"""Bucketed co-located joins (no Exchange) and salted hot-key joins
(equal results to the plain join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bb_ocr_spark.operators.colocate import read_table, salted_join, write_bucketed


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(o, "t_orders_b", "o_orderkey", buckets=8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "t_lineitem_b",
        "o_orderkey", buckets=8,
    )
    a = read_table(spark, "t_orders_b")
    b = read_table(spark, "t_lineitem_b")
    # hint forces sort-merge (small inputs would broadcast and hide the
    # co-location property under test)
    j = a.hint("merge").join(b, "o_orderkey").select(
        "o_orderkey", "o_totalprice", "l_quantity"
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:600]}"
    # and it computes the same thing as the plain join
    plain = o.join(li, o.o_orderkey == li.l_orderkey).count()
    assert j.count() == plain


def test_salted_join_equals_plain_join(spark):
    import pandas as pd

    # hot key: 5000 fat rows on key 'hot', a handful elsewhere
    fat = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["hot"] * 5000 + ["a", "b", "c"],
                "v": list(range(5003)),
            }
        )
    )
    thin = spark.createDataFrame(
        pd.DataFrame({"k": ["hot", "a", "z"], "w": [1, 2, 3]})
    )
    got = salted_join(fat, thin, "k", n_salts=8)
    want = fat.join(thin, "k")
    assert got.count() == want.count() == 5001
    gs = {(r["k"], r["v"], r["w"]) for r in got.collect()}
    ws = {(r["k"], r["v"], r["w"]) for r in want.collect()}
    assert gs == ws
    # left join keeps unmatched fat rows exactly once
    gl = salted_join(fat, thin, "k", n_salts=8, how="left")
    assert gl.count() == fat.count()
    assert gl.filter(F.col("w").isNull()).count() == 2  # b, c
