"""Physical-plan quality gates: the optimizations we claim must be visible
in the executed plan — filter pushdown into the parquet scan, column
pruning, broadcast joins for dims, zero Exchange in the narrow pipelines."""

from __future__ import annotations

from pyspark.sql import functions as F

from bb_ocr_spark import datagen
from bb_ocr_spark.functions.metadata import extract_metadata_df
from bb_ocr_spark.operators.extract import extract_inline
from bb_ocr_spark.operators.tokenizer import tokenize_html_expr


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_narrow_pipelines_have_no_exchange(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from bb_ocr_spark.plans.interleave import interleave_documents

    interleaved = interleave_documents(docs)
    for df in (
        extract_inline(interleaved),
        extract_metadata_df(interleaved),
        tokenize_html_expr(
            docs.select(F.col("doc_id").cast("string"), F.col("text").alias("html"))
        ),
    ):
        p = plan_of(df)
        assert "Exchange" not in p, f"narrow pipeline shuffles:\n{p[:500]}"


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= "1998-09-02").select("l_orderkey", "l_quantity")
    p = plan_of(q)
    assert "PushedFilters: [" in p and "l_shipdate" in p.split("PushedFilters")[1][:200]
    # column pruning: scan schema holds only the needed columns
    read_schema = p.split("ReadSchema:")[-1]
    assert "l_extendedprice" not in read_schema


def test_dim_join_is_broadcast(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    q = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .select("o_orderkey", "n_name")
    )
    p = plan_of(q)
    assert "BroadcastHashJoin" in p, "small dims should broadcast"


def test_anti_join_resume_shape(spark, tmp_path):
    from bb_ocr_spark.plans.extract_job import run_extract_job, completed_doc_ids

    out = str(tmp_path / "j")
    df = datagen.generate_df(spark, 30, partitions=2)
    run_extract_job(spark, df, out, run_id="a")
    done = completed_doc_ids(spark, out)
    resumed = df.join(done, "doc_id", "left_anti")
    p = plan_of(resumed)
    assert "LeftAnti" in p
    # completed set is small -> broadcast anti join expected
    assert "Broadcast" in p

def test_new_query_plan_quality(spark):
    """Plan-shape guards for the round-2 driver queries: candidate
    generation must never degrade to a cartesian/nested-loop product, and
    the tokenizer query must stay a narrow zero-Exchange map."""
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    qs = E.queries()

    tok = plan_of(qs["tokenize_spans"](spark, sf))
    # round 6: the read-side fanout (_fanout) adds exactly one
    # id-hash REPARTITION_BY_NUM exchange so a tiny single-row-group
    # input spreads over the cores; the pipeline itself must stay narrow —
    # no hash/range exchange introduced by the tokenizer work
    fanouts = tok.count("REPARTITION_BY_NUM")
    assert tok.count("Exchange") == fanouts <= 1, (
        "tokenize_spans must stay a narrow map-only plan apart from the "
        f"read-side fanout repartition:\n{tok[:800]}"
    )

    for name in ("best_offer", "paragraph_dedup", "minhash_lsh", "ngram_jaccard"):
        plan = plan_of(qs[name](spark, sf))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
