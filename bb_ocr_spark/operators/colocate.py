"""Explicit shuffle-avoidance techniques (SURVEY §4: partitioning/shuffle/
skew handled explicitly, not left to defaults).

1. Bucketed tables — pay the shuffle ONCE at write time; every later join
   or aggregation on the bucket key is co-located (no Exchange). This is
   the pattern for the results/metadata tables that downstream enrichment
   repeatedly joins on doc_id.

2. Salted joins — for a join with a pathologically hot key that AQE's
   skew-split can't fix (e.g. one doc_id carrying 10^6 offer rows): the
   fat side gets a deterministic per-row salt, the thin side is exploded
   across all salt values, the join key becomes (key, salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Persist df hash-bucketed (and sorted) by key as a managed table.

    Drops any previous table AND its orphaned location first: a managed
    table whose metadata died with a previous session leaves its directory
    behind, and saveAsTable refuses to reuse the location."""
    import shutil  # noqa: PLC0415

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)
    (
        df.write.mode(mode)
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def salted_join(
    fat: DataFrame,
    thin: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `fat` has hot keys: fat rows get salt =
    xxhash64(all fat columns) % n, thin rows are replicated across all n
    salts, and the join runs on (key, salt) — the hot key's rows spread
    over n reducers instead of one. Result equals fat.join(thin, key, how)
    for fat-side-preserving joins only (asserted in tests): because the
    thin side is exploded across all n salts, a right/full outer join would
    emit every unmatched thin row n times, so those modes are rejected.
    Thin-side duplication costs n× the THIN side only, which is the correct
    trade when fat >> thin on hot keys."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} not supported — thin-side salt "
            "explosion duplicates unmatched thin rows under right/full outer"
        )
    fat_s = fat.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in fat.columns]), F.lit(n_salts))
    )
    thin_s = thin.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salts)]))
    )
    return fat_s.join(thin_s, [key, "_salt"], how).drop("_salt")
