"""Parquet table loaders for the driver-provided test data.

In production these would be Iceberg catalog tables (`spark.read.table`);
the sandbox has plain parquet, so the loaders go through `spark.read
.parquet` — Catalyst still gets filter pushdown + column pruning. The
Iceberg write path is stubbed behind an import-try (iceberg jars are not in
this image).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TPCH_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TPCH_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def have_iceberg(spark: SparkSession) -> bool:
    """True iff the iceberg runtime jar is actually on the classpath.
    Must go through Class.forName: py4j resolves a missing class path to
    a JavaPackage object WITHOUT raising, so attribute access alone
    reports present for any class name (caught by test_env_gates)."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")
        return True
    except Exception:
        return False


DOCS_JSONL_DDL = "doc_id string, text string, lang string, source string"


def load_documents_jsonl(
    spark: SparkSession, path: str, schema: str = DOCS_JSONL_DDL
) -> DataFrame:
    """Raw-corpus ingestion from JSON Lines (the common pretraining dump
    format). An EXPLICIT schema is mandatory at scale: schema inference
    runs a full extra pass over 100 TB and silently widens types on dirty
    records; with a fixed schema, corrupt lines surface as NULL columns
    (Spark's PERMISSIVE mode) instead of failing the job — filter
    `text IS NULL` into a quarantine sink rather than crashing."""
    return spark.read.schema(schema).json(path)
