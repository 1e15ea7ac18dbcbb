"""Streaming ingest for the extraction pipeline.

The core extraction is a stateless narrow map (extract_inline), so it
runs UNCHANGED under Structured Streaming: point a file source at the
interleaved-docs directory and new documents are extracted incrementally
as they land — the continuous-ingest alternative to the batch-incremental
snapshot+anti-join resume of plans/extract_job (reference analog: the
upload→process flow of i2j_ui/app/main.py:714-837, minus the threads).

Checkpointing gives exactly-once file-source progress; per-batch lineage
can reuse the same metrics schema via foreachBatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.extract import checksum_spans_col, extract_inline

DOCS_SCHEMA_DDL = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def read_documents_stream(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(DOCS_SCHEMA_DDL).parquet(path)


def extract_stream(docs: DataFrame) -> DataFrame:
    """Identical plan to the batch hot path — stateless, no watermark
    needed, no shuffle; every micro-batch is pure data parallelism."""
    from pyspark.sql import functions as F

    return extract_inline(docs).withColumn(
        "checksum", checksum_spans_col(F.col("spans"))
    )
