"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bb_ocr_spark.functions.metadata import extract_metadata_df  # noqa: E402
from bb_ocr_spark.operators.extract import (  # noqa: E402
    context_text_col,
    extract_inline,
)
from bb_ocr_spark.plans.interleave import interleave_documents  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


# ---------------------------------------------------------------------------
# flagship: interleave → extract → reassemble; invariant = original text
# ---------------------------------------------------------------------------


def _q_extract_reassemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    interleaved = interleave_documents(_docs(spark, sf_dir))
    extracted = extract_inline(interleaved)
    spans = F.col("spans")
    return extracted.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.size(spans).alias("n_spans_out"),
        context_text_col(spans).alias("content"),
        F.array_join(
            F.transform(
                F.filter(spans, lambda s: s["kind"] == "media"),
                lambda s: s["media_ref"],
            ),
            ",",
        ).alias("media_refs"),
    )


_ORACLE_EXTRACT_REASSEMBLE = """
SELECT doc_id,
       CAST(ceil(len(string_split(text, ' ')) / 5.0) AS INT) + 1 AS n_spans_out,
       text AS content,
       'media://' || CAST(doc_id AS VARCHAR) || '/' ||
         CAST(CAST(ceil(len(string_split(text, ' ')) / 5.0) AS INT) AS VARCHAR)
         AS media_refs
FROM documents
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q_extract_reassemble(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "extract_reassemble": _q_extract_reassemble,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "extract_reassemble": _ORACLE_EXTRACT_REASSEMBLE,
    }
