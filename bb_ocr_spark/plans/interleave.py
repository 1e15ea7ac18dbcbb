"""Build a documents_interleaved table from the driver's flat documents table.

The driver test data (`documents.parquet`: doc_id, text, lang, source,
n_chars) is a flat corpus. To exercise the interleaved-spans contract on it,
we deterministically shred each doc's text into 5-token chunk spans stored in
REVERSED chunk order (simulating permuted storage that the extractor must
re-order), plus one trailing media span — all with built-in expressions, no
UDFs, no shuffle.

The key invariant (and the DuckDB oracle for it): extracting + reassembling
the interleaved table in offset order reproduces the ORIGINAL text exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK_TOKENS = 5


def interleave_documents(documents: DataFrame) -> DataFrame:
    """(doc_id, text, …) → (doc_id string, spans array<struct<…>>).

    span j (j = 0..nch-1) holds chunk (nch-1-j) at offset (nch-1-j);
    span nch is a media span at offset nch.
    """
    toks = F.split(F.col("text"), " ")
    nch = F.floor((F.size(toks) + F.lit(CHUNK_TOKENS - 1)) / F.lit(CHUNK_TOKENS)).cast(
        "int"
    )
    did = F.col("doc_id").cast("string")
    text_spans = F.transform(
        F.sequence(F.lit(0), nch - 1),
        lambda j: F.struct(
            F.lit("text").alias("kind"),
            F.array_join(
                F.slice(toks, (nch - 1 - j) * CHUNK_TOKENS + 1, CHUNK_TOKENS), " "
            ).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            (nch - 1 - j).cast("int").alias("offset"),
        ),
    )
    media_span = F.array(
        F.struct(
            F.lit("media").alias("kind"),
            F.lit(None).cast("string").alias("text"),
            F.concat(F.lit("media://"), did, F.lit("/"), nch.cast("string")).alias(
                "media_ref"
            ),
            nch.cast("int").alias("offset"),
        )
    )
    return documents.select(
        did.alias("doc_id"), F.concat(text_spans, media_span).alias("spans")
    )
