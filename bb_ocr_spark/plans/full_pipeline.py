"""The complete reference flow as one Spark plan (SURVEY §3 E1-E3).

    raw markup ──tokenize──▶ documents_interleaved
              ──extract───▶ ordered span sequences (+ lineage/resume)
              ──heuristic─▶ metadata records (+ validation)
              ──enrich────▶ best offer per doc (tiered join)
              ──merge─────▶ priced records (coalesce-fill)

Everything before enrichment is narrow (zero shuffle); enrichment shuffles
only on short join keys. This is the "switch from the reference" user
journey: what `process_book_enhanced.py` + the pricing UI do per document,
as one declarative plan over tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.metadata import extract_metadata_df, validate_metadata_cols
from ..operators.extract import extract_inline
from ..operators.offers import best_offer, dedup_offers, merge_metadata
from ..operators.tokenizer import tokenize_html_expr


def html_to_interleaved(html_df: DataFrame) -> DataFrame:
    return tokenize_html_expr(html_df)


def interleaved_to_metadata(documents_interleaved: DataFrame) -> DataFrame:
    meta = extract_metadata_df(documents_interleaved)
    return meta.withColumn("valid", validate_metadata_cols())


def enrich_and_price(meta: DataFrame, offers: DataFrame) -> DataFrame:
    offers = dedup_offers(offers)
    best = best_offer(meta, offers)
    return merge_metadata(meta, best, offers)


def run_full_pipeline(html_df: DataFrame, offers: DataFrame) -> dict[str, DataFrame]:
    """Returns every intermediate table (caller picks sinks).

    `metadata` is the compact 6-field record the enrichment join consumes;
    `metadata_full` is the complete 16-field schema of the reference
    (enhanced_extractor.py:57-92) for downstream consumers."""
    from ..functions.metadata import extract_metadata_full_df  # noqa: PLC0415

    interleaved = html_to_interleaved(html_df)
    extracted = extract_inline(interleaved)
    meta = interleaved_to_metadata(interleaved)
    priced = enrich_and_price(meta, offers)
    return {
        "interleaved": interleaved,
        "extracted": extracted,
        "metadata": meta,
        "metadata_full": extract_metadata_full_df(interleaved),
        "priced": priced,
    }
