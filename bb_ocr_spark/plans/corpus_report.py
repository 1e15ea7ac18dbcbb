"""Corpus quality report: one row per source with the signals a curation
team reviews before training — composed entirely from verified
primitives (quality_cols, lang_guess_col, fingerprint_md5_col, the
unigram-LM surprisal) into a single job.

Every column is an INTEGER count or an integer-derived ratio, so the
report is exact and identical at any parallelism/engine (the same
micro-nat discipline as unigram_surprisal; no float aggregation
anywhere). Shuffle profile: one narrow scan computes all per-doc
signals, then one groupBy on source (tiny key space), one fingerprint
groupBy for the dup rate, one token pass for the surprisal model —
each map-side combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    fingerprint_md5_col,
    lang_guess_col,
    quality_cols,
    tokens_col,
)


def corpus_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(source, n_docs, n_tokens, n_quality_kept, n_exact_dup_docs,
    top_lang, top_lang_docs, surprisal_micronats)

    n_exact_dup_docs counts docs whose normalized-text fingerprint occurs
    more than once CORPUS-wide (both copies count — the number a dedup
    pass would inspect, not the number it would drop). top_lang is the
    modal lang guess per source (ties → lexicographically smallest;
    docs with no guess grouped as '??')."""
    from ..operators.search import unigram_surprisal  # noqa: PLC0415

    t = F.col(text_col)
    base = docs.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("source"),
        t.alias("text"),
        tokens_col(t).alias("_toks"),
    )
    from ..cache import track_persist  # noqa: PLC0415

    # the per-doc signal projection (20-language argmax + quality ratios
    # + fingerprint) feeds the dup-fp groupBy, the dup join, the source
    # aggregate, AND the lang mode — no CSE across self-referencing
    # branches, so persist or compute it 4x (production materializes the
    # per-doc stats table for the same reason)
    per_doc = track_persist(
        base.select(
            "id",
            "source",
            F.size("_toks").cast("long").alias("n_tokens"),
            F.coalesce(
                lang_guess_col(F.col("text"), toks=F.col("_toks")), F.lit("??")
            ).alias("lang"),
            quality_cols(F.col("text"), toks=F.col("_toks"))[6],  # quality_keep
            fingerprint_md5_col(F.col("text")).alias("fp"),
        )
    )
    dup_fps = (
        per_doc.groupBy("fp")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .select("fp")
    )
    with_dup = per_doc.join(
        dup_fps.withColumn("_dup", F.lit(1)), "fp", "left"
    )
    surp = unigram_surprisal(docs, id_col=id_col, text_col=text_col).select(
        F.col(id_col).alias("id"), "surprisal_micronats"
    )
    joined = with_dup.join(surp, "id")
    per_source = joined.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum(F.col("quality_keep").cast("long")).cast("long").alias(
            "n_quality_kept"
        ),
        F.sum(F.coalesce("_dup", F.lit(0))).cast("long").alias(
            "n_exact_dup_docs"
        ),
        F.sum("surprisal_micronats").cast("long").alias(
            "surprisal_micronats"
        ),
    )
    lang_counts = per_doc.groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("n")
    )
    # modal lang with deterministic ties: min over (-n, lang) — ascending
    # struct order gives highest count first, then smallest lang
    top_lang = (
        lang_counts.select(
            "source",
            F.struct((-F.col("n")).alias("neg_n"), F.col("lang").alias("lang")).alias(
                "_s"
            ),
        )
        .groupBy("source")
        .agg(F.min("_s").alias("_s"))
        .select(
            "source",
            F.col("_s.lang").alias("top_lang"),
            (-F.col("_s.neg_n")).cast("long").alias("top_lang_docs"),
        )
    )
    return per_source.join(top_lang, "source")
