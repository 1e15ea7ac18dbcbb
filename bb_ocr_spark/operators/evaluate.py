"""Accuracy / parity evaluation (A7): results ⋈ golden, exact + fuzzy
match rates per field and overall span-sequence match rate.

Reference: evaluate_results.py:43-139 (exact + fuzz.ratio>=80 matching of
title/author/publisher vs ground_truth.json, avg inference time) and
compare_with_ocr.py:157-262 (3-way inner join on image name, per-method
accuracy report). The BASELINE.json headline metric — span-sequence
exact-match rate — is `span_match_report`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .extract import serialize_spans_col


def _similarity(a: Column, b: Column) -> Column:
    """Token-set Jaccard in [0,1] — deterministic stand-in for fuzz.ratio
    (same role: tolerant string match)."""
    ta = F.array_distinct(F.split(F.lower(F.trim(a)), r"\s+"))
    tb = F.array_distinct(F.split(F.lower(F.trim(b)), r"\s+"))
    inter = F.size(F.array_intersect(ta, tb))
    union = F.size(F.array_union(ta, tb))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def field_match_report(
    results: DataFrame,
    golden: DataFrame,
    fields: list[str],
    key: str = "doc_id",
    fuzzy_min: float = 0.8,
) -> DataFrame:
    """One row: per-field exact rate, fuzzy rate, and n (J7 3-way-join
    analog; inner join so only co-present keys are graded)."""
    g = golden.select(key, *[F.col(f).alias(f"g_{f}") for f in fields])
    j = results.select(key, *fields).join(g, key)
    aggs = [F.count("*").alias("n")]
    for f in fields:
        both_null = F.col(f).isNull() & F.col(f"g_{f}").isNull()
        # one-sided NULLs make `a == b` SQL-NULL, which F.avg would silently
        # DROP from the denominator (inflating the rate); coalesce to False
        # so a missing field vs a present golden value counts as a miss and
        # exact/fuzzy share the same denominator
        exact = F.coalesce(both_null | (F.col(f) == F.col(f"g_{f}")), F.lit(False))
        fuzzy = F.coalesce(
            both_null | (_similarity(F.col(f), F.col(f"g_{f}")) >= fuzzy_min),
            F.lit(False),
        )
        aggs.append(F.round(F.avg(exact.cast("double")), 6).alias(f"{f}_exact"))
        aggs.append(F.round(F.avg(fuzzy.cast("double")), 6).alias(f"{f}_fuzzy"))
    return j.groupBy().agg(*aggs)


def span_match_report(
    results: DataFrame, golden: DataFrame, key: str = "doc_id"
) -> DataFrame:
    """The headline metric: per-doc span-sequence equality rate on
    (kind, text, media_ref, order), via serialized-sequence comparison.
    Full outer join so missing/extra docs count as mismatches."""
    r = results.select(key, serialize_spans_col(F.col("spans")).alias("r_ser"))
    g = golden.select(key, serialize_spans_col(F.col("spans")).alias("g_ser"))
    j = r.join(g, key, "full_outer")
    match = (F.col("r_ser") == F.col("g_ser")).cast("double")
    return j.groupBy().agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(F.coalesce(match, F.lit(0.0))), 6).alias("span_match_rate"),
        F.sum((F.coalesce(match, F.lit(0.0)) < 1).cast("long")).alias("n_mismatch"),
    )
