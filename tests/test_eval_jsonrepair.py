"""Evaluation harness (A7) and JSON repair (U8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bb_ocr_spark import datagen
from bb_ocr_spark.functions.jsonrepair import cleaned_json_col, repair_json_df
from bb_ocr_spark.operators.evaluate import field_match_report, span_match_report
from bb_ocr_spark.operators.extract import extract_inline


def test_span_match_report_all_match(spark):
    df = datagen.generate_df(spark, 40, partitions=4)
    a = extract_inline(df)
    rep = span_match_report(a, a).collect()[0]
    assert rep["span_match_rate"] == 1.0 and rep["n_mismatch"] == 0


def test_span_match_report_detects_mismatch(spark):
    df = datagen.generate_df(spark, 40, partitions=4)
    a = extract_inline(df)
    # corrupt one doc: drop its first span
    b = a.withColumn(
        "spans",
        F.when(
            F.col("doc_id") == datagen.doc_id_of(1),
            F.slice(F.col("spans"), 2, 10_000),
        ).otherwise(F.col("spans")),
    )
    rep = span_match_report(a, b).collect()[0]
    assert rep["n_mismatch"] == 1
    assert abs(rep["span_match_rate"] - 39 / 40) < 1e-6
    # missing doc counts as mismatch (full outer)
    rep2 = span_match_report(a.filter(f"doc_id != '{datagen.doc_id_of(2)}'"), a).collect()[0]
    assert rep2["n_mismatch"] == 1


def test_field_match_report(spark):
    res = spark.createDataFrame(
        [("d1", "The Quick Fox", "Acme"), ("d2", "quick fox the", None), ("d3", "Other", "X")],
        "doc_id string, title string, publisher string",
    )
    gold = spark.createDataFrame(
        [("d1", "The Quick Fox", "Acme"), ("d2", "the quick fox", None), ("d3", "Completely Different", "Y")],
        "doc_id string, title string, publisher string",
    )
    rep = field_match_report(res, gold, ["title", "publisher"]).collect()[0]
    assert rep["n"] == 3
    assert abs(rep["title_exact"] - 1 / 3) < 1e-6  # only d1 exact
    assert abs(rep["title_fuzzy"] - 2 / 3) < 1e-6  # d2 same token set
    assert abs(rep["publisher_exact"] - 2 / 3) < 1e-6  # d1 + both-null d2


def test_json_repair(spark):
    rows = [
        ("a", '```json\n{"title": "T", "publisher": "string | null", "year": "1999", '
              '"authors": ["X"], "isbn_13": null, "isbn_10": null, "page_count": 12, '
              '"price": {"currency": "USD", "amount": 9.5}}\n```'),
        ("b", 'prose before {"title": "U", "authors": [], "publisher": "P", "year": null, '
              '"isbn_13": null, "isbn_10": null, "page_count": null, "price": null} prose after'),
        ("c", "no json at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, raw string")
    out = {r["doc_id"]: r for r in repair_json_df(df).collect()}
    assert out["a"]["record"]["title"] == "T"
    assert out["a"]["record"]["publisher"] is None  # placeholder neutralized
    assert out["a"]["record"]["price"]["amount"] == 9.5
    assert out["a"]["fallback_used"] is False
    assert out["b"]["record"]["title"] == "U"  # fence-less, embedded in prose
    assert out["c"]["record"] is None and out["c"]["fallback_used"] is True


def test_cleaned_json_col_placeholder(spark):
    df = spark.createDataFrame(
        [('{"a": "integer | null", "b": 1}',)], "raw string"
    )
    got = df.select(cleaned_json_col(F.col("raw")).alias("c")).collect()[0]["c"]
    assert got == '{"a": null, "b": 1}'
