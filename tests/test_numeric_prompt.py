"""Locale numeric parse (F3), currency mapping, prompt builder (U6),
binaryFile loader + base64 (S3/F6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bb_ocr_spark import datagen
from bb_ocr_spark.functions.numeric import currency_code, parse_locale_number
from bb_ocr_spark.functions.prompt import page_blocks_col, prompt_col
from bb_ocr_spark.operators.extract import extract_inline
from bb_ocr_spark.sources.media import b64_content_col, load_binary_dir


def test_parse_locale_number(spark):
    cases = [
        ("1.234,56", 1234.56),
        ("1,234.56", 1234.56),
        ("12,50", 12.50),
        ("12.50", 12.50),
        ("1,234", 1234.0),
        ("1.234", 1.234),  # trailing 3 digits after dot: ambiguous, dot kept
        ("  $ 99 ", 99.0),
        ("abc", None),
        ("", None),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "raw string")
    got = [
        r["v"]
        for r in df.select(parse_locale_number(F.col("raw")).alias("v")).collect()
    ]
    for (raw, want), v in zip(cases, got):
        assert v == want, f"{raw!r}: {v} != {want}"


def test_currency_code(spark):
    cases = [
        ("$12.50", "USD"),
        ("€ 9,99", "EUR"),
        ("£5", "GBP"),
        ("12 euros", "EUR"),
        ("price in dollars", "USD"),
        ("C$ 8", "CAD"),
        ("nothing", None),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "raw string")
    got = [
        r["c"] for r in df.select(currency_code(F.col("raw")).alias("c")).collect()
    ]
    for (raw, want), c in zip(cases, got):
        assert c == want, f"{raw!r}: {c} != {want}"


def test_prompt_builder(spark):
    df = datagen.generate_df(spark, 10, partitions=2)
    out = extract_inline(df).select(
        "doc_id",
        page_blocks_col(F.col("spans")).alias("blocks"),
        prompt_col(F.col("spans")).alias("prompt"),
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    r = next(r for r in rows.values() if r["blocks"])
    assert r["blocks"].startswith("Page 1 OCR Text:\n")
    assert r["prompt"].startswith("Extract structured metadata")
    assert r["blocks"] in r["prompt"]
    # page numbering is sequential over kept text spans
    import re

    nums = [int(m) for m in re.findall(r"Page (\d+) OCR Text:", r["blocks"])]
    assert nums == list(range(1, len(nums) + 1))


def test_binary_loader_and_b64(spark, tmp_path):
    p = tmp_path / "blobs"
    p.mkdir()
    (p / "a.bin").write_bytes(b"\x00\x01hello")
    (p / "b.txt").write_bytes(b"ignored")
    df = load_binary_dir(spark, str(p), glob="*.bin")
    rows = df.select("path", "content", b64_content_col(F.col("content")).alias("b64")).collect()
    assert len(rows) == 1
    import base64

    assert base64.b64decode(rows[0]["b64"]) == b"\x00\x01hello"
