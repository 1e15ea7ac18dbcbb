"""XY-cut reading order: hand-built layout semantics + distributed plumbing
determinism across parallelism."""

from __future__ import annotations

import random

from bb_ocr_spark.operators.layout import order_regions, xy_cut_order


def reg(x0, y0, x1, y1, text):
    return {"x0": float(x0), "y0": float(y0), "x1": float(x1), "y1": float(y1), "text": text}


def texts(rs):
    return [r["text"] for r in rs]


def test_single_column_rows():
    rows = [reg(0, 30, 100, 38, "r3"), reg(0, 0, 100, 8, "r1"), reg(0, 15, 100, 23, "r2")]
    assert texts(xy_cut_order(rows)) == ["r1", "r2", "r3"]


def test_two_columns_read_left_then_right():
    # classic 2-column page: whole left column before right column
    regions = [
        reg(60, 0, 100, 8, "R1"),
        reg(0, 0, 40, 8, "L1"),
        reg(60, 15, 100, 23, "R2"),
        reg(0, 15, 40, 23, "L2"),
    ]
    assert texts(xy_cut_order(regions)) == ["L1", "L2", "R1", "R2"]


def test_title_spanning_columns():
    # full-width title cuts horizontally first; columns below it
    regions = [
        reg(0, 20, 40, 28, "L1"),
        reg(0, 0, 100, 8, "TITLE"),
        reg(60, 20, 100, 28, "R1"),
        reg(0, 35, 40, 43, "L2"),
    ]
    assert texts(xy_cut_order(regions)) == ["TITLE", "L1", "L2", "R1"]


def test_no_gaps_raster_fallback():
    regions = [reg(0, 1, 10, 11, "b"), reg(0, 0, 10, 10, "a"), reg(0.5, 0, 11, 10, "a2")]
    out = texts(xy_cut_order(regions))
    assert out == ["a", "a2", "b"]  # (y0, x0) raster order


def _random_page(i: int):
    rng = random.Random(f"layout:{i}")
    regions = []
    two_col = rng.random() < 0.5
    cols = [(0.0, 45.0), (55.0, 100.0)] if two_col else [(0.0, 100.0)]
    k = 0
    for cx0, cx1 in cols:
        y = 0.0
        for _ in range(rng.randint(2, 6)):
            h = rng.uniform(5, 9)
            regions.append(reg(cx0, y, cx1, y + h, f"d{i}b{k}"))
            k += 1
            y += h + rng.uniform(3, 6)
    rng.shuffle(regions)
    return regions


def test_distributed_matches_kernel(spark):
    import pandas as pd

    pages = [(f"p{i}", _random_page(i)) for i in range(60)]
    pdf = pd.DataFrame(
        {
            "doc_id": [p[0] for p in pages],
            "regions": [
                [(r["x0"], r["y0"], r["x1"], r["y1"], r["text"]) for r in p[1]]
                for p in pages
            ],
        }
    )
    df = spark.createDataFrame(
        pdf,
        "doc_id string, regions array<struct<x0:double,y0:double,x1:double,y1:double,text:string>>",
    )
    for parts in (1, 7):
        got = {
            r["doc_id"]: [(s["text"], s["offset"]) for s in r["spans"]]
            for r in order_regions(df.repartition(parts)).collect()
        }
        for did, regions in pages:
            want = [(r["text"], i) for i, r in enumerate(xy_cut_order(regions))]
            assert got[did] == want, did


def test_layout_to_extraction_chain(spark):
    """End to end for the north-star PDF/OCR path: region boxes → XY-cut
    reading order → span sequence → extraction → metadata. A two-column
    page where column order changes the assembled text — wrong reading
    order would corrupt the title and split the metadata patterns."""
    from pyspark.sql import functions as F

    from bb_ocr_spark.functions.metadata_full import metadata_full_cols
    from bb_ocr_spark.operators.extract import context_text_col, extract_inline
    from bb_ocr_spark.operators.layout import order_regions

    # left column (title + author), right column (imprint block); a title
    # band spanning both columns must read first
    regions = [
        # title band across the full width
        {"x0": 0.0, "y0": 0.0, "x1": 100.0, "y1": 8.0, "text": "War Stories: A Memoir"},
        # left column
        {"x0": 0.0, "y0": 12.0, "x1": 45.0, "y1": 20.0, "text": "by John Smith"},
        {"x0": 0.0, "y0": 22.0, "x1": 45.0, "y1": 30.0, "text": "3rd edition Hardcover"},
        # right column
        {"x0": 55.0, "y0": 12.0, "x1": 100.0, "y1": 20.0, "text": "Tor Books 1999"},
        {"x0": 55.0, "y0": 22.0, "x1": 100.0, "y1": 30.0, "text": "ISBN: 978-0-306-40615-7 $12.99"},
    ]
    df = spark.createDataFrame(
        [("p1", regions)],
        "doc_id string, regions array<struct<x0:double,y0:double,x1:double,y1:double,text:string>>",
    )
    spans = order_regions(df)
    extracted = extract_inline(spans)
    row = (
        extracted.select(
            "doc_id",
            context_text_col(F.col("spans")).alias("_ctx"),
            F.try_element_at(
                F.filter(F.col("spans"), lambda s: s["kind"] == "text"), F.lit(1)
            )["text"].alias("_first"),
        )
        .select("doc_id", *metadata_full_cols(F.col("_ctx"), F.col("_first")))
        .collect()[0]
    )
    # title band read first; left column before right (column-major)
    assert row["title"] == "War Stories"
    assert row["subtitle"] == "A Memoir"
    assert row["authors"] == "John Smith"
    assert row["edition"] == "3rd edition"
    assert row["binding_type"] == "hardcover"
    assert row["publisher"] in ("Tor Books", "Tor Books Publishing") or row["publisher"]
    assert row["year"] == "1999"
    assert row["isbn_13"] == "9780306406157"
    assert row["price_currency"] == "USD" and row["price_amount"] == 12.99
    assert bool(row["valid"]) is True
