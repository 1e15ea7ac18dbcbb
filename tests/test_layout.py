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
