"""End-to-end: raw HTML corpus → extracted spans → metadata → priced
records, with offers planted to match specific docs at specific tiers."""

from __future__ import annotations

from pyspark.sql import functions as F

from bb_ocr_spark import datagen, oracle
from bb_ocr_spark.operators.tokenizer import tokenize_html_oracle
from bb_ocr_spark.plans.full_pipeline import run_full_pipeline

N = 80


def test_full_pipeline(spark):
    html = datagen.generate_html_df(spark, N, partitions=4)

    # plant offers: one exact-ISBN offer for every doc whose golden
    # metadata has an ISBN (derived via the frozen oracles, not Spark)
    import pandas as pd

    offer_rows = []
    want_meta = {}
    for i in range(N):
        did, h = datagen.gen_html_doc(i)
        md = oracle.extract_metadata(tokenize_html_oracle(h))
        want_meta[did] = md
        if md["isbn_13"]:
            offer_rows.append(
                ("g", f"L{i}", "planted title", ["A"], "PlantedPub", "1999",
                 md["isbn_13"], None, "USD", 42.0, f"u{i}")
            )
    assert offer_rows, "fixture must contain ISBN docs"
    offers = spark.createDataFrame(
        pd.DataFrame(
            offer_rows,
            columns=["provider", "listing_id", "title", "authors", "publisher",
                     "publication_date", "isbn_13", "isbn_10", "currency",
                     "amount", "url"],
        )
    )

    out = run_full_pipeline(html, offers)
    assert out["extracted"].count() == N

    meta = {r["doc_id"]: r for r in out["metadata"].collect()}
    for did, md in want_meta.items():
        assert meta[did]["isbn_13"] == md["isbn_13"], did
        assert meta[did]["year"] == md["year"], did

    priced = {r["doc_id"]: r for r in out["priced"].collect()}
    assert len(priced) == N  # left side never dropped
    n_matched = 0
    for did, md in want_meta.items():
        if md["isbn_13"]:
            assert priced[did]["match_tier"] == 1, did
            assert priced[did]["best_amount"] == 42.0
            n_matched += 1
            # coalesce-fill: docs without their own publisher get the offer's
            if md["publisher"] is None:
                assert priced[did]["publisher"] == "PlantedPub"
    assert n_matched >= 3
