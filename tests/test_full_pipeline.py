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


def test_full_pipeline_metadata_full(spark):
    # the 16-field record is produced alongside, golden-equal to the
    # frozen full-schema oracle over the tokenized spans
    html = datagen.generate_html_df(spark, 40, partitions=2)
    out = run_full_pipeline(html, _empty_offers(spark))
    got = {r["doc_id"]: r.asDict() for r in out["metadata_full"].collect()}
    for i in range(40):
        did, h = datagen.gen_html_doc(i)
        want = oracle.extract_metadata_full(tokenize_html_oracle(h))
        for k, v in want.items():
            assert got[did][k] == v, (did, k, got[did][k], v)


def _empty_offers(spark):
    return spark.createDataFrame(
        [],
        "provider string, listing_id string, title string, authors array<string>, "
        "publisher string, publication_date string, isbn_13 string, isbn_10 string, "
        "currency string, amount double, url string",
    )
