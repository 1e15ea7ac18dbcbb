"""Enrichment operators: tiered best-offer join, dedup, scoring, top-k,
coalesce-merge — hand-built fixtures with hand-computed expectations."""

from __future__ import annotations

import pytest

from bb_ocr_spark.operators.offers import (
    best_offer,
    candidate_pairs_by_token,
    dedup_offers,
    merge_metadata,
    score_offers,
    top_k_offers,
)

META = [
    # doc_id, title, publisher, year, isbn_13, isbn_10
    ("d1", "The Quick Fox", None, None, "9781111111111", None),  # tier1: isbn
    ("d2", "Deep Ocean Atlas", None, "1999", None, None),  # tier2: exact title
    ("d3", "Ancient War History Tome", None, None, None, None),  # tier3: fuzzy
    ("d4", "Unmatchable Zzz", None, None, None, None),  # no match
]

OFFERS = [
    # provider, listing_id, title, authors, publisher, publication_date,
    # isbn_13, isbn_10, currency, amount, url
    ("g", "L1", "Totally Different", ["A"], "P1", "2001", "978-1-111111111", None, "USD", 20.0, "u1"),
    ("g", "L2", "deep ocean atlas", ["B"], "P2", "1999", None, None, "USD", 15.0, "u2"),
    ("a", "L3", "Ancient War History", ["C"], "P3", "1950", None, None, "USD", 9.0, "u3"),
    ("a", "L4", "The Quick Fox", ["D"], "P4", "2002", None, None, "USD", 5.0, "u4"),
    # duplicate of L1 on the dedup key
    ("g", "L1", "Totally Different", ["A"], "P1", "2001", "978-1-111111111", None, "USD", 20.0, "u1b"),
]

OFFER_COLS = [
    "provider", "listing_id", "title", "authors", "publisher",
    "publication_date", "isbn_13", "isbn_10", "currency", "amount", "url",
]


@pytest.fixture(scope="module")
def meta_df(spark):
    return spark.createDataFrame(
        META, "doc_id string, title string, publisher string, year string, isbn_13 string, isbn_10 string"
    )


@pytest.fixture(scope="module")
def offers_df(spark):
    return spark.createDataFrame(OFFERS, ", ".join(
        f"{c} {'array<string>' if c == 'authors' else 'double' if c == 'amount' else 'string'}"
        for c in OFFER_COLS
    ))


def test_dedup(offers_df):
    out = dedup_offers(offers_df)
    assert out.count() == 4
    # first-wins by url ordering: u1 kept, u1b dropped
    urls = {r["url"] for r in out.collect()}
    assert "u1" in urls and "u1b" not in urls


def test_best_offer_tiers(meta_df, offers_df):
    best = {r["doc_id"]: r for r in best_offer(meta_df, dedup_offers(offers_df)).collect()}
    # d1: isbn match beats the cheaper title match (tier 1 wins over tier 2)
    assert best["d1"]["listing_id"] == "L1" and best["d1"]["tier"] == 1
    # d2: exact normalized title (case-insensitive)
    assert best["d2"]["listing_id"] == "L2" and best["d2"]["tier"] == 2
    # d3: fuzzy — tokens {ancient,war,history,tome} vs {ancient,war,history}
    # jaccard 3/4 = 0.75 >= 0.5
    assert best["d3"]["listing_id"] == "L3" and best["d3"]["tier"] == 3
    # d4: no candidate at any tier
    assert "d4" not in best


def test_candidate_pairs_no_crossjoin(meta_df, offers_df):
    cand = candidate_pairs_by_token(meta_df, offers_df)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    pairs = {(r["doc_id"], r["listing_id"]): r["jaccard"] for r in cand.collect()}
    assert pairs[("d3", "L3")] == 0.75
    assert ("d4", "L1") not in pairs


def test_scoring_and_topk(spark, offers_df):
    from pyspark.sql import functions as F

    scored = score_offers(
        offers_df, F.lit("The Quick Fox"), F.lit("D"), F.lit("2002")
    )
    rows = {r["listing_id"]: r["score"] for r in scored.collect()}
    # L4: exact title (+3), author D (+1.5), year 2002 (+1) = 5.5
    assert rows["L4"] == 5.5
    assert rows["L2"] == 0.0

    withdoc = scored.withColumn("doc_id", F.lit("q"))
    top2 = top_k_offers(withdoc, k=2).collect()
    assert [r["listing_id"] for r in top2] == ["L4", "L3"]  # 5.5, then cheapest of the 0-score ties


def test_merge_metadata(meta_df, offers_df):
    offers = dedup_offers(offers_df)
    best = best_offer(meta_df, offers)
    merged = {r["doc_id"]: r for r in merge_metadata(meta_df, best, offers).collect()}
    # d2 had no isbn/publisher; nothing to fill isbn (L2 has none) but
    # publisher comes from the offer
    assert merged["d2"]["publisher"] == "P2"
    assert merged["d2"]["year"] == "1999"  # own value kept (pick = a unless null)
    # d1 publisher filled from L1
    assert merged["d1"]["publisher"] == "P1"
    assert merged["d1"]["isbn_13"] == "9781111111111"  # own kept
    # d4 survives the left join with nulls (J1: left side never dropped)
    assert merged["d4"]["match_tier"] is None
    assert merged["d4"]["best_amount"] is None
