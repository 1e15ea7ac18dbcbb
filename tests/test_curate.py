"""End-to-end corpus curation: quality -> exact dedup -> paragraph dedup
-> split -> shard packing, with attrition accounting reconciled."""

from __future__ import annotations

from pyspark.sql import functions as F

from bb_ocr_spark.plans.curate import run_curation


def test_curation_pipeline(spark):
    rows = []
    # 60 quality docs (multi-paragraph), 3 exact dup pairs, shared boiler
    for i in range(60):
        body = " ".join(f"w{i}_{j} the of and to" for j in range(12))
        rows.append((i, f"{body}\nsubscribe to our newsletter today"))
    for i in range(3):  # exact duplicates of docs 0..2 (normalized-equal)
        rows.append((100 + i, rows[i][1].upper().lower()))
    rows.append((200, "x"))  # fails quality (too short)
    df = spark.createDataFrame(rows, "doc_id long, text string")

    out = run_curation(df, shard_budget_tokens=300)
    stats = out["stats"].collect()[0]
    assert stats["n_input"] == 64
    assert stats["n_quality_kept"] == 63  # short doc dropped
    assert stats["n_exact_unique"] == 60 and stats["n_exact_dropped"] == 3
    assert stats["n_paragraphs_dropped"] == 59  # shared boiler kept once

    curated = {r["id"]: r for r in out["curated"].collect()}
    assert len(curated) == 60
    assert sum(1 for r in curated.values() if "newsletter" in r["text_dedup"]) == 1
    splits = {r["split"] for r in curated.values()}
    assert "train" in splits
    # every train doc has a shard; shards fill in id order
    train = [r for r in curated.values() if r["split"] == "train"]
    assert all(r["shard_id"] is not None for r in train)
    assert all(r["shard_id"] is None for r in curated.values() if r["split"] != "train")
    # prefix property: shard ids are non-decreasing in id order over train
    ordered = [r["shard_id"] for r in sorted(train, key=lambda r: r["id"])]
    assert ordered == sorted(ordered)


def test_curation_scrub_and_decontam_stages(spark):
    rows = []
    for i in range(40):
        body = " ".join(f"w{i}_{j} the of and to" for j in range(12))
        rows.append((i, f"{body} mail user{i}@example.com"))
    # a repetition-bomb doc: one line repeated many times
    rows.append((300, "\n".join(["the same line of and to again"] * 20)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # eval set shares exactly one trigram ("and to w5_1") unique to doc 5
    # (common trigrams like "the of and" would contaminate every doc)
    ev = spark.createDataFrame(
        [(9000, "and to w5_1")], "doc_id long, text string"
    )
    out = run_curation(df, shard_budget_tokens=300, eval_df=ev)
    stats = out["stats"].collect()[0]
    assert stats["n_repetition_flagged"] == 1  # the repetition bomb
    assert stats["n_contaminated"] == 1  # doc 5 and only doc 5
    kept_ids = {r["id"] for r in out["kept"].collect()}
    assert 5 not in kept_ids and 300 not in kept_ids
    # PII scrub happened before everything downstream
    curated = {r["id"]: r for r in out["curated"].collect()}
    assert all("@example.com" not in r["text_dedup"] for r in curated.values())
    assert any("<EMAIL>" in r["text_dedup"] for r in curated.values())
    # no-eval path still reports a zero contamination stat
    out2 = run_curation(df, shard_budget_tokens=300)
    assert out2["stats"].collect()[0]["n_contaminated"] == 0


def test_curation_near_dup_stage(spark):
    rows = []
    for i in range(30):
        body = " ".join(f"w{i}_{j} the of and to" for j in range(12))
        rows.append((i, body))
    # near-dups of doc 3 (one token changed — high jaccard, not exact)
    base3 = rows[3][1]
    rows.append((400, base3.replace("w3_11", "changed")))
    rows.append((401, base3.replace("w3_10", "altered")))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    out = run_curation(df, shard_budget_tokens=300, near_dup_threshold=0.6)
    stats = out["stats"].collect()[0]
    assert stats["n_near_dup_dropped"] == 2  # 400 and 401 collapse into 3
    curated = {r["id"] for r in out["curated"].collect()}
    assert 3 in curated and 400 not in curated and 401 not in curated

    # without the stage nothing is dropped and the stat reads zero
    out2 = run_curation(df, shard_budget_tokens=300)
    assert out2["stats"].collect()[0]["n_near_dup_dropped"] == 0
    assert {400, 401} <= {r["id"] for r in out2["curated"].collect()}
