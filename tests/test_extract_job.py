"""Resume + lineage semantics: a second run after partial completion
processes exactly the complement; final results equal a one-shot run;
metrics cover every result partition."""

from __future__ import annotations

from bb_ocr_spark import datagen
from bb_ocr_spark.plans.extract_job import (
    read_metrics,
    read_results,
    run_extract_job,
)

N = 80


def test_resume_and_lineage(spark, tmp_path):
    out = str(tmp_path / "job")
    full = datagen.generate_df(spark, N, partitions=4)
    half = full.filter(f"doc_id < '{datagen.doc_id_of(N // 2)}'")

    s1 = run_extract_job(spark, half, out, run_id="r1")
    assert s1["n_docs"] == N // 2 and s1["resumed_skipped"] == 0

    s2 = run_extract_job(spark, full, out, run_id="r2")
    assert s2["n_docs"] == N - N // 2, "resume must process exactly the complement"
    assert s2["resumed_skipped"] == N // 2

    res = read_results(spark, out)
    assert res.count() == N
    assert res.select("doc_id").distinct().count() == N, "no doc processed twice"

    # one-shot run elsewhere must produce identical (doc_id, checksum) pairs
    out2 = str(tmp_path / "oneshot")
    run_extract_job(spark, full, out2, run_id="r1")
    a = {(r["doc_id"], r["checksum"]) for r in res.select("doc_id", "checksum").collect()}
    b = {
        (r["doc_id"], r["checksum"])
        for r in read_results(spark, out2).select("doc_id", "checksum").collect()
    }
    assert a == b

    # lineage: metrics rows exist per (run, partition); totals reconcile
    m = read_metrics(spark, out)
    agg = m.groupBy().sum("n_docs").collect()[0][0]
    assert agg == N
    runs = {r["run_id"] for r in m.select("run_id").distinct().collect()}
    assert runs == {"r1", "r2"}
    # xor of partition checksums == xor of per-doc checksums
    total_ck = res.selectExpr("bit_xor(checksum)").collect()[0][0]
    m_ck = m.selectExpr("bit_xor(checksum)").collect()[0][0]
    assert total_ck == m_ck
    # per-task wall time from the SparkListener: present on every lineage
    # row in local mode, positive, and no larger than the run-level clock
    tk = m.select("task_wall_ms", "wall_time_ms").collect()
    assert all(r["task_wall_ms"] is not None for r in tk)
    assert all(0 < r["task_wall_ms"] <= r["wall_time_ms"] for r in tk)


def test_noop_rerun(spark, tmp_path):
    out = str(tmp_path / "job")
    df = datagen.generate_df(spark, 20, partitions=2)
    run_extract_job(spark, df, out, run_id="a")
    s = run_extract_job(spark, df, out, run_id="b")
    assert s["n_docs"] == 0, "fully-completed input must be a no-op"
    assert read_results(spark, out).count() == 20


def test_snapshot_time_travel(spark, tmp_path):
    import os

    from bb_ocr_spark.plans.snapshots import current_snapshot, read_results_as_of

    out = str(tmp_path / "job")
    df = datagen.generate_df(spark, 60, partitions=4)
    s1 = run_extract_job(spark, df.limit(40), out, run_id="a")
    s2 = run_extract_job(spark, df, out, run_id="b")
    assert (s1["snapshot_id"], s2["snapshot_id"]) == (1, 2)
    cur = current_snapshot(out)
    assert cur["snapshot_id"] == 2 and cur["run_ids"] == ["a", "b"]
    assert cur["n_docs_total"] == 60
    # time travel: snapshot 1 sees only run a's docs
    assert read_results_as_of(spark, out, 1).count() == s1["n_docs"]
    assert read_results_as_of(spark, out, 2).count() == 60
    # a crashed (uncommitted) run directory is invisible to snapshot reads
    os.makedirs(os.path.join(out, "results", "run_id=crashed"))
    assert read_results_as_of(spark, out, 2).count() == 60


def test_jsonl_ingestion(spark, tmp_path):
    import json

    from bb_ocr_spark.sources.tables import load_documents_jsonl

    p = tmp_path / "corpus.jsonl"
    lines = [
        json.dumps({"doc_id": "a", "text": "hello world", "lang": "en", "source": "web"}),
        json.dumps({"doc_id": "b", "text": "zweite zeile", "lang": "de", "source": "web"}),
        '{"doc_id": "c", "text": BROKEN',  # corrupt line -> NULL columns, no crash
    ]
    p.write_text("\n".join(lines))
    df = load_documents_jsonl(spark, str(p))
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows["a"]["text"] == "hello world" and rows["b"]["lang"] == "de"
    assert df.count() == 3 and df.filter("text IS NULL").count() == 1
