"""Exploded-path assembly: salted two-phase result == inline result ==
oracle, including the mega-doc (salting actually engages) — and salting
preserves GLOBAL per-doc offset order (SURVEY §7 hard part)."""

from __future__ import annotations

from bb_ocr_spark import datagen, oracle
from bb_ocr_spark.operators.assemble import (
    assemble_spans,
    explode_spans,
    filter_spans,
    with_span_counts,
)

N_DOCS = 60  # includes mega-doc i=7


def test_salted_assembly_matches_oracle(spark):
    df = datagen.generate_df(spark, N_DOCS, partitions=6)
    exploded = filter_spans(explode_spans(df))
    # tiny threshold/buckets so salting engages on many docs, not just mega
    out = assemble_spans(exploded, salt_threshold=8, salt_buckets=4)
    got = {r["doc_id"]: r["spans"] for r in out.collect()}
    for i in range(N_DOCS):
        did = datagen.doc_id_of(i)
        want = oracle.extract_doc(datagen.gen_doc(i)[1])
        if not want:  # groupBy drops docs with zero kept spans
            assert did not in got or got[did] == []
            continue
        seq = [(s["kind"], s["text"], s["media_ref"]) for s in got[did]]
        assert seq == want, f"salted assembly mismatch for {did}"


def test_mega_doc_salting_engaged(spark):
    df = datagen.generate_df(spark, 8, partitions=2)
    exploded = explode_spans(df)
    mega = exploded.filter(exploded.doc_id == datagen.doc_id_of(7))
    n = mega.count()
    assert n >= 2000
    out = assemble_spans(filter_spans(exploded))  # default threshold 512
    row = out.filter(out.doc_id == datagen.doc_id_of(7)).collect()[0]
    want = oracle.extract_doc(datagen.gen_doc(7)[1])
    assert [(s["kind"], s["text"], s["media_ref"]) for s in row["spans"]] == want


def test_with_span_counts(spark):
    df = datagen.generate_df(spark, 10, partitions=2)
    bare = explode_spans(df).drop("n_spans")
    counted = with_span_counts(bare)
    sizes = {
        r["doc_id"]: r["n_spans"]
        for r in counted.select("doc_id", "n_spans").distinct().collect()
    }
    for i in range(10):
        assert sizes[datagen.doc_id_of(i)] == len(datagen.gen_doc(i)[1])
