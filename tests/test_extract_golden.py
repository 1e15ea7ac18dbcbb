"""Golden span-sequence equality: Spark pipeline vs frozen Python oracle.

The BASELINE.json invariant — per-doc span-sequence equality on
(kind, text, media_ref, order) — checked exhaustively on a deterministic
synthetic corpus that includes the edge docs from FIXTURES.md §1
(zero-text, only-boilerplate, unicode, mega-doc skew tail, permuted spans).
"""

from __future__ import annotations

from bb_ocr_spark import datagen, oracle
from bb_ocr_spark.functions.metadata import extract_metadata_df
from bb_ocr_spark.operators.extract import extract_inline

N_DOCS = 300  # includes mega-doc i=7 (2000-8000 spans) and i%97 edge docs


def golden(i: int):
    _, spans = datagen.gen_doc(i)
    return oracle.extract_doc(spans)


def test_span_sequence_equality(spark):
    df = datagen.generate_df(spark, N_DOCS, partitions=8)
    out = {r["doc_id"]: r["spans"] for r in extract_inline(df).collect()}
    assert len(out) == N_DOCS
    for i in range(N_DOCS):
        did = datagen.doc_id_of(i)
        got = [(s["kind"], s["text"], s["media_ref"]) for s in out[did]]
        assert got == golden(i), f"span sequence mismatch for {did}"


def test_edge_docs_present():
    # the generator must actually produce the edge cases the suite relies on
    kinds_by_doc = {}
    for i in range(N_DOCS):
        _, spans = datagen.gen_doc(i)
        kinds_by_doc[i] = {s["kind"] for s in spans}
    assert kinds_by_doc[3 + 97 * 0] == {"media"}  # i%97==3 → only media
    assert kinds_by_doc[5] == {"boilerplate"}  # i%97==5 → only boilerplate
    _, mega = datagen.gen_doc(7)
    assert len(mega) >= 2000  # skew tail
    # permuted order: at least one doc whose spans are not offset-sorted
    assert any(
        [s["offset"] for s in datagen.gen_doc(i)[1]]
        != sorted(s["offset"] for s in datagen.gen_doc(i)[1])
        for i in range(20)
    )


def test_metadata_equality(spark):
    df = datagen.generate_df(spark, N_DOCS, partitions=8)
    got = {r["doc_id"]: r.asDict() for r in extract_metadata_df(df).collect()}
    for i in range(N_DOCS):
        did = datagen.doc_id_of(i)
        _, spans = datagen.gen_doc(i)
        want = oracle.extract_metadata(spans)
        row = got[did]
        for k, v in want.items():
            assert row[k] == v, f"{did}.{k}: spark={row[k]!r} oracle={v!r}"


def test_metadata_full_equality(spark):
    # full 16-field U9 schema over the real pipeline vs the frozen python
    # reference; the datagen corpus seeds author/binding/pages/edition/
    # language/series/condition patterns so every field class is hit
    from bb_ocr_spark.functions.metadata import extract_metadata_full_df

    df = datagen.generate_df(spark, N_DOCS, partitions=8)
    got = {r["doc_id"]: r.asDict() for r in extract_metadata_full_df(df).collect()}
    hit = {k: 0 for k in next(iter(got.values())) if k != "doc_id"}
    for i in range(N_DOCS):
        did = datagen.doc_id_of(i)
        _, spans = datagen.gen_doc(i)
        want = oracle.extract_metadata_full(spans)
        row = got[did]
        for k, v in want.items():
            assert row[k] == v, f"{did}.{k}: spark={row[k]!r} oracle={v!r}"
            if v not in (None, "", False):
                hit[k] += 1
    # field-class coverage: the corpus must exercise every extractor family
    for k in ("authors", "binding_type", "page_count", "edition", "language",
              "series", "condition_keywords", "categories", "year",
              "publisher", "isbn_13", "price_amount", "valid"):
        assert hit[k] > 0, f"corpus never exercises field {k}"
