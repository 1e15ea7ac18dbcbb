"""PII scrubbing, repetition metrics, URL canonicalization, and train/eval
decontamination — python-reference exactness + semantics tests."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from bb_ocr_spark.functions.scrub import (
    PII_CHAIN,
    canonical_host_col,
    canonical_url_col,
    pii_count_cols,
    pii_scrub_col,
    repetition_cols,
)


def test_pii_scrub_matches_python(spark):
    rows = [
        ("1", "mail me at a.b+c@ex-ample.org or x@y.io thanks"),
        ("2", "server 10.0.255.7 and 192.168.1.1 up"),
        ("3", "call +1 555-123-4567 or 44 20 1234 567 today"),
        ("4", "card 4111111111111111 acct 12345678901234567"),
        ("5", "email bob@corp.com from 10.1.1.1 card 4000123412341234"),
        ("6", "clean text with no pii at all"),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    got = {
        r["id"]: r
        for r in df.select(
            "id",
            pii_scrub_col(F.col("text")).alias("scrubbed"),
            *pii_count_cols(F.col("text")),
        ).collect()
    }

    def py_chain(text):
        counts = {}
        for name, pat, repl in PII_CHAIN:
            counts[f"n_{name}"] = len(re.findall(pat, text))
            text = re.sub(pat, repl, text)
        return text, counts

    for id_, text in rows:
        want_text, want_counts = py_chain(text)
        assert got[id_]["scrubbed"] == want_text, id_
        for k, v in want_counts.items():
            assert got[id_][k] == v, (id_, k)
    assert "<EMAIL>" in got["1"]["scrubbed"]
    assert got["2"]["n_ips"] == 2
    assert got["4"]["n_ids"] == 2
    assert got["6"]["scrubbed"] == rows[5][1]


def test_repetition_metrics(spark):
    rows = [
        ("a", "one two\nthree four\none two\nfive"),  # 4 lines, 1 repeat
        ("b", "x\n\n  \nx\nx"),  # blanks dropped; 3 lines, 2 repeats
        ("c", "all\nunique\nlines"),
        ("d", ""),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    got = {
        r["id"]: r
        for r in df.select("id", *repetition_cols(F.col("text"))).collect()
    }
    assert got["a"]["n_lines"] == 4
    assert got["a"]["dup_line_frac"] == 0.25
    # chars: one two(7)*2 + three four(10) + five(4) = 28; dup chars 7
    assert got["a"]["dup_line_char_frac"] == 0.25
    assert got["b"]["n_lines"] == 3 and round(got["b"]["dup_line_frac"], 4) == 0.6667
    assert got["c"]["dup_line_frac"] == 0.0
    assert got["d"]["n_lines"] == 0 and got["d"]["dup_line_frac"] == 0.0


def test_url_canonicalization(spark):
    rows = [
        ("1", "https://WWW.Example.COM:8080/Path/a?utm_source=x&q=1#frag"),
        ("2", "http://user@sub.example.com/p/"),
        ("3", "example.com/x"),
        ("4", "HTTPS://example.com"),
        ("5", "   "),
    ]
    df = spark.createDataFrame(rows, "id string, url string")
    got = {
        r["id"]: (r["host"], r["canon"])
        for r in df.select(
            "id",
            canonical_host_col(F.col("url")).alias("host"),
            canonical_url_col(F.col("url")).alias("canon"),
        ).collect()
    }
    assert got["1"][0] == "example.com"
    assert got["2"][0] == "sub.example.com"
    assert got["3"][0] == "example.com"
    assert got["4"][0] == "example.com"
    assert got["5"][0] is None
    # canonical url: tracking params + fragment gone, trailing slash gone,
    # scheme+host lowered, path case preserved
    assert got["1"][1] == "https://www.example.com:8080/Path/a?q=1"
    assert got["2"][1] == "http://user@sub.example.com/p"


def test_decontamination(spark):
    from bb_ocr_spark.operators.decontaminate import (
        contaminated_docs,
        decontaminate,
    )

    eval_rows = [("e1", "the quick brown fox jumps")]
    train_rows = [
        ("t1", "something about the quick brown fox appearing here"),  # 3-gram hit
        ("t2", "quick brown cats sleep all day"),  # no shared 3-gram
        ("t3", "the quick brown fox jumps exactly"),  # multiple hits
        ("t4", "unrelated text entirely different words"),
    ]
    train = spark.createDataFrame(train_rows, "doc_id string, text string")
    ev = spark.createDataFrame(eval_rows, "doc_id string, text string")

    flagged = {
        r["doc_id"]: r["n_shared"]
        for r in contaminated_docs(train, ev, n=3).collect()
    }
    assert set(flagged) == {"t1", "t3"}
    # t1 shares 2 trigrams ("the quick brown", "quick brown fox");
    # t3 shares all 3 of the eval doc's trigrams
    assert flagged["t1"] == 2 and flagged["t3"] == 3

    clean = {r["doc_id"] for r in decontaminate(train, ev, n=3).collect()}
    assert clean == {"t2", "t4"}

    # min_hits raises the bar
    strict = {
        r["doc_id"]
        for r in contaminated_docs(train, ev, n=3, min_hits=3).collect()
    }
    assert strict == {"t3"}


def test_dedup_clusters_transitive_closure(spark):
    from bb_ocr_spark.operators.dedup import dedup_clusters

    # chain 1-2-3 (A~C never emitted), pair (10,11), and a 6-node path
    # 20-21-...-25 that needs several propagation rounds
    pairs = [(1, 2), (2, 3), (10, 11)] + [(i, i + 1) for i in range(20, 25)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["id"]: r["cluster_id"] for r in dedup_clusters(df).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10,
        **{i: 20 for i in range(20, 26)},
    }
    # determinism across input partitioning
    got2 = {
        r["id"]: r["cluster_id"]
        for r in dedup_clusters(df.repartition(7)).collect()
    }
    assert got2 == got


def test_mix_sources_stable_weights(spark):
    from bb_ocr_spark.functions.sampling import mix_sources

    rows = [(i, f"src{i % 4}") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    weights = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.0}
    kept = mix_sources(df, weights).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert len(by_src.get("src0", ())) == 1000  # weight 1.0 keeps all
    assert "src3" not in by_src  # weight 0 drops all
    # md5-bucket sampling is approximate per-source but deterministic
    assert abs(len(by_src["src1"]) / 1000 - 0.5) < 0.1
    assert abs(len(by_src["src2"]) / 1000 - 0.25) < 0.1

    # append-stability: the same keys keep identical decisions on a subset
    sub = mix_sources(df.filter(F.col("doc_id") < 2000), weights).collect()
    sub_ids = {(r["source"], r["doc_id"]) for r in sub}
    full_ids = {(r["source"], r["doc_id"]) for r in kept if r["doc_id"] < 2000}
    assert sub_ids == full_ids

    # default weight applies to unlisted sources
    d2 = mix_sources(df, {"src0": 1.0}, default=1.0).count()
    assert d2 == 4000


def test_dedup_clusters_long_path_pointer_jumping(spark):
    # a 60-node path has diameter 59 — naive min-propagation would need 59
    # rounds; pointer jumping must converge well inside max_iter=20
    from bb_ocr_spark.operators.dedup import dedup_clusters

    pairs = [(i, i + 1) for i in range(100, 159)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["id"]: r["cluster_id"] for r in dedup_clusters(df, max_iter=20).collect()}
    assert got == {i: 100 for i in range(100, 160)}


def test_embedding_dup_hot_buckets_reports_capped_clusters(spark):
    import math

    from bb_ocr_spark.operators.similarity import embedding_dup_hot_buckets

    dim = 8
    cluster_v = [1.0] * dim
    other_v = [math.sin(i + 1) for i in range(dim)]
    rows = [(i, cluster_v) for i in range(1000)]
    rows += [(2000, other_v), (2001, [x * 1.001 for x in other_v])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    hot = embedding_dup_hot_buckets(
        df, dim=dim, n_planes=6, bands=2, max_bucket=100
    ).collect()
    # the 1000-member cluster is reported once per band, with its members
    assert len(hot) == 2
    for r in hot:
        assert r["size"] == 1000
        assert r["member_ids"][:3] == [0, 1, 2] and len(r["member_ids"]) == 1000


def test_mix_sources_with_repeats_upsampling(spark):
    from bb_ocr_spark.functions.sampling import mix_sources_with_repeats

    rows = [(i, f"src{i % 2}") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mix_sources_with_repeats(df, {"src0": 2.5, "src1": 0.5}).collect()
    by_key = {}
    for r in out:
        by_key.setdefault((r["source"], r["doc_id"]), []).append(r["copy_idx"])
    # src0: every doc 2 or 3 copies, mean ~2.5; copy_idx is 1..n
    src0_counts = [len(v) for (s, _), v in by_key.items() if s == "src0"]
    assert set(src0_counts) <= {2, 3}
    assert abs(sum(src0_counts) / 1000 - 2.5) < 0.2
    for (s, _), v in by_key.items():
        assert sorted(v) == list(range(1, len(v) + 1))
    # src1: ~half the docs, single copy
    src1 = [v for (s, _), v in by_key.items() if s == "src1"]
    assert all(v == [1] for v in src1)
    assert abs(len(src1) / 1000 - 0.5) < 0.1
    # determinism
    out2 = mix_sources_with_repeats(df.repartition(9), {"src0": 2.5, "src1": 0.5}).collect()
    assert len(out2) == len(out)


def test_dedup_clusters_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir switches rounds to reliable checkpoint() (the
    cluster-correct mode — localCheckpoint blocks die with an executor);
    clusters must be identical to the local path and checkpoint files
    must actually land in the directory."""
    import os

    from bb_ocr_spark.operators.dedup import dedup_clusters

    pairs = [(1, 2), (2, 3), (10, 11)] + [(i, i + 1) for i in range(20, 25)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    local = {r["id"]: r["cluster_id"] for r in dedup_clusters(df).collect()}
    ckdir = str(tmp_path / "ck")
    reliable = {
        r["id"]: r["cluster_id"]
        for r in dedup_clusters(df, checkpoint_dir=ckdir).collect()
    }
    assert reliable == local
    assert any(files for _, _, files in os.walk(ckdir))


def test_semantic_contaminated_flags_paraphrase_analogs(spark):
    """A scaled copy of an eval embedding (cosine 1.0) is flagged; an
    orthogonal vector is not; the flags anti-join like the n-gram pass."""
    from pyspark.sql import functions as F

    from bb_ocr_spark.operators.decontaminate import semantic_contaminated

    ev = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    train = spark.createDataFrame(
        [
            (10, [2.0, 0.0, 0.0]),      # scaled copy of eval 1 -> cos 1.0
            (11, [0.0, 0.0, 5.0]),      # orthogonal -> no hit
            (12, [1.0, 1.0, 0.0]),      # cos 0.707107 to both evals
        ],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r
           for r in semantic_contaminated(train, ev, threshold=0.9).collect()}
    assert set(out) == {10}
    assert out[10]["n_eval_hits"] == 1
    assert out[10]["max_eval_cosine"] == 1.0

    low = {r["vec_id"]: r
           for r in semantic_contaminated(train, ev, threshold=0.7).collect()}
    assert set(low) == {10, 12} and low[12]["n_eval_hits"] == 2
    clean = train.join(
        semantic_contaminated(train, ev, threshold=0.9).select("vec_id"),
        "vec_id", "left_anti",
    )
    assert {r["vec_id"] for r in clean.collect()} == {11, 12}
