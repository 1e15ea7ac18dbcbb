"""Round-5 late-extras soak: the operators added after the main
round-5 soak (perplexity_buckets, dsir_select, gopher_quality,
bpe_merges, then bigram_surprisal, bpe_encode, quality_classifier),
at 5x the gate corpus (25k docs built from sf0.1 documents
x5 with distinct ids), with inline PLANTED invariants — a failed
invariant fails the soak (same discipline as tools/soak_r4.py).

Planted structure on top of the 25k base docs:
  - 50 target-vocabulary docs + 50 junk-vocabulary docs for DSIR: every
    junk doc must score below every planted target-like raw doc, and no
    junk doc may be selected while all target-like raw docs are;
  - 40 Gopher-violating docs (10 each: too-short, symbol-heavy,
    bullet-walled, stopword-free): every one must be dropped by
    gopher_keep, and a 60-word clean control must be kept;
  - 30 gibberish ultra-rare-token docs for perplexity_buckets: each
    must land in its source's 'tail' bucket (its mean surprisal is the
    corpus maximum by construction);
  - one dominant adjacent pair ("soakleft soakright") stamped 3x into
    2000 docs for BPE: merge rank 1 must be exactly that pair with
    count 6000.

Usage: python tools/soak_extras_r5.py
  → writes BENCH/SOAK_EXTRAS_r05.md + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from bb_ocr_spark.cache import release_persisted  # noqa: E402
from bb_ocr_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TARGET_TEXT = "the quick history of science and art in the old world " * 4
JUNK_TEXT = "zzz spam buy now click here limited offer "
GOPHER_CLEAN = (
    "the story begins and we have more of the plain prose that reads "
    "well with the usual words and the count of words passes fifty "
    "because the text continues to be of the same kind with more to "
    "say about that until the end of this paragraph which now comes"
)
PAIR = "soakleft soakright"


def _qc_weight(gram: str) -> int:
    """python replica of hashed_weights(bucket(gram)) — md5 discipline."""
    import hashlib

    def bucket(s: str, mod: int, salt: str) -> int:
        h = hashlib.md5((salt + s).encode()).hexdigest()[:15]
        return int(h, 16) % mod

    return bucket(str(bucket(gram, 4096, "qc")), 2001, "qcw") - 1000


def _qc_tokens() -> tuple[str, str]:
    """Find one token whose unigram AND self-bigram weights are both
    strictly positive, and one where both are strictly negative — a doc
    of that token repeated then has a sign-determined score."""
    pos = neg = None
    i = 0
    while pos is None or neg is None:
        t = f"qcsoak{i}"
        wu, wb = _qc_weight(t), _qc_weight(f"{t} {t}")
        if pos is None and wu > 0 and wb > 0:
            pos = t
        if neg is None and wu < 0 and wb < 0:
            neg = t
        i += 1
    return pos, neg


def build_corpus(spark):
    base = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("doc_id", "text", "source")
    )
    copies = None
    for c in range(5):
        part = base.select(
            (F.col("doc_id") + F.lit(c * 1_000_000)).alias("doc_id"),
            # vary non-planted text across copies so dedup-trivial
            # structure doesn't collapse the corpus
            F.concat(F.col("text"), F.lit(f" copyvar{c}")).alias("text"),
            "source",
        )
        copies = part if copies is None else copies.unionByName(part)
    planted = []
    for i in range(50):
        planted.append((10_000_000 + i, TARGET_TEXT + f"tvar{i}", "src0"))
    for i in range(50):
        planted.append((11_000_000 + i, JUNK_TEXT * 6 + f"jvar{i}", "src5"))
    for i in range(10):
        planted.append((12_000_000 + i, "too short to pass", "src6"))
    for i in range(10):
        planted.append(
            (12_100_000 + i, GOPHER_CLEAN + " " + "# " * 40, "src6")
        )
    for i in range(10):
        planted.append(
            (12_200_000 + i, "\n".join(["- item " + GOPHER_CLEAN] * 12),
             "src6")
        )
    for i in range(10):
        planted.append(
            (12_300_000 + i, ("lorem ipsum dolor sit amet " * 14) + f"g{i}",
             "src6")
        )
    planted.append((12_400_000, GOPHER_CLEAN, "src6"))
    for i in range(30):
        planted.append(
            (13_000_000 + i,
             " ".join(f"ultrarareq{i}w{j}" for j in range(40)), f"src{i % 20}")
        )
    # quality_classifier plants: one all-positive-weight token doc set,
    # one all-negative — token chosen by searching the md5 weight table
    # in python (the same hash both engines replay)
    pos_tok, neg_tok = _qc_tokens()
    for i in range(20):
        planted.append((14_000_000 + i, (pos_tok + " ") * 30, "src7"))
    for i in range(20):
        planted.append((14_100_000 + i, (neg_tok + " ") * 30, "src7"))
    pl = spark.createDataFrame(
        planted, "doc_id long, text string, source string"
    )
    stamped = copies.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 12 == 0,
            F.concat(F.col("text"), F.lit((" " + PAIR) * 3)),
        ).otherwise(F.col("text")),
    )
    return stamped.unionByName(pl)


def main() -> int:
    spark = get_spark("soak_extras_r5", cores=16)
    t0 = time.time()
    corpus = build_corpus(spark).localCheckpoint(eager=True)
    n_docs = corpus.count()
    n_stamped = corpus.filter(F.col("text").contains(PAIR)).count()
    results: dict[str, object] = {"n_docs": n_docs, "n_stamped": n_stamped}
    failures: list[str] = []

    # --- DSIR ------------------------------------------------------------
    from bb_ocr_spark.operators.selection import dsir_select

    t = time.time()
    sel = dsir_select(
        corpus, F.col("source").isin("src0", "src1", "src2", "src3"),
        sample_mod=4,
    )
    rows = {
        r["doc_id"]: r
        for r in sel.filter(
            (F.col("doc_id") >= 11_000_000) & (F.col("doc_id") < 11_000_050)
        ).collect()
    }
    junk_w = [r["dsir_logw_micro"] for r in rows.values()]
    junk_sel = [r["selected"] for r in rows.values()]
    n_sel, n_raw = sel.agg(
        F.sum(F.col("selected").cast("long")), F.count("*")
    ).first()
    release_persisted()
    results["dsir"] = {
        "sec": round(time.time() - t, 2),
        "n_raw": n_raw,
        "n_selected": int(n_sel),
        "junk_w_max": max(junk_w),
    }
    if len(rows) != 50:
        failures.append("dsir: planted junk docs missing from raw output")
    if any(w >= 0 for w in junk_w):
        failures.append("dsir: junk doc scored >= 0")
    if any(junk_sel):
        failures.append("dsir: junk doc selected")

    # --- Gopher ----------------------------------------------------------
    from bb_ocr_spark.functions.text import gopher_quality_cols, tokens_col

    t = time.time()
    gq = corpus.select(
        "doc_id", "text", tokens_col(F.col("text")).alias("_tk")
    ).select("doc_id", *gopher_quality_cols(F.col("text"), F.col("_tk")))
    bad = (
        gq.filter(
            (F.col("doc_id") >= 12_000_000) & (F.col("doc_id") < 12_400_000)
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("gopher_keep").cast("long")).alias("kept"),
        )
        .first()
    )
    clean_keep = (
        gq.filter(F.col("doc_id") == 12_400_000).select("gopher_keep").first()
    )
    n_keep = gq.agg(F.sum(F.col("gopher_keep").cast("long"))).first()[0]
    results["gopher"] = {
        "sec": round(time.time() - t, 2),
        "n_planted_bad": bad["n"],
        "planted_bad_kept": int(bad["kept"]),
        "corpus_kept": int(n_keep),
    }
    if bad["n"] != 40:
        failures.append("gopher: planted bad docs missing")
    if bad["kept"] != 0:
        failures.append("gopher: a planted rule-violating doc was kept")
    if not clean_keep["gopher_keep"]:
        failures.append("gopher: clean control doc was dropped")

    # --- perplexity buckets ---------------------------------------------
    from bb_ocr_spark.operators.search import perplexity_buckets

    t = time.time()
    pb = perplexity_buckets(corpus, sample_mod=4)
    gib = pb.filter(
        (F.col("doc_id") >= 13_000_000) & (F.col("doc_id") < 13_000_030)
    ).collect()
    release_persisted()
    results["perplexity"] = {
        "sec": round(time.time() - t, 2),
        "n_gibberish": len(gib),
        "buckets": sorted({r["ppl_bucket"] for r in gib}),
    }
    if len(gib) != 30:
        failures.append("ppl: planted gibberish docs missing")
    if any(r["ppl_bucket"] != "tail" for r in gib):
        failures.append("ppl: a max-surprisal gibberish doc left the tail")

    # --- BPE -------------------------------------------------------------
    from bb_ocr_spark.operators.bpe import learn_bpe_merges

    t = time.time()
    merges = learn_bpe_merges(corpus, num_merges=3).collect()
    results["bpe"] = {
        "sec": round(time.time() - t, 2),
        "merges": [tuple(r) for r in merges],
    }
    top = merges[0]
    if (top["left_sym"], top["right_sym"]) != tuple(PAIR.split()):
        failures.append("bpe: rank-1 merge is not the planted pair")
    elif top["pair_count"] != 3 * n_stamped:
        failures.append(
            f"bpe: planted pair count {top['pair_count']} != {3 * n_stamped}"
        )

    # --- bigram surprisal ------------------------------------------------
    from bb_ocr_spark.operators.search import (
        bigram_surprisal,
        unigram_surprisal,
    )

    t = time.time()
    uni = unigram_surprisal(corpus).select(
        "doc_id",
        F.col("n_tokens").alias("n_u"),
        F.col("surprisal_micronats").alias("s_u"),
    )
    bi = bigram_surprisal(corpus).select(
        "doc_id",
        F.col("n_tokens").alias("n_b"),
        F.col("surprisal_micronats").alias("s_b"),
        F.col("mean_surprisal_nats").alias("mean_b"),
    )
    joined = uni.join(bi, "doc_id")
    # exact per-doc bound: the mixture term is >= (1-lam) * unigram prob,
    # so each non-first token's surprisal <= unigram + ln(4); allow 1
    # micro-nat rounding slack per token
    import math

    ln4 = round(math.log(4) * 1e6)
    agg = joined.agg(
        F.count("*").alias("n"),
        F.sum((F.col("n_u") != F.col("n_b")).cast("long")).alias("n_mismatch"),
        F.sum(
            (
                F.col("s_b")
                > F.col("s_u")
                + F.greatest(F.col("n_b") - 1, F.lit(0)) * F.lit(ln4)
                + F.col("n_b")
            ).cast("long")
        ).alias("n_bound_viol"),
    ).first()
    gib_means = {
        r["doc_id"]: (r["s_u"] / max(r["n_u"], 1) / 1e6,
                      r["s_b"] / max(r["n_b"], 1) / 1e6)
        for r in joined.filter(
            (F.col("doc_id") >= 13_000_000) & (F.col("doc_id") < 13_000_030)
        ).collect()
    }
    release_persisted()
    results["bigram"] = {
        "sec": round(time.time() - t, 2),
        "n_docs": agg["n"],
        "n_token_count_mismatch": int(agg["n_mismatch"]),
        "n_bound_violations": int(agg["n_bound_viol"]),
    }
    if agg["n_mismatch"]:
        failures.append("bigram: token counts differ from unigram pass")
    if agg["n_bound_viol"]:
        failures.append("bigram: per-doc interpolation bound violated")
    # gibberish docs: every transition is memorized (bigram count 1 of
    # prev count 1), so the bigram mean must collapse far below the
    # unigram mean on every one
    if len(gib_means) != 30:
        failures.append("bigram: planted gibberish docs missing")
    if any(mb >= mu / 2 for (mu, mb) in gib_means.values()):
        failures.append(
            "bigram: memorized-transition doc did not collapse vs unigram"
        )

    # --- BPE encode ------------------------------------------------------
    from bb_ocr_spark.operators.bpe import bpe_encode

    t = time.time()
    m1 = spark.createDataFrame(
        [(1, PAIR.split()[0], PAIR.split()[1], 0)],
        "merge_rank int, left_sym string, right_sym string, pair_count long",
    )
    enc = bpe_encode(corpus, m1)
    merged_sym = PAIR.replace(" ", "")
    chk = (
        enc.join(corpus.select("doc_id", "text"), "doc_id")
        .select(
            "doc_id",
            "n_symbols",
            F.size(
                F.filter(F.col("symbols"), lambda s: s == F.lit(merged_sym))
            ).alias("n_merged"),
            (
                F.replace(F.array_join("symbols", ""), F.lit(" "), F.lit(""))
                == F.replace(
                    F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "),
                    F.lit(" "),
                    F.lit(""),
                )
            ).alias("chars_ok"),
            # stamping applied to the x5 base copies only (ids < 10M);
            # planted ids can also be %12==0 but carry no stamp
            (
                (F.col("doc_id") % 12 == 0)
                & (F.col("doc_id") < 10_000_000)
            ).alias("stamped"),
        )
    )
    bagg = chk.agg(
        F.sum((~F.col("chars_ok")).cast("long")).alias("n_chars_bad"),
        # greedy left-to-right on ' P P P ': occurrences 1 and 3 merge,
        # the middle one is consumed-adjacent and survives
        F.sum(
            (F.col("stamped") & (F.col("n_merged") != 2)).cast("long")
        ).alias("n_stamp_bad"),
        F.sum(
            ((~F.col("stamped")) & (F.col("n_merged") != 0)).cast("long")
        ).alias("n_unstamp_bad"),
    ).first()
    results["bpe_encode"] = {
        "sec": round(time.time() - t, 2),
        "n_chars_bad": int(bagg["n_chars_bad"]),
        "n_stamp_bad": int(bagg["n_stamp_bad"]),
        "n_unstamp_bad": int(bagg["n_unstamp_bad"]),
    }
    if bagg["n_chars_bad"]:
        failures.append("bpe_encode: character mass not conserved")
    if bagg["n_stamp_bad"]:
        failures.append(
            "bpe_encode: stamped doc does not show the 2-of-3 greedy merge"
        )
    if bagg["n_unstamp_bad"]:
        failures.append("bpe_encode: merged symbol appeared unstamped")

    # --- quality classifier ---------------------------------------------
    from bb_ocr_spark.operators.selection import (
        hashed_weights,
        quality_classifier,
    )

    t = time.time()
    pos_tok, neg_tok = _qc_tokens()
    qc = quality_classifier(corpus, hashed_weights(spark), threshold_micro=0)
    qrows = {
        r["doc_id"]: r
        for r in qc.filter(
            (F.col("doc_id") >= 14_000_000) & (F.col("doc_id") < 14_100_020)
        ).collect()
    }
    # expected exact scores: 30 unigrams + 29 self-bigrams
    exp_pos = 30 * _qc_weight(pos_tok) + 29 * _qc_weight(f"{pos_tok} {pos_tok}")
    exp_neg = 30 * _qc_weight(neg_tok) + 29 * _qc_weight(f"{neg_tok} {neg_tok}")
    pos_rows = [r for d, r in qrows.items() if d < 14_000_020]
    neg_rows = [r for d, r in qrows.items() if d >= 14_100_000]
    results["quality_classifier"] = {
        "sec": round(time.time() - t, 2),
        "n_planted": len(qrows),
        "exp_pos": exp_pos,
        "exp_neg": exp_neg,
    }
    if len(qrows) != 40:
        failures.append("qc: planted docs missing")
    elif (
        any(not r["qc_keep"] or r["score_sum_micro"] != exp_pos
            for r in pos_rows)
        or any(r["qc_keep"] or r["score_sum_micro"] != exp_neg
               for r in neg_rows)
    ):
        failures.append("qc: planted sign/score invariant violated")

    wall = round(time.time() - t0, 1)
    ok = not failures
    md = [
        "# SOAK_EXTRAS_r05 — late-round extras at 5x with planted invariants",
        "",
        f"Corpus: {n_docs} docs (sf0.1 documents x5, ids offset, copy-variant "
        f"suffixes) + planted rows; {n_stamped} docs stamped with the BPE "
        "pair 3x each.",
        "",
        f"Total wall {wall}s on local[16]. Invariants "
        + ("**ALL HELD**." if ok else "**FAILED**: " + "; ".join(failures)),
        "",
        "```json",
        json.dumps(results, indent=2, default=str),
        "```",
        "",
        "Invariants checked:",
        "- DSIR: all 50 junk-vocab docs score < 0 and are unselected "
        "(target-distribution discrimination survives the 5x corpus);",
        "- Gopher: 40 planted rule-violating docs all dropped, clean "
        "control kept;",
        "- perplexity_buckets: 30 max-surprisal gibberish docs all land "
        "in their source's tail tercile;",
        "- BPE: rank-1 merge is the planted pair at its exact planted "
        "count (3 per stamped doc).",
        "- bigram_surprisal: token counts equal the unigram pass on every "
        "doc; the exact interpolation bound s_b <= s_u + (n-1)ln4 + slack "
        "holds corpus-wide; all 30 memorized-transition gibberish docs "
        "collapse to < half their unigram mean;",
        "- bpe_encode: character mass conserved on every doc; greedy "
        "left-to-right semantics produce exactly 2 merged symbols of the "
        "3 stamped pairs, zero on unstamped docs;",
        "- quality_classifier: 40 planted single-token docs score their "
        "hand-computed exact integer sums with sign-determined keep.",
    ]
    with open(os.path.join(REPO, "BENCH", "SOAK_EXTRAS_r05.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps({"ok": ok, "wall_s": wall, "failures": failures}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
