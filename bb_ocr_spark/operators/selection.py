"""Data selection via importance resampling (DSIR, Xie et al. 2023,
arXiv:2302.03169): score every RAW document by how target-like its
hashed bag-of-n-grams is, then keep the top fraction.

The reference pipeline curates its input set by hand-picked heuristics
(hueristics/book_extractor.py keyword scoring); a 100 TB pretraining
pipeline instead selects crawl data toward a curated target corpus
(Wikipedia/books) with exactly this estimator:

  1. features: unigrams + bigrams hashed into B buckets,
  2. two bucket distributions: p_target (target docs), p_raw (the rest),
     each Laplace-smoothed ((c_b + 1) / (N + B)),
  3. per raw doc, the log importance weight
     log w(x) = sum_b c_b(x) * (ln p_target[b] - ln p_raw[b]),
  4. keep the highest-weight fraction.

Scale shape (the part that must survive 10^12 docs):
  - gram STRINGS never shuffle: each occurrence is hashed to its md5
    bucket in the map stage, so the wire carries (id, bucket:int) rows;
  - the distribution fit is one map-side-combined groupBy over B buckets
    (B ~ 10^4 rows total, independent of corpus size), and the
    lambda = ln-ratio table broadcasts to the scoring join;
  - per-doc weights are integer micro-nat sums (order-independent,
    engine-exact) keyed on id — the only data-sized shuffle;
  - the keep threshold is fit on a deterministic md5-hash SAMPLE and
    applied by comparison (the CCNet practice perplexity_buckets also
    follows) — the corpus is never globally sorted and no count is
    collected to the driver. The sample ranking runs in one task of
    ~n/sample_mod rows; tighten sample_mod as the corpus grows.

Determinism at any parallelism / in any engine: buckets come from the
md5 family of functions.sampling (oracle-replayable SQL), ln-ratios are
rounded to integer micro-nats per bucket BEFORE summation, ranks
tie-break on id, and labeling is pure comparison against the fitted
threshold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..cache import track_persist
from ..functions.sampling import hash_bucket_col
from ..functions.text import tokens_col


def _gram_buckets(tk: Column, buckets: int, salt: str) -> Column:
    """Unigram + bigram bag of a token array, each gram folded to its
    md5 bucket — the hashed n-gram featurization of DSIR §3. Built by
    slicing (the repo's shingle idiom), so no per-row Python and no
    descending-sequence edge at len 1."""
    bigrams = F.when(
        F.size(tk) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 1),
            lambda i: F.array_join(F.slice(tk, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.transform(
        F.concat(tk, bigrams),
        lambda g: hash_bucket_col(g, buckets, salt),
    )


def dsir_select(
    docs: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    keep_ratio: tuple[int, int] = (1, 4),
    sample_mod: int = 2,
    salt: str = "dsir",
) -> DataFrame:
    """Score and select RAW docs (is_target == false) by DSIR importance
    weight toward the target distribution (is_target == true).

    keep_ratio = (num, den) keeps ~num/den of raw docs: the threshold is
    the ceil(n*num/den)-th sampled weight under (weight DESC, id ASC),
    and a doc is selected iff weight >= threshold — ties at the cutoff
    are kept (comparison labeling, like perplexity_buckets' terciles).
    If the hash sample is empty (tiny corpus + coarse sample_mod) every
    doc is kept — explicit and deterministic; lower sample_mod instead.

    Returns one row per raw doc:
      (id_col, n_grams:long, dsir_logw_micro:long, selected:boolean)
    where dsir_logw_micro is the exact integer sum of per-bucket
    micro-nat log-ratios over the doc's gram occurrences."""
    num, den = keep_ratio
    base = track_persist(
        docs.select(
            F.col(id_col).alias("id"),
            is_target.alias("_tgt"),
            tokens_col(F.col(text_col)).alias("_tk"),
        )
    )
    # persisted: BOTH the distribution fit and the scoring join read occ,
    # and the per-gram md5 is the dominant map cost — hash once, not twice
    occ = track_persist(
        base.select(
            "id",
            "_tgt",
            F.explode_outer(_gram_buckets(F.col("_tk"), buckets, salt)).alias(
                "b"
            ),
        )
        .filter(F.col("b").isNotNull())
    )
    counts = occ.groupBy("b").agg(
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).cast("long").alias("ct"),
        F.sum(F.when(~F.col("_tgt"), 1).otherwise(0)).cast("long").alias("cr"),
    )
    tot = counts.agg(
        F.sum("ct").cast("long").alias("nt"),
        F.sum("cr").cast("long").alias("nr"),
    )
    lam = counts.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            (
                F.log((F.col("ct") + 1) / (F.col("nt") + F.lit(buckets)))
                - F.log((F.col("cr") + 1) / (F.col("nr") + F.lit(buckets)))
            )
            * 1_000_000
        )
        .cast("long")
        .alias("lam"),
    )
    docw = (
        occ.filter(~F.col("_tgt"))
        .join(F.broadcast(lam), "b")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum("lam").cast("long").alias("w"),
        )
    )
    scored = track_persist(
        base.filter(~F.col("_tgt"))
        .select("id")
        .join(docw, "id", "left")
        .select(
            "id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("w", F.lit(0)).cast("long").alias("w"),
        )
    )
    # threshold fit on the deterministic hash sample; one bounded task
    sample = scored.filter(
        hash_bucket_col(F.col("id"), sample_mod, salt + "sel") == 0
    )
    wr = Window.orderBy(F.desc("w"), F.asc("id"))
    ranked = sample.select(
        "w",
        F.row_number().over(wr).alias("_rn"),
        F.count("*").over(
            Window.partitionBy()
        ).alias("_n"),
    )
    thr = ranked.filter(
        F.col("_rn")
        == F.floor((F.col("_n") * num + den - 1) / den).cast("int")
    ).agg(F.min("w").alias("_t"))
    return scored.crossJoin(F.broadcast(thr)).select(
        F.col("id").alias(id_col),
        "n_grams",
        F.col("w").alias("dsir_logw_micro"),
        F.when(F.col("_t").isNull(), F.lit(True))
        .otherwise(F.col("w") >= F.col("_t"))
        .alias("selected"),
    )


def quality_classifier(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    salt: str = "qc",
    bias_micro: int = 0,
    threshold_micro: int = 0,
) -> DataFrame:
    """fastText-style linear text-quality classifier (Joulin et al.
    2016, arXiv:1607.01759) — the learned quality-filter stage of
    GPT-3/CCNet-style curation, which scores each document with a
    mean-pooled linear model over hashed word n-gram features and keeps
    docs above a threshold. `weights` is the trained MODEL artifact:
    (bucket:int, weight_micro:long), one row per hash bucket, weights
    in integer MICRO-logits (how a fastText .bin's readout row would be
    quantized for engine-exact replay).

    Features are the DSIR featurization (_gram_buckets: unigrams +
    bigrams folded to md5 buckets), so the classifier and the
    importance sampler share one feature space — as real pipelines do.

    Per doc: sum_micro = bias + sum of weight_micro over feature
    OCCURRENCES (bag semantics, repeats count); the keep decision is
    the pure-integer comparison
        sum_micro >= threshold_micro * n_features
    i.e. mean-pooled score >= threshold without ever dividing — exact
    in any engine at any parallelism. The round-6 double mean is also
    emitted for ranking/inspection. Featureless docs score 0 and are
    dropped (keep = false).

    Returns (id_col, n_features, score_sum_micro, mean_score, qc_keep).

    Scale shape: gram strings never shuffle (hashed to int buckets in
    the map stage); the weight table is B rows — broadcast into the
    scoring join; the only data-sized shuffle is the map-side-combined
    per-doc sum keyed on id. Exactly the DSIR wire discipline."""
    base = docs.select(
        F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("t")
    )
    occ = base.select(
        "id", F.explode(_gram_buckets(F.col("t"), buckets, salt)).alias("b")
    )
    # LEFT join + 0-coalesce: a sparse weight table (real models prune
    # near-zero rows) means "weight 0", not "feature doesn't exist" —
    # n_features must count every gram occurrence either way, or the
    # mean-pool denominator would depend on model pruning
    per_doc = (
        occ.join(F.broadcast(weights), occ.b == weights.bucket, "left")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_features"),
            F.sum(F.coalesce("weight_micro", F.lit(0)))
            .cast("long")
            .alias("_s"),
        )
    )
    from ..functions.perdoc import finalize_per_doc_micro  # noqa: PLC0415

    out = finalize_per_doc_micro(
        docs, per_doc, id_col,
        count_col="n_features",
        sum_col="score_sum_micro",
        mean_col="mean_score",
        # the bias funds even featureless docs' score (the fastText
        # readout's intercept), hence the explicit sum expression
        sum_expr=(F.coalesce("_s", F.lit(0)) + F.lit(int(bias_micro))),
    )
    return out.withColumn(
        "qc_keep",
        (F.col("n_features") > 0)
        & (
            F.col("score_sum_micro")
            >= F.lit(int(threshold_micro)) * F.col("n_features")
        ),
    )


def hashed_weights(
    spark,
    buckets: int = 4096,
    salt: str = "qcw",
    span: int = 2001,
) -> DataFrame:
    """Deterministic stand-in weight table for quality_classifier:
    weight_micro(b) = md5-bucket("salt||b", span) - span//2, i.e.
    pseudo-random integers in [-span//2, span//2] micro-logits. A real
    deployment loads trained readout weights instead; this generator
    exists so tests and the oracle gate exercise the full scoring
    dataflow with an engine-replayable model."""
    return spark.range(buckets).select(
        F.col("id").cast("int").alias("bucket"),
        (
            hash_bucket_col(F.col("id"), span, salt) - F.lit(span // 2)
        ).cast("long").alias("weight_micro"),
    )
