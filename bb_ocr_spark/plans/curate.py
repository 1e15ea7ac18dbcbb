"""Corpus curation: the 100 TB pretraining-preparation job as one plan.

    documents ──scrub────▶ PII masked (emails/ips/phones/ids → tokens)
              ──quality──▶ keep/drop (Gopher/C4-style signals incl.
                           duplicate-line repetition caps)
              ──classify─▶ optional learned filter (fastText-style
                           hashed-linear model, broadcast weights)
              ──decontam─▶ drop docs sharing n-grams with an eval set
                           (optional; anti-join on hashed shingles)
              ──dedup────▶ exact-dup winners (md5 fingerprint groupBy)
              ──neardedup▶ optional MinHash near-dup clusters collapsed
                           to their min-id representative (pairs →
                           transitive closure → keep cluster winners)
              ──paradedup▶ cross-corpus paragraph dedup (rebuilt texts)
              ──substr───▶ optional substring-level pass (repeated
                           ≥k-token runs removed everywhere but their
                           globally-first occurrence — boilerplate
                           EMBEDDED in otherwise-unique docs)
              ──split────▶ deterministic train/val/test (md5 buckets)
              ──pack─────▶ token-budget shards (distributed prefix sum)

Every stage is an operator verified on its own (oracle rows and/or
goldens); this plan is the composition a real curation run executes, with
a stats row per stage so attrition is observable (the silent-truncation
rule: anything dropped is counted, never implied).

Shuffle profile: scrub + quality are narrow; decontamination shuffles
(doc_id, 8-byte shingle hash) pairs against a broadcastable eval shingle
set; exact dedup shuffles md5 keys; paragraph dedup shuffles paragraph
hashes + doc ids; split is narrow; packing shuffles bucket subtotals
(tiny) + one parallel window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.sampling import split_col
from ..functions.scrub import pii_scrub_col, repetition_cols
from ..functions.text import quality_cols, token_count_col
from ..operators.dedup import exact_dedup, paragraph_dedup
from ..operators.packing import assign_shards


def run_curation(
    documents: DataFrame,
    shard_budget_tokens: int = 100_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_df: DataFrame | None = None,
    max_dup_line_frac: float = 0.5,
    near_dup_threshold: float | None = None,
    substring_k: int | None = None,
    classifier_weights: DataFrame | None = None,
    classifier_threshold_micro: int = 0,
    classifier_buckets: int = 4096,
    classifier_salt: str = "qc",
) -> dict[str, DataFrame]:
    """documents(id, text, …) → curated corpus + per-stage tables.

    Returns {quality, kept, dedup_winners, deduped, curated, shards,
    stats}; `curated` carries (id, text_dedup, n_tokens, split, shard_id).
    Pass eval_df (same id/text columns) to decontaminate against it;
    pass classifier_weights ((bucket, weight_micro) model rows) to add
    the learned fastText-style filter after the heuristic rules.
    """
    scrubbed = documents.select(
        F.col(id_col).alias("id"),
        pii_scrub_col(F.col(text_col)).alias("text"),
    )
    q = scrubbed.select(
        "id", "text", *quality_cols(F.col("text")), *repetition_cols(F.col("text"))
    )
    kept = q.filter(
        F.col("quality_keep") & (F.col("dup_line_frac") <= max_dup_line_frac)
    ).select("id", "text")

    # optional LEARNED quality filter after the heuristic one (the
    # GPT-3/CCNet two-tier practice: cheap rules first, then the
    # fastText-style model on the survivors — the model scores fewer
    # docs and the broadcast weight table is the only extra state)
    qc = None
    if classifier_weights is not None:
        from ..cache import track_persist  # noqa: PLC0415
        from ..operators.selection import quality_classifier  # noqa: PLC0415

        # persisted: the scoring DAG feeds BOTH the keep semi-join and
        # the stats aggregate — without this the most expensive stage
        # (tokenize + gram explode + score) runs twice
        qc = track_persist(
            quality_classifier(
                kept,
                classifier_weights,
                id_col="id",
                text_col="text",
                buckets=classifier_buckets,
                salt=classifier_salt,
                threshold_micro=classifier_threshold_micro,
            )
        )
        kept = kept.join(
            qc.filter(F.col("qc_keep")).select("id"), "id", "left_semi"
        )

    flagged = None
    if eval_df is not None:
        from ..operators.decontaminate import contaminated_docs  # noqa: PLC0415

        flagged = contaminated_docs(
            kept,
            eval_df.select(
                F.col(id_col).alias("id"), F.col(text_col).alias("text")
            ),
            id_col="id",
            text_col="text",
        )
        kept = kept.join(flagged.select("id"), "id", "left_anti")

    # exact dedup: min-id winner per normalized-text fingerprint
    winners = exact_dedup(kept, id_col="id", text_col="text").select(
        F.col("id"), F.col("dup_count")
    )
    uniq = kept.join(winners.select("id"), "id")

    # optional near-dup pass: MinHash-verified pairs → transitive closure →
    # only each cluster's min-id representative survives (losers are docs
    # whose cluster_id differs from their own id)
    near_dup_losers = None
    if near_dup_threshold is not None:
        from ..operators.dedup import (  # noqa: PLC0415
            dedup_clusters,
            minhash_lsh_verified_pairs,
        )

        near_pairs = minhash_lsh_verified_pairs(
            uniq, threshold=near_dup_threshold, id_col="id", text_col="text"
        ).select("id_a", "id_b")
        clusters = dedup_clusters(near_pairs)
        near_dup_losers = clusters.filter(
            F.col("id") != F.col("cluster_id")
        ).select("id")
        uniq = uniq.join(near_dup_losers, "id", "left_anti")

    # cross-corpus paragraph dedup over the surviving docs
    para = paragraph_dedup(uniq, id_col="id", text_col="text")
    rebuilt = para.filter(F.col("n_kept") > 0).select("id", "text_dedup")

    # optional substring-level pass (Lee et al. granularity): paragraph
    # dedup only removes WHOLE repeated paragraphs; this excises repeated
    # >=k-token runs embedded inside otherwise-unique paragraphs
    sub = None
    if substring_k is not None:
        from ..operators.dedup import substring_dedup  # noqa: PLC0415

        sub = substring_dedup(
            rebuilt, k=substring_k, id_col="id", text_col="text_dedup"
        )
        rebuilt = sub.filter(F.col("n_tokens") > F.col("n_dup_tokens")).select(
            "id", "text_dedup"
        )

    curated = rebuilt.select(
        "id",
        "text_dedup",
        token_count_col(F.col("text_dedup")).cast("bigint").alias("n_tokens"),
        split_col(F.col("id")).alias("split"),
    )
    shards = assign_shards(
        curated.filter(F.col("split") == "train"),
        budget=shard_budget_tokens,
        key_col="id",
        weight_col=F.col("n_tokens"),
    )
    curated = curated.join(
        shards.select("id", "shard_id"), "id", "left"
    )

    contam_stats = (
        flagged.groupBy().agg(F.count("*").alias("n_contaminated"))
        if flagged is not None
        else documents.sparkSession.range(1).select(
            F.lit(0).cast("long").alias("n_contaminated")
        )
    )
    near_stats = (
        near_dup_losers.groupBy().agg(F.count("*").alias("n_near_dup_dropped"))
        if near_dup_losers is not None
        else documents.sparkSession.range(1).select(
            F.lit(0).cast("long").alias("n_near_dup_dropped")
        )
    )
    stats = (
        documents.groupBy()
        .agg(F.count("*").alias("n_input"))
        .crossJoin(q.groupBy().agg(
            F.sum(F.col("quality_keep").cast("long")).alias("n_quality_kept"),
            F.sum(
                (F.col("dup_line_frac") > max_dup_line_frac).cast("long")
            ).alias("n_repetition_flagged")))
        .crossJoin(
            qc.groupBy().agg(
                F.coalesce(
                    F.sum((~F.col("qc_keep")).cast("long")), F.lit(0)
                ).alias("n_classifier_dropped")
            )
            if qc is not None
            else documents.sparkSession.range(1).select(
                F.lit(0).cast("long").alias("n_classifier_dropped")
            )
        )
        .crossJoin(contam_stats)
        .crossJoin(near_stats)
        .crossJoin(winners.groupBy().agg(
            F.count("*").alias("n_exact_unique"),
            F.sum(F.col("dup_count") - 1).alias("n_exact_dropped")))
        .crossJoin(para.groupBy().agg(
            F.sum("n_kept").alias("n_paragraphs_kept"),
            F.sum("n_dropped").alias("n_paragraphs_dropped")))
        .crossJoin(
            sub.groupBy().agg(
                F.sum("n_dup_tokens").alias("n_substring_tokens_dropped")
            )
            if sub is not None
            else documents.sparkSession.range(1).select(
                F.lit(0).cast("long").alias("n_substring_tokens_dropped")
            )
        )
    )
    return {
        "quality": q,
        "kept": kept,
        "dedup_winners": winners,
        "deduped": para,
        "substring": sub,  # None unless substring_k was set
        "curated": curated,
        "shards": shards,
        "stats": stats,
    }
