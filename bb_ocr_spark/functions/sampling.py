"""Deterministic sampling / dataset-split utilities.

The standard way to split a 100 TB corpus into train/val/test is a hash
of a stable key — reproducible at any parallelism, stable under
re-partitioning and incremental appends (a doc's split never changes when
more data arrives), and requiring no global shuffle or state. The hash
family here is md5 (identical in Spark and ANSI SQL engines, so the split
is oracle-checkable), folded to a bucket in [0, buckets).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash_bucket_col(key: Column, buckets: int = 100, salt: str = "split") -> Column:
    """Deterministic bucket in [0, buckets): md5(salt || key) first 15 hex
    chars as a 60-bit int, mod buckets. The salt decorrelates independent
    splits/samples taken over the same key."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 15), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(buckets))


def split_col(
    key: Column,
    train_pct: int = 90,
    val_pct: int = 5,
    salt: str = "split",
) -> Column:
    """'train' | 'val' | 'test' assignment from the hash bucket."""
    b = hash_bucket_col(key, 100, salt)
    return (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def deterministic_sample_col(
    key: Column, fraction: float, salt: str = "sample", resolution: int = 1_000_000
) -> Column:
    """Boolean keep-flag for a deterministic fraction of rows by key —
    the scalable replacement for rand()-based sampling (stable across
    retries, resumable, join-consistent: the same key samples identically
    in every table that applies the same salt)."""
    # rounded cutoff, not truncated — see mix_keep_col's comment
    return hash_bucket_col(key, resolution, salt) < int(
        round(fraction * resolution)
    )


def hash_bucket_sql(key: str, buckets: int = 100, salt: str = "split") -> str:
    """DuckDB expression mirroring hash_bucket_col exactly (hex→int via
    positional digit weights — no hex cast in ANSI SQL)."""
    md5 = f"md5('{salt}' || CAST({key} AS VARCHAR))"
    digits = " + ".join(
        f"(strpos('0123456789abcdef', substr({md5}, {p + 1}, 1)) - 1) * "
        f"{16 ** (14 - p)}"
        for p in range(15)
    )
    return f"(({digits}) % {buckets})"


def mix_keep_col(
    key: Column,
    source: Column,
    weights: dict[str, float],
    default: float = 0.0,
    salt: str = "mix",
    resolution: int = 1_000_000,
) -> Column:
    """Boolean keep-flag implementing domain-weighted data mixing: each
    source is key-stably subsampled at its weight (1.0 = keep all,
    0.25 = keep a deterministic quarter). The pretraining 'data mixture'
    step — downweight crawl, keep curated sources whole — as one narrow
    expression: stable under appends/retries, no rand(), replayable in
    SQL. Sources absent from `weights` fall back to `default`."""
    b = hash_bucket_col(key, resolution, salt)
    # round, don't truncate: 0.29 * 1e6 is 289999.99999999997 in floats —
    # int() would shift the cutoff a bucket low and diverge from any SQL
    # replay that computes the product exactly
    expr = None
    for src, w in sorted(weights.items()):
        cond = source == F.lit(src)
        keep = b < int(round(w * resolution))
        expr = F.when(cond, keep) if expr is None else expr.when(cond, keep)
    fallback = b < int(round(default * resolution))
    return fallback if expr is None else expr.otherwise(fallback)


def mix_sources(
    df,
    weights: dict[str, float],
    default: float = 0.0,
    key_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "mix",
):
    """df filtered to the weighted mixture (see mix_keep_col)."""
    return df.filter(
        mix_keep_col(F.col(key_col), F.col(source_col), weights, default, salt)
    )


def mix_copies_col(
    key: Column,
    source: Column,
    weights: dict[str, float],
    default: float = 0.0,
    salt: str = "mix",
    resolution: int = 1_000_000,
) -> Column:
    """Integer copy count implementing FULL mixture semantics, including
    UPSAMPLING: weight 2.5 keeps every doc twice and a key-stable half of
    them a third time (epochs-per-source, the way curated sources are
    upweighted against crawl). copies = floor(w) + (bucket < frac(w)).
    mix_keep_col is the w <= 1 special case. Explode
    F.sequence(1, copies) (filtered > 0) to materialize the repeats with
    a copy index for shard/epoch assignment."""
    b = hash_bucket_col(key, resolution, salt)

    def copies(w: float) -> Column:
        whole = int(w)
        frac_cut = int(round((w - whole) * resolution))
        return (F.lit(whole) + (b < frac_cut).cast("int")).cast("int")

    expr = None
    for src, w in sorted(weights.items()):
        cond = source == F.lit(src)
        expr = F.when(cond, copies(w)) if expr is None else expr.when(cond, copies(w))
    fallback = copies(default)
    return fallback if expr is None else expr.otherwise(fallback)


def mix_sources_with_repeats(
    df,
    weights: dict[str, float],
    default: float = 0.0,
    key_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "mix",
):
    """df with each row repeated per its mixture copy count (copy_idx
    1..n added); rows with zero copies disappear. Deterministic and
    append-stable like every sampler here."""
    n = mix_copies_col(F.col(key_col), F.col(source_col), weights, default, salt)
    return (
        df.withColumn("_n_copies", n)
        .filter(F.col("_n_copies") > 0)
        .withColumn("copy_idx", F.explode_outer(F.sequence(F.lit(1), F.col("_n_copies"))))
        .drop("_n_copies")
    )
