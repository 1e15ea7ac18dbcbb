"""Token-budget shard packing for training-data assembly.

Assigns each document to a shard so that shards are filled in a
deterministic global key order with ~`budget` tokens each — the step that
turns a deduped corpus into fixed-size training shards. The assignment is
`floor(prefix_tokens / budget)` where prefix_tokens is the running token
total BEFORE the doc in the global order.

Scale shape — a distributed prefix sum, NOT a global window: an
`over (order by ...)` with no partition key collapses the whole corpus
into one task. Instead:
  1. docs are RANGE-partitioned on the key (`repartitionByRange`) — the
     buckets are contiguous slices of the global order for ANY orderable
     key type (string doc_ids included; the old `floor(key/width)`
     arithmetic silently NULLed non-numeric keys and the bucket equi-join
     then dropped the whole corpus — see the string-key test);
  2. per-bucket subtotals (one tiny row per bucket) get their own prefix
     sum — at `levels=1` a single-task window over #buckets rows (fine to
     ~10^7 buckets), at `levels=2` the same bucket trick recurses once
     (super-buckets of `fanout` buckets), lifting the single-task row
     count to #buckets/fanout;
  3. the within-bucket running sum is a window PARTITIONED by bucket
     (parallel), shifted by the bucket's broadcast offset.
Shuffle cost: the range repartition, one aggregation on bucket ids, one
parallel window; the global-order semantics are exact (oracle-verified
against a plain global window in SQL) for distinct non-null keys.

The bucketed base feeds both the subtotal pass and the final window, and
`spark_partition_id` over a re-executed range shuffle is not guaranteed
stable across plan branches — so the bucketed base is persisted
(cache.track_persist; release via cache.release_persisted()). At 100 TB
the equivalent is materializing the (key, weight, bucket) projection or
deriving the bucket from precomputed range boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucket_offsets(bucket_tot: DataFrame, levels: int, fanout: int) -> DataFrame:
    """(_b, _bt) per-bucket subtotals → (_b, _off) exclusive prefix sums.

    levels=1: one unpartitioned window over #buckets rows (tiny by
    construction). levels>=2: recurse over super-buckets of `fanout`
    buckets so no single task sees more than max(#buckets/fanout, fanout)
    rows."""
    if levels <= 1:
        wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
        return bucket_tot.withColumn(
            "_off", F.coalesce(F.sum("_bt").over(wb), F.lit(0))
        ).select("_b", "_off")
    sb = bucket_tot.withColumn("_sb", F.floor(F.col("_b") / fanout))
    super_tot = sb.groupBy("_sb").agg(F.sum("_bt").alias("_bt"))
    super_off = (
        _bucket_offsets(
            super_tot.withColumnRenamed("_sb", "_b"), levels - 1, fanout
        )
        .withColumnRenamed("_b", "_sb")
        .withColumnRenamed("_off", "_soff")
    )
    wd = Window.partitionBy("_sb").orderBy("_b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        sb.join(F.broadcast(super_off), "_sb")
        .withColumn(
            "_off", F.col("_soff") + F.coalesce(F.sum("_bt").over(wd), F.lit(0))
        )
        .select("_b", "_off")
    )


def assign_shards(
    df: DataFrame,
    budget: int,
    key_col: str = "doc_id",
    weight_col: Column | None = None,
    num_buckets: int | None = None,
    levels: int = 1,
    fanout: int = 1024,
) -> DataFrame:
    """(key, weight) → (key, weight, prefix, shard_id) with shard_id =
    floor(prefix / budget); prefix = total weight of all docs ordered
    BEFORE this key (ascending key order). Deterministic for any
    parallelism when keys are distinct and non-null; keys may be any
    orderable type (string/long/timestamp).

    num_buckets defaults to spark.sql.shuffle.partitions; raise it so
    #rows/num_buckets fits one window task comfortably. levels=2 adds a
    recursive prefix pass over super-buckets of `fanout` buckets —
    needed only once #buckets itself outgrows a single task (~10^7)."""
    w = (weight_col if weight_col is not None else F.col("n_tokens")).alias("_w")
    if num_buckets is None:
        num_buckets = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    base = (
        df.select(F.col(key_col).alias("_k"), w)
        .repartitionByRange(num_buckets, "_k")
        .withColumn("_b", F.spark_partition_id().cast("long"))
    )
    from ..cache import track_persist  # noqa: PLC0415

    base = track_persist(base)
    bucket_tot = base.groupBy("_b").agg(F.sum("_w").alias("_bt"))
    offsets = _bucket_offsets(bucket_tot, levels, fanout)
    # within-bucket running sum excluding self: parallel window per bucket
    wd = Window.partitionBy("_b").orderBy("_k").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        base.join(F.broadcast(offsets), "_b")
        .withColumn(
            "_prefix", F.col("_off") + F.coalesce(F.sum("_w").over(wd), F.lit(0))
        )
        .select(
            F.col("_k").alias(key_col),
            F.col("_w").alias("weight"),
            F.col("_prefix").alias("prefix"),
            F.floor(F.col("_prefix") / budget).cast("bigint").alias("shard_id"),
        )
    )
