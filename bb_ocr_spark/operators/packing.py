"""Token-budget shard packing for training-data assembly.

Assigns each document to a shard so that shards are filled in a
deterministic global order with ~`budget` tokens each — the step that
turns a deduped corpus into fixed-size training shards. The assignment is
`floor(prefix_tokens / budget)` where prefix_tokens is the running token
total BEFORE the doc in the global order.

Scale shape — a distributed prefix sum, NOT a global window: an
`over (order by ...)` with no partition key collapses the whole corpus
into one task. Instead:
  1. docs are grouped into ordered buckets (key div bucket_width);
  2. per-bucket subtotals (one tiny row per bucket) get their own prefix
     sum — thousands of rows, broadcastable;
  3. the within-bucket running sum is a window PARTITIONED by bucket
     (parallel), shifted by the bucket's broadcast offset.
Shuffle cost: one aggregation on bucket ids + one parallel window; the
global-order semantics are exact (oracle-verified against a plain global
window in SQL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def assign_shards(
    df: DataFrame,
    budget: int,
    key_col: str = "doc_id",
    weight_col: Column | None = None,
    bucket_width: int = 1024,
) -> DataFrame:
    """(key, weight) → (key, weight, prefix, shard_id) with shard_id =
    floor(prefix / budget); prefix = total weight of all docs ordered
    BEFORE this key. Deterministic for any parallelism."""
    w = (weight_col if weight_col is not None else F.col("n_tokens")).alias("_w")
    base = df.select(F.col(key_col).alias("_k"), w).withColumn(
        "_b", F.floor(F.col("_k").cast("long") / bucket_width)
    )
    # per-bucket subtotals: tiny (corpus/bucket_width rows), prefix-summed
    # with a window over buckets only, then broadcast back
    bucket_tot = base.groupBy("_b").agg(F.sum("_w").alias("_bt"))
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_tot.withColumn(
        "_off", F.coalesce(F.sum("_bt").over(wb), F.lit(0))
    ).select("_b", "_off")
    # within-bucket running sum excluding self: parallel window per bucket
    wd = Window.partitionBy("_b").orderBy("_k").rowsBetween(
        Window.unboundedPreceding, -1
    )
    out = (
        base.join(F.broadcast(offsets), "_b")
        .withColumn("_prefix", F.col("_off") + F.coalesce(F.sum("_w").over(wd), F.lit(0)))
        .select(
            F.col("_k").alias(key_col),
            F.col("_w").alias("weight"),
            F.col("_prefix").alias("prefix"),
            F.floor(F.col("_prefix") / budget).cast("bigint").alias("shard_id"),
        )
    )
    return out
