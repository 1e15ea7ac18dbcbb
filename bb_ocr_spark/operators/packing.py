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
    needed only once #buckets itself outgrows a single task (~10^7).

    The within-bucket window's hash Exchange looks redundant (the range
    shuffle already co-located each bucket) but replacing it with a
    zero-shuffle sortWithinPartitions + Arrow mapInPandas streaming
    cumsum measured SLOWER twice — ~1.7x standalone and ~1.3-1.8x even
    inside assign_shards_atomic where the Arrow crossing is already paid
    (interleaved A/B at 8 and 32 cores, BENCH/ADJUDICATION_r05.md): the
    Exchange moves compact (key, int64) rows and the fold stays in
    whole-stage codegen. Don't re-try without new evidence."""
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


def assign_shards_atomic(
    df: DataFrame,
    budget: int,
    key_col: str = "doc_id",
    weight_col: Column | None = None,
    chunk: int = 256,
    num_buckets: int | None = None,
    levels: int = 1,
    fanout: int = 1024,
) -> DataFrame:
    """Greedy DOC-ATOMIC packing with capacity: walking docs in global key
    order, a doc joins the current shard iff its weight still fits within
    `budget`; otherwise the shard closes and the doc opens the next one.
    A doc heavier than the whole budget sits alone in its own (overflowing)
    shard. Unlike assign_shards — whose shards are exact `budget`-token
    slices of the global token stream, splitting docs at boundaries — no
    doc is ever split here: shards are ≤ budget (except single-oversized-
    doc shards) and ids are consecutive from 0. Returns
    (key_col, weight, shard_id).

    Scale shape: the greedy recurrence is sequential, so it cannot be one
    global prefix formula — instead it runs EXACTLY within deterministic
    super-buckets of `chunk`×budget tokens derived from assign_shards'
    distributed global prefix (bucket boundaries come from the DATA, not
    from partitioning, so the result is identical at any parallelism),
    then shards are numbered globally by an exclusive prefix over the
    per-bucket shard counts (the same _bucket_offsets machinery). Each
    bucket boundary forces a shard break, so at most one under-filled
    shard per `chunk` shards — amortized fill loss ≤ 1/chunk.

    The per-bucket kernel is Arrow-batched applyInPandas: cumsum +
    searchsorted jumps, O(shards) python per bucket (bounded by ~chunk),
    never O(docs). Keys sort identically in Spark and pandas for numeric
    and ASCII-string keys (non-BMP string keys differ: UTF-16 code-unit
    vs code-point order — same caveat as any cross-engine string sort)."""
    import numpy as np  # noqa: PLC0415

    from ..cache import track_persist  # noqa: PLC0415

    pre = assign_shards(
        df, budget, key_col, weight_col, num_buckets, levels, fanout
    )
    bucket_budget = chunk * budget
    key_dtype = dict(df.select(F.col(key_col)).dtypes)[key_col]
    keyed = pre.select(
        key_col,
        F.col("weight").cast("long").alias("weight"),
        F.floor(F.col("prefix") / bucket_budget).cast("long").alias("_gb"),
    )

    def pack(pdf):
        pdf = pdf.sort_values(key_col).reset_index(drop=True)
        w = pdf["weight"].to_numpy(dtype="int64")
        c = np.cumsum(w)
        n = len(w)
        starts = [0]
        s = 0
        while True:
            base = int(c[s - 1]) if s > 0 else 0
            j = int(np.searchsorted(c, base + budget, side="right"))
            j = max(j, s + 1)  # oversized doc: alone in its own shard
            if j >= n:
                break
            starts.append(j)
            s = j
        ls = np.searchsorted(np.asarray(starts), np.arange(n), side="right") - 1
        return pdf.assign(_ls=ls.astype("int64"))

    packed = track_persist(
        keyed.groupBy("_gb").applyInPandas(
            pack, schema=f"{key_col} {key_dtype}, weight long, _gb long, _ls long"
        )
    )
    counts = packed.groupBy("_gb").agg((F.max("_ls") + 1).alias("_bt"))
    offsets = _bucket_offsets(
        counts.withColumnRenamed("_gb", "_b"), levels, fanout
    ).withColumnRenamed("_b", "_gb")
    return (
        packed.join(F.broadcast(offsets), "_gb")
        .select(
            key_col,
            "weight",
            (F.col("_off") + F.col("_ls")).cast("bigint").alias("shard_id"),
        )
    )


def materialize_shards(
    assignment: DataFrame,
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """(key, shard_id) assignment + (key, text) docs → one row per shard,
    ready to write as a training file:

      shard_id, n_docs, n_tokens, doc_ids (key order, comma-joined),
      doc_offsets (exclusive token prefix per doc within the shard,
      comma-joined), text (docs joined by `sep` in key order)

    The consumer slices examples back out with doc_offsets, so packing +
    materialization round-trips losslessly. Built for the doc-atomic
    assignment (assign_shards_atomic) where every doc is whole; it works
    on assign_shards output too but boundary docs will have been assigned
    to their STARTING shard, making those shards overshoot the budget.

    Scale shape: one join on the key, one parallel window per shard for
    the offsets (shards are budget-bounded, so groups are small by
    construction), one collect_list-class aggregation whose output row is
    ~budget tokens — the intended unit of a training file. Offsets are
    computed BEFORE grouping (window, linear) rather than by folding
    inside the collected array (quadratic array rebuild)."""
    from ..functions.text import token_count_col  # noqa: PLC0415

    joined = assignment.select(key_col, "shard_id").join(
        docs.select(
            key_col,
            F.col(text_col).alias("_txt"),
            token_count_col(F.col(text_col)).cast("long").alias("_nt"),
        ),
        key_col,
    )
    wd = (
        Window.partitionBy("shard_id")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_off = joined.withColumn(
        "_off", F.coalesce(F.sum("_nt").over(wd), F.lit(0))
    )
    collected = with_off.groupBy("shard_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_nt").cast("long").alias("n_tokens"),
        F.array_sort(
            F.collect_list(F.struct(key_col, "_off", "_txt"))
        ).alias("_rows"),
    )
    return collected.select(
        "shard_id",
        "n_docs",
        "n_tokens",
        F.array_join(
            F.transform(F.col("_rows"), lambda r: r[key_col].cast("string")),
            ",",
        ).alias("doc_ids"),
        F.array_join(
            F.transform(F.col("_rows"), lambda r: r["_off"].cast("string")),
            ",",
        ).alias("doc_offsets"),
        F.array_join(
            F.transform(F.col("_rows"), lambda r: r["_txt"]), sep
        ).alias("text"),
    )
