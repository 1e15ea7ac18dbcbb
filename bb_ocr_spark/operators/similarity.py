"""Similarity search over embedding columns (array<float>).

Two tiers:

  brute_force_topk   exact cosine top-k: broadcast the (small) query set
                     against the corpus — one narrow pass over the corpus,
                     no corpus shuffle; the per-query top-k is a window on
                     (query_id, score). This is the baseline/verification
                     tier and the right plan whenever |queries| is small
                     enough to broadcast.

  lsh_topk           random-hyperplane LSH: P deterministic hyperplanes
                     (seeded numpy, materialized once on the driver and
                     broadcast) → P-bit signature → candidates = corpus
                     rows sharing a signature bucket (multi-probe via
                     rotated bands) → exact cosine re-rank within
                     candidates. Sub-linear scan at scale; recall measured
                     in tests, not assumed.

  embedding_dup_pairs  near-duplicate pairs via the same LSH bucketing
                     (self-join on bucket), exact-cosine verified.

Dot products use F.zip_with + F.aggregate in DOUBLE (JVM expressions,
no Python in the scan path); the vectorized-numpy variant for wide batches
is a pandas UDF kept for reference in pandas_cosine_topk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import config


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_col(a: Column, b: Column) -> Column:
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self-matches by id).
    queries is broadcast; corpus is scanned once, narrow."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", cosine_col(F.col("q_vec"), F.col("c_vec")))
        .select("query_id", "vec_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cosine", "rk")
    )


# --------------------------------------------------------------------------
# random-hyperplane LSH
# --------------------------------------------------------------------------


def _hyperplanes(dim: int, n_planes: int, seed: int = config.SEED):
    import numpy as np  # noqa: PLC0415

    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype("float64")


def signature_col(vec: Column, planes) -> Column:
    """P-bit signature as a long: bit p = sign(vec · plane_p) >= 0.
    planes is a driver-side numpy array folded into literal expressions —
    constant-folded by Catalyst, broadcast with the plan."""
    def plane_dot(plane) -> Column:
        lit_plane = F.lit(plane.tolist())
        return F.aggregate(
            F.transform(
                vec,
                lambda x, i: x.cast("double")
                * F.element_at(lit_plane, i.cast("int") + 1),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    bits = []
    for p, plane in enumerate(planes):
        dot = plane_dot(plane)
        bits.append(F.when(dot >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def with_lsh_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    vec_col: str = "embedding",
    seed: int = config.SEED,
) -> DataFrame:
    planes = _hyperplanes(dim, n_planes, seed)
    return df.withColumn("bucket", signature_col(F.col(vec_col), planes))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine re-rank within shared LSH buckets.
    Candidate set = corpus rows in the query's bucket (single-probe)."""
    from pyspark.sql import Window

    c = with_lsh_buckets(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec")),
        dim,
        n_planes,
        "c_vec",
    )
    q = with_lsh_buckets(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        dim,
        n_planes,
        "q_vec",
    )
    scored = (
        c.join(q, "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", cosine_col(F.col("q_vec"), F.col("c_vec")))
        .select("query_id", "vec_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cosine", "rk")
    )


def embedding_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate (a < b) pairs with cosine >= threshold, candidates via
    LSH bucket self-join (near-identical vectors agree on every hyperplane
    sign with high probability)."""
    b = with_lsh_buckets(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")),
        dim,
        n_planes,
        "vec",
    )
    return (
        b.alias("a")
        .join(b.alias("b"), "bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn("cosine", cosine_col(F.col("a.vec"), F.col("b.vec")))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cosine")
    )


def _centroids(dim: int, n_centroids: int, seed: int = config.SEED):
    import numpy as np  # noqa: PLC0415

    rng = np.random.RandomState(seed + 1)
    c = rng.randn(n_centroids, dim)
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _centroid_scores_col(vec: Column, cents) -> Column:
    """array<struct<cos,idx>> of cosine vs every centroid (norm of vec
    cancels in ranking, so plain dots rank identically)."""

    def dot(cent) -> Column:
        lit_c = F.lit(cent.tolist())
        return F.aggregate(
            F.transform(
                vec,
                lambda x, i: x.cast("double") * F.element_at(lit_c, i.cast("int") + 1),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    return F.array(
        *[
            F.struct(dot(c).alias("cos"), F.lit(i).alias("idx"))
            for i, c in enumerate(cents)
        ]
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: corpus rows are assigned to their nearest (by dot)
    of n_centroids fixed unit centroids (inverted lists = hash partitions
    on list id); each query probes its n_probe nearest lists and exact
    cosine re-ranks within them. Scan cost drops to ~n_probe/n_centroids
    of the corpus. Centroids are seeded-random unit vectors — at real
    scale they would come from a k-means sample, same plan."""
    from pyspark.sql import Window

    cents = _centroids(dim, n_centroids)
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"))
    c = c.withColumn(
        "list_id", F.array_max(_centroid_scores_col(F.col("c_vec"), cents))["idx"]
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    q = q.withColumn(
        "probes",
        F.slice(
            F.reverse(F.array_sort(_centroid_scores_col(F.col("q_vec"), cents))),
            1,
            n_probe,
        ),
    ).select(
        "query_id", "q_vec", F.explode(F.transform("probes", lambda p: p["idx"])).alias("list_id")
    )
    scored = (
        c.join(q, "list_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", cosine_col(F.col("q_vec"), F.col("c_vec")))
        .select("query_id", "vec_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cosine", "rk")
    )


def pandas_cosine_topk(
    corpus: DataFrame,
    queries_pdf,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-vectorized exact variant: queries as a numpy matrix captured in
    a mapInPandas closure; per batch one (batch × queries) matmul. The shape
    to use when |queries| is large enough that per-row HOF dot products lose
    to BLAS."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    qm = np.stack(queries_pdf[vec_col].to_numpy()).astype("float64")
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    qids = queries_pdf[id_col].to_numpy()

    def run(batches):
        for pdf in batches:
            cm = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            cn = cm / np.linalg.norm(cm, axis=1, keepdims=True)
            sims = cn @ qn.T  # (batch, nq)
            rows = []
            for qi in range(sims.shape[1]):
                order = np.argsort(-sims[:, qi])[: k + 1]
                for ci in order:
                    if pdf[id_col].iloc[ci] != qids[qi]:
                        rows.append(
                            (
                                int(qids[qi]),
                                int(pdf[id_col].iloc[ci]),
                                round(float(sims[ci, qi]), 6),
                            )
                        )
            yield pd.DataFrame(rows, columns=["query_id", "vec_id", "cosine"])

    # partial top-k per batch; final exact top-k via window
    from pyspark.sql import Window

    partial = corpus.mapInPandas(
        run, schema="query_id long, vec_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        partial.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cosine", "rk")
    )
