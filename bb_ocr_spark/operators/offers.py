"""Enrichment / pricing-merge job (SURVEY §2.3 J1-J5, §2.4 A1-A4).

Reference semantics re-expressed as scalable Spark joins:

  A1  offer dedup on (provider, listing_id, isbn_13, isbn_10)
      (aggregator.py:61-68)
  A4  additive match score (+3 exact title, +1.5 contains, +1.5 author,
      +1 year — abebooks_html.py:149-161)
  A3  top-10 offers per doc by (score desc, amount asc)
      (abebooks_html.py:311-312)
  J2  best-offer tier 1: exact ISBN join, dash/space-stripped
      (pricing_api/static/script.js:204-210)
  J3  tier 2: normalized-title equality (script.js:113-119,211-213)
  J4  tier 3: Jaccard >= 0.5 over stop-worded title tokens —
      implemented as an INVERTED-INDEX candidate join (explode tokens,
      equi-join on token, distinct pairs, then exact Jaccard filter): no
      crossJoin, scales as a pair of shuffles on token keys
      (script.js:121-144,215-221)
  W1  first-per-group: row_number over (tier asc, amount asc) picks the
      best candidate (script.js:205-230 loop-break semantics)
  J5  coalesce-merge: fill null metadata fields from the best offer
      (script.js:235-271 pick(a,b) semantics)

All tiers are equi-joins Catalyst can broadcast when one side is small;
AQE skew-join covers hot ISBNs/titles at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "an", "of", "and", "or", "in", "on", "to"]

DEDUP_KEY = ["provider", "listing_id", "isbn_13", "isbn_10"]


def norm_isbn(c: Column) -> Column:
    return F.nullif(F.regexp_replace(F.coalesce(c, F.lit("")), "[-\\s]", ""), F.lit(""))


def norm_title(c: Column) -> Column:
    """lower, strip non-alnum, squeeze spaces (script.js:113-119)."""
    return F.nullif(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.coalesce(c, F.lit(""))), "[^a-z0-9 ]", ""),
                " +",
                " ",
            )
        ),
        F.lit(""),
    )


def title_tokens(c: Column) -> Column:
    """stop-worded token set of the normalized title."""
    return F.array_distinct(
        F.array_except(F.split(norm_title(c), " "), F.array(*[F.lit(w) for w in STOPWORDS]))
    )


def dedup_offers(offers: DataFrame) -> DataFrame:
    """A1 — order-preserving first-wins dedup via row_number (exact analog
    of the reference's seen-set loop, deterministic under ties)."""
    w = Window.partitionBy(*DEDUP_KEY).orderBy("url")
    return (
        offers.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def score_offers(offers: DataFrame, q_title: Column, q_author: Column, q_year: Column) -> DataFrame:
    """A4 — additive match score against a query record."""
    t = norm_title(F.col("title"))
    qt = norm_title(q_title)
    score = (
        F.when(t == qt, F.lit(3.0))
        .when(t.contains(qt) | qt.contains(t), F.lit(1.5))
        .otherwise(F.lit(0.0))
        + F.when(
            F.exists(
                F.col("authors"),
                lambda a: F.lower(a) == F.lower(q_author),
            ),
            F.lit(1.5),
        ).otherwise(F.lit(0.0))
        + F.when(
            F.regexp_extract(F.col("publication_date"), r"((?:18|19|20)\d{2})", 1)
            == q_year,
            F.lit(1.0),
        ).otherwise(F.lit(0.0))
    )
    return offers.withColumn("score", score)


def top_k_offers(offers: DataFrame, k: int = 10) -> DataFrame:
    """A3/O2 — per-doc top-k by (score desc, amount asc)."""
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc_nulls_last("amount"), "listing_id"
    )
    return offers.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    ).drop("_rn")


def _jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def candidate_pairs_by_token(
    meta: DataFrame, offers: DataFrame, max_df: int | None = 1024
) -> DataFrame:
    """J4 candidates via inverted index: (doc_id, listing_id) pairs sharing
    at least one non-stopword title token.

    max_df — frequency cap on join tokens: a token in k_m metadata titles
    and k_o offer titles emits k_m*k_o candidate rows, so one generic word
    ("introduction") past the stopword list recreates the quadratic blowup
    at scale. Tokens whose combined frequency exceeds max_df are dropped
    from candidate GENERATION only (the hot set is tiny and broadcast);
    the downstream Jaccard is still computed over the full token sets, so
    a surviving pair's score is unchanged — only pairs whose EVERY shared
    token is hot are lost, and those are ~never >= 0.5 Jaccard matches."""
    m = meta.select("doc_id", title_tokens(F.col("title")).alias("m_toks"))
    o = offers.select("listing_id", title_tokens(F.col("title")).alias("o_toks"))
    m_tok = m.select("doc_id", "m_toks", F.explode("m_toks").alias("tok"))
    o_tok = o.select("listing_id", "o_toks", F.explode("o_toks").alias("tok"))
    if max_df is not None:
        hot = (
            m_tok.select("tok")
            .unionByName(o_tok.select("tok"))
            .groupBy("tok")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("tok")
        )
        # AQE broadcasts the (tiny) hot set when safe; no forced hint
        m_tok = m_tok.join(hot, "tok", "left_anti")
        o_tok = o_tok.join(hot, "tok", "left_anti")
    return (
        m_tok.join(o_tok, "tok")
        .groupBy("doc_id", "listing_id")  # distinct pairs; keeps token arrays
        .agg(F.first("m_toks").alias("m_toks"), F.first("o_toks").alias("o_toks"))
        .withColumn("jaccard", _jaccard(F.col("m_toks"), F.col("o_toks")))
    )


def best_offer(meta: DataFrame, offers: DataFrame, jaccard_min: float = 0.5) -> DataFrame:
    """J2→J3→J4 tiered best-offer join; returns one row per doc that has
    any candidate: (doc_id, listing_id, tier, amount…)."""
    m = meta.select(
        "doc_id",
        F.coalesce(norm_isbn(F.col("isbn_13")), norm_isbn(F.col("isbn_10"))).alias(
            "m_isbn"
        ),
        norm_title(F.col("title")).alias("m_title"),
        F.col("title").alias("m_raw_title"),
    )
    o = offers.select(
        "listing_id",
        "amount",
        "currency",
        F.coalesce(norm_isbn(F.col("isbn_13")), norm_isbn(F.col("isbn_10"))).alias(
            "o_isbn"
        ),
        norm_title(F.col("title")).alias("o_title"),
        F.col("title").alias("o_raw_title"),
    )
    t1 = (
        m.filter(F.col("m_isbn").isNotNull())
        .join(o.filter(F.col("o_isbn").isNotNull()), F.col("m_isbn") == F.col("o_isbn"))
        .select("doc_id", "listing_id", "amount", "currency", F.lit(1).alias("tier"))
    )
    t2 = (
        m.filter(F.col("m_title").isNotNull())
        .join(o.filter(F.col("o_title").isNotNull()), F.col("m_title") == F.col("o_title"))
        .select("doc_id", "listing_id", "amount", "currency", F.lit(2).alias("tier"))
    )
    cand = candidate_pairs_by_token(
        m.select("doc_id", F.col("m_raw_title").alias("title")),
        offers.select("listing_id", "title"),
    ).filter(F.col("jaccard") >= jaccard_min)
    t3 = (
        cand.join(offers.select("listing_id", "amount", "currency"), "listing_id")
        .select("doc_id", "listing_id", "amount", "currency", F.lit(3).alias("tier"))
    )
    allc = t1.unionByName(t2).unionByName(t3)
    w = Window.partitionBy("doc_id").orderBy(
        "tier", F.asc_nulls_last("amount"), "listing_id"
    )
    return (
        allc.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


MERGE_FIELDS = ["title", "publisher", "year", "isbn_13", "isbn_10"]


def merge_metadata(meta: DataFrame, best: DataFrame, offers: DataFrame) -> DataFrame:
    """J5 — left join meta ⋈ best offer; coalesce null fields from the
    offer record (pick(a,b) = a unless null/empty)."""
    off = offers.select(
        "listing_id",
        *[F.col(f).alias(f"o_{f}") for f in ["title", "publisher", "isbn_13", "isbn_10"]],
        F.regexp_extract(F.col("publication_date"), r"((?:18|19|20)\d{2})", 1).alias(
            "o_year"
        ),
        F.col("amount").alias("o_amount"),
        F.col("currency").alias("o_currency"),
    )
    joined = meta.join(best.select("doc_id", "listing_id", "tier"), "doc_id", "left").join(
        off, "listing_id", "left"
    )

    def pick(f: str) -> Column:
        return F.coalesce(F.nullif(F.col(f), F.lit("")), F.col(f"o_{f}")).alias(f)

    return joined.select(
        "doc_id",
        *[pick(f) for f in MERGE_FIELDS],
        F.col("tier").alias("match_tier"),
        F.col("o_amount").alias("best_amount"),
        F.col("o_currency").alias("best_currency"),
    )
