"""Train/eval decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set (the standard pretraining hygiene
pass — GPT-3 used 13-gram overlap; the n is a parameter here).

Scale shape:
  eval side   distinct hashed n-grams of the (small) eval set — at 100 TB
              train scale the eval set is still only benchmarks, so this
              side stays broadcast-joinable (AQE picks it up; no hint
              forced);
  train side  explode distinct hashed shingles per doc — 8-byte hashes on
              the wire, never n-gram strings (hashed_shingles_col), and
              the join + count shuffles only (doc_id, hash) pairs.

Hash-based matching equals string matching unless two DISTINCT shingles
collide in 64 bits (~|shingles|²/2^65) — the same accepted risk documented
at hashed_shingles_col; the DuckDB oracle replays the semantics with
string n-grams and is value-exact on the test corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_col
from .dedup import hashed_shingles_col


def _hashed_shingles(df: DataFrame, n: int, id_col: str, text_col: str) -> DataFrame:
    toks = tokens_col(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"),
        F.transform(toks, lambda t: F.xxhash64(t)).alias("_th"),
        toks.alias("_tk"),
    ).select("id", hashed_shingles_col(F.col("_th"), F.col("_tk"), n).alias("hs"))


def contaminated_docs(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_shared) for every train doc sharing >= min_hits DISTINCT
    word n-grams with any eval doc. Anti-join the result against the
    corpus to decontaminate; keep n_shared for audit thresholds."""
    # explode_outer, NOT explode: the optimizer infers a size>0/isnotnull
    # filter for a plain explode and pushes it past the _th/_tk projection,
    # re-inlining the WHOLE shingle expression twice — and each copy
    # re-evaluates the token-hash transform inside every try_element_at,
    # an O(shingles × tokens) blowup per doc (measured 10x on sf0.1: the
    # same trap fixed in the tokenize_spans driver query). hs is never
    # empty/null (the <n-tokens branch emits a 1-element array), so the
    # outer generate emits identical rows.
    ev = (
        _hashed_shingles(eval_df, n, id_col, text_col)
        .select(F.explode_outer("hs").alias("sh"))
        .distinct()
    )
    tr = _hashed_shingles(train, n, id_col, text_col).select(
        "id", F.explode_outer("hs").alias("sh")
    )
    return (
        tr.join(ev, "sh")  # shingles are distinct per doc -> count = hits
        .groupBy("id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_hits)
        .select(F.col("id").alias(id_col), "n_shared")
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """train rows with contaminated docs removed (left_anti on the flag
    set — the same resume/anti-join shape as plans/extract_job)."""
    flagged = contaminated_docs(train, eval_df, n, min_hits, id_col, text_col)
    return train.join(flagged.select(id_col), id_col, "left_anti")


def contamination_ngram_col(text: Column, n: int = 3) -> Column:
    """string n-grams (for tests/oracles that need the unhashed form)."""
    from .dedup import shingles_col

    return shingles_col(text, n)
