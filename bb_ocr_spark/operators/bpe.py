"""Distributed BPE vocabulary learning (Sennrich et al. 2016,
arXiv:1508.07909): iteratively count adjacent symbol pairs across the
corpus, merge the most frequent pair everywhere, repeat.

This is the tokenizer-TRAINING step of an LLM data pipeline (the
counting counterpart of functions/text.py's bpe_ish_token_count_col,
which only applies a fixed regex). Word-level variant: the initial
symbols are whitespace tokens and merges build multi-word units —
the same algorithm BPE uses on characters, at the granularity the
corpus tables here store.

Per round, on a corpus kept as one normalized symbol STRING per doc:
  1. pair counts: explode each doc's adjacent (symbol_i, symbol_i+1)
     pairs and count — a map-side-combined groupBy whose output is
     bounded by the number of DISTINCT adjacent pairs, not corpus size;
  2. argmax pair under (count DESC, pair ASC) — TakeOrderedAndProject
     (per-partition heaps, no global sort), kept as a 1-ROW FRAME that
     is cross-join-broadcast into the merge step: the winning pair
     never visits the driver;
  3. merge: string replace of ' l r ' with ' lr ' on the padded doc
     string — replace() scans left-to-right non-overlapping in Spark
     and ANSI SQL alike, which IS BPE's greedy application order
     ("a a a" + merge (a,a) -> "aa a", pinned by test);
  4. localCheckpoint(eager) the new state — the repo's iterative-loop
     discipline (dedup_clusters): without it the logical plan doubles
     per round.

Determinism: counts are exact integers, the argmax tie-break is pinned,
and merge application is the engines' shared replace semantics — so an
unrolled-stage DuckDB oracle replays every round value-exactly.

Scale: each round shuffles only the distinct-pair count table and one
1-row broadcast; the corpus itself never shuffles (narrow replace +
checkpoint). Driver holds nothing but the loop counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _pad(col):
    return F.concat(F.lit(" "), col, F.lit(" "))


def learn_bpe_merges(
    docs: DataFrame,
    num_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Learn the top `num_merges` BPE merges over the corpus.

    Returns one row per learned merge:
      (merge_rank:int 1-based, left_sym:string, right_sym:string,
       pair_count:long  — the pair's corpus count when it won).
    Rounds after the corpus runs out of repeated pairs still emit the
    (count DESC, pair ASC) argmax — deterministic down to count 1; if
    NO pair exists at all the frame just has fewer rows."""
    spark = docs.sparkSession
    state = docs.select(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ").alias(
            "s"
        )
    ).filter(F.col("s") != "").localCheckpoint(eager=True)

    out: DataFrame | None = None
    for rank in range(1, num_merges + 1):
        # no persist: the pair-count job is this frame's ONLY consumer,
        # so the per-round cache was written and never re-read (round-5
        # advisor finding) — pure overhead on every merge round
        toks = state.select(F.split("s", " ").alias("t"))
        pairs = toks.select(
            F.explode_outer(
                F.when(
                    F.size("t") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("t") - 1),
                        lambda i: F.array_join(F.slice("t", i, 2), " "),
                    ),
                )
            ).alias("pair")
        ).filter(F.col("pair").isNotNull())
        # eager checkpoint: the count job runs ONCE per round (both the
        # merge step and the output row read the checkpointed 1-row frame)
        top = (
            pairs.groupBy("pair")
            .agg(F.count("*").cast("long").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("pair"))
            .limit(1)
            .select(F.lit(rank).alias("merge_rank"), "pair", "pair_count")
            .localCheckpoint(eager=True)
        )
        # merge applied corpus-wide with the winner as a broadcast row —
        # the pair never visits the driver
        state = (
            state.crossJoin(F.broadcast(top))
            .select(
                F.trim(
                    F.replace(
                        _pad(F.col("s")),
                        _pad(F.col("pair")),
                        _pad(F.replace(F.col("pair"), F.lit(" "), F.lit(""))),
                    )
                ).alias("s")
            )
            .localCheckpoint(eager=True)
        )
        row = top.select(
            "merge_rank",
            F.split("pair", " ").getItem(0).alias("left_sym"),
            F.split("pair", " ").getItem(1).alias("right_sym"),
            "pair_count",
        )
        out = row if out is None else out.unionByName(row)
    if out is None:
        return spark.createDataFrame(
            [],
            "merge_rank int, left_sym string, right_sym string, "
            "pair_count long",
        )
    return out


def bpe_merges_oracle_sql(num_merges: int = 8) -> str:
    """Unrolled-stage DuckDB replay of learn_bpe_merges over the
    `documents` view: per round, the same pair enumeration, the same
    (count DESC, pair ASC) argmax, the same padded-replace merge."""
    ctes = [
        "s0 AS (SELECT regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
        " AS s FROM documents WHERE trim(text) <> '')"
    ]
    for r in range(1, num_merges + 1):
        prev = f"s{r - 1}"
        ctes.append(
            f"""p{r} AS (
  SELECT pair, CAST(count(*) AS BIGINT) AS pair_count
  FROM (
    SELECT unnest(CASE WHEN len(t) >= 2 THEN
             [array_to_string(t[i:i+1], ' ') FOR i IN range(1, len(t))]
           ELSE [] END) AS pair
    FROM (SELECT string_split(s, ' ') AS t FROM {prev})
  ) GROUP BY pair
)"""
        )
        ctes.append(
            f"m{r} AS (SELECT {r} AS merge_rank, pair, pair_count "
            f"FROM p{r} ORDER BY pair_count DESC, pair LIMIT 1)"
        )
        ctes.append(
            f"s{r} AS (SELECT trim(replace(' ' || s || ' ', "
            f"' ' || pair || ' ', ' ' || replace(pair, ' ', '') || ' ')) AS s "
            f"FROM {prev} CROSS JOIN m{r})"
        )
    finals = "\nUNION ALL\n".join(
        f"SELECT CAST(merge_rank AS INTEGER) AS merge_rank, "
        f"string_split(pair, ' ')[1] AS left_sym, "
        f"string_split(pair, ' ')[2] AS right_sym, pair_count FROM m{r}"
        for r in range(1, num_merges + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + finals


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stage_size: int = 64,
) -> DataFrame:
    """Apply a learned merge table (the output of learn_bpe_merges) to
    the corpus — the tokenizer-APPLICATION step that turns raw text into
    the symbol sequences a training pipeline feeds downstream (shard
    packing, vocab stats, token budgets).

    Merges are applied in rank order, each as ONE padded string replace
    with exactly the learn loop's semantics (left-to-right,
    non-overlapping — "a a a" + (a,a) -> "aa a", pinned by test), so
    encoding the training corpus with its own merges reproduces the
    learn loop's final state symbol-for-symbol.

    Returns (id_col, symbols:array<string>, n_symbols:long); empty/
    whitespace-only docs encode to an empty array.

    Scale shape: the merge table is a tokenizer MODEL — tiny, rank-
    ordered — collected once and folded into narrow replace chains of
    `stage_size` merges each, with an eager localCheckpoint between
    stages: every stage stays zero-shuffle and well under the Janino
    expression-depth cliff, so a 30k-merge vocabulary is ~470 narrow
    map stages over the corpus — no join, no shuffle, no driver data."""
    ranked = [
        (r["left_sym"], r["right_sym"])
        for r in merges.orderBy("merge_rank").collect()
    ]
    state = docs.select(
        F.col(id_col),
        F.concat(
            F.lit(" "),
            F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "),
            F.lit(" "),
        ).alias("_s"),
    )
    step = max(1, int(stage_size))
    for i in range(0, len(ranked), step):
        s = F.col("_s")
        for left, right in ranked[i : i + step]:
            pair = f"{left} {right}"
            s = F.replace(
                s, F.lit(f" {pair} "), F.lit(f" {pair.replace(' ', '')} ")
            )
        state = state.select(F.col(id_col), s.alias("_s"))
        if i + step < len(ranked):
            # bound expression depth between stages; eager so each
            # chunk's codegen compiles independently
            state = state.localCheckpoint(eager=True)
    out = state.select(
        F.col(id_col),
        F.filter(
            F.split(F.trim(F.col("_s")), " "), lambda t: t != ""
        ).alias("symbols"),
    )
    return out.select(
        id_col,
        "symbols",
        F.size("symbols").cast("long").alias("n_symbols"),
    )


def bpe_encode_oracle_sql(num_merges: int = 8) -> str:
    """Unrolled DuckDB replay of learn_bpe_merges + bpe_encode on the
    `documents` view: the merge table is learned round-by-round exactly
    as bpe_merges_oracle_sql does (empty docs contribute zero pairs, so
    they can share the state chain), and each state s{r} carries doc_id
    so the final state IS the per-doc encoding."""
    ctes = [
        "s0 AS (SELECT doc_id, ' ' || "
        "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
        " || ' ' AS s FROM documents)"
    ]
    for r in range(1, num_merges + 1):
        prev = f"s{r - 1}"
        ctes.append(
            f"""p{r} AS (
  SELECT pair, CAST(count(*) AS BIGINT) AS pair_count
  FROM (
    SELECT unnest(CASE WHEN len(t) >= 2 THEN
             [array_to_string(t[i:i+1], ' ') FOR i IN range(1, len(t))]
           ELSE [] END) AS pair
    FROM (SELECT list_filter(string_split(trim(s), ' '), x -> x <> '')
          AS t FROM {prev})
  ) GROUP BY pair
)"""
        )
        ctes.append(
            f"m{r} AS (SELECT pair FROM p{r} "
            f"ORDER BY pair_count DESC, pair LIMIT 1)"
        )
        ctes.append(
            f"s{r} AS (SELECT doc_id, replace(s, "
            f"' ' || pair || ' ', ' ' || replace(pair, ' ', '') || ' ') AS s "
            f"FROM {prev} CROSS JOIN m{r})"
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT doc_id,
       trim(s) AS symbols_str,
       CAST(len(list_filter(string_split(trim(s), ' '), x -> x <> ''))
            AS BIGINT) AS n_symbols
FROM s{num_merges}"""
    )
