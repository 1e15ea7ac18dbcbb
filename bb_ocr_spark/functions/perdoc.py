"""Shared per-document epilogue for the integer-micro-quantity operators
(surprisal family, quality classifier): zero-fill docs with no scored
rows via a left join against the distinct id set, and derive the
round-6 mean from the exact integer sum.

One definition, four operators — the rounding and zero-doc conventions
are cross-engine contracts pinned by the DuckDB gate, so they must not
be able to drift between operators.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def finalize_per_doc_micro(
    docs: DataFrame,
    per_doc: DataFrame,
    id_col: str,
    count_col: str,
    sum_col: str,
    mean_col: str,
    extra_long_cols: Sequence[str] = (),
    sum_expr: Column | None = None,
) -> DataFrame:
    """docs(id_col, ...) x per_doc(id, count, [extras], sum) ->
    (id_col, count, *extras, sum, mean) with:

    - every doc keeps a row (left join on the distinct id set; docs with
      nothing to score get integer zeros and mean 0.0);
    - mean = round(sum / (count * 1e6), 6) — the round-6 double both
      engines agree on — with `+ 0.0` canonicalizing IEEE -0.0 (a tiny
      negative integer sum rounds to -0.0; the stringified oracle
      compare is signed);
    - `sum_expr` overrides the default coalesce-to-0 of sum_col (the
      classifier adds its bias term here)."""
    all_docs = docs.select(F.col(id_col).alias("id")).distinct()
    s = (
        sum_expr
        if sum_expr is not None
        else F.coalesce(sum_col, F.lit(0))
    )
    cols = [
        F.col("id").alias(id_col),
        F.coalesce(count_col, F.lit(0)).cast("long").alias(count_col),
    ]
    for c in extra_long_cols:
        cols.append(F.coalesce(c, F.lit(0)).cast("long").alias(c))
    cols.append(s.cast("long").alias(sum_col))
    cols.append(
        (
            F.when(
                F.col(count_col) > 0,
                F.round(
                    s.cast("long")
                    / (F.col(count_col) * F.lit(1_000_000.0)),
                    6,
                ),
            ).otherwise(F.lit(0.0))
            + F.lit(0.0)
        ).alias(mean_col)
    )
    return all_docs.join(per_doc, "id", "left").select(*cols)
