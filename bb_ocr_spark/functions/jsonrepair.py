"""JSON repair + schema-validated parse (U8).

Reference: enhanced_extractor.py:893-925 — find the {...} substring, strip
markdown code fences, neutralize template placeholders ("string | null" →
null), parse against the fixed schema, fall back to an all-null record with
a fallback marker on failure (:953-1002).

Spark form: regexp cleanup chain + from_json(schema) — from_json returns
null on unparseable input, which drives the fallback column. All JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

METADATA_JSON_SCHEMA = (
    "struct<title:string, authors:array<string>, publisher:string, "
    "year:string, isbn_13:string, isbn_10:string, page_count:int, "
    "price:struct<currency:string, amount:double>>"
)


def cleaned_json_col(raw: Column) -> Column:
    """Strip ```json fences, cut to the outermost {...}, neutralize
    'string | null' template placeholders."""
    no_fence = F.regexp_replace(raw, r"```(?:json)?", "")
    body = F.regexp_extract(no_fence, r"(\{[\s\S]*\})", 1)
    return F.regexp_replace(
        body, r'"(?:string|integer|number)\s*\|\s*null"', "null"
    )


def repaired_metadata_cols(raw: Column) -> list[Column]:
    parsed = F.from_json(cleaned_json_col(raw), METADATA_JSON_SCHEMA)
    fallback = parsed.isNull()
    return [
        parsed.alias("record"),
        fallback.alias("fallback_used"),
    ]


def repair_json_df(df: DataFrame, raw_col: str = "raw") -> DataFrame:
    return df.select("*", *repaired_metadata_cols(F.col(raw_col))).drop(raw_col)
