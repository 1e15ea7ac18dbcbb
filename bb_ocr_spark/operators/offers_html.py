"""Offer-row extraction from search-result markup (S6).

The reference scrapes provider search pages and walks result rows with
CSS selectors, pulling (title, price, year, url) per listing and applying
a strict year-match filter:
  row walk + field selectors   pipeline_demo/pricing_api/pricing_api/
                               providers/abebooks_html.py:98-312
  price parse w/ locale        abebooks_html.py:19-45 (functions/numeric)
  currency mapping             abebooks_html.py:48-91
  strict year filter (P5)      abebooks_html.py:298-305

Spark-first form: the "selector" is a lazy row-block regex over the raw
markup column (`<tr class="offer">…</tr>`), then per-row field regexes
inside a `transform` lambda — one narrow projection, no UDFs, no shuffle;
1 input row → N offer rows via posexplode. The same two-level
block-then-field shape a DOM walk produces, expressed vectorized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import currency_code, parse_locale_number

OFFER_ROW_RE = r'<tr class="offer">(.*?)</tr>'
TITLE_CELL_RE = r'<td class="title"><a href="[^"]*">([^<]*)</a>'
URL_RE = r'href="([^"]*)"'
PRICE_CELL_RE = r'<td class="price">([^<]*)</td>'
YEAR_CELL_RE = r'<td class="year">([^<]*)</td>'


def _cell(row: Column, pattern: str) -> Column:
    return F.nullif(F.regexp_extract(row, pattern, 1), F.lit(""))


def parse_offer_rows(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """markup column → one row per offer: (id, pos, title, url, amount,
    currency, year). Rows not matching the offer selector (ads, nav) are
    ignored, exactly like the reference's class-scoped row walk."""
    rows = F.regexp_extract_all(F.col(html_col), F.lit(OFFER_ROW_RE), F.lit(1))
    offers = F.transform(
        rows,
        lambda r: F.struct(
            _cell(r, TITLE_CELL_RE).alias("title"),
            _cell(r, URL_RE).alias("url"),
            parse_locale_number(_cell(r, PRICE_CELL_RE)).alias("amount"),
            currency_code(_cell(r, PRICE_CELL_RE)).alias("currency"),
            _cell(r, YEAR_CELL_RE).alias("year"),
        ),
    )
    return df.select(
        F.col(id_col), F.posexplode(offers).alias("pos", "o")
    ).select(
        id_col,
        F.col("pos").cast("bigint").alias("pos"),
        F.col("o.title").alias("title"),
        F.col("o.url").alias("url"),
        F.col("o.amount").alias("amount"),
        F.col("o.currency").alias("currency"),
        F.col("o.year").alias("year"),
    )


def filter_year_match(offers: DataFrame, q_year: Column) -> DataFrame:
    """P5 strict year filter (abebooks_html.py:298-305): keep only offers
    whose extracted year equals the query year; offers with NO year are
    dropped (the reference's strict mode)."""
    return offers.filter(F.col("year") == q_year)
