"""Full-schema heuristic metadata extraction (U9/U10) — pure Spark exprs.

Implements the reference's complete 16-field metadata record:
  schema literal      pipeline_demo/extractor/enhanced_extractor.py:57-92
  author "by X Y"     pipeline_components/img_to_json/ocr_testing/
                      hueristics/book_extractor.py:128
  series patterns     book_extractor.py:135-147
  known publishers    book_extractor.py:32-38 (fallback at :100-106)
  price w/ currency   book_extractor.py:25-28 + abebooks_html.py:48-91
  genre keyword hits  book_extractor.py:149-178 (substring containment)
  validation          pipeline_demo/extractor/process_book_enhanced.py:35-51

Every rule is a constant-folded regex/CASE expression — no UDFs — and has
an exact ANSI-SQL mirror (metadata_full_oracle_sql) so the driver's DuckDB
gate verifies field-for-field equality. The `synth_listing_col` payload
generator (also mirrored in SQL) deterministically seeds every field class
from doc_id, so the oracle run exercises authors, bindings, page counts,
prices, editions, and conditions rather than all-NULL rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import config

# fallback publisher list (book_extractor.py:32-38; subset — the rule is
# word-boundary case-insensitive search, first list entry wins)
KNOWN_PUBLISHERS = [
    "Penguin",
    "Random House",
    "HarperCollins",
    "Macmillan",
    "Wiley",
    "Pearson",
    "Vintage",
    "Tor Books",
]

# binding vocabulary (schema binding_type, enhanced_extractor.py:70)
BINDING_TYPES = ["hardcover", "paperback", "mass market", "library binding"]

# language name vocabulary (schema language, enhanced_extractor.py:71)
LANGUAGES = ["english", "french", "german", "spanish"]

# condition keywords (schema condition_keywords, enhanced_extractor.py:79)
CONDITION_KEYWORDS = ["like new", "very good", "good", "acceptable", "ex-library"]

AUTHOR_RE = r"by ([A-Z][a-z]+ [A-Z][a-z]+)"          # book_extractor.py:128
SERIES_RE = r"(?i)\b([A-Za-z]+) series\b"            # book_extractor.py:137
ASIN_RE = r"\b(B[0-9A-Z]{9})\b"
EDITION_RE = r"(?i)\b([0-9]+(?:st|nd|rd|th) edition)\b"
PAGES_RE = r"\b([0-9]{1,5}) pages\b"
PRICE_CCY_RE = r"([$€£])([0-9]+(?:[.][0-9]{2})?)"
DESCRIPTION_RE = r"(?i)description: ([^\n]+)"

_CCY = {"$": "USD", "€": "EUR", "£": "GBP"}


def _first(ctx: Column, pattern: str, group: int = 1) -> Column:
    return F.nullif(F.regexp_extract(ctx, pattern, group), F.lit(""))


def metadata_full_cols(ctx: Column, first_line: Column | None = None) -> list[Column]:
    """The 16-field record as columns over a context string. Array fields
    are emitted '; '-joined (empty string = empty array) so results hash
    identically across engines.

    first_line — the title-line source (reference heuristic: first OCR
    line, book_extractor.py:115-124). Defaults to the first \\n-line of
    ctx; the pipeline variant passes the first kept text span instead."""
    lower = F.lower(ctx)
    if first_line is None:
        first_line = F.regexp_extract(ctx, r"^([^\n]*)", 1)
    title = F.nullif(F.trim(F.regexp_extract(first_line, r"^([^:]*)", 1)), F.lit(""))
    subtitle = F.nullif(
        F.trim(F.regexp_extract(first_line, r"^[^:]*:(.*)$", 1)), F.lit("")
    )
    authors = F.array_distinct(
        F.regexp_extract_all(ctx, F.lit(AUTHOR_RE), F.lit(1))
    )
    isbn13 = _first(ctx, config.ISBN13_RE)
    isbn10 = F.when(isbn13.isNull(), _first(ctx, config.ISBN10_RE))
    def strip(c: Column) -> Column:
        return F.regexp_replace(c, "[- ]", "")

    # publisher: regex first (book_extractor.py:94-99), known-list fallback
    # in list order (:100-106)
    fb = F.lit(None).cast("string")
    for name in reversed(KNOWN_PUBLISHERS):
        fb = F.when(lower.rlike(rf"\b{name.lower()}\b"), F.lit(name)).otherwise(fb)
    publisher = F.coalesce(_first(ctx, config.PUBLISHER_RE), fb)

    def first_in_list(options: list[str]) -> Column:
        out = F.lit(None).cast("string")
        for opt in reversed(options):
            out = F.when(lower.contains(opt), F.lit(opt)).otherwise(out)
        return out

    def all_hits(genres: dict[str, list[str]]) -> Column:
        parts = [
            F.when(
                F.greatest(*[lower.contains(k).cast("int") for k in kws]) == 1,
                F.array(F.lit(g)),
            ).otherwise(F.array().cast("array<string>"))
            for g, kws in genres.items()
        ]
        return F.concat(*parts)

    conditions = F.concat(
        *[
            F.when(lower.contains(k), F.array(F.lit(k))).otherwise(
                F.array().cast("array<string>")
            )
            for k in CONDITION_KEYWORDS
        ]
    )
    price_ccy = _first(ctx, PRICE_CCY_RE, 1)
    price_code = F.lit(None).cast("string")
    for sym, code in reversed(_CCY.items()):
        price_code = F.when(price_ccy == sym, F.lit(code)).otherwise(price_code)
    page_count = _first(ctx, PAGES_RE).cast("int")
    cols = [
        title.alias("title"),
        subtitle.alias("subtitle"),
        F.array_join(authors, "; ").alias("authors"),
        publisher.alias("publisher"),
        _first(ctx, config.YEAR_RE).alias("year"),
        strip(isbn13).alias("isbn_13"),
        strip(isbn10).alias("isbn_10"),
        _first(ctx, ASIN_RE).alias("asin"),
        _first(ctx, EDITION_RE).alias("edition"),
        first_in_list(BINDING_TYPES).alias("binding_type"),
        first_in_list(LANGUAGES).alias("language"),
        page_count.alias("page_count"),
        F.array_join(all_hits(config.GENRE_KEYWORDS), "; ").alias("categories"),
        _first(ctx, DESCRIPTION_RE).alias("description"),
        F.array_join(conditions, "; ").alias("condition_keywords"),
        price_code.alias("price_currency"),
        _first(ctx, PRICE_CCY_RE, 2).cast("double").alias("price_amount"),
        _first(ctx, SERIES_RE).alias("series"),
    ]
    # U10 validation — process_book_enhanced.py:41-51: title required,
    # ISBN-10 strips to 10 chars, ISBN-13 to 13; types enforced by schema
    valid = (
        title.isNotNull()
        & (strip(isbn10).isNull() | (F.length(strip(isbn10)) == 10))
        & (strip(isbn13).isNull() | (F.length(strip(isbn13)) == 13))
        & (page_count.isNull() | (page_count > 0))
    )
    cols.append(valid.alias("valid"))
    return cols


# --------------------------------------------------------------------------
# deterministic listing synthesis (drives the oracle check + golden tests)
# --------------------------------------------------------------------------


def synth_listing_col(doc_id: Column, text: Column) -> Column:
    """Deterministic book-listing payload from (doc_id, text): every field
    class appears for a known residue class of doc_id, so the extractor is
    exercised on real material. Mirrored exactly by synth_listing_sql()."""
    d = doc_id.cast("long")
    title = F.concat(F.lit("Doc "), d.cast("string"), F.lit(" Chronicles"))
    title = F.when(
        d % 4 == 1, F.concat(title, F.lit(": A Subtitle Study"))
    ).otherwise(title)
    authors = (
        F.when(d % 3 == 0, F.lit("by John Smith"))
        .when(d % 3 == 1, F.lit("by Jane Doe and by Alan Turing"))
        .otherwise(F.lit(None).cast("string"))
    )
    publisher = (
        F.when(d % 5 < 2, F.lit("Pelican Press"))
        .when(d % 5 == 2, F.lit("published by penguin"))
        .otherwise(F.lit(None).cast("string"))
    )
    year = F.concat(F.lit("© "), (F.lit(1950) + d % 70).cast("string"))
    isbn = (
        F.when(
            d % 7 == 0,
            F.concat(
                F.lit("ISBN: 978-0-"),
                F.lpad((d % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad((d % 100000).cast("string"), 5, "0"),
                F.lit("-"),
                (d % 10).cast("string"),
            ),
        )
        .when(
            d % 7 == 1,
            F.concat(
                F.lit("ISBN: 0-306-"),
                F.lpad((d % 100000).cast("string"), 5, "0"),
                F.lit("-"),
                (d % 10).cast("string"),
            ),
        )
        .otherwise(F.lit(None).cast("string"))
    )
    extras = F.concat_ws(
        " ",
        F.when(d % 4 == 2, F.lit("3rd edition")),
        F.when(d % 11 != 0, F.when(d % 2 == 0, F.lit("Hardcover")).otherwise(F.lit("Paperback"))),
        F.when(d % 13 == 0, F.lit("French")).otherwise(F.lit("English")),
        F.when(d % 17 == 0, F.lit("The Foundation series")),
        F.when(d % 19 == 0, F.concat(F.lit("ASIN B"), F.lpad((d % 1000000000).cast("string"), 9, "0"))),
    )
    pages = F.when(
        d % 6 != 0, F.concat((F.lit(100) + d % 400).cast("string"), F.lit(" pages"))
    )
    price = F.concat(
        F.lit("Price: "),
        F.when(d % 3 == 0, F.lit("$")).when(d % 3 == 1, F.lit("€")).otherwise(F.lit("£")),
        (F.lit(10) + d % 90).cast("string"),
        F.lit(".99"),
    )
    condition = F.concat(
        F.lit("Condition: "),
        F.element_at(
            F.lit(CONDITION_KEYWORDS), (d % len(CONDITION_KEYWORDS)).cast("int") + 1
        ),
    )
    genre = (
        F.when(d % 4 == 0, F.lit("a novel full of story"))
        .when(d % 4 == 1, F.lit("history of the war century"))
        .when(d % 4 == 2, F.lit("science physics notes"))
        .otherwise(F.lit("computer software data"))
    )
    description = F.concat(F.lit("Description: "), F.substring(text, 1, 80))
    return F.concat_ws(
        "\n",
        title, authors, publisher, year, isbn, extras, pages, price,
        condition, genre, description,
    )


def synth_listing_sql(doc_id: str = "doc_id", text: str = "text") -> str:
    """DuckDB expression mirroring synth_listing_col exactly."""
    d = doc_id
    conds = ", ".join(f"'{k}'" for k in CONDITION_KEYWORDS)
    return f"""concat_ws(chr(10),
  CASE WHEN {d} % 4 = 1
       THEN 'Doc ' || CAST({d} AS VARCHAR) || ' Chronicles: A Subtitle Study'
       ELSE 'Doc ' || CAST({d} AS VARCHAR) || ' Chronicles' END,
  CASE WHEN {d} % 3 = 0 THEN 'by John Smith'
       WHEN {d} % 3 = 1 THEN 'by Jane Doe and by Alan Turing' END,
  CASE WHEN {d} % 5 < 2 THEN 'Pelican Press'
       WHEN {d} % 5 = 2 THEN 'published by penguin' END,
  chr(169) || ' ' || CAST(1950 + {d} % 70 AS VARCHAR),
  CASE WHEN {d} % 7 = 0 THEN 'ISBN: 978-0-' || lpad(CAST({d} % 1000 AS VARCHAR), 3, '0')
            || '-' || lpad(CAST({d} % 100000 AS VARCHAR), 5, '0')
            || '-' || CAST({d} % 10 AS VARCHAR)
       WHEN {d} % 7 = 1 THEN 'ISBN: 0-306-' || lpad(CAST({d} % 100000 AS VARCHAR), 5, '0')
            || '-' || CAST({d} % 10 AS VARCHAR) END,
  concat_ws(' ',
    CASE WHEN {d} % 4 = 2 THEN '3rd edition' END,
    CASE WHEN {d} % 11 <> 0 THEN
      CASE WHEN {d} % 2 = 0 THEN 'Hardcover' ELSE 'Paperback' END END,
    CASE WHEN {d} % 13 = 0 THEN 'French' ELSE 'English' END,
    CASE WHEN {d} % 17 = 0 THEN 'The Foundation series' END,
    CASE WHEN {d} % 19 = 0 THEN 'ASIN B' || lpad(CAST({d} % 1000000000 AS VARCHAR), 9, '0') END),
  CASE WHEN {d} % 6 <> 0 THEN CAST(100 + {d} % 400 AS VARCHAR) || ' pages' END,
  'Price: ' || (CASE WHEN {d} % 3 = 0 THEN '$' WHEN {d} % 3 = 1 THEN chr(8364)
                     ELSE chr(163) END) || CAST(10 + {d} % 90 AS VARCHAR) || '.99',
  'Condition: ' || ([{conds}])[CAST({d} % {len(CONDITION_KEYWORDS)} AS INT) + 1],
  CASE WHEN {d} % 4 = 0 THEN 'a novel full of story'
       WHEN {d} % 4 = 1 THEN 'history of the war century'
       WHEN {d} % 4 = 2 THEN 'science physics notes'
       ELSE 'computer software data' END,
  'Description: ' || substr({text}, 1, 80))"""


def metadata_full_oracle_sql(table: str = "documents") -> str:
    """DuckDB query mirroring synth_listing_col + metadata_full_cols."""
    pub_fb = "CASE " + " ".join(
        f"WHEN regexp_matches(lower(ctx), '\\b{p.lower()}\\b') THEN '{p}'"
        for p in KNOWN_PUBLISHERS
    ) + " END"
    binding = "CASE " + " ".join(
        f"WHEN contains(lower(ctx), '{b}') THEN '{b}'" for b in BINDING_TYPES
    ) + " END"
    language = "CASE " + " ".join(
        f"WHEN contains(lower(ctx), '{la}') THEN '{la}'" for la in LANGUAGES
    ) + " END"
    cats = " || ".join(
        "(CASE WHEN "
        + " OR ".join(f"contains(lower(ctx), '{k}')" for k in kws)
        + f" THEN ['{g}'] ELSE [] END)"
        for g, kws in config.GENRE_KEYWORDS.items()
    )
    conds = " || ".join(
        f"(CASE WHEN contains(lower(ctx), '{k}') THEN ['{k}'] ELSE [] END)"
        for k in CONDITION_KEYWORDS
    )
    return f"""
WITH ctxd AS (
  SELECT doc_id, {synth_listing_sql()} AS ctx FROM {table}
), ex AS (
  SELECT doc_id, ctx,
    nullif(trim(regexp_extract(regexp_extract(ctx, '^([^\\n]*)', 1), '^([^:]*)', 1)), '') AS title,
    nullif(trim(regexp_extract(regexp_extract(ctx, '^([^\\n]*)', 1), '^[^:]*:(.*)$', 1)), '') AS subtitle,
    nullif(regexp_replace(regexp_extract(ctx, '{config.ISBN13_RE}', 1), '[- ]', '', 'g'), '') AS isbn_13,
    nullif(regexp_replace(regexp_extract(ctx, '{config.ISBN10_RE}', 1), '[- ]', '', 'g'), '') AS isbn_10_raw,
    nullif(regexp_extract(ctx, '{PAGES_RE}', 1), '') AS pages_str,
    nullif(regexp_extract(ctx, '{PRICE_CCY_RE}', 1), '') AS ccy_sym,
    nullif(regexp_extract(ctx, '{PRICE_CCY_RE}', 2), '') AS amt_str
  FROM ctxd
)
SELECT doc_id,
  title,
  subtitle,
  coalesce(array_to_string(
    list_filter(regexp_extract_all(ctx, '{AUTHOR_RE}', 1),
                (x, i) -> list_position(regexp_extract_all(ctx, '{AUTHOR_RE}', 1), x) = i),
    '; '), '') AS authors,
  coalesce(nullif(regexp_extract(ctx, '{config.PUBLISHER_RE}', 1), ''), {pub_fb}) AS publisher,
  nullif(regexp_extract(ctx, '{config.YEAR_RE}', 1), '') AS year,
  isbn_13,
  CASE WHEN isbn_13 IS NULL THEN isbn_10_raw END AS isbn_10,
  nullif(regexp_extract(ctx, '{ASIN_RE}', 1), '') AS asin,
  nullif(regexp_extract(ctx, '{EDITION_RE}', 1), '') AS edition,
  {binding} AS binding_type,
  {language} AS language,
  CAST(pages_str AS INT) AS page_count,
  coalesce(array_to_string({cats}, '; '), '') AS categories,
  nullif(regexp_extract(ctx, '{DESCRIPTION_RE}', 1), '') AS description,
  coalesce(array_to_string({conds}, '; '), '') AS condition_keywords,
  CASE WHEN ccy_sym = '$' THEN 'USD' WHEN ccy_sym = chr(8364) THEN 'EUR'
       WHEN ccy_sym = chr(163) THEN 'GBP' END AS price_currency,
  CAST(amt_str AS DOUBLE) AS price_amount,
  nullif(regexp_extract(ctx, '{SERIES_RE}', 1), '') AS series,
  (title IS NOT NULL
   AND (CASE WHEN isbn_13 IS NULL THEN isbn_10_raw END IS NULL
        OR length(CASE WHEN isbn_13 IS NULL THEN isbn_10_raw END) = 10)
   AND (isbn_13 IS NULL OR length(isbn_13) = 13)
   AND (CAST(pages_str AS INT) IS NULL OR CAST(pages_str AS INT) > 0)) AS valid
FROM ex
"""
