"""Full-schema metadata extraction (U9/U10) + offer-HTML parsing (S6):
edge cases beyond the synthesized-listing oracle corpus — invalid ISBNs,
missing titles, duplicate authors, every binding type, ad-row rejection.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bb_ocr_spark.functions.metadata_full import metadata_full_cols
from bb_ocr_spark.operators.offers_html import filter_year_match, parse_offer_rows


def _extract(spark, texts):
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "id string, ctx string"
    )
    rows = df.select("id", *metadata_full_cols(F.col("ctx"))).collect()
    return {r["id"]: r for r in rows}


def test_full_schema_fields(spark):
    out = _extract(
        spark,
        [
            # 0: everything present
            "War Stories: A Memoir\nby John Smith and by John Smith\n"
            "Tor Books © 1999\nISBN: 978-0-306-40615-7\n"
            "2nd Edition Mass Market french\nThe Dune series\n350 pages\n"
            "€12.50 like new very good\nDescription: a war novel",
            # 1: no title line (leading colon), invalid ISBN-10 length
            ": only subtitle\nISBN: 12-345-678-9",
            # 2: known-publisher fallback + bare minimum
            "Plain Title\npublished by HarperCollins",
        ],
    )
    r = out["0"]
    assert r["title"] == "War Stories"
    assert r["subtitle"] == "A Memoir"
    assert r["authors"] == "John Smith"  # duplicates collapsed
    assert r["publisher"] == "Tor Books Publishing" or r["publisher"] == "Tor Books"
    assert r["year"] == "1999"
    assert r["isbn_13"] == "9780306406157"
    assert r["isbn_10"] is None  # suppressed when isbn_13 present
    assert r["edition"] == "2nd Edition"
    assert r["binding_type"] == "mass market"
    assert r["language"] == "french"
    assert r["page_count"] == 350
    assert r["categories"] == "fiction; history"  # novel+story / war
    assert r["description"] == "a war novel"
    assert r["condition_keywords"] == "like new; very good; good"
    assert r["price_currency"] == "EUR" and r["price_amount"] == 12.50
    assert r["series"] == "Dune"
    assert bool(r["valid"]) is True

    r1 = out["1"]
    assert r1["title"] is None
    # the loose ISBN-10 pattern grabs a partial run; it strips to != 10
    # chars, which is exactly what validation must reject
    assert r1["isbn_10"] is not None and len(r1["isbn_10"]) != 10
    assert bool(r1["valid"]) is False

    r2 = out["2"]
    assert r2["publisher"] == "HarperCollins"
    assert r2["authors"] == "" and r2["categories"] == ""
    assert bool(r2["valid"]) is True


def test_parse_offer_rows_selector(spark):
    html = (
        '<tr class="ad"><td class="price">$999.99</td></tr>'
        '<tr class="offer"><td class="title"><a href="https://x/a">A</a></td>'
        '<td class="price">€1.234,56</td><td class="year">1987</td></tr>'
        '<tr class="offer"><td class="title"><a href="https://x/b">B</a></td>'
        '<td class="price">12,50</td><td class="year">1988</td></tr>'
        '<tr class="offer"><td class="title"><a href="https://x/c">C</a></td>'
        "<td></td></tr>"
    )
    df = spark.createDataFrame([("d1", html), ("d2", "<div>nothing</div>")],
                               "doc_id string, html string")
    out = parse_offer_rows(df).collect()
    by_pos = {(r["doc_id"], r["pos"]): r for r in out}
    assert len(out) == 3  # ad row and offer-less doc ignored
    a = by_pos[("d1", 0)]
    assert (a["title"], a["url"], a["amount"], a["currency"], a["year"]) == (
        "A", "https://x/a", 1234.56, "EUR", "1987"
    )
    b = by_pos[("d1", 1)]
    assert b["amount"] == 12.50 and b["currency"] is None
    c = by_pos[("d1", 2)]
    assert c["title"] == "C" and c["amount"] is None and c["year"] is None

    matched = filter_year_match(parse_offer_rows(df), F.lit("1987")).collect()
    assert [(r["doc_id"], r["pos"]) for r in matched] == [("d1", 0)]
