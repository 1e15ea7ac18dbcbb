"""Frozen single-node oracle extractor (plain Python).

Defines the golden span sequences the Spark pipeline must match under
span-sequence equality (kind, text, media_ref, order) — the analog of the
reference's golden accepted-JSON fixtures
(reference pipeline_demo/i2j_ui/data/accepted/example_1a.json etc., and the
validation pass at pipeline_demo/extractor/batch_processor_enhanced.py:95-105).

Implements EXACTLY the rules in config.py; any rule change must land in both
this file and operators/extract.py, enforced by tests/test_extract_golden.py.
"""

from __future__ import annotations

import re

from . import config

_LINK_TOKEN = re.compile(config.LINK_TOKEN_RE)
_TOKEN_SPLIT = re.compile(config.TOKEN_SPLIT_RE)
_WS_SQUEEZE = re.compile(config.WS_SQUEEZE_RE)
_ALNUM = re.compile(r"[a-zA-Z0-9]")
_NONWS = re.compile(r"[^ \t\n\r]")


def is_boilerplate_text(text: str) -> bool:
    """Link-density + alnum-density main-content classifier (frozen rule)."""
    tokens = [t for t in _TOKEN_SPLIT.split(text.strip(_ASCII_WS)) if t]
    if not tokens:
        return True
    link = sum(1 for t in tokens if _LINK_TOKEN.match(t))
    if link / len(tokens) > config.LINK_DENSITY_MAX:
        return True
    nonws = len(_NONWS.findall(text))
    alnum = len(_ALNUM.findall(text))
    return nonws == 0 or alnum / nonws < config.ALNUM_DENSITY_MIN


_ASCII_WS = " \t\n\r"


def normalize_text(text: str) -> str:
    # strip is pinned to ASCII whitespace: Python str.strip() is
    # unicode-aware while Spark's trim() strips only 0x20 — both sides use
    # the explicit ASCII set (fuzz-caught divergence on '\t\n')
    return _WS_SQUEEZE.sub(" ", text.strip(_ASCII_WS))


def extract_doc(spans: list[dict]) -> list[tuple[str, str | None, str | None]]:
    """Ordered kept spans: [(kind, text, media_ref)] — the golden sequence."""
    out = []
    for s in sorted(spans, key=lambda s: s["offset"]):
        kind = s["kind"]
        if kind == "media":
            out.append(("media", None, s["media_ref"]))
        elif kind == "text":
            t = s.get("text")
            if t is None or not t.strip(_ASCII_WS):
                continue
            if is_boilerplate_text(t):
                continue
            out.append(("text", normalize_text(t), None))
        # kind == 'boilerplate' → dropped
    return out


def context_text(spans: list[dict]) -> str:
    """Metadata-extraction context: kept text spans, length-capped, joined.

    Mirrors the reference's page-text assembly + per-image OCR length cap
    (enhanced_extractor.py:520-521, 690-705): spans longer than
    MAX_CONTEXT_CHARS_PER_SPAN are dropped from the context (not truncated).
    """
    parts = [
        t
        for k, t, _ in extract_doc(spans)
        if k == "text" and len(t) <= config.MAX_CONTEXT_CHARS_PER_SPAN
    ]
    return " ".join(parts)


_ISBN13 = re.compile(config.ISBN13_RE)
_ISBN10 = re.compile(config.ISBN10_RE)
_YEAR = re.compile(config.YEAR_RE)
_PUBLISHER = re.compile(config.PUBLISHER_RE)
_PRICE = re.compile(config.PRICE_RE)


def extract_metadata(spans: list[dict]) -> dict:
    """Heuristic deterministic metadata extractor — oracle for U9.

    First-match-wins regex families (reference
    hueristics/book_extractor.py:76-113) + genre keyword argmax
    (book_extractor.py:149-178, ties broken by fixed genre order).
    """
    ctx = context_text(spans)
    ordered = extract_doc(spans)
    title = next((t for k, t, _ in ordered if k == "text"), None)

    def first(rx):
        m = rx.search(ctx)
        return m.group(1) if m else None

    isbn13 = first(_ISBN13)
    isbn10 = None if isbn13 else first(_ISBN10)
    year = first(_YEAR)
    publisher = first(_PUBLISHER)
    price = first(_PRICE)
    all_prices = _PRICE.findall(ctx)  # A9: last match = grand total
    last_price = all_prices[-1] if all_prices else None

    low = ctx.lower()
    genre, best = None, 0
    for g, kws in config.GENRE_KEYWORDS.items():
        c = sum(low.split().count(k) for k in kws)
        if c > best:
            genre, best = g, c
    return {
        "title": title,
        "isbn_13": isbn13.replace("-", "").replace(" ", "") if isbn13 else None,
        "isbn_10": isbn10.replace("-", "").replace(" ", "") if isbn10 else None,
        "year": year,
        "publisher": publisher,
        "price_amount": float(price) if price else None,
        "last_price_amount": float(last_price) if last_price else None,
        "genre": genre,
    }


# --------------------------------------------------------------------------
# full-schema metadata (U9 full field set) — python reference for
# functions/metadata_full.metadata_full_cols over the extraction pipeline
# --------------------------------------------------------------------------


def extract_metadata_full(spans: list[dict]) -> dict:
    """Frozen reference for extract_metadata_full_df: same regex/CASE
    rules as functions/metadata_full.py, over context_text(spans) with the
    title line = first kept text span."""
    from .functions import metadata_full as mf

    ctx = context_text(spans)
    low = ctx.lower()
    ordered = extract_doc(spans)
    first_line = next((t for k, t, _ in ordered if k == "text"), None)

    def first(pattern, s=None):
        m = re.search(pattern, ctx if s is None else s)
        return m.group(1) if m else None

    title = subtitle = None
    if first_line is not None:
        head, sep, tail = first_line.partition(":")
        title = head.strip() or None
        subtitle = (tail.strip() or None) if sep else None

    seen, authors = set(), []
    for a in re.findall(mf.AUTHOR_RE, ctx):
        if a not in seen:
            seen.add(a)
            authors.append(a)

    publisher = first(config.PUBLISHER_RE)
    if publisher is None:
        for name in mf.KNOWN_PUBLISHERS:
            if re.search(rf"\b{name.lower()}\b", low):
                publisher = name
                break

    isbn13 = first(config.ISBN13_RE)
    isbn10 = None if isbn13 else first(config.ISBN10_RE)

    def strip_isbn(v):
        return re.sub(r"[- ]", "", v) if v else None

    isbn13, isbn10 = strip_isbn(isbn13), strip_isbn(isbn10)

    def first_in(options):
        return next((o for o in options if o in low), None)

    pages = first(mf.PAGES_RE)
    page_count = int(pages) if pages else None
    categories = [
        g for g, kws in config.GENRE_KEYWORDS.items() if any(k in low for k in kws)
    ]
    conditions = [k for k in mf.CONDITION_KEYWORDS if k in low]
    m_price = re.search(mf.PRICE_CCY_RE, ctx)
    ccy = {"$": "USD", "€": "EUR", "£": "GBP"}.get(m_price.group(1)) if m_price else None
    amount = float(m_price.group(2)) if m_price else None
    valid = (
        title is not None
        and (isbn10 is None or len(isbn10) == 10)
        and (isbn13 is None or len(isbn13) == 13)
        and (page_count is None or page_count > 0)
    )
    return {
        "title": title,
        "subtitle": subtitle,
        "authors": "; ".join(authors),
        "publisher": publisher,
        "year": first(config.YEAR_RE),
        "isbn_13": isbn13,
        "isbn_10": isbn10,
        "asin": first(mf.ASIN_RE),
        "edition": first(mf.EDITION_RE),
        "binding_type": first_in(mf.BINDING_TYPES),
        "language": first_in(mf.LANGUAGES),
        "page_count": page_count,
        "categories": "; ".join(categories),
        "description": first(mf.DESCRIPTION_RE),
        "condition_keywords": "; ".join(conditions),
        "price_currency": ccy,
        "price_amount": amount,
        "series": first(mf.SERIES_RE),
        "valid": valid,
    }
