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
