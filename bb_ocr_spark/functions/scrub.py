"""Corpus scrubbing for training-data pipelines: PII masking,
repetition/boilerplate metrics (Gopher-style), URL canonicalization.

All pure Spark SQL expressions (JVM-side, narrow, zero shuffle) so they
compose into the curation scan pass for free. Every pattern is written in
the regex subset Java and RE2 share (no backrefs/lookaround), so DuckDB
oracles replay them byte-for-byte.

Reference anchor: the reference normalizes/sanitizes scraped text ad hoc
(abebooks_html.py:8-11 whitespace squeeze, enhanced_extractor.py price/id
regexes); these functions are the corpus-scale generalization a 100 TB
pretraining pipeline needs before text is train-ready.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# RE2- and Java-compatible PII patterns. Masking order matters (emails
# contain dots like IPs, phones are digit runs): email → ipv4 → phone →
# long digit run; both engines must apply the same chain.
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\+?\d{1,3}[ \-]\(?\d{2,4}\)?[ \-]\d{3}[ \-]?\d{2,4}\b"
LONG_DIGITS_RE = r"\b\d{13,19}\b"  # credit-card/account-shaped runs

PII_CHAIN: list[tuple[str, str, str]] = [
    ("emails", EMAIL_RE, "<EMAIL>"),
    ("ips", IPV4_RE, "<IP>"),
    ("phones", PHONE_RE, "<PHONE>"),
    ("ids", LONG_DIGITS_RE, "<ID>"),
]


def pii_count_cols(text: Column) -> list[Column]:
    """n_<kind> counts, measured DURING the masking chain, in chain order —
    each pattern counted on the text with the previous masks applied,
    exactly as the scrubber sees it (an email's digits must not also count
    as a phone)."""
    cols = []
    cur = text
    for name, pat, repl in PII_CHAIN:
        cols.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return cols


def pii_scrub_col(text: Column) -> Column:
    """text with every PII match replaced by its typed placeholder."""
    cur = text
    for _, pat, repl in PII_CHAIN:
        cur = F.regexp_replace(cur, pat, repl)
    return cur


def _nonblank_lines(text: Column, sep: str) -> Column:
    # explicit 1-arg lambda: transform infers arity from the callable's
    # signature, and F.trim has an optional second param — passing F.trim
    # directly becomes two-parameter trim(element, index)
    return F.filter(
        F.transform(F.split(text, sep), lambda x: F.trim(x)), lambda x: x != ""
    )


def repetition_cols(text: Column, line_sep: str = "\n") -> list[Column]:
    """Gopher-style repetition signals, per document, expression-only:

      n_lines              non-blank (trimmed) lines
      dup_line_frac        fraction of lines that are repeats of an
                           earlier line (1 - distinct/total)
      dup_line_char_frac   fraction of line CHARACTERS inside those
                           repeats (Gopher's duplicate-line-chars rule —
                           catches a short doc whose one long line repeats)

    Set semantics only (array_distinct / per-line length sums), so the
    DuckDB oracle replays it with list_distinct even though that function
    does not preserve order. Empty docs → 0.0, not null."""
    lines = _nonblank_lines(text, line_sep)
    n = F.size(lines)
    distinct = F.array_distinct(lines)
    chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    chars_distinct = F.aggregate(
        distinct, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    return [
        n.cast("long").alias("n_lines"),
        F.when(n > 0, F.round((n - F.size(distinct)).cast("double") / n, 6))
        .otherwise(F.lit(0.0))
        .alias("dup_line_frac"),
        F.when(
            chars > 0,
            F.round((chars - chars_distinct).cast("double") / chars, 6),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_line_char_frac"),
    ]


# --------------------------------------------------------------------------
# URL canonicalization
# --------------------------------------------------------------------------

_HOST_RE = r"^(?:[A-Za-z][A-Za-z0-9+.\-]*://)?(?:[^/@]*@)?(?:www\.)?([^/:?#]+)"

# Tracking-param strip must be anchored at a param boundary ('?' or '&'):
# unanchored, '?xutm_source=1' would be mangled to '?x'. Written as a run
# of whole tracking params each consuming its trailing '&' (or end of
# string), applied twice with a LITERAL '?' / '&' prefix + replacement —
# backref-free so the DuckDB oracle replays it without engine-specific
# group-reference syntax ($1 vs \1).
_TRACK_RUN = r"(?:(?:utm_[A-Za-z_]+|fbclid|gclid)=[^&#]*(?:&|$))+"


def canonical_host_col(url: Column) -> Column:
    """lowercased registrable host: scheme, userinfo, leading www., port,
    path, query, and fragment stripped. Lowercases BEFORE extracting so
    'WWW.'/'HTTPS://' normalize too. Empty/unparseable → null."""
    h = F.regexp_extract(F.lower(F.trim(url)), _HOST_RE, 1)
    return F.when(h != "", h)


def canonical_url_col(url: Column) -> Column:
    """normalization for URL-level dedup: lowercase scheme+host, strip
    fragment, strip utm_*/fbclid/gclid tracking params (then a dangling
    '?'/'&'), strip one trailing slash. Pure regexp chain — replayable."""
    u = F.trim(url)
    # lowercase scheme://host prefix only (path stays case-sensitive)
    u = F.concat(
        F.lower(F.regexp_extract(u, r"^([^/]*//[^/]*)", 1)),
        F.regexp_replace(u, r"^[^/]*//[^/]*", ""),
    )
    u = F.regexp_replace(u, r"#.*$", "")
    u = F.regexp_replace(u, r"\?" + _TRACK_RUN, "?")
    u = F.regexp_replace(u, "&" + _TRACK_RUN, "&")
    u = F.regexp_replace(u, r"[?&]$", "")
    u = F.regexp_replace(u, r"/$", "")
    return u
