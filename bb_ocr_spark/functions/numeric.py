"""Locale-aware numeric + currency parsing (F3).

Reference: abebooks_html.py:19-45 `_to_float` — disambiguate thousand vs
decimal separators by the LAST of ','/'.' (e.g. "1.234,56" → 1234.56,
"1,234.56" → 1234.56, "12,50" → 12.50) — and :48-91 currency symbol/word →
ISO code. Pure expressions: regexp_replace chains + a literal map.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

CURRENCY_MAP = {
    "$": "USD",
    "US$": "USD",
    "€": "EUR",
    "£": "GBP",
    "¥": "JPY",
    "C$": "CAD",
    "A$": "AUD",
    "usd": "USD",
    "eur": "EUR",
    "gbp": "GBP",
    "dollar": "USD",
    "dollars": "USD",
    "euro": "EUR",
    "euros": "EUR",
    "pound": "GBP",
    "pounds": "GBP",
}


def parse_locale_number(raw: Column) -> Column:
    """string with mixed separators → DOUBLE (NULL if unparseable).

    Rule (reference semantics): keep digits and separators; the LAST of
    ','/'.' is the decimal point iff it is followed by 1-2 digits at the
    end; every other separator is a grouping mark."""
    s = F.regexp_replace(F.trim(raw), r"[^0-9.,-]", "")
    # decimal comma: ...,dd at end and no '.' after it
    dec_comma = s.rlike(r",\d{1,2}$") & ~s.rlike(r",\d{1,2}\.\d")
    # normalize: for decimal-comma, drop dots then comma→dot;
    # otherwise drop commas (grouping)
    norm = F.when(
        dec_comma,
        F.regexp_replace(F.regexp_replace(s, r"\.", ""), ",", "."),
    ).otherwise(F.regexp_replace(s, ",", ""))
    return norm.try_cast("double")


def py_parse_locale_number(raw: str) -> float | None:
    """Frozen Python reference for parse_locale_number (dual-implementation
    check, fuzz-tested in tests/test_fuzz.py)."""
    import re  # noqa: PLC0415

    s = re.sub(r"[^0-9.,-]", "", raw.strip())
    dec_comma = re.search(r",\d{1,2}$", s) and not re.search(r",\d{1,2}\.\d", s)
    norm = s.replace(".", "").replace(",", ".") if dec_comma else s.replace(",", "")
    try:
        return float(norm)
    except ValueError:
        return None


def py_currency_code(raw: str) -> str | None:
    """Frozen Python reference for currency_code."""
    import re  # noqa: PLC0415

    lowered = raw.strip().lower()
    ordered = sorted(
        CURRENCY_MAP.items(),
        key=lambda kv: (-len(kv[0]), list(CURRENCY_MAP).index(kv[0])),
    )
    for key, code in ordered:
        if key.isalpha():
            if re.search(rf"\b{key}\b", lowered):
                return code
        elif key in raw.strip():
            return code
    return None


def parse_locale_number_sql(raw: str) -> str:
    """DuckDB expression mirroring parse_locale_number exactly."""
    s = f"regexp_replace(trim({raw}), '[^0-9.,-]', '', 'g')"
    dec = (
        f"(regexp_matches({s}, ',[0-9]{{1,2}}$') "
        f"AND NOT regexp_matches({s}, ',[0-9]{{1,2}}\\.[0-9]'))"
    )
    return (
        f"TRY_CAST(CASE WHEN {dec} "
        f"THEN replace(regexp_replace({s}, '\\.', '', 'g'), ',', '.') "
        f"ELSE regexp_replace({s}, ',', '', 'g') END AS DOUBLE)"
    )


def currency_code_sql(raw: str) -> str:
    """DuckDB expression mirroring currency_code: same priority order
    (longest symbol first, then map order), symbols by contains on the
    trimmed raw, words by word-boundary match on the lowercase."""
    ordered = sorted(
        CURRENCY_MAP.items(),
        key=lambda kv: (-len(kv[0]), list(CURRENCY_MAP).index(kv[0])),
    )
    whens = []
    for key, code in ordered:
        if key.isalpha():
            cond = f"regexp_matches(lower(trim({raw})), '\\b{key}\\b')"
        else:
            esc = key.replace("'", "''")
            cond = f"contains(trim({raw}), '{esc}')"
        whens.append(f"WHEN {cond} THEN '{code}'")
    return "CASE " + " ".join(whens) + " END"


def currency_code(raw: Column) -> Column:
    """symbol/word → ISO code (NULL if unknown). First match in the raw
    string wins; symbols checked before words."""
    lowered = F.lower(F.trim(raw))
    expr = F.lit(None).cast("string")
    # longest symbol first ('C$' before '$'), then map order; reversed
    # when-chain so higher-priority entries end up outermost
    ordered = sorted(
        CURRENCY_MAP.items(), key=lambda kv: (-len(kv[0]), list(CURRENCY_MAP).index(kv[0]))
    )
    for key, code in reversed(ordered):
        if key.isalpha():
            cond = lowered.rlike(rf"\b{key}\b")
        else:
            cond = F.trim(raw).contains(key)
        expr = F.when(cond, F.lit(code)).otherwise(expr)
    return expr
