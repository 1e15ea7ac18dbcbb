"""Text-analysis functions for large-scale training-data pipelines.

All pure Spark SQL expressions (JVM-side, codegen-friendly): language-ID
(marker-word n-gram heuristic), quality scoring (length/punct/stopword
ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting (md5 + rolling 64-bit polynomial hash).

These extend the reference's text heuristics (genre keyword argmax at
hueristics/book_extractor.py:149-178, normalization at abebooks_html.py:8-11)
to the corpus-quality operations a 100 TB pretraining pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# marker stopwords per language (deterministic heuristic lang-ID; the kind
# of n-gram/stopword profile langid tools use, reduced to exact-match form
# so a SQL oracle can replicate it). 20 languages; shared function words
# (sv/da "og"/"det", es/pt "para") tie-break to the EARLIER entry —
# deterministic in both engines (argmax checks languages in declaration
# order). Space-separated scripts only; CJK/Thai (no word boundaries) are
# handled by the char-class fallback below.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "pour"],
    "es": ["el", "los", "las", "es", "una", "para", "por", "como"],
    "pt": ["não", "uma", "dos", "das", "em", "com", "mais", "já"],
    "it": ["il", "di", "che", "per", "con", "del", "della", "gli"],
    "nl": ["het", "een", "van", "niet", "zijn", "voor", "aan", "ook"],
    "sv": ["och", "att", "det", "som", "på", "är", "av", "för"],
    "da": ["og", "ikke", "jeg", "hvad", "hvor", "når", "være", "kan"],
    "no": ["og", "ikke", "det", "som", "på", "er", "av", "til"],
    "fi": ["ja", "on", "ei", "että", "mutta", "myös", "kun", "niin"],
    "pl": ["nie", "się", "jest", "jak", "ale", "czy", "dla", "tak"],
    "cs": ["je", "se", "na", "že", "ale", "jako", "pro", "tak"],
    "ro": ["și", "este", "nu", "cu", "din", "care", "mai", "sau"],
    "hu": ["és", "nem", "hogy", "egy", "van", "mint", "csak", "már"],
    "tr": ["bir", "ve", "bu", "için", "ile", "ama", "gibi", "daha"],
    "id": ["yang", "dan", "di", "untuk", "dengan", "tidak", "ini", "itu"],
    "vi": ["và", "của", "có", "không", "là", "này", "cho", "được"],
    "ru": ["и", "не", "на", "что", "это", "как", "его", "она"],
    "ar": ["في", "من", "على", "هذا", "أن", "إلى", "عن", "مع"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["it", "for", "on", "with", "as", "at"]

# char-class fallback for scripts where stopword matching cannot work
# (CJK/Thai have no word boundaries) or the marker table has no entry:
# dominant script by code-point count. Ranges are literal BMP characters
# so the same class works verbatim as a Java and RE2 character class.
SCRIPT_RANGES: dict[str, str] = {
    "cjk-han": "一-鿿",
    "cjk-kana": "぀-ヿ",
    "cjk-hangul": "가-힯",
    "cyrillic": "Ѐ-ӿ",
    "arabic": "؀-ۿ",
    "devanagari": "ऀ-ॿ",
    "greek": "Ͱ-Ͽ",
    "hebrew": "֐-׿",
    "thai": "฀-๿",
}


def tokens_col(text: Column) -> Column:
    """whitespace tokens of the lowercased text (no empties)."""
    return F.filter(
        F.split(F.lower(F.trim(text)), r"\s+"), lambda t: t != ""
    )


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text))


def bpe_ish_token_count_col(text: Column) -> Column:
    """GPT-2-style pre-tokenizer approximation: count matches of
    contraction | word | number | punct-run (public BPE split regex shape).
    """
    pat = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"
    # regexp_count: counting must not materialize the match strings
    return F.regexp_count(text, F.lit(pat))


def lang_scores_col(text: Column, toks: Column | None = None) -> Column:
    """array<struct<hits,neg_idx,lang>> of marker hits per language.

    Pass a pre-materialized token-array column as `toks` when calling
    from a wide projection: the tokenizer expression is otherwise
    re-inlined into every one of the 20 language branches (Catalyst does
    not CSE across HOF lambdas — the round-1 minhash trap, 25x there)."""
    if toks is None:
        toks = tokens_col(text)

    def hits(markers: list[str]) -> Column:
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    return F.array(
        *[
            F.struct(
                hits(m).alias("hits"),
                F.lit(-i).alias("neg_idx"),
                F.lit(lang).alias("lang"),
            )
            for i, (lang, m) in enumerate(LANG_MARKERS.items())
        ]
    )


def script_scores_col(text: Column) -> Column:
    """array<struct<hits,neg_idx,lang>> of code-point counts per script
    range (counting by REMOVING out-of-class chars: length is chars, not
    bytes, in both Spark and DuckDB)."""
    return F.array(
        *[
            F.struct(
                # regexp_count of the in-class single-char pattern ==
                # length after removing out-of-class chars, without the
                # per-doc string rewrite (see quality_cols)
                F.regexp_count(text, F.lit(f"[{rng}]")).alias(
                    "hits"
                ),
                F.lit(-i).alias("neg_idx"),
                F.lit(name).alias("lang"),
            )
            for i, (name, rng) in enumerate(SCRIPT_RANGES.items())
        ]
    )


def script_guess_col(text: Column) -> Column:
    """dominant script by char count; earliest range wins ties; NULL when
    no char of any tracked script appears."""
    best = F.array_max(script_scores_col(text))
    return F.when(best["hits"] > 0, best["lang"])


def lang_guess_col(text: Column, toks: Column | None = None) -> Column:
    """argmax language by marker hits (earliest wins ties); falls back to
    the dominant-script class when no marker matches (CJK/Thai have no
    word boundaries so stopword matching CANNOT fire for them); NULL when
    neither signal fires."""
    best = F.array_max(lang_scores_col(text, toks))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(
        script_guess_col(text)
    )


def quality_cols(text: Column, toks: Column | None = None) -> list[Column]:
    """Quality signals (Gopher/C4-style filters, exact-arithmetic form):
    n_chars, n_tokens, mean token length, alnum ratio, punct ratio,
    stopword ratio, and a composite keep/drop flag. Pass a
    pre-materialized token array as `toks` from wide projections (no CSE
    across HOF lambdas)."""
    if toks is None:
        toks = tokens_col(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    # count-in-class via regexp_count, not length(regexp_replace(
    # text, [^class], '')): identical value for single-char classes
    # (each match is one char) but the replace form allocates a rewritten
    # string per doc — measured 2.68 s vs 0.32 s for the alnum column
    # alone at sf1.0 (guide §1.2 per-task work)
    nonws = F.length(text) - F.regexp_count(text, F.lit(r"\s"))
    alnum = F.regexp_count(text, F.lit("[a-zA-Z0-9]"))
    punct = F.regexp_count(text, F.lit("[.,;:!?]"))
    stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS_EN)))
    mean_tok_len = F.round(
        F.when(n_tok > 0, nonws.cast("double") / n_tok).otherwise(F.lit(0.0)), 4
    )
    alnum_ratio = F.round(
        F.when(nonws > 0, alnum.cast("double") / nonws).otherwise(F.lit(0.0)), 4
    )
    punct_ratio = F.round(
        F.when(nonws > 0, punct.cast("double") / nonws).otherwise(F.lit(0.0)), 4
    )
    stop_ratio = F.round(
        F.when(n_tok > 0, stop.cast("double") / n_tok).otherwise(F.lit(0.0)), 4
    )
    keep = (
        (n_tok >= 5)
        & (mean_tok_len >= 2.0)
        & (mean_tok_len <= 12.0)
        & (alnum_ratio >= 0.6)
    )
    return [
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        mean_tok_len.alias("mean_tok_len"),
        alnum_ratio.alias("alnum_ratio"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        keep.alias("quality_keep"),
    ]


# Gopher rule constants (Rae et al. 2021, arXiv:2112.11446 Appendix A1.1)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_BULLETS = ["•", "-", "*"]


def gopher_quality_cols(text: Column, toks: Column | None = None) -> list[Column]:
    """The FULL Gopher document-quality rule set (Rae et al. 2021,
    Appendix A1.1) — the standard pretraining filter quality_cols only
    approximates. A doc is kept iff ALL of:

      1. word count in [50, 100000],
      2. mean word length in [3, 10] characters,
      3. symbol-to-word ratio ('#' and '...') <= 0.1,
      4. <= 90% of (non-blank) lines start with a bullet,
      5. <= 30% of lines end with an ellipsis,
      6. >= 80% of words contain an alphabetic character,
      7. at least 2 of Gopher's 8 stop words appear,
      8. duplicate-line fraction <= 0.30 (A1.2),
      9. duplicate-line CHARACTER fraction <= 0.20 (A1.2).

    Every threshold is evaluated in EXACT integer arithmetic (e.g.
    mean length >= 3  <=>  sum_len >= 3*n_words), so the keep decision
    is bit-identical in any engine; the emitted ratio columns are
    round-6 doubles for display only. Pure narrow expressions — zero
    shuffle, codegen-friendly, pushdown-safe.

    Pass a pre-materialized token array as `toks` from wide projections
    (no CSE across HOF lambdas)."""
    if toks is None:
        toks = tokens_col(text)
    n = F.size(toks)
    sum_len = F.coalesce(
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ),
        F.lit(0).cast("long"),
    )
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ell = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / 3
    n_sym = (n_hash + n_ell).cast("long")
    lines = F.filter(
        F.split(text, "\n"), lambda ln: F.trim(ln) != ""
    )
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(
            lines,
            lambda ln: F.substring(F.trim(ln), 1, 1).isin(*GOPHER_BULLETS),
        )
    )
    n_ell_end = F.size(
        F.filter(
            lines,
            lambda ln: F.trim(ln).endswith("...") | F.trim(ln).endswith("…"),
        )
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    n_stop = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(toks, s),
        )
    )
    # A1.2 repetition rules, line-level pair (duplicate-line fraction
    # > 0.30 or duplicate-line CHAR fraction > 0.20 -> drop); the
    # n-gram-family repetition rules are this repo's boilerplate_kgrams /
    # substring_dedup operators' territory. Same set semantics as
    # functions/scrub.py::repetition_cols, evaluated integer-exactly.
    dlines = F.array_distinct(lines)
    n_dup_lines = n_lines - F.size(dlines)
    line_chars = F.coalesce(
        F.aggregate(
            lines, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
        ),
        F.lit(0).cast("long"),
    )
    dup_chars = line_chars - F.coalesce(
        F.aggregate(
            dlines, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
        ),
        F.lit(0).cast("long"),
    )
    r6 = lambda num, den: F.round(  # noqa: E731
        F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0)), 6
    )
    keep = (
        (n >= GOPHER_MIN_WORDS)
        & (n <= GOPHER_MAX_WORDS)
        & (sum_len >= 3 * n)
        & (sum_len <= 10 * n)
        & (10 * n_sym <= n)
        & (10 * n_bullet <= 9 * n_lines)
        & (10 * n_ell_end <= 3 * n_lines)
        & (5 * n_alpha >= 4 * n)
        & (n_stop >= 2)
        & (10 * n_dup_lines <= 3 * n_lines)
        & (10 * dup_chars <= 2 * line_chars)
    )
    return [
        n.cast("long").alias("n_words"),
        r6(sum_len, n).alias("mean_word_len"),
        r6(n_sym, n).alias("symbol_ratio"),
        r6(n_bullet, n_lines).alias("bullet_line_frac"),
        r6(n_ell_end, n_lines).alias("ellipsis_line_frac"),
        r6(n_alpha, n).alias("alpha_word_frac"),
        n_stop.cast("long").alias("n_stopword_hits"),
        r6(n_dup_lines, n_lines).alias("dup_line_frac"),
        r6(dup_chars, line_chars).alias("dup_line_char_frac"),
        keep.alias("gopher_keep"),
    ]


def c4_clean_cols(text: Column) -> list[Column]:
    """The C4 line/page cleaning rules (Raffel et al. 2020, §2.2), the
    other canonical pretraining filter next to Gopher:

      line KEPT iff it ends in terminal punctuation ('.', '!', '?',
      '"'), has >= 5 whitespace words, and does not mention
      'javascript' (case-insensitive);
      page KEPT iff >= 3 lines survive, and the page contains neither
      'lorem ipsum' nor a '{' (code marker).

    (C4's cross-corpus three-sentence dedup is the separate
    paragraph_dedup operator; its bad-words list is policy data, not an
    algorithm, and is omitted.) Emits the TRANSFORM, not just a flag:
    text_c4 is the kept lines rejoined — plus kept/dropped counts and
    the page flag. Pure narrow expressions (nested HOF filter), exact
    string semantics shared with ANSI SQL (LIKE has no engine variance),
    zero shuffle."""
    lines = F.filter(
        F.split(text, "\n"), lambda ln: F.trim(ln) != ""
    )
    kept = F.filter(
        lines,
        lambda ln: (
            F.trim(ln).like("%.")
            | F.trim(ln).like("%!")
            | F.trim(ln).like("%?")
            | F.trim(ln).like('%"')
        )
        & (
            F.size(F.filter(F.split(F.trim(ln), r"\s+"), lambda w: w != ""))
            >= 5
        )
        & ~F.lower(ln).contains("javascript"),
    )
    n_all = F.size(lines)
    n_kept = F.size(kept)
    page_keep = (
        (n_kept >= 3)
        & ~F.lower(text).contains("lorem ipsum")
        & ~text.contains("{")
    )
    return [
        # explicit closure: F.trim has an optional 2nd param, and a bare
        # F.trim here would become trim(elem, index) (arity inference)
        F.array_join(F.transform(kept, lambda x: F.trim(x)), "\n").alias(
            "text_c4"
        ),
        n_kept.cast("long").alias("c4_lines_kept"),
        (n_all - n_kept).cast("long").alias("c4_lines_dropped"),
        page_keep.alias("c4_keep"),
    ]


def fingerprint_md5_col(text: Column) -> Column:
    """md5 of the whitespace-normalized lowercased text — the exact-dedup key."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


MERSENNE31 = (1 << 31) - 1


def rolling_hash_col(text: Column, base: int = 1000003) -> Column:
    """Polynomial rolling hash over tokens modulo 2^31-1 (order-sensitive
    document fingerprint). Operands stay bounded (acc < 2^31, base < 2^20,
    token hash < 2^31 ⇒ acc*base + h < 2^52) so the multiply-add never
    overflows int64 — ANSI-mode safe."""
    toks = tokens_col(text)
    h = lambda t: F.pmod(F.xxhash64(t), F.lit(1 << 31).cast("long"))  # noqa: E731
    return F.aggregate(
        toks,
        F.lit(5381).cast("long"),
        lambda acc, t: F.pmod(
            acc * F.lit(base).cast("long") + h(t), F.lit(MERSENNE31)
        ),
    )


def chunk_spec(n_tokens: Column, chunk: int, overlap: int) -> Column:
    """number of chunks for a doc of n_tokens under (chunk, overlap)
    windowing: starts advance by step = chunk - overlap; every token is
    covered; a doc that fits in one window yields exactly one chunk;
    empty docs yield one empty chunk (callers filter if unwanted)."""
    step = chunk - overlap
    return F.when(
        n_tokens <= chunk, F.lit(1)
    ).otherwise(
        F.ceil((n_tokens - F.lit(chunk)).cast("double") / step).cast("int")
        + 1
    )


def chunk_documents(
    df,
    chunk: int = 512,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """docs → one row per fixed-size token window (the chunking step of
    embedding/RAG/pretraining pipelines): (id_col, chunk_id, n_tokens,
    text_chunk), windows of `chunk` whitespace tokens advancing by
    chunk − overlap so consecutive chunks share `overlap` tokens.

    Narrow (zero shuffle): tokens materialize once per doc, the window
    list is a transform over sequence, and the explode is explode_outer
    + post-filter (the Generate-filter trap — a plain explode would
    re-inline the computed window array into an inferred filter)."""
    assert 0 <= overlap < chunk, "need 0 <= overlap < chunk"
    step = chunk - overlap
    base = df.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("_tk")
    ).select(
        id_col,
        "_tk",
        chunk_spec(F.size("_tk"), chunk, overlap).alias("_nc"),
    )
    windows = F.transform(
        F.sequence(F.lit(0), F.col("_nc") - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            F.slice(F.col("_tk"), i * step + 1, chunk).alias("_w"),
        ),
    )
    out = base.select(
        id_col, F.explode_outer(windows).alias("_c")
    ).filter(F.col("_c").isNotNull())
    return out.select(
        id_col,
        F.col("_c.chunk_id").alias("chunk_id"),
        F.size("_c._w").cast("long").alias("n_tokens"),
        F.array_join("_c._w", " ").alias("text_chunk"),
    )
