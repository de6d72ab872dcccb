"""Text-quality predicates & scoring — reference parity + training-data
pipeline ops.

Reference predicates re-expressed as pure Column expressions (no UDFs,
whole-stage codegen; Catalyst fuses the conjuncts exactly like the
reference's hand-fused single-pass loop, /root/reference/src/chunk.rs:70-89):

* is_valid_chunk   — /root/reference/src/chunk.rs:64-126 (P1)
* looks_like_code  — /root/reference/src/chunk.rs:119-126 (P2)
* is_garbage       — /root/reference/src/chunk.rs:512-518 (P3)
* is_header_like   — /root/reference/src/chunk.rs:345-380 (P4, approximated:
                     same three branch shapes, pinned thresholds)

Training-data additions (not in the reference, required for the
100 TB pipeline): language ID (stopword-ratio heuristic), quality
score, token counting, md5 document fingerprinting.

Every function here has a byte-identical DuckDB SQL twin in
registry.py — expressions are deliberately restricted to constructs
both engines evaluate identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from semantic_pdf_search_engine_spark.functions.tokenize import tokens_expr

# pinned constants (reference values where they exist)
MIN_CHARS = 50  # chunk.rs:66
MIN_WORDS = 8  # chunk.rs:{67-72}
MIN_ALPHA_RATIO = 0.5  # chunk.rs:{74-80}
MAX_ELLIPSES = 2  # chunk.rs:{101-106}
CODE_INDICATORS = ["{", "}", "function", "var ", "const ", "let ", "=>", "//"]
CODE_THRESHOLD = 3  # chunk.rs:119-126
ARTIFACT_WORDS = ["foreword", "appendix", "index", "references"]  # chunk.rs:{90-99}

STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "this", "that",
]


def alpha_ratio(text: Column) -> Column:
    """letters / total chars (0.0 for empty)."""
    total = F.length(text)
    letters = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    return F.when(total > 0, letters.cast("double") / total).otherwise(F.lit(0.0))


def word_count(text: Column) -> Column:
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, "\\s+")))


def ellipsis_count(text: Column) -> Column:
    return (F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))) / 3


def code_indicator_count(text: Column) -> Column:
    out = F.lit(0)
    for ind in CODE_INDICATORS:
        out = out + F.contains(text, F.lit(ind)).cast("int")
    return out


def looks_like_code(text: Column) -> Column:
    return code_indicator_count(text) >= CODE_THRESHOLD


def is_garbage(text: Column) -> Column:
    """>10 dots ∧ <5 letters ∧ >0 digits (chunk.rs:512-518)."""
    dots = F.length(text) - F.length(F.replace(text, F.lit("."), F.lit("")))
    letters = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    digits = F.length(F.regexp_replace(text, "[^0-9]", ""))
    return (dots > 10) & (letters < 5) & (digits > 0)


def is_header_like(text: Column) -> Column:
    t = F.trim(text)
    wc = word_count(t)
    starts_digit = t.rlike("^[0-9]")
    all_caps = (F.upper(t) == t) & t.rlike("[A-Z]")
    digit_colon = t.rlike("^[0-9][^\\n]*:")
    return (F.length(t) <= 100) & (
        (starts_digit & (wc <= 6)) | (all_caps & (wc <= 5)) | (digit_colon & (wc <= 8))
    )


def has_complete_sentence(text: Column) -> Column:
    """F5 (/root/reference/src/chunk.rs:214-223): at least one sentence
    ender (". ", "? ", "! " or trailing ./?/!) AND an uppercase first
    char. Pinned to ASCII [A-Z] (the reference's char::is_uppercase is
    unicode; the corpus is ASCII) for an exact SQL twin."""
    enders = (
        F.contains(text, F.lit(". "))
        | text.endswith(".")
        | F.contains(text, F.lit("? "))
        | text.endswith("?")
        | F.contains(text, F.lit("! "))
        | text.endswith("!")
    )
    return enders & F.substring(text, 1, 1).rlike("[A-Z]")


# P5 line-level header-removal regexes (/root/reference/src/chunk.rs:304-342);
# applied to the TRIMMED line, so the reference's leading ^[\s]* is moot.
SECTION_NUMBER_RE = r"^(\d+\.)+\d*\s*[A-Z]"  # "3.1 Introduction", "3.1.2 Details"
CHAPTER_RE = r"^(Chapter|Section|Part|Appendix)\s+(\d+|[A-Z])"
SIMPLE_HEADER_RE = r"^\d+\.\s*[A-Z][a-z]+"  # "3. Introduction"


def is_section_header_line(line: Column) -> Column:
    """One line is a section header: any of the three reference regexes
    or the is_header_like heuristic (chunk.rs:327-333)."""
    t = F.trim(line)
    return (
        t.rlike(SECTION_NUMBER_RE)
        | t.rlike(CHAPTER_RE)
        | t.rlike(SIMPLE_HEADER_RE)
        | is_header_like(line)
    )


def remove_section_headers(text: Column) -> Column:
    """P5 (/root/reference/src/chunk.rs:304-342): drop empty and
    header lines, keep the rest VERBATIM (original, untrimmed), joined
    by newline. Pure Column expr — array functions under codegen."""
    lines = F.split(text, "\n")
    kept = F.filter(
        lines, lambda l: (F.length(F.trim(l)) > 0) & ~is_section_header_line(l)
    )
    return F.array_join(kept, "\n")


def is_valid_chunk(text: Column) -> Column:
    t = F.trim(text)
    return (
        (F.length(t) >= MIN_CHARS)
        & (word_count(t) >= MIN_WORDS)
        & (alpha_ratio(t) >= MIN_ALPHA_RATIO)
        & ~F.lower(t).isin(ARTIFACT_WORDS)
        & (ellipsis_count(t) <= MAX_ELLIPSES)
        & ~looks_like_code(t)
    )


def stopword_ratio(text: Column, toks: Column | None = None) -> Column:
    """`toks` (optional): a PRECOMPUTED tokens_expr(text) column — pass
    it when the caller has already projected the token array so the
    tokenization is not re-evaluated per consumer (higher-order
    functions are CodegenFallback: repeated evaluation is interpreted,
    per row)."""
    toks = tokens_expr(text) if toks is None else toks
    n = F.size(toks)
    stops = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS)))
    return F.when(n > 0, stops.cast("double") / n).otherwise(F.lit(0.0))


def lang_id(text: Column, sr: Column | None = None) -> Column:
    """n-gram-free heuristic: English stopword density ≥ 5% → 'en'.
    `sr`: optional precomputed stopword_ratio column (same contract as
    stopword_ratio's `toks`)."""
    sr = stopword_ratio(text) if sr is None else sr
    return F.when(sr >= 0.05, F.lit("en")).otherwise(F.lit("und"))


def quality_score(
    text: Column,
    toks: Column | None = None,
    alpha: Column | None = None,
    sr: Column | None = None,
) -> Column:
    """Composite [0,1]: length component + alphabetic density +
    stopword naturalness. Pinned formula (identical SQL twin).

    Rounding is ARITHMETIC half-up — floor(x·1e6 + 0.5)/1e6 — on both
    sides instead of engine ROUND(): a corpus value landing one ulp
    under a .5 decimal boundary (observed at sf0.1: 0.5365624999…)
    makes Spark/numpy ROUND down while DuckDB rounds up; the explicit
    floor form evaluates the same IEEE ops on the same double in both
    engines, so the twin can never split on a tie.

    `toks`/`alpha`/`sr`: optional precomputed columns (tokens_expr /
    alpha_ratio / stopword_ratio of the same text) — pass them when the
    caller has projected them once for several consumers; the arithmetic
    is identical either way."""
    toks = tokens_expr(text) if toks is None else toks
    dl = F.size(toks).cast("double")
    alpha = alpha_ratio(text) if alpha is None else alpha
    sr = stopword_ratio(text, toks) if sr is None else sr
    raw = (
        F.least(F.lit(1.0), dl / F.lit(100.0)) * F.lit(0.5)
        + alpha * F.lit(0.3)
        + F.least(sr * F.lit(4.0), F.lit(1.0)) * F.lit(0.2)
    )
    return F.floor(raw * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def fingerprint(text: Column) -> Column:
    """md5 content fingerprint (exact-dup key)."""
    return F.md5(text.cast("binary"))


# --- corpus-cleaning additions (round 3) -----------------------------------

# Deliberately simple, engine-portable patterns: no lookarounds, so
# Java regex (Spark) and RE2 (DuckDB) agree byte-for-byte.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONG_NUM_RE = r"[0-9][0-9 ()\-]{5,}[0-9]"


def dedup_lines(text: Column) -> Column:
    """Remove REPEATED lines within a document, keeping each line's
    first occurrence in order — the standard intra-document boilerplate
    cut (repeated headers/footers/navigation chrome). Spark's
    `array_distinct` preserves first-occurrence order; DuckDB's
    `list_distinct` does NOT (hash order), so the oracle twin keeps
    index i iff list_position(L, L[i]) = i — the explicit
    order-preserving formulation. Pure Column expr."""
    return F.array_join(
        F.array_distinct(F.split(F.coalesce(text, F.lit("")), "\n")), "\n"
    )


def redact_pii(text: Column) -> Column:
    """Mask obvious PII lexemes: email addresses → <EMAIL>, long
    digit/phone-shaped runs (≥7 chars of digits, spaces, parens,
    dashes, digit-delimited) → <NUM>. Pattern-based scrubbing is the
    cheap first pass a corpus pipeline runs before model-based PII
    removal; patterns are RE2-safe so the DuckDB oracle matches
    byte-for-byte. Email masking runs FIRST (emails may contain
    digits)."""
    t = F.coalesce(text, F.lit(""))
    t = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(t, LONG_NUM_RE, "<NUM>")


def quality_verdict(
    text: Column,
    min_words: int = 10,
    min_alpha: float = 0.5,
    min_quality: float = 0.3,
    toks: Column | None = None,
    alpha: Column | None = None,
    sr: Column | None = None,
) -> Column:
    """First-failing-rule verdict for the corpus-filter pass: the
    composed keep/drop DECISION downstream of the individual quality
    signals (the filtering analog of dedup_clusters' role for pair
    generators). Pinned rule ORDER — too_short, garbage, low_alpha,
    low_quality, pass — so the reason a doc is dropped is
    deterministic, auditable, and countable per rule. All comparisons
    are over already-pinned expressions (ints; quality_score's
    arithmetic-rounded double; alpha_ratio's identical-IEEE-ops
    double), so the SQL twin can never tie-split."""
    alpha = alpha_ratio(text) if alpha is None else alpha
    return (
        F.when(word_count(text) < min_words, F.lit("too_short"))
        .when(is_garbage(text), F.lit("garbage"))
        .when(alpha < min_alpha, F.lit("low_alpha"))
        .when(
            quality_score(text, toks=toks, alpha=alpha, sr=sr) < min_quality,
            F.lit("low_quality"),
        )
        .otherwise(F.lit("pass"))
    )
