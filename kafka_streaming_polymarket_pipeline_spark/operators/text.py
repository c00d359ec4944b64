"""Text-analysis operators for large-scale training-data pipelines.

Column-level builders (pure ``pyspark.sql.functions`` — JVM-side,
whole-stage-codegen, zero Python UDFs) for:

- tokenization + token statistics
- language identification (stopword-vote n-gram heuristic)
- quality scoring (length / character-class / stopword ratios)
- document fingerprinting (normalized-content hash + polynomial rolling hash)

All are deterministic and engine-portable: each has an exact ANSI-SQL
equivalent used as the DuckDB oracle in plans/text_plans.py.

Scale: every function is row-local (no shuffle); applied to 100 TB of
documents they parallelize embarrassingly across partitions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword vote sets for the language-ID heuristic. Deterministic argmax
# with fixed precedence (en > es > fr > de); all-zero votes -> 'unknown'.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "los", "que", "y", "es"),
    "fr": ("le", "les", "des", "et", "une", "est"),
    "de": ("der", "die", "und", "das", "von", "ist"),
}

FP_MOD = 1_000_000_007
FP_BASE = 31


def tokens(text: Column) -> Column:
    """Non-empty whitespace tokens (single-space split; '' filtered)."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def char_shingles(text: Column, n: int = 5) -> Column:
    """Distinct overlapping character n-grams of ``text``."""
    idx = F.sequence(F.lit(1), F.length(text) - (n - 1))
    grams = F.transform(idx, lambda i: text.substr(i, F.lit(n)))
    return F.when(F.length(text) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def lang_votes(text: Column) -> dict[str, Column]:
    """Per-language stopword vote counts over the lowercased token list."""
    toks = tokens(F.lower(text))
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")
        for lang, words in LANG_STOPWORDS.items()
    }


def lang_id(text: Column) -> Column:
    """Argmax language with fixed precedence; 'unknown' when no votes.

    CASE chain in precedence order: a language wins if it has >0 votes and
    >= every other language's votes; the first winner in chain order takes
    ties. Mirrored verbatim by the SQL oracle.
    """
    v = lang_votes(text)
    order = list(LANG_STOPWORDS)
    expr = None
    for lang in order:
        cond = v[lang] > 0
        for other in order:
            if other != lang:
                cond = cond & (v[lang] >= v[other])
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return expr.otherwise("unknown")


def quality_features(text: Column) -> dict[str, Column]:
    """Length / character-class / stopword ratio features, all rational
    arithmetic (no transcendentals) so any engine reproduces them bit-for-bit."""
    n_tok = token_count(text)
    n_char = F.length(text).cast("long")
    lower = F.lower(text)
    alpha_chars = F.length(F.regexp_replace(lower, "[^a-z]", "")).cast("long")
    digit_chars = F.length(F.regexp_replace(lower, "[^0-9]", "")).cast("long")
    en_votes = F.size(
        F.filter(tokens(lower), lambda t: t.isin(*LANG_STOPWORDS["en"]))
    ).cast("long")
    safe_tok = F.greatest(n_tok, F.lit(1).cast("long"))
    safe_char = F.greatest(n_char, F.lit(1).cast("long"))
    return {
        "n_tokens": n_tok,
        "n_chars_computed": n_char,
        "avg_token_len": (n_char - (n_tok - 1)) / safe_tok,  # chars minus separators
        "alpha_ratio": alpha_chars / safe_char,
        "digit_ratio": digit_chars / safe_char,
        "stopword_ratio": en_votes / safe_tok,
    }


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score: favors stopword presence, alphabetic
    content, and length up to 100 tokens; penalizes digit noise."""
    f = quality_features(text)
    raw = (
        0.3 * f["stopword_ratio"]
        + 0.3 * f["alpha_ratio"]
        + 0.4 * (F.least(f["n_tokens"], F.lit(100).cast("long")) / 100.0)
        - 0.5 * f["digit_ratio"]
    )
    return F.greatest(F.lit(0.0), F.least(F.lit(1.0), raw))


def content_fingerprint(text: Column) -> Column:
    """Normalized-content hash: md5 of lowercased, whitespace-collapsed text.
    Two documents differing only in case/whitespace share a fingerprint."""
    norm = F.trim(F.regexp_replace(F.lower(text), "\\s+", " "))
    return F.md5(norm)


def rolling_hash(text: Column) -> Column:
    """Polynomial rolling hash over character codes:
    ``h = fold(chars, 0, (acc, c) -> (acc*31 + ascii(c)) % 1_000_000_007)`` —
    the order-sensitive fingerprint family used for shingling/winnowing."""
    codes = F.transform(F.split(text, ""), lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FP_BASE + c) % FP_MOD,
    )
