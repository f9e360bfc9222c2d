"""Text-analysis functions for the training-data-pipeline surface.

Language-ID (stopword-hit heuristic), quality scoring, token counting,
document fingerprinting — all as builtin-function Column expressions
(JVM-side, codegen'd; no Python in the hot path). Beyond-parity vs the
reference (which processes no text), required by the repo north star.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import md5_long

# Tiny deterministic stopword lists for the language-ID heuristic.
# Kept SQL-portable (used verbatim in the duckdb oracle strings).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "den"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "fr": ["le", "la", "de", "et", "un", "les", "des", "est", "que", "pour"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "就", "不", "人"],
}

EN_STOPWORDS = STOPWORDS["en"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization (lowercased) → array<string>."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def stopword_hits(text: Column, words: list[str]) -> Column:
    """Number of tokens that are in ``words``.

    isin compiles to an InSet membership test — ~6× faster than
    array_contains on a literal array (measured at sf0.1).
    """
    return F.size(F.filter(tokens(text), lambda t: t.isin(words)))


def stopword_ratio(text: Column, words: list[str] | None = None) -> Column:
    return stopword_hits(text, words or EN_STOPWORDS) / token_count(text)


def avg_token_len(text: Column) -> Column:
    """Mean token length = non-space chars / tokens."""
    return F.length(F.regexp_replace(F.trim(text), r"\s+", "")) / token_count(text)


def langid_scores(text: Column) -> dict[str, Column]:
    """Stopword-hit count per candidate language."""
    return {lang: stopword_hits(text, words) for lang, words in STOPWORDS.items()}


LANG_ORDER = ("en", "de", "es", "fr", "zh")


def langid_from_scores(scores: dict[str, Column]) -> Column:
    """Arg-max language from precomputed per-language hit counts.

    Deterministic tie-break: language order en<de<es<fr<zh (first wins
    on equal score) — mirrored exactly in the SQL oracle.

    Kept separate from the scoring so callers can aggregate on the raw
    scores first and run this CASE chain post-aggregation: higher-order
    expressions are interpreted (no codegen CSE), so Catalyst's project
    collapse would otherwise duplicate the tokenize/filter subtree into
    every WHEN branch.
    """
    best_lang, best_score = None, None
    for lang in LANG_ORDER:
        s = scores[lang]
        if best_lang is None:
            best_lang, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
            best_score = F.when(cond, s).otherwise(best_score)
    return F.when(best_score > 0, best_lang).otherwise(F.lit("unk"))


def langid(text: Column) -> Column:
    """Per-row language ID (see langid_from_scores for the fast
    aggregate-then-decide pattern)."""
    return langid_from_scores(langid_scores(text))


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: rewards sane token length & stopwords.

    score = 0.5*clamp(stop_ratio*5) + 0.5*clamp(1 - |avg_len-5|/5)
    (pure arithmetic so the oracle can reproduce it bit-for-bit).
    """
    sr = stopword_ratio(text)
    al = avg_token_len(text)
    clamp = lambda c: F.greatest(F.lit(0.0), F.least(F.lit(1.0), c))  # noqa: E731
    return 0.5 * clamp(sr * 5.0) + 0.5 * clamp(1.0 - F.abs(al - 5.0) / 5.0)


def fingerprint(text: Column) -> Column:
    """Deterministic 56-bit document fingerprint of normalized text
    (lowercase, collapsed whitespace) — the exact-dedup key."""
    return md5_long(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))
