"""Text-analysis expressions for the training-data pipeline surface.

All pure Catalyst expressions (split/regexp/aggregate/transform) — no
Python UDFs — so a 100 TB document sweep runs entirely inside whole-stage
codegen with the parquet scan pruned to the `text` column.

Covers: tokenization + token counting (whitespace and a BPE-ish subword
proxy), word shingles for Jaccard/MinHash, quality scoring
(length/punctuation/stopword ratios), a deterministic n-gram language-ID
heuristic, and document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"
# Stopword list for quality scoring / language ID. Deliberately tiny and
# frozen: it is part of the operator's contract (the oracle embeds it too).
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")

_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    # language → marker tokens for the n-gram/keyword LID heuristic
    "en": ("the", "and", "of"),
    "de": ("der", "und", "das"),
    "fr": ("le", "et", "la"),
    "es": ("el", "y", "los"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty string → empty array (not [''])."""
    return F.filter(F.split(text, TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def subword_count(text: Column) -> Column:
    """BPE-ish token-count proxy: ceil(non-space chars / 4) + word count —
    a standard cheap estimator for LLM token budgets; deterministic and
    vocabulary-free."""
    nonspace = F.length(F.regexp_replace(text, r"\s+", ""))
    return (F.ceil(nonspace / F.lit(4.0)) + token_count(text)).cast("long")


def _is_in(t: Column, words: tuple[str, ...]) -> Column:
    """Membership test usable on lambda variables inside higher-order
    functions (Column.isin is not supported there)."""
    cond = t == F.lit(words[0])
    for w in words[1:]:
        cond = cond | (t == F.lit(w))
    return cond


def stopword_ratio(text: Column) -> Column:
    toks = tokens(F.lower(text))
    stop = F.filter(toks, lambda t: _is_in(t, STOPWORDS))
    return F.when(F.size(toks) > 0, F.size(stop) / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[^!-/:-@\[-`{-~]", ""))
    return F.when(n > 0, punct / n).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: rewards mid-length docs and a
    natural stopword ratio, penalizes punctuation soup. The exact formula
    is contract, not tuning — the oracle reproduces it verbatim."""
    n_tok = token_count(text)
    len_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * F.lit(4.0), F.lit(1.0))
    punct_term = F.greatest(F.lit(1.0) - punct_ratio(text) * F.lit(4.0), F.lit(0.0))
    return (len_term * F.lit(0.4) + stop_term * F.lit(0.3) + punct_term * F.lit(0.3))


def lang_guess(text: Column) -> Column:
    """Marker-token language ID: pick the language with the most marker
    hits; ties and zero hits → 'und'. Cheap n-gram LID in expression form."""
    toks = tokens(F.lower(text))
    def _marker_filter(markers: tuple[str, ...]):
        # NB: the returned lambda must be unary — F.filter treats a binary
        # lambda as (element, index).
        return lambda t: _is_in(t, markers)

    scores = [
        (lang, F.size(F.filter(toks, _marker_filter(markers))))
        for lang, markers in _LANG_MARKERS.items()
    ]
    best = F.greatest(*[s for _, s in scores])
    guess = F.lit("und")
    # iterate in reverse so earlier languages win ties via later overwrite
    for lang, score in reversed(scores):
        guess = F.when((score == best) & (best > 0), F.lit(lang)).otherwise(guess)
    return guess


# PII patterns — restricted to syntax that Java regex (Spark) and RE2
# (DuckDB) interpret identically: char classes, bounded repeats, ASCII \b.
# No lookaround, no backrefs. The patterns are contract, not tuning.
PII_PATTERNS: list[tuple[str, str, str]] = [
    # (name, regex, replacement) — applied IN ORDER to the running text
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def redacted_text(text: Column) -> Column:
    """Text with each PII pattern replaced by its tag, applied in the
    declared order (email first, so an address's digits can't be half-
    matched as a phone number later)."""
    out = text
    for _, pattern, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, repl)
    return out


def pii_counts(text: Column) -> list[Column]:
    """One match-count column per PII pattern, each measured on the
    ORIGINAL text (counts are independent of redaction order)."""
    return [
        F.regexp_count(text, F.lit(pattern)).alias(f"n_{name}")
        for name, pattern, _ in PII_PATTERNS
    ]


def normalized_text(text: Column) -> Column:
    """Canonical form used by fingerprint + exact dedup: lowercase,
    collapse whitespace, strip."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the normalized text."""
    return F.md5(normalized_text(text))


def word_shingles(text: Column, k: int = 3) -> Column:
    """Array of k-word shingles (space-joined) of the normalized text.
    Docs with fewer than k tokens get a single shingle of all tokens, so
    no document silently drops out of MinHash/Jaccard.

    The tokenize chain (regex normalize + split + filter) is bound ONCE
    per row via a one-element `transform` lambda — the expression-level
    let-binding. Referencing the chain directly from the inner shingle
    lambda would re-run it per OUTPUT ELEMENT: codegen subexpression
    elimination does not hoist across higher-order-function lambda
    boundaries, and the sketch family (MinHash/Jaccard/SimHash/LSH/
    repetition/decontamination) all sit on this function — measured ~3x
    on the shingle-heavy operators."""

    def _shingle(toks: Column) -> Column:
        n = F.size(toks)
        idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
        return F.when(n <= k, F.array(F.array_join(toks, " "))).otherwise(
            F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))
        )

    bound = F.transform(F.array(tokens(normalized_text(text))), _shingle)
    return F.element_at(bound, 1)
