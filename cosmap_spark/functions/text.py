"""Text-analysis column functions for LLM-data pipelines (SURVEY.md §2.4).

Whitespace tokenization, shingling, token statistics, quality scoring,
language-ID heuristics, and document fingerprints — all as JVM-side
expressions (split / higher-order functions / regexp), so they run inside
whole-stage codegen with no Python round-trip at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny multilingual stopword lists for the language-ID heuristic
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "fr": ("le", "la", "de", "et", "les"),
    "de": ("der", "die", "das", "und", "nicht"),
    "es": ("el", "la", "de", "que", "los"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokens (single-space split — the corpus convention)."""
    return F.split(text, " ")


def n_tokens(text: Column) -> Column:
    """Count of non-whitespace runs (robust to repeated spaces)."""
    return F.regexp_count(text, F.lit(r"\S+")).cast("long")


def shingles_from_tokens(t: Column, k: int = 3) -> Column:
    """k-gram shingles from an ALREADY-MATERIALIZED token-array column.

    Callers on a hot path should project the token array first
    (``withColumn("__toks", tokens(text))``) and shingle that: Spark does
    no common-subexpression elimination inside lambda functions, so
    referencing ``split(text)`` directly here re-splits the whole
    document for every ``element_at`` — O(k·n_shingles) full-text splits
    per row (measured 3-4× the runtime of the entire ngram-dedup job).

    Documents with fewer than ``k`` tokens yield an EMPTY array: the
    unguarded ``sequence(0, size-k)`` would descend (sequence's step
    defaults to -1 when stop < start) and element_at would then throw
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT under ANSI mode — so the short-doc
    case is guarded explicitly, mirroring the ``CASE WHEN len >= k``
    guard in the DuckDB oracles."""
    idx = F.sequence(F.lit(0), F.size(t) - k)
    cols = lambda i: [F.element_at(t, i + j + 1) for j in range(k)]  # noqa: E731
    grams = F.transform(idx, lambda i: F.concat_ws(" ", *cols(i)))
    return F.when(F.size(t) >= k, grams).otherwise(
        F.array().cast("array<string>")
    )


def shingles(text: Column, k: int = 3) -> Column:
    """k-gram word shingles as strings: ``tok[i] tok[i+1] … tok[i+k-1]``.

    Convenience form over a raw text column; prefer materializing the
    token array and calling :func:`shingles_from_tokens` in hot paths
    (see its docstring for the CSE pitfall)."""
    return shingles_from_tokens(tokens(text), k)


def stopword_count(text: Column, words: tuple[str, ...]) -> Column:
    """Number of tokens that are in ``words``."""
    lst = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(text), lambda x: F.array_contains(lst, x))).cast("long")


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]: penalize very short docs and
    degenerate token diversity (near-dup token spam)."""
    nt = n_tokens(text).cast("double")
    uniq = F.size(F.array_distinct(tokens(text))).cast("double")
    len_score = F.least(F.lit(1.0), nt / F.lit(50.0))
    diversity = uniq / F.greatest(nt, F.lit(1.0))
    return len_score * F.lit(0.5) + diversity * F.lit(0.5)


def canonicalize(text: Column) -> Column:
    """Dedup-canonical text form: lowercase, punctuation stripped,
    whitespace collapsed, trimmed — the standard normalization applied
    BEFORE exact/fuzzy dedup so trivial formatting variants (case,
    smart punctuation, double spaces) hash identically.  Pure JVM
    regexp expressions; compose as
    ``exact_dedup(df.withColumn("text", canonicalize(col("text"))))``."""
    no_punct = F.regexp_replace(F.lower(text), r"[^\p{L}\p{N}\s]", " ")
    return F.trim(F.regexp_replace(no_punct, r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lowercased text.  Stable across engines and runs."""
    normalized = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return F.md5(normalized)


def scrub_pii(text: Column) -> Column:
    """Redact email-shaped and long-digit-run substrings (the
    minimal PII scrub pass every training-data pipeline ships):
    JVM-side regexp_replace chain — order matters (emails first, so
    their digit runs don't get half-replaced)."""
    scrubbed = F.regexp_replace(
        text, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"
    )
    return F.regexp_replace(scrubbed, r"\d{9,}", "<NUM>")


def repetition_ratio(text: Column, k: int = 3) -> Column:
    """Fraction of k-gram occurrences belonging to the most frequent
    k-gram (Gopher-style repetition filter, Rae et al. 2021 §A1.1):
    near 1.0 ⇒ the document is one phrase repeated.  All higher-order
    functions — aggregate over the shingle multiset, no UDF."""
    sh = shingles(text, k)
    counts = F.transform(
        F.array_distinct(sh),
        lambda s: F.size(F.filter(sh, lambda x: x == s)),
    )
    max_count = F.array_max(counts)
    return F.when(
        F.size(sh) > 0, max_count.cast("double") / F.size(sh).cast("double")
    ).otherwise(F.lit(0.0))
