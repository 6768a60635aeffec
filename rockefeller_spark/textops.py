"""Text-analysis operators for a large-scale training-data pipeline.

All operators are pure ``pyspark.sql.functions`` column expressions
(JVM-side, whole-stage-codegen'd) — no Python UDFs — so they run at full
scan speed over 100 TB of documents. Each has a DuckDB-SQL twin in
``registry.py`` for the correctness gate.

Covers: token counting, quality scoring (length/punct/stopword ratios),
language ID (stopword-hit heuristic), document fingerprinting
(canonicalized content hash), and word-shingling (the input to the
dedup family in ``dedup.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small and hard-coded: the heuristic must be
# reproducible in ANSI SQL for the oracle.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "que", "por"],
}


def canonical_text(col: Column | str) -> Column:
    """Lowercase + collapse whitespace runs + trim — the normal form used
    by fingerprints and exact dedup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """Deterministic 128-bit content fingerprint of canonicalized text
    (md5 hex — identical in Spark and DuckDB, unlike xxhash64)."""
    return F.md5(canonical_text(col))


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of trimmed text → array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token estimate: count of word/number/punct chunks via
    a BPE-flavored regex (letters runs, digit runs, single punct)."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"[A-Za-z]+|[0-9]+|\s+", "")
    words = F.size(F.filter(F.split(c, r"[^A-Za-z0-9]+"),
                            lambda x: x != F.lit("")))
    return (words + F.length(stripped)).cast("int")


def punct_ratio(col: Column | str) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    return (n_punct / F.greatest(F.length(c), F.lit(1))).cast("double")


def stopword_hits(col: Column | str, lang: str = "en") -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    toks = tokens(F.lower(F.col(col) if isinstance(col, str) else col))
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    return (stopword_hits(col, lang) /
            F.greatest(token_count(col), F.lit(1))).cast("double")


def quality_score(col: Column | str) -> Column:
    """Composite quality heuristic in [0,1]: rewards stopword presence and
    moderate length, penalizes punctuation soup. Rounded to 6 decimals so
    the engine and the SQL oracle hash identically."""
    c = F.col(col) if isinstance(col, str) else col
    length_ok = F.when((F.length(c) >= 50) & (F.length(c) <= 10000), 1.0).otherwise(0.3)
    sw = F.least(stopword_ratio(col) * 4.0, F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(col) * 5.0, F.lit(1.0))
    return F.round((0.4 * length_ok + 0.4 * sw + 0.2 * punct_ok), 6)


def lang_id(col: Column | str) -> Column:
    """Stopword-vote language ID: argmax over per-language hit counts,
    'und' (undetermined) when no stopwords hit. Ties break by language
    code order (deterministic; mirrored in the SQL oracle)."""
    hits = {lang: stopword_hits(col, lang) for lang in sorted(STOPWORDS)}
    best_n = F.greatest(*hits.values())
    out = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):
        out = F.when(hits[lang] == best_n, F.lit(lang)).otherwise(out)
    return F.when(best_n > 0, out).otherwise(F.lit("und"))


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """k-word shingles of canonicalized text → array<string>. The unit of
    the Jaccard / MinHash dedup family."""
    toks = F.split(canonical_text(col), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - F.lit(k), F.lit(0)))
    return F.when(n >= k, F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass document profile: tokens, quality, language, fingerprint."""
    return df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        bpe_ish_token_count(text_col).alias("n_subword_tokens"),
        F.round(punct_ratio(text_col), 6).alias("punct_ratio"),
        F.round(stopword_ratio(text_col), 6).alias("stopword_ratio"),
        quality_score(text_col).alias("quality"),
        lang_id(text_col).alias("lang_pred"),
        fingerprint(text_col).alias("fp"),
    )
