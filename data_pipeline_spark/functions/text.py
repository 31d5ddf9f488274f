"""Text-analysis functions for large-scale training-data curation.

Language-ID (stopword-share heuristic), quality scoring (length / punctuation
/ stopword ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting (normalized-content hash) — all pure Spark column expressions
(JVM-side, codegen'd), designed to run over a 100-TB ``documents`` corpus
without any Python in the hot path.

Cross-engine note: every function here has an exact ANSI-SQL twin (DuckDB)
used by the oracle harness, so semantics are pinned by tests, not prose.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EN_STOPWORDS = [
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
    "on", "with", "as", "was", "at", "by", "an", "be", "this", "are",
]

# BPE-ish word/piece splitter: runs of letters, runs of digits, or a single
# non-space symbol each count as one token (GPT-2 pre-tokenizer shape).
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def words(col: Column | str) -> Column:
    """Lowercased whitespace-split word array (empties removed)."""
    return F.filter(F.split(F.lower(_c(col)), r"\s+"), lambda w: w != "")


def token_count(col: Column | str, mode: str = "whitespace") -> Column:
    """Token count: 'whitespace' words or 'bpe' regex pieces."""
    if mode == "whitespace":
        return F.size(words(col))
    if mode == "bpe":
        return F.regexp_count(_c(col), F.lit(BPE_TOKEN_RE))
    raise ValueError(f"unknown token mode {mode!r}")


def avg_word_len(col: Column | str) -> Column:
    """Mean word length (NULL for empty docs) — a cheap fluency signal."""
    w = words(col)
    total = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.when(F.size(w) > 0, total.cast("double") / F.size(w))


def punct_ratio(col: Column | str) -> Column:
    """Punctuation chars / total chars (0.0 for empty docs)."""
    c = _c(col)
    n = F.length(c)
    p = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\-]", ""))
    return F.when(n > 0, p.cast("double") / n).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str) -> Column:
    """English-stopword share of words (0.0 for empty docs)."""
    w = words(col)
    hits = F.size(F.filter(w, lambda x: x.isin(EN_STOPWORDS)))
    return F.when(F.size(w) > 0, hits.cast("double") / F.size(w)).otherwise(F.lit(0.0))


def lang_id(col: Column | str, en_threshold: float = 0.08) -> Column:
    """N-gram-free language-ID heuristic: docs whose stopword share clears
    ``en_threshold`` are tagged 'en', else 'und' (undetermined).  At corpus
    scale this is the cheap first-pass filter before a model-based ID."""
    return F.when(stopword_ratio(col) >= en_threshold, F.lit("en")).otherwise(F.lit("und"))


def quality_score(col: Column | str) -> Column:
    """Composite quality in [0,1]: rewards stopword presence and moderate
    word length, penalizes punctuation soup and tiny docs.

    score = 0.4*min(1, n_words/50) + 0.3*min(1, stopword_ratio/0.15)
          + 0.3*(1 - min(1, punct_ratio/0.3))
    """
    n_words = F.size(words(col)).cast("double")
    sw = stopword_ratio(col)
    pr = punct_ratio(col)
    return F.round(
        F.lit(0.4) * F.least(F.lit(1.0), n_words / 50.0)
        + F.lit(0.3) * F.least(F.lit(1.0), sw / 0.15)
        + F.lit(0.3) * (F.lit(1.0) - F.least(F.lit(1.0), pr / 0.3)),
        4,
    )


def doc_fingerprint(col: Column | str) -> Column:
    """Content fingerprint: md5 of aggressively-normalized text (lowercase,
    alnum+space only, collapsed whitespace).  Two docs differing only in case,
    punctuation, or spacing share a fingerprint — the exact-dedup key."""
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(_c(col)), r"[^a-z0-9 ]", " "), r" +", " ")
    )
    return F.md5(norm)


def repeated_ngram_fraction(col: Column | str, n: int = 2) -> Column:
    """Gopher-style repetition signal: fraction of word n-grams that are
    duplicates of an earlier n-gram in the same doc
    (``1 - distinct/total``; 0.0 for docs with no n-grams).  Heavily
    boilerplated / looping machine text scores high and is filtered before
    training.  Pure column expression — array_distinct over the shingle
    array, no shuffle, no UDF."""
    s = word_shingles(col, n)
    return F.when(
        F.size(s) > 0,
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(s)).cast("double") / F.size(s), 4
        ),
    ).otherwise(F.lit(0.0))


# PII patterns: kept to syntax shared by Java regex (Spark) and RE2 (DuckDB
# oracle) — character classes, bounded repetition, \b word boundaries.
PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+\d[\d \-]{6,}\d"


def redact_pii(col: Column | str) -> Column:
    """Redact emails / IPv4s / international-format phone numbers with typed
    placeholder tags (the standard pre-training scrub).  Order matters:
    emails first (their domains would otherwise partially match), then IPs,
    then phones.  Pure ``regexp_replace`` chain — JVM-side, codegen'd, and
    bit-identical to the DuckDB oracle's RE2 twin (asserted by the
    ``doc_pii_redact`` value-hash check)."""
    c = F.regexp_replace(_c(col), PII_EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, PII_IPV4_RE, "<IP>")
    return F.regexp_replace(c, PII_PHONE_RE, "<PHONE>")


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Array of word n-gram shingles (space-joined), for Jaccard/MinHash.

    Built with sequence+transform over the word array — no explode, no UDF.
    Docs shorter than ``n`` words yield a single shingle of all their words.
    """
    w = words(col)
    k = F.greatest(F.size(w) - (n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
    )
