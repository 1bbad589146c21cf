"""Text-analysis column functions for the training-data pipeline.

All of these are pure built-in-function compositions (JVM-side, vectorized,
whole-stage-codegen) so they hold up on 100 TB of documents: no Python in the
hot path, every one is a narrow map the optimizer can pipeline with the scan.

Each function has an exactly-equivalent ANSI-SQL form used as the DuckDB
oracle in ``__spark_entry__.oracle_sql`` — keep the two in sync.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small fixed stopword lists per language for the heuristic language-ID /
# quality scoring. Deterministic, shared with the SQL oracles.
STOPWORDS = {
    "en": ["the", "a", "of", "to", "and", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "zu"],
    "fr": ["le", "la", "de", "et", "est", "un", "que", "pour"],
    "zh": ["de", "shi", "le", "bu", "wo", "you", "he", "ren"],
}

# A BPE-ish pre-tokenizer: alpha runs, digit runs, single punctuation marks.
BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def words(text: Column) -> Column:
    """Whitespace tokens (corpus is single-space separated)."""
    return F.filter(F.split(text, " "), lambda w: w != "")


def token_count_ws(text: Column) -> Column:
    return F.size(words(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token estimate via the pre-tokenizer regex."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_REGEX), 0))


def stopword_hits(text: Column, lang: str) -> Column:
    sw = STOPWORDS[lang]
    return F.size(F.filter(words(text), lambda w: F.lower(w).isin(*sw)))


def langid(text: Column) -> Column:
    """Heuristic language ID: argmax of per-language stopword hits.

    Ties break in the fixed key order of ``STOPWORDS`` (greater-than chain),
    defaulting to 'en'. Deterministic, oracle-checkable.
    """
    langs = list(STOPWORDS)
    hits = {lg: stopword_hits(text, lg) for lg in langs}
    best_lang = F.lit(langs[0])
    best_hits = hits[langs[0]]
    for lg in langs[1:]:
        cond = hits[lg] > best_hits
        best_lang = F.when(cond, F.lit(lg)).otherwise(best_lang)
        best_hits = F.when(cond, hits[lg]).otherwise(best_hits)
    return F.when(best_hits > 0, best_lang).otherwise(F.lit("unknown"))


def punct_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(r"[^A-Za-z0-9\s]"), 0))


def mean_word_len(text: Column) -> Column:
    w = words(text)
    total = F.aggregate(w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
    return F.when(F.size(w) > 0, total.cast("double") / F.size(w)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Deterministic doc-quality heuristic in [0, 1]:
    0.4·min(1, words/100) + 0.3·clamp(mean_word_len/8) + 0.3·(1 − punct_ratio).
    """
    n = token_count_ws(text).cast("double")
    mwl = mean_word_len(text)
    chars = F.length(text).cast("double")
    pr = F.when(chars > 0, punct_count(text).cast("double") / chars).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), n / F.lit(100.0))
        + F.lit(0.3) * F.least(F.lit(1.0), mwl / F.lit(8.0))
        + F.lit(0.3) * (F.lit(1.0) - pr)
    )
    return F.round(score, 6)


def quality_score_e6(text: Column) -> Column:
    """``quality_score`` in exact integer micro-units (×1e6), floor-division
    arithmetic only — engine-exact for cross-engine oracles (float rounding
    at ulp boundaries differs between engines; integers never do)."""
    w = words(text)
    n = F.size(w).cast("long")
    total_len = F.aggregate(w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
    chars = F.length(text).cast("long")
    punct = punct_count(text).cast("long")
    t1 = F.lit(4000) * F.least(F.lit(100).cast("long"), n)
    t2 = F.when(
        n > 0, F.least(F.lit(300000).cast("long"), F.floor(F.lit(300000) * total_len / (F.lit(8) * n)))
    ).otherwise(F.lit(0))
    t3 = F.when(chars > 0, F.lit(300000) - F.floor(F.lit(300000) * punct / chars)).otherwise(
        F.lit(300000)
    )
    return (t1 + t2 + t3).cast("long")


FP_MOD = 2147483647  # 2^31 - 1


def fingerprint(text: Column) -> Column:
    """Position-weighted rolling document fingerprint.

    sum over words w_i (1-based i) of
    ``((i * 31 + ascii(first_char)) * 131 + length(w)) mod (2^31−1)``,
    itself mod 2^31−1. Order-sensitive (the position weight), overflow-free in
    int64, and exactly expressible in DuckDB for the oracle. Plays the role of
    the reference's doc identity probes at scale (content-shift detection).
    """
    w = words(text)
    terms = F.transform(
        w,
        lambda x, i: ((i + F.lit(1)).cast("long") * 31 + F.ascii(F.substring(x, 1, 1)))
        * 131
        + F.length(x).cast("long"),
    )
    total = F.aggregate(
        terms, F.lit(0).cast("long"), lambda acc, t: (acc + t) % F.lit(FP_MOD).cast("long")
    )
    return total


def shingles(text: Column, k: int = 5) -> Column:
    """Distinct word k-gram shingles (as single space-joined strings)."""
    w = words(text)
    n = F.size(w)
    idx = F.sequence(F.lit(0), n - k)  # Spark sequence is descending if stop<start
    sh = F.transform(idx, lambda i: F.array_join(F.slice(w, i + 1, k), " "))
    empty = F.array().cast("array<string>")
    return F.when(n >= k, F.array_distinct(sh)).otherwise(empty)
