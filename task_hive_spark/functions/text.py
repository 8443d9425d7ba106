"""Text-analysis column functions for training-data pipelines.

Everything here is built-in pyspark.sql.functions expressions (JVM-side,
whole-stage codegen) — no Python UDFs in the hot path. The same formulas
are mirrored as DuckDB SQL in operators/textops.py for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Real pipelines would ship fastText; the heuristic keeps the
# operator deterministic, oracle-checkable and dependency-free.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "en", "por", "que"],
}

# BPE-ish token pattern: word pieces, numbers, or single non-space symbols
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokenization (empty string → no tokens)."""
    return F.split(F.trim(text), r"\s+")


def ws_token_count(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, 0).otherwise(F.size(ws_tokens(text)))


def bpe_ish_token_count(text: Column) -> Column:
    """Count of BPE-ish regex tokens — a cheap proxy for tokenizer cost
    accounting at corpus scale."""
    return F.regexp_count(text, F.lit(TOKEN_REGEX))


def punct_ratio(text: Column) -> Column:
    n_punct = F.regexp_count(text, F.lit(r"[^\w\s]"))
    return n_punct / F.greatest(F.length(text), F.lit(1))


def stopword_hits(text: Column, lang: str) -> Column:
    """How many tokens are stopwords of `lang` (array_intersect-free:
    per-token membership via filter, stays JVM-side)."""
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(ws_tokens(F.lower(text)), lambda t: F.array_contains(words, t)))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: length score, mean word
    length sanity, low punctuation. Deterministic arithmetic only."""
    n_tok = ws_token_count(text).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    mean_word = F.length(text).cast("double") / F.greatest(n_tok, F.lit(1.0))
    word_score = F.when((mean_word >= 3) & (mean_word <= 12), 1.0).otherwise(0.5)
    punct_score = F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))
    return F.round((len_score + word_score + punct_score) / 3, 6)


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (the exact-dedup key)."""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles (distinct), the MinHash/Jaccard input unit.

    Built from slice+concat over the token array — no UDF. Documents
    shorter than n words yield their whole text as one shingle.
    """
    toks = ws_tokens(F.lower(text))
    k = F.size(toks) - (n - 1)
    idx = F.sequence(F.lit(1), F.greatest(k, F.lit(1)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.array_distinct(grams)


def portable_hash32(col: Column, seed: str = "") -> Column:
    """Deterministic 32-bit hash from the md5 prefix — portable to
    DuckDB as CAST(concat('0x', substr(md5(seed || x), 1, 8)) AS
    BIGINT). One definition for every hash-derived sampling draw
    (stratified buckets, A-Res uniforms, CDC replay selection) so the
    seed/width contract with the oracles lives in one place."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(seed), col)), 1, 8), 16, 10).cast(
        "long"
    )


def portable_hash64(col: Column, seed: str = "", offset: int = 1) -> Column:
    """Deterministic 60-bit hash from md5 — portable to DuckDB as
    CAST(concat('0x', substr(md5(seed || x), offset, 15)) AS BIGINT),
    used so MinHash signatures are oracle-checkable across engines.
    One md5 yields two independent 60-bit lanes (offset 1 and 17), so a
    K-wide MinHash family needs only K/2 md5 evaluations per shingle."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), col)), offset, 15), 16, 10
    ).cast("bigint")
