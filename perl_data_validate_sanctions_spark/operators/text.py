"""Text-analysis operators for training-data pipelines: tokenization,
language-ID (stopword-ratio heuristic), quality scoring, fingerprinting.

All pure Column expressions (JVM, codegen) — the 100 TB path never
touches Python for these."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny public stopword lists (top function words per language)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den", "von", "mit"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es", "que", "por"],
}


def words(col: Column | str) -> Column:
    """Lowercased whitespace tokens, empties dropped."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(F.trim(c)), r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    """Whitespace token count (BPE-ish subword estimate = chars/4 is
    exposed separately as ``subword_estimate``)."""
    return F.size(words(col))


def subword_estimate(col: Column | str) -> Column:
    """~4 chars/token heuristic used for LLM budget estimates."""
    c = F.col(col) if isinstance(col, str) else col
    return F.ceil(F.length(c) / F.lit(4.0)).cast("long")


# GPT-2-style pretokenizer pattern, restricted to the lookahead-free
# subset (RE2-compatible, so Java regex AND DuckDB/RE2 agree match for
# match): contraction suffixes, space-prefixed letter runs, digit
# runs, punctuation runs, then any whitespace run. Pretoken count is
# the standard BPE-budget estimate — every BPE merge happens INSIDE a
# pretoken, so this upper-bounds and tracks the true token count.
BPE_PRETOKEN_REGEX = (
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def bpe_token_estimate(col: Column | str) -> Column:
    """BPE-ish token estimate: GPT-2 pretokenizer match count (public
    pattern, minus its trailing-whitespace lookahead — RE2 has no
    lookahead, which keeps a DuckDB oracle bit-identical). Native
    ``regexp_count`` — JVM-side, codegen, no Python."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_PRETOKEN_REGEX)).cast("long")


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    toks = words(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def lang_id(col: Column | str) -> Column:
    """argmax of per-language stopword ratios; 'und' when all zero."""
    pairs = [(lang, stopword_ratio(col, lang)) for lang in STOPWORDS]
    best_score = F.greatest(*[s for _, s in pairs])
    out = F.lit("und")
    # deterministic tie-break: first language (dict order) wins
    for lang, score in reversed(pairs):
        out = F.when((best_score > 0) & (score == best_score), F.lit(lang)).otherwise(
            out
        )
    return out


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band, alpha ratio,
    mean word length band, repetition penalty."""
    c = F.col(col) if isinstance(col, str) else col
    toks = words(c)
    n = F.size(toks)
    length_ok = F.when((n >= 10) & (n <= 5000), F.lit(1.0)).otherwise(F.lit(0.3))
    alpha_chars = F.length(F.regexp_replace(c, r"[^\p{L}]", ""))
    alpha_ratio = F.when(F.length(c) > 0, alpha_chars / F.length(c)).otherwise(
        F.lit(0.0)
    )
    mean_wlen = F.when(n > 0, F.length(F.concat_ws("", toks)) / n).otherwise(
        F.lit(0.0)
    )
    wlen_ok = F.when((mean_wlen >= 2.0) & (mean_wlen <= 12.0), F.lit(1.0)).otherwise(
        F.lit(0.4)
    )
    distinct_ratio = F.when(n > 0, F.size(F.array_distinct(toks)) / n).otherwise(
        F.lit(0.0)
    )
    return (
        F.lit(0.25) * length_ok
        + F.lit(0.25) * alpha_ratio
        + F.lit(0.25) * wlen_ok
        + F.lit(0.25) * distinct_ratio
    )


def fingerprint_md5(col: Column | str) -> Column:
    """Exact-dup fingerprint: md5 of normalized text (lowercase, collapsed
    whitespace) — md5 so a DuckDB oracle reproduces it bit-for-bit."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.md5(norm)


def rolling_fingerprints(
    col: Column | str, w: int = 5, keep: int = 8, hash: str = "xxhash64"
) -> Column:
    """Winnowing-style document fingerprint: hash every w-token shingle,
    keep the ``keep`` smallest hashes (a deterministic sketch of the
    document; containment of sketches approximates overlap).

    ``hash``: "xxhash64" (default — fastest, JVM-native) or "md5_60"
    (60-bit int from the first 15 hex chars of md5 — bit-identical
    across engines, so a DuckDB oracle can reproduce the whole
    pipeline; same cross-engine trick as operators/dedup.py simhash).
    Sketch quality is equivalent: both are uniform hashes, min-K of
    either is an unbiased document sketch."""
    toks = words(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - w + 1, F.lit(1)))
    shingles = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, w)))
    if hash == "md5_60":
        hashes = F.transform(
            shingles,
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast(
                "long"
            ),
        )
    elif hash == "xxhash64":
        hashes = F.transform(shingles, lambda s: F.xxhash64(s))
    else:
        raise ValueError(f"unknown hash {hash!r}")
    return F.slice(F.array_sort(F.array_distinct(hashes)), 1, keep)
