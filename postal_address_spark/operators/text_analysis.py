"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Everything is JVM-side expression work (split / regexp / array functions /
xxhash64) inside whole-stage codegen — zero Python UDFs, so these scale
linearly with input and survive a 100x scale-up unchanged.
"""
from __future__ import annotations

from typing import Dict, List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic.
# Deliberately small: language ID here is a cheap router, not a classifier.
LANG_MARKERS: Dict[str, List[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "a"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "une", "pour", "dans"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "für", "von"],
    "es": ["el", "la", "los", "de", "y", "es", "que", "una", "por", "con"],
}


def tokens_col(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/NULL-ish text)."""
    trimmed = F.trim(F.coalesce(text, F.lit("")))
    return F.when(trimmed == "", F.lit(0)).otherwise(F.size(F.split(trimmed, r"\s+")))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND punctuation and
    counts ~4-char chunks of long words — a cheap, deterministic stand-in
    for a BPE tokenizer's token count."""
    pieces = F.split(F.lower(F.trim(F.coalesce(text, F.lit("")))), r"[\s\p{Punct}]+")
    pieces = F.filter(pieces, lambda p: p != "")
    return F.aggregate(
        pieces,
        F.lit(0),
        lambda acc, p: acc + F.greatest(F.ceil(F.length(p) / 4).cast("int"), F.lit(1)),
    )


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    toks = tokens_col(text)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[\p{Punct}]", "")
    return (F.length(text) - F.length(stripped)) / F.greatest(
        F.length(text), F.lit(1)
    )


def quality_score(text: Column) -> Column:
    """[0,1] quality heuristic: length band + low punctuation + stopword
    presence — the classic cheap pre-filter for web-scale corpora."""
    n_chars = F.length(F.coalesce(text, F.lit("")))
    len_ok = F.when((n_chars >= 50) & (n_chars <= 20000), 1.0).otherwise(
        F.when(n_chars > 0, 0.3).otherwise(0.0)
    )
    low_punct = F.lit(1.0) - F.least(punct_ratio(text) * 4, F.lit(1.0))
    has_stop = F.least(stopword_ratio(text) * 5, F.lit(1.0))
    return F.round(0.4 * len_ok + 0.3 * low_punct + 0.3 * has_stop, 6)


def _marker_hits(toks: Column, lang: str) -> Column:
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))


def lang_id(text: Column) -> Column:
    """argmax over per-language stopword hit ratios; 'und' when no marker
    hits at all."""
    toks = tokens_col(text)
    n = F.greatest(F.size(toks), F.lit(1))
    scored = F.array(
        *[
            F.struct(
                (_marker_hits(toks, lang) / n).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang in sorted(LANG_MARKERS)
        ]
    )
    best = F.array_max(scored)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def with_doc_fingerprint(
    df: DataFrame, text_col: str = "text", window: int = 8,
    out_col: str = "fingerprint", portable: bool = False,
) -> DataFrame:
    """Adds ``out_col``: winnowing-style rolling fingerprint — min gram-hash
    over each window of word 3-gram hashes, distinct-collected.  A compact,
    shift-robust content signature for near-dup detection.

    ``portable=True`` swaps the gram hash from xxhash64 to the 32-bit
    md5 prefix (semantic.portable_hash32) so a DuckDB oracle replays the
    fingerprint bit-for-bit; md5 is MessageDigest-backed and must stay
    off hot paths (engine rule 4) — oracle-graded fixtures only.

    The token and gram-hash arrays are materialized as real columns: inlined
    into the window lambdas, Catalyst re-expands the gram-hash expression
    into every ``slice``, recomputing every gram (and under it every token
    split) per window — O(windows x grams x tokens) instead of O(grams)
    (same pathology as dedup.with_shingle_hashes, measured 40x there).
    """
    if portable:
        from .semantic import portable_hash32 as _gram_hash
    else:
        _gram_hash = F.xxhash64
    step = df.withColumn("_toks", tokens_col(F.col(text_col)))
    count = F.greatest(F.size("_toks") - F.lit(2), F.lit(1))
    step = step.withColumn(
        "_gh",
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: _gram_hash(F.concat_ws(" ", F.slice(F.col("_toks"), i, 3))),
        ),
    )
    n_windows = F.greatest(F.size("_gh") - F.lit(window - 1), F.lit(1))
    fp = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda i: F.array_min(F.slice(F.col("_gh"), i, window)),
        )
    )
    return step.withColumn(out_col, fp).drop("_toks", "_gh")


def analyze_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass enrichment with every text-analysis column."""
    t = F.col(text_col)
    enriched = df.select(
        "*",
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_subword_tokens"),
        F.round(stopword_ratio(t), 6).alias("en_stopword_ratio"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
    )
    return with_doc_fingerprint(enriched, text_col)


# ---------------------------------------------------------------------------
# PII redaction — a first-class training-data-pipeline operator: scrub
# contact identifiers before text enters a training corpus.  Pure JVM
# regexp_replace chains (whole-stage codegen, no Python); the patterns
# deliberately avoid lookaround so the same regexes run identically under
# Java regex (Spark) and RE2 (the DuckDB oracle) — both engines use
# leftmost-first matching for these constructs.
# Ordered: email first (its local part contains digits a later phone
# pattern could otherwise chew into).
# ---------------------------------------------------------------------------

_IPV4_OCTET = r"(?:25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})"

PII_PATTERNS: List[tuple] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("id", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<ID>"),
    # octets bounded to 0-255: 999.999.999.999 is not an address
    ("ipv4", rf"\b(?:{_IPV4_OCTET}\.){{3}}{_IPV4_OCTET}\b", "<IP>"),
    # >=7 DIGITS (not 7+ digit-or-punct chars) with at most three
    # separator chars between digits: version strings ("1.2.3.4.5") and
    # short numeric lists don't match (too few digits), while spaced
    # separators ("020 - 7946 0958") and 16-19-digit PANs redact in full.
    # No upper digit bound ON PURPOSE: redaction must err toward
    # over-matching — a bounded repeat leaves the tail of a long digit
    # run (e.g. the last PAN digit) exposed.  Residual over-match: a
    # datetime ("2024-01-01 12") genuinely is a separated >=7-digit run
    # and still redacts — indistinguishable from a phone by shape alone.
    ("phone", r"\+?[0-9](?:[-(). ]{0,3}[0-9]){6,}", "<PHONE>"),
]


def redact_pii(text: Column) -> Column:
    """Replace emails / SSN-shaped ids / IPv4s / phone-shaped digit runs
    with typed placeholder tokens, in a fixed pattern order."""
    out = text
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(text: Column) -> Dict[str, Column]:
    """Per-kind match counts BEFORE redaction (kind -> int column).

    Counted sequentially on the progressively-redacted text, mirroring
    :func:`redact_pii`'s order, so overlapping patterns (a phone-shaped
    digit run inside an id) are attributed to exactly one kind.
    """
    out: Dict[str, Column] = {}
    current = text
    for kind, pattern, token in PII_PATTERNS:
        out[kind] = F.coalesce(
            F.regexp_count(current, F.lit(pattern)), F.lit(0)
        )
        current = F.regexp_replace(current, pattern, token)
    return out
