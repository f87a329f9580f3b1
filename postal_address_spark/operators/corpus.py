"""Corpus-curation operators for training-data pipelines: intra-document
repetition statistics, a composite keep/drop quality filter with per-rule
reasons, deterministic dataset splitting, and corpus vocabulary top-k.

These are the curation steps a web-scale corpus runs BETWEEN dedup and
tokenization (repetition and quality gates drop the bulk of junk before
any expensive model-based filter; the split assignment must be a pure
function of the document id so re-runs and backfills land every doc in
the same split).

Everything is JVM-side expression work inside whole-stage codegen — zero
Python UDFs — so each operator is a single map-side pass (the vocabulary
top-k adds one aggregation shuffle on the token, partially aggregated
map-side) and scales linearly to 100 TB.

All keep/drop decisions use INTEGER cross-multiplied thresholds
(``(n_bigrams - n_distinct) * 5 > n_bigrams`` instead of
``dup_frac > 0.2``) so the engine and the DuckDB oracle can never
disagree on a float rounding boundary.
"""
from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from postal_address_spark.operators.text_analysis import LANG_MARKERS


def _tokens(text: Column) -> Column:
    """Lowercased whitespace tokens; empty ARRAY (not ['']) for blank/NULL
    text so downstream counts read 0."""
    trimmed = F.trim(F.coalesce(text, F.lit("")))
    return F.when(
        trimmed == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.lower(trimmed), r"\s+"))


def _bigrams(toks: Column) -> Column:
    """Adjacent-token bigram array from a token ARRAY COLUMN.

    ``toks`` must be a projected column reference, never the raw
    ``_tokens(...)`` expression: the lambda's ``F.slice(toks, i, 2)``
    re-inlines whatever expression ``toks`` is into EVERY element
    evaluation (CLAUDE.md engine rule 1 — the shape
    ``with_shingle_hashes`` measured at 40x), turning a linear pass
    quadratic in tokens per document.  Callers project ``_toks`` first;
    ``tests/test_plans.py::test_corpus_plans`` counts one ``split(`` in
    the optimized plans to keep it that way.
    """
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style intra-document repetition measures: duplicate-token and
    duplicate-bigram fractions, appended as columns.

    A document that repeats itself (boilerplate, keyword stuffing, decoding
    loops) has most of its n-grams duplicated; the duplicate fraction is the
    standard cheap detector.  The token and bigram arrays are materialized
    as real intermediate columns so each is built ONCE per row (see
    :func:`_bigrams`); counts are ``size``/``array_distinct`` over those
    columns.

    Emits int counts plus fractions as SINGLE int/int divisions (rounded
    for display; comparisons elsewhere use the int counts directly).
    """
    step = df.withColumn("_toks", _tokens(F.col(text_col))).withColumn(
        "_bg", _bigrams(F.col("_toks"))
    )
    n, nb = F.size(F.col("_toks")), F.size(F.col("_bg"))
    d = F.size(F.array_distinct(F.col("_toks")))
    db = F.size(F.array_distinct(F.col("_bg")))
    return (
        step.withColumn("n_tokens", n)
        .withColumn("n_distinct_tokens", d)
        .withColumn(
            "dup_token_frac", F.round((n - d) / F.greatest(n, F.lit(1)), 6)
        )
        .withColumn("n_bigrams", nb)
        .withColumn("n_distinct_bigrams", db)
        .withColumn(
            "dup_bigram_frac", F.round((nb - db) / F.greatest(nb, F.lit(1)), 6)
        )
        .drop("_toks", "_bg")
    )


def _no_stopwords(toks: Column, lang: Column | None) -> Column:
    """True when the document shows NO stopword of its own language.

    The corpus is multilingual (the documents table carries ``lang``), so
    the marker set is selected per row — a French document must be judged
    against the French markers, not the English ones (an en-only rule
    silently rejects every non-English document).  A language we have no
    marker list for (or NULL lang) makes the rule abstain: absence of
    evidence, not evidence of junk.  When no lang column is available the
    caller passes ``None`` and the rule falls back to English markers.

    One short-circuiting ``exists`` over a LITERAL marker array per
    vendored language (the per-branch arrays stay literals — CLAUDE.md
    rule 1: no non-trivial expression is re-inlined into the HOF lambda).
    """
    def miss(lg: str) -> Column:
        markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lg]])
        return ~F.exists(toks, lambda t: F.array_contains(markers, t))

    if lang is None:
        return miss("en")
    fired = None
    for lg in sorted(LANG_MARKERS):
        cond = (lang == F.lit(lg)) & miss(lg)
        fired = cond if fired is None else (fired | cond)
    return fired


# (rule_name, builder) — builder(toks, bigrams) -> boolean Column over
# PROJECTED token/bigram array columns (see _bigrams on why).  Names
# sorted so the reasons string is deterministic.  Thresholds are
# integer-exact: each rule is a pure int comparison over token/char
# counts.
def _quality_rules(
    toks: Column,
    bigrams: Column,
    min_tokens: int,
    max_tokens: int,
    min_mean_len_x10: int,
    max_mean_len_x10: int,
    dup_bigram_pct: int,
    lang: Column | None = None,
) -> List[Tuple[str, Column]]:
    n = F.size(toks)
    sum_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    nb = F.size(bigrams)
    db = F.size(F.array_distinct(bigrams))
    return [
        # mean token length out of band, via cross-multiplication:
        # mean*10 < min_x10  <=>  sum_len*10 < min_x10*n
        (
            "bad_mean_token_len",
            (n > 0)
            & (
                (sum_len * 10 < F.lit(min_mean_len_x10) * n)
                | (sum_len * 10 > F.lit(max_mean_len_x10) * n)
            ),
        ),
        ("no_stopwords", _no_stopwords(toks, lang)),
        # dup_bigram_frac > pct/100  <=>  (nb-db)*100 > pct*nb
        ("repetitive", (nb - db) * 100 > F.lit(dup_bigram_pct) * nb),
        ("too_long", n > max_tokens),
        ("too_short", n < min_tokens),
    ]


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 5000,
    min_mean_len_x10: int = 20,   # mean token length >= 2.0 chars
    max_mean_len_x10: int = 120,  # mean token length <= 12.0 chars
    dup_bigram_pct: int = 20,     # drop when > 20% of bigrams are duplicates
    lang_col: str | None = None,
) -> DataFrame:
    """C4/Gopher-style composite keep/drop gate with per-rule reasons.

    Adds ``keep`` (boolean) and ``reasons`` (comma-joined sorted rule names
    that fired; '' when kept).  Reasons are data, not logs: the downstream
    corpus report GROUPs BY them, so they must be deterministic columns.

    ``lang_col`` names the document-language column; when given, the
    stopword rule judges each row against ITS language's marker list and
    abstains for languages without one (see :func:`_no_stopwords`) — the
    multilingual-corpus default for jobs/curate.py.  ``None`` keeps the
    English-only behavior for monolingual inputs.

    One codegen'd map pass, no shuffle; at 100 TB this runs at scan speed
    and the dropped fraction never leaves the executor.  The token/bigram
    arrays are projected once per row (see :func:`_bigrams`).
    """
    step = df.withColumn("_toks", _tokens(F.col(text_col))).withColumn(
        "_bg", _bigrams(F.col("_toks"))
    )
    rules = _quality_rules(
        F.col("_toks"), F.col("_bg"), min_tokens, max_tokens,
        min_mean_len_x10, max_mean_len_x10, dup_bigram_pct,
        lang=F.col(lang_col) if lang_col is not None else None,
    )
    flags = F.array(
        *[F.when(cond, F.lit(name)).otherwise(F.lit(None)) for name, cond in rules]
    )
    reasons = F.array_join(F.filter(flags, lambda x: x.isNotNull()), ",")
    return (
        step.withColumn("reasons", reasons)
        .withColumn("keep", F.col("reasons") == "")
        .drop("_toks", "_bg")
    )


def split_assign(
    id_col: Column,
    n_buckets: int = 1000,
    method: str = "xxhash",
    salt: int = 2024,
) -> Column:
    """Deterministic split bucket in [0, n_buckets) as a pure function of
    the record id — re-runs, backfills, and late-arriving shards land every
    record in the same bucket with no coordination.

    ``method='xxhash'`` (production): xxhash64(id, salt) — uniform for any
    id distribution, including clustered/auto-increment ids.
    ``method='lcg'`` (portable): a multiplicative mod map with exact
    integer semantics in ANY engine — the driver query uses it so the
    DuckDB oracle can replay the assignment bit-for-bit (xxhash64 is not
    SQL-portable).  Adequate when ids are uniform (they are a dense
    sequence here); production should prefer xxhash.
    """
    if method == "xxhash":
        return F.pmod(F.xxhash64(id_col, F.lit(salt)), F.lit(n_buckets))
    if method == "lcg":
        return F.pmod(id_col * F.lit(40503) + F.lit(salt), F.lit(n_buckets))
    raise ValueError(f"method must be 'xxhash' or 'lcg', got {method!r}")


def with_dataset_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    valid_pct: int = 10,
    method: str = "xxhash",
    salt: int = 2024,
) -> DataFrame:
    """Adds ``split`` in {'train','valid','test'} from the id's bucket.
    Percentages are integers out of 100; test gets the remainder."""
    bucket = split_assign(F.col(id_col), 100, method=method, salt=salt)
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + valid_pct, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def vocab_topk(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 50
) -> DataFrame:
    """Corpus vocabulary head: top-k tokens by total occurrences (ties by
    token), with document frequency.

    Plan shape at scale: explode is a Generate inside the scan stage; the
    occurrence count partial-aggregates map-side before the single shuffle
    on the token; ``count(distinct doc_id)`` expands to a two-phase
    aggregate on (token, doc_id) — both keyed on the token, so one
    logical key; the top-k is a TakeOrderedAndProject, never a full sort.
    """
    toks = df.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct(id_col).alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(k)
    )
