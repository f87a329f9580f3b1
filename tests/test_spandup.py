"""span_dup_stats (operators/spandup.py) vs a literal Python re-statement
of the spec: per doc, the w-gram spans that occur verbatim in ANOTHER
document, and the union length of their [pos, pos+w) intervals."""
from __future__ import annotations

import pytest

from postal_address_spark.operators.spandup import (
    contamination_stats,
    span_dup_stats,
)


def _brute(rows, w):
    toks = {
        i: (t or "").strip().lower().split() if (t or "").strip() else []
        for i, t in rows
    }
    gram_docs: dict[tuple, set] = {}
    for i, ts in toks.items():
        for p in range(len(ts) - w + 1):
            gram_docs.setdefault(tuple(ts[p : p + w]), set()).add(i)
    want = {}
    for i, ts in toks.items():
        pos = [
            p
            for p in range(len(ts) - w + 1)
            if len(gram_docs[tuple(ts[p : p + w])]) >= 2
        ]
        covered = set()
        for p in pos:
            covered.update(range(p, p + w))
        want[i] = (len(ts), max(len(ts) - w + 1, 0), len(pos), len(covered))
    return want


SHARED = "the quick brown fox jumps over the lazy dog tonight"
DOCS = [
    (1, f"alpha beta {SHARED} gamma delta"),
    (2, f"{SHARED} unrelated trailing words here now"),
    (3, "totally different content with no overlap at all whatsoever okay"),
    # within-doc repeated span, present in NO other doc: must NOT count
    (4, "rep one two three four five rep one two three four five"),
    (5, ""),
    (6, None),
    (7, "short text"),
    # exact duplicate pair: everything covered
    (8, "identical twin document body with enough tokens to gram"),
    (9, "identical twin document body with enough tokens to gram"),
]


@pytest.mark.parametrize("w", [3, 5, 8])
def test_matches_brute_force(spark, w):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_grams, r.n_dup_grams, r.dup_token_cover)
        for r in span_dup_stats(df, w=w).collect()
    }
    assert got == _brute(DOCS, w)


def test_within_doc_repeat_not_counted(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    out = {r.doc_id: r.n_dup_grams for r in span_dup_stats(df, w=5).collect()}
    assert out[4] == 0  # doc 4's repeat exists only inside doc 4
    assert out[8] > 0 and out[9] > 0


def test_all_docs_reported(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    assert span_dup_stats(df, w=8).count() == len(DOCS)


def test_w_too_small_rejected(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    with pytest.raises(ValueError):
        span_dup_stats(df, w=1)


# -- contamination_stats ----------------------------------------------------

BENCH = [
    (100, SHARED),  # contaminates docs 1 and 2
    (101, "identical twin document body with enough tokens to gram"),
    (102, ""),
]


def _brute_contam(corpus, bench, w):
    def toks(t):
        return (t or "").strip().lower().split() if (t or "").strip() else []

    bench_grams = {
        tuple(ts[p : p + w])
        for _, t in bench
        for ts in [toks(t)]
        for p in range(len(ts) - w + 1)
    }
    want = {}
    for i, t in corpus:
        ts = toks(t)
        pos = [
            p
            for p in range(len(ts) - w + 1)
            if tuple(ts[p : p + w]) in bench_grams
        ]
        covered = set()
        for p in pos:
            covered.update(range(p, p + w))
        want[i] = (len(ts), max(len(ts) - w + 1, 0), len(pos), len(covered))
    return want


@pytest.mark.parametrize("w", [3, 5, 8])
def test_contamination_matches_brute_force(spark, w):
    corpus = spark.createDataFrame(DOCS, "doc_id int, text string")
    bench = spark.createDataFrame(BENCH, "doc_id int, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_grams, r.n_contam_grams, r.contam_token_cover)
        for r in contamination_stats(corpus, bench, w=w).collect()
    }
    assert got == _brute_contam(DOCS, BENCH, w)


def test_contamination_full_cover_for_verbatim_copy(spark):
    corpus = spark.createDataFrame(DOCS, "doc_id int, text string")
    bench = spark.createDataFrame(BENCH, "doc_id int, text string")
    out = {
        r.doc_id: (r.n_tokens, r.contam_token_cover)
        for r in contamination_stats(corpus, bench, w=5).collect()
    }
    # docs 8/9 are verbatim benchmark doc 101: every token covered
    assert out[8][0] == out[8][1] > 0
    assert out[9][0] == out[9][1] > 0
    # doc 3 shares nothing with the benchmark
    assert out[3][1] == 0
