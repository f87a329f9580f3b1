"""Unigram-rarity stats (operators/rarity.py): hand-computed df math,
case folding, blank/NULL totality, and hapax accounting."""
from __future__ import annotations

from postal_address_spark.operators.rarity import doc_rarity_stats


def _stats(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: (
            r["n_tokens"], r["sum_df"], r["min_df"], r["n_hapax"]
        )
        for r in doc_rarity_stats(df).collect()
    }


def test_hand_computed_df_stats(spark):
    got = _stats(spark, [
        (1, "a b A"),          # case folds: 'A' == 'a'
        (2, "b c"),
        (3, "c d   d"),        # run of whitespace = one separator
        (4, ""),
        (5, None),
    ])
    # df: a -> 1 doc, b -> 2, c -> 2, d -> 1
    assert got[1] == (3, 1 + 2 + 1, 1, 2)   # a,b,a ; both 'a' are hapax
    assert got[2] == (2, 2 + 2, 2, 0)
    assert got[3] == (3, 2 + 1 + 1, 1, 2)
    # blank and NULL text: zero tokens, NULL df stats (errors are data)
    assert got[4] == (0, None, None, None)
    assert got[5] == (0, None, None, None)
    assert len(got) == 5  # every doc reported, token-less included


def test_uniform_corpus_has_no_hapax(spark):
    got = _stats(spark, [(i, "x y") for i in range(4)])
    assert all(v == (2, 8, 4, 0) for v in got.values())


def test_occurrences_not_distinct_tokens(spark):
    # n_tokens counts occurrences; sum_df weights each occurrence
    got = _stats(spark, [(1, "z z z z"), (2, "w")])
    assert got[1] == (4, 4, 1, 4)
    assert got[2] == (1, 1, 1, 1)
