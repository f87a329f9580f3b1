"""Rare-token pair similarity: planted ground truth + the df-cap skew
guarantee (a stop token shared by everyone creates zero pairs)."""
from pyspark.sql import functions as F

from postal_address_spark.operators.token_join import doc_tokens, rare_token_pairs


def _docs(spark):
    rows = [
        # 'zephyr' appears in docs 1+2 only (df=2) -> strong pair signal;
        # 'quartz' in 1+3 (df=2); 'the' in all (df=6, capped out).
        (1, "the Zephyr quartz engine"),
        (2, "a zephyr, the second document"),
        (3, "QUARTZ the third"),
        (4, "the unrelated fourth"),
        (5, "the fifth has nothing uncommon shared"),
        (6, "the sixth: zephyr quartz BOTH rare tokens"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tokens_are_distinct_lowercase_sets(spark):
    toks = doc_tokens(_docs(spark), "text", "doc_id")
    d1 = {r.token for r in toks.where("doc_id = 1").collect()}
    assert d1 == {"the", "zephyr", "quartz", "engine"}


def test_rare_token_pairs_planted(spark):
    out = {
        (r.doc_a, r.doc_b): (r.n_shared, r.score)
        for r in rare_token_pairs(_docs(spark), max_df=3).collect()
    }
    # df: zephyr=3 (1,2,6), quartz=3 (1,3,6), the=6 (dropped),
    # second/document/... df=1 singles create no pairs.
    # w = 6 div 3 = 2 for zephyr/quartz.
    assert out[(1, 2)] == (1, 2)      # zephyr
    assert out[(1, 3)] == (1, 2)      # quartz
    assert out[(1, 6)] == (2, 4)      # both rare tokens
    assert out[(2, 6)] == (1, 2)
    assert out[(3, 6)] == (1, 2)
    # 'the' is shared by every doc but exceeds max_df: docs 4/5 pair with
    # nothing — the frequency filter IS the skew defense.
    assert not any(4 in p or 5 in p for p in out)


def test_min_score_threshold(spark):
    out = rare_token_pairs(_docs(spark), max_df=3, min_score=4).collect()
    assert [(r.doc_a, r.doc_b) for r in out] == [(1, 6)]


def test_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "only doc with words")],
        "doc_id long, text string",
    )
    assert rare_token_pairs(df, max_df=5).count() == 0
    toks = doc_tokens(df, "text", "doc_id")
    assert toks.where(F.col("doc_id").isin(1, 2)).count() == 0
