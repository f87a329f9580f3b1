"""Corpus-curation operators (operators/corpus.py): hand-computed ground
truth for repetition stats, quality-filter rules, split assignment, and
vocabulary top-k, plus plan guards (pure codegen, TakeOrdered top-k).
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_ground_truth(spark):
    from postal_address_spark.operators.corpus import repetition_stats

    df = _docs(
        spark,
        [
            (1, "a a a a"),
            (2, "x y z"),
            (3, ""),
            (4, None),
            (5, "one"),
        ],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in repetition_stats(df).drop("text").collect()
    }
    assert out[1]["n_tokens"] == 4 and out[1]["n_distinct_tokens"] == 1
    assert out[1]["dup_token_frac"] == 0.75
    # bigrams of "a a a a": ["a a", "a a", "a a"] -> 3 total, 1 distinct
    assert out[1]["n_bigrams"] == 3 and out[1]["n_distinct_bigrams"] == 1
    assert out[1]["dup_bigram_frac"] == round(2 / 3, 6)
    assert out[2]["dup_token_frac"] == 0.0 and out[2]["dup_bigram_frac"] == 0.0
    assert out[2]["n_bigrams"] == 2
    for blank in (3, 4):
        assert out[blank]["n_tokens"] == 0 and out[blank]["n_bigrams"] == 0
        assert out[blank]["dup_token_frac"] == 0.0
    assert out[5]["n_tokens"] == 1 and out[5]["n_bigrams"] == 0


def test_quality_filter_rules(spark):
    from postal_address_spark.operators.corpus import quality_filter

    long_words = (
        "aaaaaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbbbb "
        "cccccccccccccccccccc dddddddddddddddddddd the"
    )
    df = _docs(
        spark,
        [
            (1, "the cat sat on mat"),          # clean -> keep
            (2, "hi"),                           # short, no stopwords
            (3, "the a the a the a the a the a the a"),  # repeated bigrams
            (4, long_words),                     # mean token length 16.6
            (5, " ".join(["the"] * 5001)),       # too long (and repetitive)
        ],
    )
    out = {r["doc_id"]: r for r in quality_filter(df).collect()}
    assert out[1]["keep"] and out[1]["reasons"] == ""
    assert out[2]["reasons"] == "no_stopwords,too_short"
    assert out[3]["reasons"] == "repetitive"
    assert out[4]["reasons"] == "bad_mean_token_len"
    assert out[5]["reasons"] == "repetitive,too_long"
    assert not out[5]["keep"]


def test_quality_filter_stopwords_lang_aware(spark):
    """The stopword rule judges each row against ITS language's markers:
    a French doc with French stopwords passes, a known-language doc with
    none of its own markers fires, an unvendored language abstains."""
    from postal_address_spark.operators.corpus import quality_filter

    rows = [
        (1, "le chat dort dans la maison pres de la fenetre", "fr"),
        (2, "cat sleeps house window quietly tonight", "fr"),   # no fr markers
        (3, "the cat sat on the mat", "en"),
        (4, "some words entirely without markers here", "zh"),  # abstain
        (5, "der hund liegt unter dem tisch und schlaeft", "de"),
        (6, "el gato duerme en la casa junto a la ventana", "es"),
        (7, "words with no markers at all", None),              # NULL: abstain
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r["doc_id"]: r["reasons"]
        for r in quality_filter(df, lang_col="lang").collect()
    }
    assert out[1] == "" and out[3] == "" and out[5] == "" and out[6] == ""
    assert "no_stopwords" in out[2]
    assert "no_stopwords" not in out[4]
    assert "no_stopwords" not in out[7]
    # default (no lang column) keeps the monolingual English behavior
    mono = {
        r["doc_id"]: r["reasons"]
        for r in quality_filter(df.drop("lang")).collect()
    }
    assert "no_stopwords" in mono[1]  # French doc, judged against en markers


def test_split_assignment_deterministic_and_covering(spark):
    from pyspark.sql import functions as F

    from postal_address_spark.operators.corpus import (
        split_assign,
        with_dataset_split,
    )

    ids = spark.range(500).withColumnRenamed("id", "doc_id")
    # xxhash (production): stable across evaluations, full bucket range
    a = ids.select("doc_id", split_assign(F.col("doc_id")).alias("b")).collect()
    b = ids.select("doc_id", split_assign(F.col("doc_id")).alias("b")).collect()
    assert a == b
    buckets = {r["b"] for r in a}
    assert all(0 <= x < 1000 for x in buckets) and len(buckets) > 200

    # lcg (portable): exact integer semantics replayable anywhere
    got = {
        r["doc_id"]: r["b"]
        for r in ids.select(
            "doc_id", split_assign(F.col("doc_id"), 100, method="lcg").alias("b")
        ).collect()
    }
    assert got == {i: (i * 40503 + 2024) % 100 for i in range(500)}

    splits = dict(
        with_dataset_split(ids, method="xxhash").groupBy("split").count().collect()
    )
    assert set(splits) == {"train", "valid", "test"}
    assert splits["train"] > splits["valid"] and splits["train"] > splits["test"]
    assert sum(splits.values()) == 500

    with pytest.raises(ValueError):
        split_assign(F.col("doc_id"), method="nope")


def test_vocab_topk_ground_truth(spark):
    from postal_address_spark.operators.corpus import vocab_topk

    df = _docs(spark, [(1, "a b a"), (2, "b c")])
    rows = vocab_topk(df, k=2).collect()
    assert [(r["token"], r["n_occurrences"], r["n_docs"]) for r in rows] == [
        ("a", 2, 1),
        ("b", 2, 2),
    ]


def test_length_dispersion_udaf_ground_truth(spark):
    from postal_address_spark.operators.grouped_stats import length_dispersion

    df = spark.createDataFrame(
        [("en", 1), ("en", 2), ("en", 4), ("en", 100), ("fr", 7)],
        "lang string, n_chars long",
    )
    rows = {r["lang"]: r for r in length_dispersion(df).collect()}
    # en: median(1,2,4,100)=3.0; deviations (2,1,1,97) -> mad 1.5
    assert rows["en"]["n_docs"] == 4
    assert rows["en"]["med_len"] == 3.0 and rows["en"]["mad_len"] == 1.5
    assert rows["fr"]["med_len"] == 7.0 and rows["fr"]["mad_len"] == 0.0


def test_length_dispersion_single_pandas_aggregate(spark):
    """All three UDAFs evaluate in ONE AggregateInPandas over one shuffle."""
    import __spark_entry__ as em

    plan = (
        em.queries()["length_dispersion"](spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # Spark 4 names the grouped-agg pandas node ArrowAggregatePython
    # (AggregateInPandas in 3.x) — either way, exactly ONE of it
    n = plan.count("ArrowAggregatePython") + plan.count("AggregateInPandas")
    assert n == 1, plan[:2000]


def test_corpus_plans(spark):
    """Repetition/quality are pure codegen (no Python eval nodes, no
    shuffle) with the token split appearing exactly ONCE in the optimized
    plan — a second occurrence means the token/bigram arrays were
    re-inlined into a HOF lambda (corpus.py _bigrams rationale, the 40x
    shape); vocab top-k is a TakeOrdered, never a global sort."""
    import __spark_entry__ as em

    qs = em.queries()
    for name in ("doc_repetition", "quality_filter_stats", "dataset_split"):
        q = qs[name](spark, SF)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, name
        opt = q._jdf.queryExecution().optimizedPlan().toString()
        expect = 0 if name == "dataset_split" else 1
        assert opt.count("split(") == expect, (name, opt[:2000])
    vocab_plan = (
        qs["vocab_topk"](spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in vocab_plan
    assert "ArrowEvalPython" not in vocab_plan
