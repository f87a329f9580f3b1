"""semantic.py: hashed-gram integer embeddings + sign-LSH semantic
near-dup detection.  The binding test is EXACT EQUALITY between the
LSH-bucketed path and the brute-force all-pairs grader on real fixture
data — recall 1.0 at the pinned seed, not a floor (the minhash/lsh_ann
adjudication).  Every decision is 64-bit integer arithmetic, so there is
no float boundary to guard.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postal_address_spark.operators.semantic import (  # noqa: E402
    conversation_semantic_dups,
    hashed_gram_embedding,
    hyperplanes,
    projection_matrix,
    semantic_near_dups,
    semantic_near_dups_exact,
)

SF = "/root/testdata/sf0.001"


def test_projection_matrix_deterministic_and_bounded():
    a = projection_matrix(16, 4, seed=7)
    b = projection_matrix(16, 4, seed=7)
    c = projection_matrix(16, 4, seed=8)
    assert a == b and a != c
    assert len(a) == 16 and all(len(r) == 4 for r in a)
    assert all(-2 <= v <= 2 for r in a for v in r)


def test_hyperplanes_shape():
    h = hyperplanes(3, 5, 8, seed=1)
    assert len(h) == 3 and len(h[0]) == 5 and len(h[0][0]) == 8


def test_embedding_shape_and_determinism(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "one two three four five"), (4, "short")],
        "doc_id long, text string",
    )
    embs = hashed_gram_embedding(docs, dim=4, vocab=16, seed=3)
    rows = {r["doc_id"]: r for r in embs.collect()}
    assert len(rows[1]["emb"]) == 4
    # 4 words -> 2 trigram shingles; short doc falls back to whole text
    assert rows[1]["n_grams"] == 2 and rows[4]["n_grams"] == 1
    # identical text -> identical embedding
    assert rows[1]["emb"] == rows[2]["emb"]
    # different content -> (overwhelmingly) different embedding
    assert rows[1]["emb"] != rows[3]["emb"]


def test_portable_and_fast_hash_modes_agree_structurally(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "g h i j k l")], "doc_id long, text string"
    )
    fast = hashed_gram_embedding(docs, dim=4, vocab=16, seed=3)
    portable = hashed_gram_embedding(docs, dim=4, vocab=16, seed=3, portable=True)
    fr = {r["doc_id"]: r for r in fast.collect()}
    pr = {r["doc_id"]: r for r in portable.collect()}
    # same gram sets (hash only changes the slot assignment)
    assert all(fr[i]["n_grams"] == pr[i]["n_grams"] for i in (1, 2))


def test_lsh_equals_bruteforce_on_fixture(spark):
    """Recall 1.0 at the pinned seed on the sf0.001 conversation corpus
    with planted paraphrase conversations (the driver fixture's shape) —
    exact equality with the all-pairs grader, both directions."""
    events = spark.read.parquet(f"{SF}/events.parquet")
    turns = (
        events.where(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .select(
            F.col("user_id").alias("conv_id"), "ts", "event_id",
            F.lower(F.col("event_type")).alias("action"),
        )
    )
    sel = turns.where(F.pmod(F.col("conv_id"), F.lit(5)) == 0)
    planted = sel.select(
        (F.col("conv_id") + F.lit(1000000)).alias("conv_id"),
        "ts", "event_id", "action",
    )
    turns = turns.union(planted)
    from postal_address_spark.operators.conversations import conversation_docs

    docs = conversation_docs(turns, "conv_id", ("ts", "event_id"), "action")
    embs = hashed_gram_embedding(docs, "seq", "conv_id", dim=8, vocab=64, seed=42)
    lsh = semantic_near_dups(
        embs, "conv_id", dim=8, tau_num=19, tau_den=20, n_tables=16, bits=4,
        seed=42,
    )
    exact = semantic_near_dups_exact(
        embs, "conv_id", dim=8, tau_num=19, tau_den=20
    )
    got = {(r["id_a"], r["id_b"]): (r["dot"], r["norm_a"], r["norm_b"])
           for r in lsh.collect()}
    want = {(r["id_a"], r["id_b"]): (r["dot"], r["norm_a"], r["norm_b"])
            for r in exact.collect()}
    assert got == want and len(want) > 0


def test_paraphrase_caught_disjoint_not(spark):
    base = " ".join(f"w{i}" for i in range(30))
    paraphrase = " ".join(("swapped" if i == 29 else f"w{i}") for i in range(30))
    disjoint = " ".join(f"z{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, base), (2, paraphrase), (3, disjoint)], "doc_id long, text string"
    )
    embs = hashed_gram_embedding(docs, dim=8, vocab=64, seed=42)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in semantic_near_dups_exact(
            embs, "doc_id", dim=8, tau_num=9, tau_den=10
        ).collect()
    }
    assert (1, 2) in pairs          # one word changed out of 30
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_identical_conversations_are_semantic_dups(spark):
    rows = [(c, i, f"act{i % 5}") for c in (1, 2) for i in range(12)]
    rows += [(3, i, f"other{i}") for i in range(12)]
    turns = spark.createDataFrame(rows, "conv_id long, turn_idx long, action string")
    dups = conversation_semantic_dups(
        turns, "conv_id", ("turn_idx",), "action", tau_num=19, tau_den=20
    )
    got = {(r["conv_a"], r["conv_b"]) for r in dups.collect()}
    assert got == {(1, 2)}
    one = dups.where((F.col("conv_a") == 1) & (F.col("conv_b") == 2)).first()
    # identical sequences: cosine exactly 1 -> dot == both norms
    assert one["dot"] == one["norm_a"] == one["norm_b"]


def test_threshold_validation(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    embs = hashed_gram_embedding(docs, dim=4, vocab=16)
    import pytest

    for tn, td in ((0, 10), (11, 10), (-1, 10)):
        with pytest.raises(ValueError):
            semantic_near_dups(embs, "doc_id", dim=4, tau_num=tn, tau_den=td)


def test_empty_input(spark):
    empty = spark.createDataFrame([], "conv_id long, turn_idx long, action string")
    assert conversation_semantic_dups(empty).count() == 0
