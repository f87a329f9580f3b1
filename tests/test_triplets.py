"""mine_triplets: hand-computed triplets on a small labeled graph —
argmin selection, tie-breaks, NULL-distance drops, both-sides-required.
"""
import os
import sys

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postal_address_spark.operators.triplets import mine_triplets


PAIR_SCHEMA = StructType(
    [
        StructField("rec_id_a", StringType()),
        StructField("rec_id_b", StringType()),
        StructField("dist", IntegerType()),
    ]
)


def _run(spark, pairs, assignments):
    p = spark.createDataFrame(pairs, PAIR_SCHEMA)
    a = spark.createDataFrame(assignments, "rec_id string, cluster_id string")
    return {
        r.rec_id: (r.cluster_id, r.pos_id, r.pos_dist, r.neg_id, r.neg_dist)
        for r in mine_triplets(p, a).collect()
    }


def test_triplets_hand_computed(spark):
    assignments = [
        ("a", "X"), ("b", "X"), ("c", "X"),
        ("d", "Y"), ("e", "Y"),
        ("f", "Z"),  # singleton: never earns a positive
    ]
    pairs = [
        ("a", "b", 1), ("a", "c", 2), ("a", "d", 3),
        ("b", "c", 1), ("c", "d", 2), ("d", "e", 1),
        ("b", "e", 4), ("c", "f", 5),
        ("a", "e", None),  # unscorable pair: dropped, NOT a's negative
    ]
    got = _run(spark, pairs, assignments)
    assert got == {
        "a": ("X", "b", 1, "d", 3),
        # b's positives tie at dist 1 -> neighbor id ascending picks a
        "b": ("X", "a", 1, "e", 4),
        "c": ("X", "b", 1, "d", 2),
        "d": ("Y", "e", 1, "c", 2),
        "e": ("Y", "d", 1, "b", 4),
        # f: cross-cluster candidate only -> no positive -> no triplet
    }


def test_triplets_require_both_sides(spark):
    # one pure-positive pair and one pure-negative pair, disjoint anchors:
    # nobody has both, so the output is empty
    assignments = [("a", "X"), ("b", "X"), ("c", "Y"), ("d", "Z")]
    pairs = [("a", "b", 1), ("c", "d", 2)]
    assert _run(spark, pairs, assignments) == {}


def test_triplets_symmetric_doubling(spark):
    # the pair is stored once but serves BOTH endpoints as anchors
    assignments = [("a", "X"), ("b", "X"), ("c", "Y")]
    pairs = [("a", "b", 2), ("a", "c", 7), ("b", "c", 9)]
    got = _run(spark, pairs, assignments)
    assert got["a"] == ("X", "b", 2, "c", 7)
    assert got["b"] == ("X", "a", 2, "c", 9)
    assert "c" not in got  # only cross-cluster candidates, no positive
