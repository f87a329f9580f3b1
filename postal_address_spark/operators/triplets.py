"""Contrastive training-triplet mining from a linkage graph.

A resolved linkage is not just an output table — it is LABELED TRAINING
DATA for the next generation of the matcher (a learned similarity, an
embedding model, a reranker).  The standard recipe (Ditto, DeepMatcher,
sentence-transformers' triplet losses) wants, per anchor record:

* a POSITIVE — another record of the same entity, and
* a HARD NEGATIVE — the most-similar record of a DIFFERENT entity.

Random negatives are trivially easy (different postal code, different
country); what teaches the model the decision boundary is the co-blocked
near-miss the blocking already surfaced and the clustering rejected.
This module mines exactly those from artifacts the pipeline has anyway:
the scored candidate pairs and the cluster assignment.

Scale shape: the pair relation is doubled once (anchor on each side),
cluster labels join on rec_id, and each anchor's positive / hard
negative is a ``min(struct(dist, id))`` aggregation — partial map-side
combine, no window over the full pair relation, output cardinality
bounded by the anchor count.  Everything is integer distances and id
strings, so the driver gate hash-grades the full table against a DuckDB
replay (``er_training_triplets``).
"""
from pyspark.sql import DataFrame, functions as F


def mine_triplets(
    pairs: DataFrame,
    assignments: DataFrame,
    id_a: str = "rec_id_a",
    id_b: str = "rec_id_b",
    dist_col: str = "dist",
    id_col: str = "rec_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """(anchor, positive, hard-negative) triplets for matcher training.

    ``pairs``: scored candidate pairs ``(id_a, id_b, dist_col)`` with an
    INTEGER distance (smaller = more similar; pass a negated similarity
    rank for the other orientation).  NULL-distance pairs are dropped —
    a NULL inside the argmin struct would order differently across
    engines, and a pair the kernel could not score is not evidence.
    ``assignments``: the clustering ``(id_col, cluster_col)``.

    Per anchor record: ``pos_id`` = the SAME-cluster candidate at
    minimum distance (its most-similar confirmed match), ``neg_id`` =
    the CROSS-cluster candidate at minimum distance (its most-similar
    rejected near-miss — the hard negative).  Ties break on the
    neighbor id ascending; both selections are ``min(struct(dist, id))``
    aggregations.  Only anchors with BOTH a positive and a negative are
    emitted — a triplet loss needs the full triple, and singleton-
    cluster or never-contested records have nothing to teach.

    Output: ``(rec_id, cluster_id, pos_id, pos_dist, neg_id, neg_dist)``.
    """
    p = pairs.where(F.col(dist_col).isNotNull()).select(
        F.col(id_a).alias("_a"),
        F.col(id_b).alias("_b"),
        F.col(dist_col).alias("_dist"),
    )
    doubled = p.select(
        F.col("_a").alias("_anchor"), F.col("_b").alias("_other"), "_dist"
    ).unionByName(
        p.select(
            F.col("_b").alias("_anchor"), F.col("_a").alias("_other"), "_dist"
        )
    )
    lab = assignments.select(
        F.col(id_col).alias("_rid"), F.col(cluster_col).alias("_cl")
    )
    tagged = (
        doubled.join(lab.withColumnsRenamed({"_rid": "_anchor", "_cl": "_ca"}), "_anchor")
        .join(lab.withColumnsRenamed({"_rid": "_other", "_cl": "_co"}), "_other")
    )

    def _best(side: DataFrame, prefix: str) -> DataFrame:
        top = side.groupBy("_anchor").agg(
            F.min(
                F.struct(
                    F.col("_dist").alias("dist"), F.col("_other").alias("id")
                )
            ).alias("_top")
        )
        return top.select(
            "_anchor",
            F.col("_top.id").alias(f"{prefix}_id"),
            F.col("_top.dist").alias(f"{prefix}_dist"),
        )

    pos = _best(tagged.where(F.col("_ca") == F.col("_co")), "pos")
    neg = _best(tagged.where(F.col("_ca") != F.col("_co")), "neg")
    return (
        pos.join(neg, "_anchor")
        .join(lab, pos["_anchor"] == lab["_rid"])
        .select(
            F.col("_rid").alias(id_col),
            F.col("_cl").alias(cluster_col),
            "pos_id",
            "pos_dist",
            "neg_id",
            "neg_dist",
        )
    )
