"""Incremental linkage == batch linkage, on every split of the input.

The contract (plans/incremental.py): folding batches B1, B2, ... into the
state one at a time yields mention-level labels IDENTICAL to running the
batch pipeline once over B1 ∪ B2 ∪ ....  Violations would be silent
(plausible-looking clusters, wrong membership), so the tests sweep the
interesting axes:

* multi-batch splits (2 and 3 batches) at the production threshold
  (refinement ON) and at a sub-refinement threshold (coarser blocks, more
  cross-batch edges);
* later batches carrying SMALLER rec_ids than earlier ones (labels are
  component minima — the alias-edge path must propagate the new min);
* a later batch whose value is identical to an already-clustered value
  (vkey match: no scoring, straight to the existing component);
* a later batch that MERGES two previously separate clusters (old star
  edges must be transitively connected to the new edges).
"""
from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from postal_address_spark.plans.incremental import (
    IncrementalConfig,
    incremental_link,
    incremental_link_mentions,
    mention_clusters,
)
from postal_address_spark.plans.pipeline import LinkageConfig, run_linkage
from postal_address_spark.synth import synth_transcripts_spark

SEED = 20260817


def _labels(df) -> set:
    return {(r["rec_id"], r["cluster_id"]) for r in df.collect()}


@pytest.fixture()
def state_dir():
    d = tempfile.mkdtemp(prefix="inc_state_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("n_batches,threshold", [(2, 0.82), (3, 0.7)])
def test_incremental_equals_batch(spark, state_dir, n_batches, threshold):
    transcripts = synth_transcripts_spark(
        spark, seed=SEED, n_convs=600, n_entities=120, typo_prob=0.3
    ).persist()

    batch_cfg = LinkageConfig(threshold=threshold)
    expected = _labels(run_linkage(spark, transcripts, batch_cfg)["clusters"])

    inc_cfg = IncrementalConfig(threshold=threshold, n_pb=8)
    split = F.pmod(F.xxhash64("conv_id"), F.lit(n_batches))
    for i in range(n_batches):
        incremental_link(
            spark, transcripts.where(split == i), state_dir, inc_cfg
        )
    got = _labels(mention_clusters(spark, state_dir))
    transcripts.unpersist()
    assert got == expected


def _mention_rows(spark, rows):
    return spark.createDataFrame(
        [
            (rid, line1, None, postal, city, "FR", None)
            for rid, line1, postal, city in rows
        ],
        "rec_id string, line1 string, line2 string, postal_code string, "
        "city_name string, country_code string, subdivision_code string",
    )


def _batch_reference(spark, all_rows, threshold=0.82):
    """Batch-path labels for raw mention rows (er_link composition)."""
    from postal_address_spark.operators.blocking import with_block_key
    from postal_address_spark.operators.cluster import assign_clusters
    from postal_address_spark.operators.normalize_op import normalize_mentions
    from postal_address_spark.operators.pairs import candidate_pairs
    from postal_address_spark.operators.scoring import score_pairs

    blocked = with_block_key(normalize_mentions(_mention_rows(spark, all_rows)))
    edges = score_pairs(
        candidate_pairs(blocked, threshold=threshold), threshold=threshold
    )
    return _labels(
        assign_clusters(
            blocked.where(F.col("block_key").isNotNull()),
            edges.select(
                F.col("rec_id_a").alias("src"), F.col("rec_id_b").alias("dst")
            ),
        )
    )


def _fold(spark, state_dir, rows, cfg):
    incremental_link_mentions(spark, _mention_rows(spark, rows), state_dir, cfg)


def test_later_batch_brings_smaller_rec_id(spark, state_dir):
    """Labels are component minima; a later batch with a smaller id for an
    ALREADY-SEEN tuple must drag the whole component's label down."""
    b1 = [
        ("m9", "12 rue de la paix", "75001", "Paris"),
        ("m8", "12 rue de la paiz", "75001", "Paris"),  # typo, links to m9
    ]
    b2 = [("m1", "12 rue de la paix", "75001", "Paris")]  # same tuple as m9
    cfg = IncrementalConfig(n_pb=4)
    _fold(spark, state_dir, b1, cfg)
    _fold(spark, state_dir, b2, cfg)
    got = _labels(mention_clusters(spark, state_dir))
    assert got == _batch_reference(spark, b1 + b2)
    assert got == {("m9", "m1"), ("m8", "m1"), ("m1", "m1")}


def test_identical_value_joins_without_scoring(spark, state_dir):
    b1 = [("m2", "7 avenue foch", "75116", "Paris")]
    b2 = [("m5", "7 avenue foch", "75116", "Paris")]
    cfg = IncrementalConfig(n_pb=4)
    _fold(spark, state_dir, b1, cfg)
    _fold(spark, state_dir, b2, cfg)
    got = _labels(mention_clusters(spark, state_dir))
    assert got == {("m2", "m2"), ("m5", "m2")}


def test_new_batch_merges_two_old_clusters(spark, state_dir):
    """b1 yields two separate clusters (same postal block, line1s too far
    apart); b2's value sits between them and links to both — the merged
    component must relabel the OLD mentions too."""
    # production scores (core kernels, same city): A-B 0.782 < 0.82 while
    # A-C 0.915 and B-C 0.836 — C bridges the two separate components.
    b1 = [
        ("m3", "10 amaranth court", "75010", "Paris"),
        ("m4", "10 zyx quay west", "75010", "Paris"),
    ]
    b2 = [("m6", "10 amaranth quay west", "75010", "Paris")]
    expected = _batch_reference(spark, b1 + b2)
    # the fixture only demonstrates a merge if the batch path merges:
    assert len({c for _, c in expected}) == 1, (
        "fixture drift: bridge no longer links both sides"
    )
    cfg = IncrementalConfig(n_pb=4)
    _fold(spark, state_dir, b1, cfg)
    mid = _labels(mention_clusters(spark, state_dir))
    assert len({c for _, c in mid}) == 2  # two clusters before the bridge
    _fold(spark, state_dir, b2, cfg)
    assert _labels(mention_clusters(spark, state_dir)) == expected


def test_untouched_blocks_unchanged_and_batch_labels_returned(
    spark, state_dir
):
    b1 = [
        ("m2", "1 place vendome", "75001", "Paris"),
        ("m3", "9 quai de grenelle", "75015", "Paris"),
    ]
    b2 = [("m4", "1 place vendome", "75001", "Paris")]  # touches 75001 only
    cfg = IncrementalConfig(n_pb=4)
    _fold(spark, state_dir, b1, cfg)
    out = incremental_link_mentions(
        spark, _mention_rows(spark, b2), state_dir, cfg
    )
    assert _labels(out["batch_labels"]) == {("m4", "m2")}
    assert {r["block_key"] for r in out["touched_blocks"].collect()} == {
        "FR|75001"
    }
    assert _labels(mention_clusters(spark, state_dir)) == {
        ("m2", "m2"), ("m4", "m2"), ("m3", "m3"),
    }


def test_n_pb_is_pinned_by_state_manifest(spark, state_dir):
    """The first fold writes n_pb to the state manifest; a later fold with
    a different n_pb must be REFUSED — it would prune/overwrite the wrong
    pb buckets and corrupt the state silently."""
    b1 = [("m1", "3 rue oberkampf", "75011", "Paris")]
    _fold(spark, state_dir, b1, IncrementalConfig(n_pb=4))
    with pytest.raises(ValueError, match="n_pb"):
        _fold(
            spark, state_dir,
            [("m2", "3 rue oberkampf", "75011", "Paris")],
            IncrementalConfig(n_pb=8),
        )
    # same n_pb still folds fine
    _fold(
        spark, state_dir,
        [("m2", "3 rue oberkampf", "75011", "Paris")],
        IncrementalConfig(n_pb=4),
    )
    assert _labels(mention_clusters(spark, state_dir)) == {
        ("m1", "m1"), ("m2", "m1"),
    }


# ---- publish_entities (durable entity-id loop over the state) ----

def test_publish_entities_across_folds(spark, state_dir, tmp_path):
    """jobs/link_incremental.py --entities-state: fold 1 bootstraps every
    id under the e0. prefix; fold 2's publish inherits ids for surviving
    entities and mints e1.-prefixed ids for genuinely new ones; entity
    ids stay injective per publish; a republish of unchanged labels is a
    no-op on the record-level assignment."""
    import os
    import sys

    from postal_address_spark.plans.incremental import publish_entities

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    import link_incremental

    t = synth_transcripts_spark(
        spark, seed=SEED, n_convs=80, n_entities=30, typo_prob=0.2
    ).persist()
    b1 = t.where(F.pmod(F.xxhash64("conv_id"), F.lit(2)) == 0)
    b2 = t.subtract(b1)
    p1, p2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    b1.write.parquet(p1)
    b2.write.parquet(p2)
    edir = str(tmp_path / "entities")

    s1 = link_incremental.main(
        ["--input", p1, "--state", state_dir, "--n-pb", "4",
         "--entities-state", edir],
        spark=spark,
    )
    ent1 = s1["entities"]
    assert ent1["publish_seq"] == 0
    assert ent1["n_new"] == ent1["n_entities"] > 0
    rec1 = {
        r.rec_id: r.entity_id
        for r in spark.read.parquet(f"{edir}/by_record").collect()
    }
    assert all(e.startswith("e0.") for e in rec1.values())

    s2 = link_incremental.main(
        ["--input", p2, "--state", state_dir, "--n-pb", "4",
         "--entities-state", edir],
        spark=spark,
    )
    ent2 = s2["entities"]
    assert ent2["publish_seq"] == 1
    assert (
        ent2["n_inherited"] + ent2["n_contended"] + ent2["n_new"]
        == ent2["n_entities"]
    )
    assert ent2["n_inherited"] > 0  # batch-1 entities survive the fold
    rows2 = spark.read.parquet(f"{edir}/entities").collect()
    # injectivity: one entity id per cluster, one cluster per entity id
    ids = [r.entity_id for r in rows2]
    assert len(ids) == len(set(ids))
    # inherited ids come from the previous publish; fresh ids from e1.
    prev_ids = set(rec1.values())
    for r in rows2:
        if r.status == "inherited":
            assert r.entity_id in prev_ids
        else:
            assert r.entity_id.startswith("e1.")
    rec2 = {
        r.rec_id: r.entity_id
        for r in spark.read.parquet(f"{edir}/by_record").collect()
    }
    assert set(rec1) <= set(rec2)  # batch-1 records still published

    # republish of UNCHANGED labels: everything inherits, assignment fixed
    labels = mention_clusters(spark, state_dir).localCheckpoint(eager=True)
    ent3 = publish_entities(spark, labels, edir)
    assert ent3["publish_seq"] == 2
    assert ent3["n_inherited"] == ent3["n_entities"]
    rec3 = {
        r.rec_id: r.entity_id
        for r in spark.read.parquet(f"{edir}/by_record").collect()
    }
    t.unpersist()
    assert rec3 == rec2
