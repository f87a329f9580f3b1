"""Retraction == batch linkage over the survivors, on every scenario.

The contract (plans/incremental.py:retract_mentions): removing a set of
mentions from the incremental state yields labels IDENTICAL to running
the batch pipeline once over the surviving mentions.  The dangerous
regimes are swept explicitly:

* a retracted value that BRIDGED two sub-communities (the cluster must
  split — exactly what star edges alone cannot express);
* retracting a value's representative (min rec_id) while other mentions
  survive (the value must be renamed to its new min everywhere);
* retracting a NON-representative mention (nothing may change but the
  mention_map row — zero affected blocks);
* an alias phantom minimum on an UNtouched value inside an affected
  block (the recompute must rename that value to its true min or its
  label regresses to the stale stored id);
* folding a NEW batch after a retraction, re-introducing a retracted
  tuple (it must be scored fresh against the survivors);
* retracting everything / unknown ids / repeated retraction
  (idempotency), and the legacy-state refusal.
"""
from __future__ import annotations

import json
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from postal_address_spark.plans.incremental import (
    IncrementalConfig,
    incremental_link,
    incremental_link_mentions,
    mention_clusters,
    retract_mentions,
)
from postal_address_spark.synth import synth_transcripts_spark

SEED = 20260819


def _labels(df) -> set:
    return {(r["rec_id"], r["cluster_id"]) for r in df.collect()}


@pytest.fixture()
def state_dir():
    d = tempfile.mkdtemp(prefix="retract_state_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _mention_rows(spark, rows):
    return spark.createDataFrame(
        [
            (rid, line1, None, postal, city, "FR", None)
            for rid, line1, postal, city in rows
        ],
        "rec_id string, line1 string, line2 string, postal_code string, "
        "city_name string, country_code string, subdivision_code string",
    )


def _batch_reference_df(spark, mentions_df, threshold=0.82):
    """Batch-path labels for a raw mention DataFrame."""
    from postal_address_spark.operators.blocking import with_block_key
    from postal_address_spark.operators.cluster import assign_clusters
    from postal_address_spark.operators.normalize_op import normalize_mentions
    from postal_address_spark.operators.pairs import candidate_pairs
    from postal_address_spark.operators.scoring import score_pairs

    blocked = with_block_key(normalize_mentions(mentions_df))
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


def _batch_reference(spark, all_rows, threshold=0.82):
    return _batch_reference_df(spark, _mention_rows(spark, all_rows), threshold)


def _fold(spark, state_dir, rows, cfg):
    incremental_link_mentions(spark, _mention_rows(spark, rows), state_dir, cfg)


def test_retract_equals_batch_on_survivors_synth(spark, state_dir):
    """Scale sweep: fold synthetic transcripts in two batches, retract a
    deterministic ~1/5 of all mentions, and match the batch pipeline over
    the survivors exactly."""
    from postal_address_spark.operators.extract import extract_mentions

    transcripts = synth_transcripts_spark(
        spark, seed=SEED, n_convs=600, n_entities=120, typo_prob=0.3
    ).persist()
    mentions = extract_mentions(transcripts).persist()

    cfg = IncrementalConfig(n_pb=8)
    split = F.pmod(F.xxhash64("conv_id"), F.lit(2))
    for i in range(2):
        incremental_link(
            spark, transcripts.where(split == i), state_dir, cfg
        )

    retract = mentions.where(F.pmod(F.xxhash64("rec_id"), F.lit(5)) == 0)
    summary = retract_mentions(
        spark, retract.select("rec_id"), state_dir
    )
    assert summary["retracted_mentions"] > 0

    survivors = mentions.join(retract.select("rec_id"), "rec_id", "left_anti")
    expected = _batch_reference_df(spark, survivors)
    got = _labels(mention_clusters(spark, state_dir))
    transcripts.unpersist()
    mentions.unpersist()
    assert got == expected


def test_retract_bridge_splits_cluster(spark, state_dir):
    """m6 bridges m3 and m4 (A-B below threshold, A-C and B-C above);
    retracting m6 must SPLIT the merged cluster back into two — the
    regime stored star edges alone cannot reproduce."""
    b1 = [
        ("m3", "10 amaranth court", "75010", "Paris"),
        ("m4", "10 zyx quay west", "75010", "Paris"),
    ]
    b2 = [("m6", "10 amaranth quay west", "75010", "Paris")]
    cfg = IncrementalConfig(n_pb=4)
    _fold(spark, state_dir, b1, cfg)
    _fold(spark, state_dir, b2, cfg)
    merged = _labels(mention_clusters(spark, state_dir))
    assert len({c for _, c in merged}) == 1  # fixture: genuinely bridged

    summary = retract_mentions(spark, ["m6"], state_dir)
    assert summary["dead_values"] == 1
    got = _labels(mention_clusters(spark, state_dir))
    assert got == _batch_reference(spark, b1)
    assert got == {("m3", "m3"), ("m4", "m4")}


def test_retract_representative_renames_value(spark, state_dir):
    """m1 and m9 share one tuple (value id m1 after the alias fold);
    retracting m1 must rename the value to m9 and relabel the component."""
    b1 = [
        ("m9", "12 rue de la paix", "75001", "Paris"),
        ("m8", "12 rue de la paiz", "75001", "Paris"),  # typo, links
    ]
    b2 = [("m1", "12 rue de la paix", "75001", "Paris")]  # same tuple as m9
    cfg = IncrementalConfig(n_pb=4)
    _fold(spark, state_dir, b1, cfg)
    _fold(spark, state_dir, b2, cfg)
    assert _labels(mention_clusters(spark, state_dir)) == {
        ("m9", "m1"), ("m8", "m1"), ("m1", "m1"),
    }

    summary = retract_mentions(spark, ["m1"], state_dir)
    assert summary["dead_values"] == 0
    assert summary["renamed_values"] == 0  # value id was m9; m1 was an alias
    got = _labels(mention_clusters(spark, state_dir))
    assert got == _batch_reference(spark, b1)
    assert got == {("m9", "m8"), ("m8", "m8")}


def test_retract_stored_min_with_survivor(spark, state_dir):
    """The STORED representative (the value's min rec_id at fold time)
    is retracted while a later same-tuple mention survives: the value
    must be renamed to the surviving min."""
    b1 = [
        ("m2", "5 rue st honore", "75001", "Paris"),
        ("m7", "5 rue st honoré", "75001", "Paris"),  # links to m2
    ]
    b2 = [("m5", "5 rue st honore", "75001", "Paris")]  # same tuple as m2
    cfg = IncrementalConfig(n_pb=4)
    _fold(spark, state_dir, b1, cfg)
    _fold(spark, state_dir, b2, cfg)

    summary = retract_mentions(spark, ["m2"], state_dir)
    assert summary["dead_values"] == 0
    assert summary["renamed_values"] == 1  # m2 -> m5
    got = _labels(mention_clusters(spark, state_dir))
    assert got == _batch_reference(
        spark, [b1[1], ("m5", "5 rue st honore", "75001", "Paris")]
    )
    assert got == {("m7", "m5"), ("m5", "m5")}


def test_retract_non_representative_touches_nothing(spark, state_dir):
    b1 = [
        ("m2", "8 boulevard haussmann", "75009", "Paris"),
        ("m6", "8 boulevard haussmann", "75009", "Paris"),  # same tuple
    ]
    cfg = IncrementalConfig(n_pb=4)
    _fold(spark, state_dir, b1, cfg)
    summary = retract_mentions(spark, ["m6"], state_dir)
    assert summary == {
        "retracted_mentions": 1, "dead_values": 0,
        "renamed_values": 0, "affected_blocks": 0,
    }
    assert _labels(mention_clusters(spark, state_dir)) == {("m2", "m2")}


def test_untouched_value_keeps_alias_min_in_affected_block(spark, state_dir):
    """The alias-phantom trap: value V (stored id m9) gained label m1 via
    a later same-tuple mention; value W in the SAME block dies by
    retraction.  The block recompute must still label V as m1 — i.e. the
    effective-id rename must cover UNtouched values of affected blocks,
    not only the retracted ones."""
    b1 = [
        ("m9", "3 rue de rivoli", "75004", "Paris"),   # value V
        ("m8", "99 xyzxyz zzz", "75004", "Paris"),      # value W, no link
    ]
    b2 = [("m1", "3 rue de rivoli", "75004", "Paris")]  # alias: V -> m1
    cfg = IncrementalConfig(n_pb=4)
    _fold(spark, state_dir, b1, cfg)
    _fold(spark, state_dir, b2, cfg)
    assert _labels(mention_clusters(spark, state_dir)) == {
        ("m9", "m1"), ("m8", "m8"), ("m1", "m1"),
    }

    summary = retract_mentions(spark, ["m8"], state_dir)
    assert summary["dead_values"] == 1
    got = _labels(mention_clusters(spark, state_dir))
    assert got == _batch_reference(spark, [b1[0]] + b2)
    assert got == {("m9", "m1"), ("m1", "m1")}


def test_fold_after_retraction_rescores_reintroduced_tuple(spark, state_dir):
    """A tuple whose value died by retraction arrives again in a LATER
    batch: it must be treated as new (its vkey is gone from the state)
    and scored fresh against the survivors."""
    b1 = [
        ("m3", "21 avenue victor hugo", "75116", "Paris"),
        ("m4", "21 avenue viktor hugo", "75116", "Paris"),  # links to m3
    ]
    cfg = IncrementalConfig(n_pb=4)
    _fold(spark, state_dir, b1, cfg)
    retract_mentions(spark, ["m3"], state_dir)
    assert _labels(mention_clusters(spark, state_dir)) == {("m4", "m4")}

    b2 = [("m2", "21 avenue victor hugo", "75116", "Paris")]  # same as dead m3
    _fold(spark, state_dir, b2, cfg)
    got = _labels(mention_clusters(spark, state_dir))
    assert got == _batch_reference(spark, [b1[1]] + b2)
    assert got == {("m4", "m2"), ("m2", "m2")}


def test_retract_everything_empties_state(spark, state_dir):
    b1 = [
        ("m1", "2 rue du bac", "75007", "Paris"),
        ("m2", "4 rue du bac", "75007", "Paris"),
    ]
    cfg = IncrementalConfig(n_pb=4)
    _fold(spark, state_dir, b1, cfg)
    summary = retract_mentions(spark, ["m1", "m2"], state_dir)
    assert summary["retracted_mentions"] == 2
    assert summary["dead_values"] == 2
    assert mention_clusters(spark, state_dir).count() == 0
    # and the state still accepts new folds
    _fold(spark, state_dir, [("m5", "2 rue du bac", "75007", "Paris")], cfg)
    assert _labels(mention_clusters(spark, state_dir)) == {("m5", "m5")}


def test_retract_unknown_and_repeat_are_noops(spark, state_dir):
    b1 = [("m1", "6 rue mouffetard", "75005", "Paris")]
    cfg = IncrementalConfig(n_pb=4)
    _fold(spark, state_dir, b1, cfg)
    assert retract_mentions(spark, ["zz_nope"], state_dir) == {
        "retracted_mentions": 0, "dead_values": 0,
        "renamed_values": 0, "affected_blocks": 0,
    }
    retract_mentions(spark, ["m1"], state_dir)
    # second retraction of the same id: the mention is already gone
    assert retract_mentions(spark, ["m1"], state_dir)[
        "retracted_mentions"
    ] == 0
    assert mention_clusters(spark, state_dir).count() == 0


def test_link_incremental_job_retract_path(spark, tmp_path):
    """Deploy surface: jobs/link_incremental.py --retract removes the ids
    and the materialized labels equal the batch run over the survivors."""
    import os
    import sys

    from postal_address_spark.operators.extract import extract_mentions

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    import link_incremental

    transcripts = synth_transcripts_spark(
        spark, seed=SEED, n_convs=80, n_entities=30, typo_prob=0.2
    ).persist()
    inp = str(tmp_path / "transcripts")
    transcripts.write.parquet(inp)
    state = str(tmp_path / "state")

    link_incremental.main(
        ["--input", inp, "--state", state, "--n-pb", "4"], spark=spark
    )

    mentions = extract_mentions(transcripts).persist()
    retract = mentions.where(
        F.pmod(F.xxhash64("rec_id"), F.lit(4)) == 0
    ).select("rec_id")
    ids = str(tmp_path / "retract_ids")
    retract.write.parquet(ids)
    out = str(tmp_path / "labels")
    summary = link_incremental.main(
        ["--retract", ids, "--state", state, "--output", out], spark=spark
    )
    assert summary["retracted_mentions"] == retract.count()

    survivors = mentions.join(retract, "rec_id", "left_anti")
    expected = _batch_reference_df(spark, survivors)
    got = {
        (r["rec_id"], r["cluster_id"])
        for r in spark.read.parquet(out).collect()
    }
    transcripts.unpersist()
    mentions.unpersist()
    assert got == expected


def test_legacy_state_without_edge_log_is_refused(spark, state_dir):
    import os

    from postal_address_spark.sources.fs import fs_read_text, fs_write_text

    b1 = [("m1", "14 rue cler", "75007", "Paris")]
    _fold(spark, state_dir, b1, IncrementalConfig(n_pb=4))
    # simulate a state created before the edge log existed — rewrite the
    # manifest through the SAME Hadoop FS the engine reads with (a plain
    # open() edit would invalidate the local FS checksum sidecar)
    manifest = os.path.join(state_dir, "_manifest.json")
    m = json.loads(fs_read_text(spark, manifest))
    m.pop("edge_log")
    fs_write_text(spark, manifest, json.dumps(m))
    with pytest.raises(ValueError, match="edge log"):
        retract_mentions(spark, ["m1"], state_dir)
