"""Streaming linkage ingest == batch linkage, at any micro-batch split.

``streaming/link_stream.py`` drives the verified incremental fold from a
``foreachBatch`` sink; these tests assert (1) the drained stream's labels
equal the batch pipeline over the whole input regardless of how the
FileStreamSource carves micro-batches, (2) a re-run drains nothing new,
and (3) a replayed epoch (at-least-once delivery) is a no-op thanks to
the epoch markers.
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile

import pytest
from pyspark.sql import functions as F

from postal_address_spark.plans.incremental import (
    IncrementalConfig,
    mention_clusters,
)
from postal_address_spark.plans.pipeline import LinkageConfig, run_linkage
from postal_address_spark.streaming.link_stream import make_fold, run_available
from postal_address_spark.synth import synth_transcripts_spark

SEED = 20260818


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="stream_link_")
    yield {
        "input": os.path.join(root, "input"),
        "state": os.path.join(root, "state"),
        "ckpt": os.path.join(root, "ckpt"),
    }
    shutil.rmtree(root, ignore_errors=True)


def _labels(df) -> set:
    return {(r["rec_id"], r["cluster_id"]) for r in df.collect()}


def test_streaming_fold_equals_batch_and_is_idempotent(spark, dirs):
    transcripts = synth_transcripts_spark(
        spark, seed=SEED, n_convs=500, n_entities=100, typo_prob=0.3
    ).persist()
    expected = _labels(run_linkage(spark, transcripts, LinkageConfig())["clusters"])

    # three arrival files -> three micro-batches at maxFilesPerTrigger=1
    split = F.pmod(F.xxhash64("conv_id"), F.lit(3))
    for i in range(3):
        transcripts.where(split == i).coalesce(1).write.mode("append").parquet(
            dirs["input"]
        )
    transcripts.unpersist()

    cfg = IncrementalConfig(n_pb=8)
    n = run_available(
        spark, dirs["input"], dirs["state"], dirs["ckpt"], cfg
    )
    assert n == 3  # one fold per file
    assert _labels(mention_clusters(spark, dirs["state"])) == expected

    # drained stream: a second run folds nothing, labels unchanged
    assert run_available(
        spark, dirs["input"], dirs["state"], dirs["ckpt"], cfg
    ) == 0
    assert _labels(mention_clusters(spark, dirs["state"])) == expected


def test_foreign_checkpoint_refused(spark, dirs):
    """A state dir is bound to its first stream checkpoint: a different
    checkpoint restarts epoch ids at 0, whose markers would silently skip
    real folds — run_available must refuse it loudly."""
    rows = spark.createDataFrame(
        [("m1", "3 rue neuve", None, "75002", "Paris", "FR", None)],
        "rec_id string, line1 string, line2 string, postal_code string, "
        "city_name string, country_code string, subdivision_code string",
    )
    rows.coalesce(1).write.parquet(dirs["input"])
    from postal_address_spark.streaming.link_stream import MENTION_DDL

    run_available(
        spark, dirs["input"], dirs["state"], dirs["ckpt"],
        IncrementalConfig(n_pb=4), schema=MENTION_DDL, transcripts=False,
    )
    with pytest.raises(ValueError, match="bound to stream checkpoint"):
        run_available(
            spark, dirs["input"], dirs["state"], dirs["ckpt"] + "_other",
            IncrementalConfig(n_pb=4), schema=MENTION_DDL, transcripts=False,
        )


def test_link_stream_job(spark, dirs):
    """jobs/link_stream.py: repeated invocations drain only new files."""
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "jobs"),
    )
    import link_stream

    transcripts = synth_transcripts_spark(
        spark, seed=SEED, n_convs=120, n_entities=30, typo_prob=0.2
    )
    transcripts.coalesce(1).write.mode("append").parquet(dirs["input"])
    argv = [
        "--input", dirs["input"], "--state", dirs["state"],
        "--checkpoint", dirs["ckpt"], "--n-pb", "4",
    ]
    first = link_stream.main(argv, spark=spark)
    assert first["micro_batches_folded"] == 1
    assert first["total_mentions"] > 0

    # nothing new landed: second tick folds nothing, totals unchanged
    second = link_stream.main(argv, spark=spark)
    assert second["micro_batches_folded"] == 0
    assert second["total_mentions"] == first["total_mentions"]
    assert second["total_clusters"] == first["total_clusters"]


def test_replayed_epoch_is_noop(spark, dirs):
    rows = spark.createDataFrame(
        [("m1", "12 rue de la paix", None, "75001", "Paris", "FR", None)],
        "rec_id string, line1 string, line2 string, postal_code string, "
        "city_name string, country_code string, subdivision_code string",
    )
    fold = make_fold(dirs["state"], IncrementalConfig(n_pb=4), transcripts=False)
    fold(rows, 0)
    first = _labels(mention_clusters(spark, dirs["state"]))
    fold(rows, 0)  # at-least-once replay of the SAME epoch: marker skips it
    assert _labels(mention_clusters(spark, dirs["state"])) == first == {
        ("m1", "m1")
    }
    # a NEW epoch with new data does fold
    rows2 = rows.withColumn("rec_id", F.lit("m2"))
    fold(rows2, 1)
    assert _labels(mention_clusters(spark, dirs["state"])) == {
        ("m1", "m1"), ("m2", "m1")
    }


def test_mid_write_crash_detected_and_recovered(spark, dirs):
    """A fold that died inside the four-table write-back leaves the
    state mutually inconsistent, and a replay would silently mislabel
    (the batch's values half-exist, so its edges never re-score).  The
    intent markers must turn that into a loud stop — state untouched —
    and, after operator recovery (here: clearing the marker for a state
    known-good because the simulated crash wrote nothing), a re-drive
    folds normally."""
    import posixpath

    from postal_address_spark.sources.fs import fs_delete, fs_write_text
    from postal_address_spark.streaming.link_stream import MENTION_DDL

    ddl = MENTION_DDL
    rows1 = spark.createDataFrame(
        [("m1", "12 rue de la paix", None, "75001", "Paris", "FR", None),
         ("m2", "12 rue de la paix", None, "75001", "Paris", "FR", None)],
        ddl,
    )
    rows1.coalesce(1).write.mode("append").parquet(dirs["input"])
    cfg = IncrementalConfig(n_pb=4)
    assert run_available(
        spark, dirs["input"], dirs["state"], dirs["ckpt"], cfg,
        schema=ddl, transcripts=False,
    ) == 1
    from postal_address_spark.plans.incremental import mention_clusters

    before = _labels(mention_clusters(spark, dirs["state"]))

    # a new file lands, but the previous fold (epoch 1) "died mid-write":
    # its intent marker survives with no commit marker
    rows2 = spark.createDataFrame(
        [("m3", "7 avenue victor hugo", None, "69002", "Lyon", "FR", None)],
        ddl,
    )
    rows2.coalesce(1).write.mode("append").parquet(dirs["input"])
    intent = posixpath.join(dirs["state"], "_epochs", "intent-1")
    fs_write_text(spark, intent, "")
    with pytest.raises(Exception, match="intent"):
        run_available(
            spark, dirs["input"], dirs["state"], dirs["ckpt"], cfg,
            schema=ddl, transcripts=False,
        )
    # the refused run must not have touched the state
    assert _labels(mention_clusters(spark, dirs["state"])) == before

    # operator recovery, then the re-drive folds the pending file
    fs_delete(spark, intent)
    assert run_available(
        spark, dirs["input"], dirs["state"], dirs["ckpt"], cfg,
        schema=ddl, transcripts=False,
    ) == 1
    after = _labels(mention_clusters(spark, dirs["state"]))
    assert {r for r, _ in after} == {"m1", "m2", "m3"}


def test_completed_fold_intent_leftover_self_heals(spark, dirs):
    """Crash between the commit marker and the intent cleanup: the fold
    COMPLETED, so the surviving intent is not evidence of corruption —
    the next run must self-heal it and keep folding."""
    import posixpath

    from postal_address_spark.sources.fs import fs_exists, fs_write_text
    from postal_address_spark.streaming.link_stream import MENTION_DDL

    ddl = MENTION_DDL
    rows1 = spark.createDataFrame(
        [("m1", "3 rue neuve", None, "75002", "Paris", "FR", None)], ddl
    )
    rows1.coalesce(1).write.mode("append").parquet(dirs["input"])
    cfg = IncrementalConfig(n_pb=4)
    assert run_available(
        spark, dirs["input"], dirs["state"], dirs["ckpt"], cfg,
        schema=ddl, transcripts=False,
    ) == 1
    # epoch 0 committed; its intent cleanup "crashed"
    intent = posixpath.join(dirs["state"], "_epochs", "intent-0")
    fs_write_text(spark, intent, "")

    rows2 = spark.createDataFrame(
        [("m2", "9 grand place", None, "59000", "Lille", "FR", None)], ddl
    )
    rows2.coalesce(1).write.mode("append").parquet(dirs["input"])
    assert run_available(
        spark, dirs["input"], dirs["state"], dirs["ckpt"], cfg,
        schema=ddl, transcripts=False,
    ) == 1
    assert not fs_exists(spark, intent)  # self-healed
