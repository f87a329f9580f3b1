"""Streaming conversation-state compaction == batch fold, at any
micro-batch split (streaming/conv_stream.py).

Asserts (1) the drained state equals the batch fold over the whole
input regardless of how files carve micro-batches — including a split
that scatters each conversation's turns ACROSS files out of order (the
late-arrival case), (2) a re-run drains nothing new, (3) a replayed
epoch is a no-op (markers), (4) a foreign checkpoint is refused, and
(5) only touched buckets are rewritten on a merge epoch."""
from __future__ import annotations

import os
import shutil
import sys
import tempfile

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postal_address_spark.operators.conversations import (  # noqa: E402
    _ordered_token_arrays,
)
from postal_address_spark.streaming.conv_stream import (  # noqa: E402
    ConvStreamConfig,
    fold_turns,
    make_fold,
    read_conversations,
    run_available,
)

DDL = "conv_id long, turn_idx int, action string"


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="stream_conv_")
    yield {
        "input": os.path.join(root, "input"),
        "state": os.path.join(root, "state"),
        "ckpt": os.path.join(root, "ckpt"),
        "ckpt2": os.path.join(root, "ckpt2"),
    }
    shutil.rmtree(root, ignore_errors=True)


def _turns(spark, n_convs=60, seed=7):
    import random

    rng = random.Random(seed)
    rows = []
    for c in range(n_convs):
        n = rng.randint(1, 12)
        for i in range(n):
            tok = None if rng.random() < 0.1 else rng.choice("abcdefgh")
            rows.append((c, i, tok))
    return spark.createDataFrame(rows, DDL)


def _fold_set(df):
    return {
        (r["conv"], r["n_turns"], r["n_total_turns"], tuple(r["toks"]))
        for r in df.collect()
    }


def test_stream_fold_equals_batch_any_split(spark, dirs):
    turns = _turns(spark).persist()
    expected = _fold_set(
        _ordered_token_arrays(turns, "conv_id", ("turn_idx",), "action")
    )

    # scatter each conversation's turns ACROSS arrival files by turn
    # parity-ish hash — every conversation is split over micro-batches
    # and no file is time-ordered (the late-arrival case)
    split = F.pmod(F.xxhash64("turn_idx", "conv_id"), F.lit(3))
    for i in (2, 0, 1):  # deliberately not in order
        turns.where(split == i).coalesce(1).write.mode("append").parquet(
            dirs["input"]
        )
    turns.unpersist()

    cfg = ConvStreamConfig(n_buckets=8)
    n = run_available(
        spark, dirs["input"], dirs["state"], dirs["ckpt"], DDL, cfg
    )
    assert n == 3
    got = _fold_set(read_conversations(spark, dirs["state"], cfg))
    assert got == expected

    # re-run: nothing new to drain, state unchanged
    n2 = run_available(
        spark, dirs["input"], dirs["state"], dirs["ckpt"], DDL, cfg
    )
    assert n2 == 0
    assert _fold_set(read_conversations(spark, dirs["state"], cfg)) == expected

    # a different checkpoint against the same state dir is refused
    with pytest.raises(ValueError):
        run_available(
            spark, dirs["input"], dirs["state"], dirs["ckpt2"], DDL, cfg
        )


def test_replayed_epoch_is_noop_and_buckets_partial_rewrite(spark, dirs):
    cfg = ConvStreamConfig(n_buckets=8)
    b1 = spark.createDataFrame(
        [(1, 0, "a"), (1, 1, "b"), (2, 0, "x")], DDL
    )
    fold = make_fold(dirs["state"], cfg)
    fold(b1, epoch_id=0)
    before = _fold_set(read_conversations(spark, dirs["state"], cfg))

    # replay of epoch 0 with DIFFERENT content must be ignored (marker)
    poison = spark.createDataFrame([(1, 9, "z")], DDL)
    fold(poison, epoch_id=0)
    assert _fold_set(read_conversations(spark, dirs["state"], cfg)) == before

    # record bucket-partition mtimes, then merge an epoch touching ONLY
    # conv 1's bucket — conv 2's partition must not be rewritten
    convs_dir = os.path.join(dirs["state"], "convs")
    mtimes = {
        d: os.path.getmtime(os.path.join(convs_dir, d))
        for d in os.listdir(convs_dir)
        if d.startswith("_bucket=")
    }
    [b_of_1] = [
        r["_bucket"]
        for r in spark.read.parquet(convs_dir)
        .where(F.col("conv") == 1)
        .select("_bucket")
        .collect()
    ]
    [b_of_2] = [
        r["_bucket"]
        for r in spark.read.parquet(convs_dir)
        .where(F.col("conv") == 2)
        .select("_bucket")
        .collect()
    ]
    fold(spark.createDataFrame([(1, 2, "c")], DDL), epoch_id=1)
    got = _fold_set(read_conversations(spark, dirs["state"], cfg))
    assert (1, 3, 3, ("a", "b", "c")) in got
    assert (2, 1, 1, ("x",)) in got
    if b_of_1 != b_of_2:  # distinct buckets: untouched partition intact
        d2 = f"_bucket={b_of_2}"
        assert os.path.getmtime(os.path.join(convs_dir, d2)) == mtimes[d2]


def test_fold_turns_direct_null_handling(spark, dirs):
    cfg = ConvStreamConfig(n_buckets=4)
    b = spark.createDataFrame(
        [(1, 0, None), (1, 1, "a"), (None, 0, "ghost"), (3, 0, None)], DDL
    )
    fold_turns(spark, b, dirs["state"], cfg)
    out = read_conversations(spark, dirs["state"], cfg)
    got = _fold_set(out)
    # conv 1: one NULL token counts toward totals only; NULL conv ids
    # vanish; conv 3 (all-NULL tokens) is excluded by the n_turns>0
    # filter — same discipline as the batch fold
    assert got == {(1, 1, 2, ("a",))}
    # second direct fold merges in place
    fold_turns(
        spark, spark.createDataFrame([(3, 1, "t"), (1, 2, "b")], DDL),
        dirs["state"], cfg,
    )
    got2 = _fold_set(read_conversations(spark, dirs["state"], cfg))
    assert got2 == {(1, 2, 3, ("a", "b")), (3, 1, 2, ("t",))}


def test_state_to_turns_roundtrip_feeds_batch_operators(spark, dirs):
    """state_to_turns explodes the compacted state back into turn rows
    whose fold equals the original — the drop-in --input contract for
    the curation job (NULL-token turns are the one documented loss)."""
    from postal_address_spark.streaming.conv_stream import state_to_turns

    cfg = ConvStreamConfig(n_buckets=4)
    turns = _turns(spark, n_convs=30, seed=11)
    fold_turns(spark, turns, dirs["state"], cfg)

    back = state_to_turns(spark, dirs["state"], cfg)
    assert set(back.columns) == {"conv_id", "turn_idx", "action"}
    expected = _fold_set(
        _ordered_token_arrays(
            turns.where(F.col("action").isNotNull()),
            "conv_id", ("turn_idx",), "action",
        )
    )
    # n_total over the exploded rows counts tokenful turns only
    got = _fold_set(
        _ordered_token_arrays(back, "conv_id", ("turn_idx",), "action")
    )
    assert got == expected


def test_ingest_job_end_to_end(spark, dirs, tmp_path):
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), "jobs"))
    import ingest_transcripts

    turns = _turns(spark, n_convs=25, seed=3)
    split = F.pmod(F.xxhash64("turn_idx", "conv_id"), F.lit(2))
    for i in (1, 0):
        turns.where(split == i).coalesce(1).write.mode("append").parquet(
            dirs["input"]
        )
    out_turns = str(tmp_path / "compacted_turns")
    summary = ingest_transcripts.main(
        ["--input", dirs["input"], "--state", dirs["state"],
         "--checkpoint", dirs["ckpt"], "--schema", DDL,
         "--action-col", "action", "--n-buckets", "4",
         "--turns-output", out_turns],
        spark=spark,
    )
    assert summary["n_epochs_folded"] == 2
    expected = _fold_set(
        _ordered_token_arrays(turns, "conv_id", ("turn_idx",), "action")
    )
    assert summary["n_convs"] == len(expected)
    assert summary["n_tokenful_turns"] == sum(e[1] for e in expected)
    # totals cover TOKENFUL conversations (read_conversations' n_turns>0
    # filter, same as the batch fold): an all-NULL-token conversation's
    # turns are excluded from the summary
    tokenful = turns.where(F.col("action").isNotNull()).select(
        "conv_id"
    ).distinct()
    assert summary["n_total_turns"] == turns.join(
        tokenful, "conv_id", "left_semi"
    ).count()
    # the written compacted turn table folds back to the batch result
    # over the TOKENFUL rows (NULL-token turns are not representable in
    # exploded state — state_to_turns' documented loss)
    got = _fold_set(
        _ordered_token_arrays(
            spark.read.parquet(out_turns), "conv_id", ("turn_idx",),
            "action",
        )
    )
    assert got == _fold_set(
        _ordered_token_arrays(
            turns.where(F.col("action").isNotNull()),
            "conv_id", ("turn_idx",), "action",
        )
    )
    # second run: nothing new
    summary2 = ingest_transcripts.main(
        ["--input", dirs["input"], "--state", dirs["state"],
         "--checkpoint", dirs["ckpt"], "--schema", DDL,
         "--action-col", "action", "--n-buckets", "4"],
        spark=spark,
    )
    assert summary2["n_epochs_folded"] == 0
    assert summary2["n_convs"] == len(expected)


def test_retract_conversations_equals_survivor_fold(spark, dirs):
    """Retraction leaves the state identical to folding only the
    surviving turns; unknown ids no-op; retract-everything leaves an
    empty state that a later fold repopulates cleanly."""
    from postal_address_spark.streaming.conv_stream import (
        retract_conversations,
    )

    cfg = ConvStreamConfig(n_buckets=4)
    turns = _turns(spark, n_convs=20, seed=5).persist()
    fold_turns(spark, turns, dirs["state"], cfg)

    gone = [3, 7, 11]
    n = retract_conversations(spark, gone, dirs["state"], cfg)
    assert n == 3
    survivors = turns.where(~F.col("conv_id").isin(gone))
    assert _fold_set(read_conversations(spark, dirs["state"], cfg)) \
        == _fold_set(_ordered_token_arrays(
            survivors, "conv_id", ("turn_idx",), "action"))

    # unknown ids + already-retracted ids: idempotent no-op
    assert retract_conversations(
        spark, [3, 999], dirs["state"], cfg
    ) == 0
    # empty id list: no-op
    assert retract_conversations(spark, [], dirs["state"], cfg) == 0

    # retract everything, then a fresh fold repopulates
    remaining = [
        r["conv"]
        for r in read_conversations(spark, dirs["state"], cfg)
        .select("conv").collect()
    ]
    # include the all-NULL-token conversations state still holds
    retract_conversations(spark, list(range(20)), dirs["state"], cfg)
    b = spark.createDataFrame([(50, 0, "z")], DDL)
    fold_turns(spark, b, dirs["state"], cfg)
    got = _fold_set(read_conversations(spark, dirs["state"], cfg))
    assert got == {(50, 1, 1, ("z",))}
    assert remaining  # sanity: the pre-wipe state wasn't empty
    turns.unpersist()


def test_crash_between_state_write_and_marker_replays_idempotently(
    spark, dirs
):
    """The largest real crash window: a fold's state write COMPLETED but
    the driver died before its epoch marker landed.  The stream then
    replays the epoch (marker absent); the per-row last_epoch stamps
    must make the replay a byte-identical no-op instead of a double
    merge (pre-fix behavior: every replayed conversation's turns
    duplicated)."""
    cfg = ConvStreamConfig(n_buckets=8)
    f1 = spark.createDataFrame([(1, 0, "a"), (1, 1, "b"), (2, 0, "x")], DDL)
    f1.coalesce(1).write.mode("append").parquet(dirs["input"])
    assert run_available(
        spark, dirs["input"], dirs["state"], dirs["ckpt"], DDL, cfg
    ) == 1

    # epoch 1's file lands, and the fold runs to completion — but the
    # marker write never happens (the simulated SIGKILL point).  On disk
    # this is exactly the post-crash world.
    rows2 = [(1, 2, "c"), (3, 0, "y")]
    spark.createDataFrame(rows2, DDL).coalesce(1).write.mode(
        "append"
    ).parquet(dirs["input"])
    fold_turns(
        spark, spark.createDataFrame(rows2, DDL), dirs["state"], cfg,
        epoch_id=1,
    )

    # re-drive: the stream replays epoch 1; state must equal the batch
    # fold over ALL turns — no duplicated c/y, no doubled totals
    assert run_available(
        spark, dirs["input"], dirs["state"], dirs["ckpt"], DDL, cfg
    ) == 1
    both = f1.union(spark.createDataFrame(rows2, DDL))
    assert _fold_set(read_conversations(spark, dirs["state"], cfg)) == (
        _fold_set(
            _ordered_token_arrays(both, "conv_id", ("turn_idx",), "action")
        )
    )


def test_partial_bucket_commit_replays_idempotently(spark, dirs):
    """Mid-COMMIT crash at partition granularity: dynamic partition
    overwrite replaces touched bucket dirs one by one, so a kill during
    the commit can leave SOME buckets holding the epoch's merge and
    others not.  Simulated by folding only one conversation's slice of
    the epoch-1 batch (its bucket commits; the other conversation's
    does not).  The replay must merge the missing conversation and skip
    the committed one — per-ROW idempotence, independent of bucket
    layout."""
    cfg = ConvStreamConfig(n_buckets=8)
    f1 = spark.createDataFrame([(1, 0, "a"), (2, 0, "x")], DDL)
    f1.coalesce(1).write.mode("append").parquet(dirs["input"])
    assert run_available(
        spark, dirs["input"], dirs["state"], dirs["ckpt"], DDL, cfg
    ) == 1

    rows2 = [(1, 1, "b"), (2, 1, "y")]
    spark.createDataFrame(rows2, DDL).coalesce(1).write.mode(
        "append"
    ).parquet(dirs["input"])
    # crash world: only conv 1's rows reached disk, stamped epoch 1
    fold_turns(
        spark, spark.createDataFrame([rows2[0]], DDL), dirs["state"], cfg,
        epoch_id=1,
    )

    assert run_available(
        spark, dirs["input"], dirs["state"], dirs["ckpt"], DDL, cfg
    ) == 1
    both = f1.union(spark.createDataFrame(rows2, DDL))
    assert _fold_set(read_conversations(spark, dirs["state"], cfg)) == (
        _fold_set(
            _ordered_token_arrays(both, "conv_id", ("turn_idx",), "action")
        )
    )
