"""Streaming entity resolution: fold transcript micro-batches into the
persistent linkage state as they land.

``plans/incremental.py`` proves that folding batches B1, B2, ... into the
state yields labels identical to the batch pipeline over B1 ∪ B2 ∪ ...,
for EVERY split of the input.  That equivalence is exactly what makes the
fold safe to drive from Structured Streaming, where the micro-batch
boundaries are an accident of file arrival: whatever partitioning the
``FileStreamSource`` picks, the final labels are the same.  This module is
the glue — a ``foreachBatch`` sink whose body is the already-verified
incremental fold.

Exactly-once folding: Structured Streaming replays a micro-batch after a
failure (at-least-once for ``foreachBatch`` sinks), and the fold mutates
external state, so each epoch is guarded by a marker file
(``<state_dir>/_epochs/v1-<epoch_id>``) written only after the fold's
writes land — a replayed epoch is skipped.  A fold that dies MID-WRITE
leaves the four state tables mutually inconsistent, which a replay
cannot repair (the batch's values half-exist, so its edges would never
re-score); each fold therefore brackets its writes with an
``intent-<epoch>`` marker and ``check_no_stale_intent`` turns any
surviving intent into a loud stop with recovery instructions instead of
a silently-wrong fold (production would wrap the four writes in one
Iceberg/Delta transaction instead of markers).  Epoch ids are only unique
WITHIN one stream checkpoint (a fresh checkpoint restarts them at 0, and
a marker would then silently skip real folds), so ``run_available`` binds
the state dir to its first checkpoint path and refuses any other.

The reference has no streaming surface (SURVEY §2.B); this is the
production ingest shape of the north rule's resumability requirement.
"""
from __future__ import annotations

import posixpath
from typing import Optional

from pyspark.sql import SparkSession

from ..operators.extract import extract_mentions
from ..plans.incremental import IncrementalConfig, incremental_link_mentions
from ..sources.fs import (
    fs_delete,
    fs_exists,
    fs_glob,
    fs_qualified,
    fs_read_text,
    fs_write_text,
)
from .ingest import TRANSCRIPT_DDL

MENTION_DDL = (
    "rec_id string, line1 string, line2 string, postal_code string, "
    "city_name string, country_code string, subdivision_code string"
)


def _epoch_marker(state_dir: str, epoch_id: int) -> str:
    return posixpath.join(state_dir, "_epochs", f"v1-{epoch_id}")


def _intent_marker(state_dir: str, epoch_id: int) -> str:
    return posixpath.join(state_dir, "_epochs", f"intent-{epoch_id}")


def check_no_stale_intent(spark: SparkSession, state_dir: str) -> None:
    """Refuse to fold into a state whose previous fold died MID-WRITE.

    The linkage fold's write-back is a four-table sequence (three appends
    + one dynamic partition overwrite, plans/incremental.py); a crash
    inside that sequence leaves tables at different epochs — values
    appended but edges unlogged — and a naive replay would then compute
    an EMPTY new-node set (the batch's vkeys match the half-written
    values table) and silently produce wrong labels.  So each fold
    writes an ``intent-<epoch>`` marker before its first write and
    removes it after the commit marker lands; a surviving intent marker
    is proof of a mid-write crash, and the only sound recovery for
    multi-table parquet state is restore/rebuild (re-fold the source
    batches into a fresh state dir — they are replayable from the stream
    input by construction; production state on Iceberg would instead
    wrap the four writes in one transaction and roll back).  Detection
    turns silent corruption into a loud, actionable stop
    (tests/test_link_stream.py crash tests).
    """
    stale = []
    for p in fs_glob(spark, posixpath.join(state_dir, "_epochs", "intent-*")):
        eid = p.rsplit("intent-", 1)[-1]
        if fs_exists(spark, _epoch_marker(state_dir, int(eid))):
            # crash landed between the commit marker and the intent
            # cleanup: the fold COMPLETED — self-heal the leftover
            fs_delete(spark, p)
        else:
            stale.append(p)
    if stale:
        raise RuntimeError(
            f"linkage state {state_dir!r} has stale write-intent markers "
            f"{[p.rsplit('/', 1)[-1] for p in stale]}: a previous fold "
            "crashed mid-write and the state tables may be mutually "
            "inconsistent.  Re-fold the source batches into a fresh "
            "state dir (stream input files are replayable), or restore "
            "the state from a snapshot, then delete the markers."
        )


def make_fold(state_dir: str, config: Optional[IncrementalConfig] = None,
              transcripts: bool = True):
    """Build the ``foreachBatch`` body: one incremental fold per epoch.

    ``transcripts=True`` runs mention extraction on each micro-batch first
    (transcript-table source); ``False`` expects mention rows directly.
    """
    def fold(batch_df, epoch_id: int) -> None:
        # Marker I/O goes through the Hadoop FileSystem so the state dir
        # may live on HDFS/S3A under spark-submit — a local os.path probe
        # would answer "missing" for every remote marker and re-fold
        # replayed epochs.
        spark = batch_df.sparkSession
        marker = _epoch_marker(state_dir, epoch_id)
        if fs_exists(spark, marker):  # replayed epoch: already folded
            return
        if batch_df.isEmpty():
            return
        # fail loud on a predecessor's mid-write crash BEFORE touching
        # the tables (a fold over inconsistent state is silently wrong)
        check_no_stale_intent(spark, state_dir)
        intent = _intent_marker(state_dir, epoch_id)
        fs_write_text(spark, intent, "")
        mentions = extract_mentions(batch_df) if transcripts else batch_df
        incremental_link_mentions(spark, mentions, state_dir, config)
        fs_write_text(spark, marker, "")
        fs_delete(spark, intent)

    return fold


def run_available(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    config: Optional[IncrementalConfig] = None,
    schema: str = TRANSCRIPT_DDL,
    transcripts: bool = True,
    max_files_per_trigger: int = 1,
) -> int:
    """Drain every unprocessed file under ``input_dir`` into the linkage
    state (availableNow trigger), one fold per micro-batch, then stop.

    Returns the number of micro-batches folded this run.  Designed to be
    invoked repeatedly (cron / long-lived daemon with a processing-time
    trigger would use ``.trigger(processingTime=...)`` instead); the
    stream checkpoint remembers which files are done, the epoch markers
    make replays idempotent.  Exactly one checkpoint per state dir: a
    different checkpoint restarts epoch ids at 0 and the existing markers
    would silently skip its folds, so the binding is checked and a
    mismatch raises ``ValueError``.
    """
    # Canonical identity for the binding is the fully-qualified FS URI
    # (fs_qualified), not os.path.abspath — abspath would mangle an
    # hdfs://... checkpoint into a bogus local path.
    bind = posixpath.join(state_dir, "_epochs", "_checkpoint")
    ckpt_abs = fs_qualified(spark, checkpoint_dir)
    if fs_exists(spark, bind):
        bound = fs_read_text(spark, bind).strip()
        if bound != ckpt_abs:
            raise ValueError(
                f"state dir {state_dir!r} is bound to stream checkpoint "
                f"{bound!r}; refusing {ckpt_abs!r} — epoch ids from a new "
                "checkpoint restart at 0 and would collide with existing "
                "fold markers"
            )
    else:
        fs_write_text(spark, bind, ckpt_abs)

    folded = {"n": 0}
    inner = make_fold(state_dir, config, transcripts=transcripts)

    def fold(batch_df, epoch_id: int) -> None:
        before = fs_exists(spark, _epoch_marker(state_dir, epoch_id))
        inner(batch_df, epoch_id)
        if not before and fs_exists(spark, _epoch_marker(state_dir, epoch_id)):
            folded["n"] += 1

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
        .writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.awaitTermination()
    return folded["n"]
