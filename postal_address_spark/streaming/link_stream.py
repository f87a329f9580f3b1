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
writes land — a replayed epoch is skipped, a half-folded epoch is the one
known hole (documented below; production would wrap the fold in an
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
from ..sources.fs import fs_exists, fs_qualified, fs_read_text, fs_write_text
from .ingest import TRANSCRIPT_DDL

MENTION_DDL = (
    "rec_id string, line1 string, line2 string, postal_code string, "
    "city_name string, country_code string, subdivision_code string"
)


def _epoch_marker(state_dir: str, epoch_id: int) -> str:
    return posixpath.join(state_dir, "_epochs", f"v1-{epoch_id}")


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
        mentions = extract_mentions(batch_df) if transcripts else batch_df
        incremental_link_mentions(spark, mentions, state_dir, config)
        fs_write_text(spark, marker, "")

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
