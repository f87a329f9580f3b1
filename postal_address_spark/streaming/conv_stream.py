"""Streaming conversation-state compaction: fold turn micro-batches into
a per-conversation state table as they land.

Chat/agent logs emit conversations INCREMENTALLY — a turn at a time,
files in arrival order that is nobody's promise (late shards, backfills,
replays).  Every conversation operator in this engine consumes the
per-conversation ordered token fold
(operators/conversations.py:_ordered_token_arrays); this module keeps
that fold as PERSISTENT STATE so the curation surface (signatures,
dedup, quality, prefix containment) runs over compacted conversations
without re-folding the raw turn history on every run.

Equivalence contract (the thing the tests and the driver oracle grade):
after draining arrival files F1..Fk in ANY order and ANY micro-batch
partitioning, the state equals the batch fold over F1 ∪ ... ∪ Fk.  The
merge is a concat + ``array_sort`` over (order-key, token) structs —
order-insensitive by construction, so the equivalence needs no
watermark and admits arbitrarily late turns (a late turn lands in its
conversation at its order-key position, exactly where the batch fold
would have put it).

Scale shape: state is ONE row per conversation, hash-partitioned into
``n_buckets`` directories (``_bucket = pmod(xxhash64(conv), n_buckets)``);
each epoch merges the batch's conversations against ONLY the buckets it
touches and rewrites ONLY those partitions (dynamic partition
overwrite, the plans/incremental.py clusters-table precedent) — an
epoch's cost is O(batch + touched-bucket state), never O(all state).
Every write payload is eagerly materialized (``localCheckpoint``)
BEFORE the write because its lineage reads the same directories it
overwrites (engine rule 10).

Exactly-once folding mirrors streaming/link_stream.py: epoch-marker
files make replays idempotent, and the state dir is bound to its first
stream checkpoint (fresh checkpoints restart epoch ids at 0 and would
silently skip real folds).  The reference has no streaming surface
(SURVEY §2.B); this is the transcript-side analogue of the linkage
fold's resumability story.
"""
from __future__ import annotations

import posixpath
from dataclasses import dataclass
from typing import Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fs import fs_exists, fs_qualified, fs_read_text, fs_write_text


@dataclass(frozen=True)
class ConvStreamConfig:
    conv_col: str = "conv_id"
    order_cols: Tuple[str, ...] = ("turn_idx",)
    token_col: str = "action"
    n_buckets: int = 64


def _convs_dir(state_dir: str) -> str:
    return posixpath.join(state_dir, "convs")


def _epoch_marker(state_dir: str, epoch_id: int) -> str:
    return posixpath.join(state_dir, "_epochs", f"v1-{epoch_id}")


def _kt_struct(cfg: ConvStreamConfig):
    return F.struct(
        *[F.col(c).alias(f"k{i}") for i, c in enumerate(cfg.order_cols)],
        F.col(cfg.token_col).alias("tok"),
    )


def _fold_batch(batch: DataFrame, cfg: ConvStreamConfig) -> DataFrame:
    """One micro-batch of turn rows -> per-conversation partial fold
    (conv, kts, n_total) — the same NULL-token discipline as
    operators/conversations.py:_ordered_token_arrays (NULL tokens count
    toward n_total only; NULL conv ids carry nothing and are dropped)."""
    keyed = batch.where(F.col(cfg.conv_col).isNotNull()).select(
        F.col(cfg.conv_col).alias("conv"),
        F.when(F.col(cfg.token_col).isNotNull(), _kt_struct(cfg)).alias(
            "kt"
        ),
    )
    return keyed.groupBy("conv").agg(
        F.array_sort(F.collect_list("kt")).alias("kts"),
        F.count(F.lit(1)).alias("n_total"),
    )


def _read_convs(spark: SparkSession, state_dir: str):
    from pyspark.errors import AnalysisException

    path = _convs_dir(state_dir)
    if fs_exists(spark, path):
        try:
            return spark.read.parquet(path)
        except AnalysisException:
            # retract-everything leaves the dir with no parquet files
            # (only write markers) — schema inference fails; the state
            # is legitimately empty
            return None
    return None


def fold_turns(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    cfg: ConvStreamConfig = ConvStreamConfig(),
    epoch_id: "int | None" = None,
) -> None:
    """Merge one batch of turn rows into the conversation state.

    Callable directly (incremental batch jobs) or via the
    ``foreachBatch`` sink below.  Merge = outer join on conv within the
    TOUCHED buckets only, ``array_sort(concat(...))`` of the keyed-turn
    structs (order-insensitive), summed total-turn counts.

    Crash idempotence (``epoch_id`` given — the streaming path): every
    written row carries ``last_epoch`` = the newest epoch merged into
    it.  A fold that completed its data write but died BEFORE the epoch
    marker landed gets REPLAYED by the stream (marker absent), and the
    replay must not double-merge; with the stamp, a state row whose
    ``last_epoch`` >= the replaying epoch already contains this batch's
    turns for that conversation and passes through untouched — per-ROW
    idempotence, so it holds even if the crash committed only some of
    the touched bucket partitions.  (Epoch ids are replay-stable because
    the state dir is bound to one stream checkpoint, and a commit's
    delete-then-rename of one partition dir remains the one non-atomic
    window — production state on Iceberg closes it transactionally;
    proven by tests/test_conv_stream.py crash-replay tests.)  Without an
    epoch id (direct batch calls) rows are stamped -1 and merges are
    never skipped — exactly the old behavior."""
    ep = F.lit(int(epoch_id) if epoch_id is not None else -1).cast("long")
    new = _fold_batch(batch, cfg).withColumn(
        "_bucket", F.pmod(F.xxhash64("conv"), F.lit(cfg.n_buckets))
    )
    state = _read_convs(spark, state_dir)
    if state is not None and "last_epoch" not in state.columns:
        state = state.withColumn("last_epoch", F.lit(-1).cast("long"))
    if state is not None:
        touched = new.select("_bucket").distinct()
        old = state.join(F.broadcast(touched), "_bucket")
        # replay detection: this row already merged this (or a later)
        # epoch — keep it byte-identical
        if epoch_id is None:
            skip = F.lit(False)
        else:
            skip = F.col("_t_old").isNotNull() & (
                F.col("_le_old") >= F.lit(int(epoch_id))
            )
        merged = (
            old.select(
                "conv",
                F.col("kts").alias("_k_old"),
                F.col("n_total").alias("_t_old"),
                F.col("last_epoch").alias("_le_old"),
                "_bucket",
            )
            .join(
                new.select(
                    "conv",
                    F.col("kts").alias("_k_new"),
                    F.col("n_total").alias("_t_new"),
                    F.col("_bucket").alias("_b_new"),
                ),
                "conv",
                "full_outer",
            )
            .select(
                "conv",
                # both sides are individually sorted; only the genuine
                # merge needs the re-sort (and no empty-array typing)
                F.when(skip, F.col("_k_old"))
                .when(F.col("_k_old").isNull(), F.col("_k_new"))
                .when(F.col("_k_new").isNull(), F.col("_k_old"))
                .otherwise(
                    F.array_sort(F.concat("_k_old", "_k_new"))
                ).alias("kts"),
                F.when(skip, F.col("_t_old"))
                .otherwise(
                    F.coalesce("_t_old", F.lit(0))
                    + F.coalesce("_t_new", F.lit(0))
                ).alias("n_total"),
                F.when(
                    skip | F.col("_t_new").isNull(), F.col("_le_old")
                ).otherwise(ep).alias("last_epoch"),
                F.coalesce("_bucket", "_b_new").alias("_bucket"),
            )
        )
    else:
        merged = new.withColumn("last_epoch", ep)
    # engine rule 10: the payload's lineage reads the directories the
    # write below replaces — materialize BEFORE the first write.
    payload = merged.localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        payload.write.mode("overwrite").partitionBy("_bucket").parquet(
            _convs_dir(state_dir)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_conversations(
    spark: SparkSession,
    state_dir: str,
    cfg: ConvStreamConfig = ConvStreamConfig(),
) -> DataFrame:
    """State -> the batch fold's exact shape: ``(conv, n_turns,
    n_total_turns, toks)`` with the same only-tokenful-conversations
    filter as ``_ordered_token_arrays`` — drop-in input for signatures /
    dedup / quality over the compacted state."""
    state = _read_convs(spark, state_dir)
    if state is None:
        raise FileNotFoundError(f"no conversation state under {state_dir}")
    return (
        state.select(
            "conv",
            F.size("kts").alias("n_turns"),
            F.col("n_total").alias("n_total_turns"),
            F.transform("kts", lambda s: s["tok"]).alias("toks"),
        )
        .where(F.col("n_turns") > 0)
    )


def make_fold(state_dir: str, cfg: ConvStreamConfig = ConvStreamConfig()):
    """``foreachBatch`` body: one idempotent state merge per epoch."""

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        marker = _epoch_marker(state_dir, epoch_id)
        if fs_exists(spark, marker):  # replayed epoch: already folded
            return
        if batch_df.isEmpty():
            return
        # epoch_id rides into the row stamps so a crash AFTER the state
        # write but BEFORE the marker write replays idempotently (see
        # fold_turns docstring; crash-replay pytest).
        fold_turns(spark, batch_df, state_dir, cfg, epoch_id=epoch_id)
        fs_write_text(spark, marker, "")

    return fold


def run_available(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    schema: str,
    cfg: ConvStreamConfig = ConvStreamConfig(),
    max_files_per_trigger: int = 1,
) -> int:
    """Drain every unprocessed file under ``input_dir`` into the
    conversation state (availableNow trigger), one merge per
    micro-batch, then stop.  Returns the number of epochs folded.  The
    state dir is bound to its first checkpoint (link_stream.py's
    epoch-id-collision guard)."""
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
    inner = make_fold(state_dir, cfg)

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        before = fs_exists(spark, _epoch_marker(state_dir, epoch_id))
        inner(batch_df, epoch_id)
        if not before and fs_exists(
            spark, _epoch_marker(state_dir, epoch_id)
        ):
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


def state_to_turns(
    spark: SparkSession,
    state_dir: str,
    cfg: ConvStreamConfig = ConvStreamConfig(),
) -> DataFrame:
    """State -> turn rows in the ORIGINAL column names — the compacted
    replacement for the raw turn history: every conversation operator
    (quality gate, signatures, near-dup, prefix containment, windows)
    and the whole curation job consume turn rows, so exploding the
    folded structs back out makes the state a drop-in ``--input``.
    NULL-token turns are not representable in state (they contribute to
    ``n_total_turns`` only), so consumers see exactly the tokenful turn
    set — the same rows every fold-based operator would keep anyway."""
    state = _read_convs(spark, state_dir)
    if state is None:
        raise FileNotFoundError(f"no conversation state under {state_dir}")
    cols = [
        F.col("kt")[f"k{i}"].alias(c) for i, c in enumerate(cfg.order_cols)
    ]
    return state.select(
        F.col("conv").alias(cfg.conv_col),
        F.explode_outer("kts").alias("kt"),
    ).where(F.col("kt").isNotNull()).select(
        cfg.conv_col, *cols, F.col("kt")["tok"].alias(cfg.token_col)
    )


def retract_conversations(
    spark: SparkSession,
    conv_ids,
    state_dir: str,
    cfg: ConvStreamConfig = ConvStreamConfig(),
) -> int:
    """Remove whole conversations from the state (GDPR-style deletion —
    a user withdraws consent, their transcripts must leave the corpus),
    leaving the state identical to folding only the SURVIVING turns.
    Unlike linkage retraction (plans/incremental.py, where star-edge
    state forces an edge-log replay), conversation state is
    self-contained — one row per conversation — so deletion is a
    filtered rewrite of ONLY the touched buckets, with now-empty bucket
    partitions deleted explicitly (dynamic overwrite cannot drop a
    partition absent from its payload — the retract_mentions
    precedent).  Unknown ids are ignored, so re-runs are idempotent.

    ``conv_ids``: an iterable of conversation ids or a DataFrame with
    the ``cfg.conv_col`` (or ``conv``) column.  Returns the number of
    conversations actually removed."""
    if isinstance(conv_ids, DataFrame):
        col = cfg.conv_col if cfg.conv_col in conv_ids.columns else "conv"
        gone = conv_ids.select(F.col(col).alias("conv")).distinct()
    else:
        ids = list(conv_ids)
        if not ids:
            return 0
        gone = spark.createDataFrame(
            [(i,) for i in ids], ["conv"]
        ).distinct()
    state = _read_convs(spark, state_dir)
    if state is None:
        raise FileNotFoundError(f"no conversation state under {state_dir}")

    gone = gone.withColumn(
        "_bucket", F.pmod(F.xxhash64("conv"), F.lit(cfg.n_buckets))
    )
    touched = [
        r["_bucket"] for r in gone.select("_bucket").distinct().collect()
    ]
    if not touched:
        return 0
    in_touched = state.where(F.col("_bucket").isin(touched))
    n_before = in_touched.count()
    survivors = in_touched.join(
        F.broadcast(gone.select("conv")), "conv", "left_anti"
    )
    # engine rule 10: materialize before overwriting the dirs the plan reads
    payload = survivors.localCheckpoint(eager=True)
    n_removed = n_before - payload.count()
    present = {
        r["_bucket"] for r in payload.select("_bucket").distinct().collect()
    }
    from ..sources.fs import fs_delete

    for b in touched:
        if b not in present:
            fs_delete(
                spark,
                posixpath.join(_convs_dir(state_dir), f"_bucket={b}"),
            )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        payload.write.mode("overwrite").partitionBy("_bucket").parquet(
            _convs_dir(state_dir)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return int(n_removed)
