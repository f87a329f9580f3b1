"""Structured Streaming ingest for transcript tables.

The north rule's pipeline is batch (clustering is iterative and global),
but the *per-mention* stages — extraction, normalization, blocking-key
emission — are stateless row transforms and stream cleanly.  This module
runs exactly the same operators over a ``readStream`` source so new
transcript partitions can be normalized + blocked incrementally as they
land; the periodic batch job then only pairs/scores/clusters fresh blocks.

Late data: a watermark on ``ts`` bounds state for any downstream windowed
aggregation (the demo aggregation here counts mentions per block per
window, mirroring the batch block histogram).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.blocking import with_block_key
from ..operators.extract import extract_mentions
from ..operators.normalize_op import normalize_mentions

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def read_transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_blocked_mentions(transcripts: DataFrame) -> DataFrame:
    """The stateless stage chain, unchanged from batch — extraction,
    normalize UDF, blocking key all operate row-wise, so the same code
    serves both executions (one semantics, two runtimes)."""
    return with_block_key(normalize_mentions(extract_mentions(transcripts)))


def streaming_block_histogram(
    transcripts: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Windowed block-size histogram with late-data watermark — the
    streaming analogue of the batch hot-block detector; feeding it into the
    salting threshold lets the batch pairing job pre-know hot keys."""
    blocked = streaming_blocked_mentions(transcripts.withWatermark("ts", watermark))
    return (
        blocked.where(F.col("block_key").isNotNull())
        .groupBy(F.window("ts", window), F.col("block_key"))
        .agg(F.count(F.lit(1)).alias("block_size"))
    )


EVENTS_DDL = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, "
    "event_type string, value double, props string"
)


def streaming_daily_rollup(
    spark: SparkSession,
    events_path: str,
    name: str = "streaming_daily_rollup_sink",
) -> DataFrame:
    """Daily per-type event rollup computed BY THE STREAMING RUNTIME:
    readStream -> windowed aggregation -> complete-mode memory sink,
    drained with an availableNow trigger, then returned as a plain
    DataFrame.  The result is bit-identical to the batch GROUP BY — one
    semantics, two runtimes — which is what lets the DuckDB oracle grade
    a Structured Streaming execution.

    Scale note: a complete-mode memory sink is the harness-side tail only
    (driver-contract queries must return a DataFrame); the production
    shape is the same aggregation in update mode into a keyed store, or
    ``run_ingest_to_parquet``'s append pipeline for the stateless stages.
    """
    for active in spark.streams.active:
        if active.name == name:
            active.stop()
    import os

    # FileStreamSource force-injects basePath=<path> for NON-glob paths,
    # which explodes when the path is a single parquet file ("basePath
    # must be a directory").  Appending '*' makes it a glob (matching the
    # same file), suppressing the injection; the explicit directory
    # basePath then governs partition inference.
    base = os.path.dirname(events_path.rstrip("/")) or "."
    agg = (
        spark.readStream.schema(EVENTS_DDL)
        .option("basePath", base)
        .parquet(events_path + "*")
        .groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    query = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return (
        spark.table(name)
        .select(
            F.col("w.start").alias("day"), "event_type", "n_events", "sum_value"
        )
        .orderBy("day", "event_type")
    )


def streaming_dedup_event_keys(
    spark: SparkSession,
    events_path: str,
    watermark: str = "3 days",
    name: str = "streaming_dedup_sink",
) -> DataFrame:
    """Watermark-bounded streaming deduplication — the one streaming shape
    a training-data ingest actually runs: drop repeat observations of a
    content key as they stream in, with state bounded by the watermark so
    the dedup store never grows past the late-data horizon
    (``dropDuplicatesWithinWatermark``, the purpose-built operator).

    The key here is (user_id, event_type, day): "first sighting of each
    user/type per day", a canonical ingest-dedup key with real duplicate
    volume on the events table.  Only the key columns are emitted, so the
    drained result is exactly the batch ``SELECT DISTINCT`` — deterministic
    and DuckDB-gradable — regardless of which physical row arrived first.

    Determinism caveat (same as the sessionizer): equality with the batch
    oracle assumes the availableNow drain sees each key's duplicates before
    the watermark expires its state.  A single-file events table drains in
    one micro-batch, where this always holds; a multi-file table whose
    file-modification order diverges wildly from event time could re-emit
    a key whose state was evicted.  That is the documented semantics of
    watermark-bounded dedup, not a bug: production picks the watermark to
    cover the real late-data horizon.
    """
    for active in spark.streams.active:
        if active.name == name:
            active.stop()
    import os

    # basePath + glob: see streaming_daily_rollup.
    base = os.path.dirname(events_path.rstrip("/")) or "."
    # Watermarks demand TIMESTAMP (not NTZ): carry a session-zone cast as
    # the event-time column; the dedup key's `day` stays on the original
    # NTZ values so it is zone-independent and oracle-comparable.
    deduped = (
        spark.readStream.schema(EVENTS_DDL)
        .option("basePath", base)
        .parquet(events_path + "*")
        .select(
            F.col("ts").cast("timestamp").alias("ts_wm"),
            F.col("user_id"),
            F.col("event_type"),
            F.date_trunc("day", F.col("ts")).alias("day"),
        )
        .withWatermark("ts_wm", watermark)
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "day"])
    )
    query = (
        deduped.select("user_id", "event_type", "day")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name).orderBy("user_id", "event_type", "day")


def streaming_interval_join(
    spark: SparkSession,
    events_path: str,
    left_type: str = "view",
    right_type: str = "purchase",
    horizon: str = "2 hours",
    watermark: str = "3 days",
    name: str = "streaming_join_sink",
) -> DataFrame:
    """Watermarked STREAM-STREAM inner join — the last stateful streaming
    shape in the surface (windowed agg, custom state, watermark dedup are
    covered elsewhere): attribute each ``right_type`` event to every
    ``left_type`` event of the SAME user in the preceding ``horizon``.

    Both sides carry watermarks and the join predicate is an explicit
    time-range on the two event times, which is what lets the runtime
    bound join state: a buffered left row is expirable once the right
    watermark passes ``left.ts + horizon`` (Structured Streaming's
    stream-stream join state eviction requires exactly this shape).

    Determinism note (same as streaming_dedup_event_keys): an inner join
    with both rows inside the watermark allowance emits the same pair set
    as the batch join; the availableNow drain of the single-file testdata
    delivers one micro-batch, where that holds by construction.  The
    output is the raw pair set (ids + timestamps), ordered — exactly the
    batch self-join, so the DuckDB oracle grades the streaming execution.
    """
    for active in spark.streams.active:
        if active.name == name:
            active.stop()
    import os

    base = os.path.dirname(events_path.rstrip("/")) or "."

    def side(event_type: str, prefix: str) -> DataFrame:
        return (
            spark.readStream.schema(EVENTS_DDL)
            .option("basePath", base)
            .parquet(events_path + "*")  # glob: see streaming_daily_rollup
            .where(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(f"{prefix}_event_id"),
                F.col("user_id").alias(f"{prefix}_user_id"),
                F.col("ts").cast("timestamp").alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", watermark)
        )

    joined = side(left_type, "l").join(
        side(right_type, "r"),
        F.expr(
            "l_user_id = r_user_id AND "
            f"r_ts >= l_ts AND r_ts <= l_ts + INTERVAL {horizon}"
        ),
    )
    query = (
        joined.select("l_user_id", "l_event_id", "r_event_id", "l_ts", "r_ts")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return (
        spark.table(name)
        .withColumnRenamed("l_user_id", "user_id")
        .orderBy("user_id", "l_event_id", "r_event_id")
    )


def stream_static_link(
    stream_blocked: DataFrame,
    static_blocked: DataFrame,
    threshold: float = 0.82,
    name: str = "stream_static_link_sink",
) -> DataFrame:
    """STREAM-STATIC linkage join — the remaining streaming join family
    member (stream-stream interval join is `streaming_interval_join`):
    a live mention feed linked against a static reference catalog, the
    streaming form of operators/link_datasets.py link_only.

    Everything here is STATELESS per micro-batch (refined-key
    projection, inner equi-join against the static side, the scoring
    cascade's codegen features + one Arrow kernel), so no watermark is
    needed and the runtime replans the static side per batch (Spark
    broadcasts a small catalog automatically).  The batch machinery's
    hot-key histogram/salting is deliberately absent — aggregating the
    stream to find hot keys is not expressible pre-join in a streaming
    plan; a skewed FEED is the static side's problem only if the catalog
    key is hot, which the batch report (jobs/er_report.py coverage)
    surfaces ahead of deployment.

    Edge semantics are identical to the batch link (the score is a pure
    function of the pair tuple), so the batch mirror oracle grades the
    streaming execution directly.
    """
    from ..operators.link_datasets import _keyed
    from ..operators.pairs import PAIR_FIELDS
    from ..operators.scoring import score_pairs

    spark = static_blocked.sparkSession
    for active in spark.streams.active:
        if active.name == name:
            active.stop()

    def sided(df: DataFrame, side: str, extra=()) -> DataFrame:
        return df.select(
            "join_key",
            *[F.col(c).alias(f"{c}_{side}") for c in PAIR_FIELDS + list(extra)],
        )

    a = sided(_keyed(stream_blocked, threshold), "a", extra=["block_key"])
    b = sided(_keyed(static_blocked, threshold), "b")
    pairs = a.join(b, "join_key").withColumnRenamed(
        "block_key_a", "block_key"
    ).drop("join_key")
    edges = score_pairs(pairs, threshold)

    query = (
        edges.select("rec_id_a", "rec_id_b", "score")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name).orderBy("rec_id_a", "rec_id_b")


def run_ingest_to_parquet(
    spark: SparkSession,
    source_path: str,
    sink_path: str,
    checkpoint_path: str,
    available_now: bool = True,
):
    """Incrementally extract+normalize+block new transcript files into a
    parquet mention store.  ``availableNow`` drains the backlog and stops —
    the batch-job-friendly trigger; drop it for a continuous daemon."""
    stream = streaming_blocked_mentions(read_transcript_stream(spark, source_path))
    writer = (
        stream.writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_hll_sketch(
    spark: SparkSession,
    events_path: str,
    col: str = "user_id",
    p: int = 10,
    hash_method: str = "md5",
    name: str = "streaming_hll_sink",
) -> DataFrame:
    """Continuous distinct-count sketching: the HLL register table
    (operators/sketches.py) maintained BY the streaming runtime — the
    "distinct users so far, updated every micro-batch" production shape.

    The whole point of the register representation shows up here: the
    streaming aggregation state IS the sketch — ``groupBy(register)
    .max(rank)`` keeps at most 2**p rows of state however long the
    stream runs (no watermark needed; max never retracts), and the
    COMPLETE-mode sink re-emits the current table each trigger, which a
    dashboard reads with :func:`~postal_address_spark.operators.sketches.
    hll_estimate`.

    Determinism: max is commutative, associative and idempotent, so the
    drained table equals the BATCH ``hll_registers`` over the same rows
    regardless of micro-batch boundaries, file order, or replays — this
    query is gradable against the same mirrored DuckDB register replay
    as the batch sketch, with NO single-micro-batch caveat (unlike the
    sessionizer / watermark-dedup notes above).
    """
    from postal_address_spark.operators.sketches import (
        _hash32_pair,
        _rank_expr,
    )

    for active in spark.streams.active:
        if active.name == name:
            active.stop()
    import os

    base = os.path.dirname(events_path.rstrip("/")) or "."
    h1, h2 = _hash32_pair(F.col(col), hash_method)
    registers = (
        spark.readStream.schema(EVENTS_DDL)
        .option("basePath", base)
        .parquet(events_path + "*")
        .where(F.col(col).isNotNull())
        .select(
            F.shiftrightunsigned(h1, 32 - p).alias("register"),
            _rank_expr(h2).alias("rank"),
        )
        .groupBy("register")
        .agg(F.max("rank").alias("max_rank"))
    )
    query = (
        registers.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name).orderBy("register")
