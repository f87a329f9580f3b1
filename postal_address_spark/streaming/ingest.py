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
