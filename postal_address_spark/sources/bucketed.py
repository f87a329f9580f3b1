"""Bucketed mention store: pre-shuffled, co-located self-joins.

At 10^12 turns the candidate self-join's two shuffles of the blocked
mention table dominate the pairing stage.  Writing the mention store
bucketed by ``block_key`` pays that shuffle ONCE at ingest; every
subsequent linkage run (rescoring with new thresholds, incremental
re-clustering, repeated experiments) self-joins bucket-to-bucket with
ZERO Exchange in the plan — asserted in tests/test_bucketed.py.

Bucketing metadata lives in the session catalog (``saveAsTable``); the
files are plain parquet, so non-bucket-aware readers still work.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = 64,
    by: Sequence[str] = ("block_key",),
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and sorted) by the join key columns."""
    (
        df.write.mode(mode)
        .bucketBy(buckets, *by)
        .sortBy(*by)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
