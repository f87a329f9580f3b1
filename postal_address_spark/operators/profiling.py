"""Column profiling: the pre-linkage data exploration every ER run
starts with (Splink's ``profile_columns``; Deequ's column statistics) —
per column its row/null/distinct tallies and the top-k most frequent
values, so blocking-key and comparison-column choices are made from
measured skew, not guesses (a column whose top value covers half the
table is a hot-key factory; a near-unique column is a useless block).

Scale shape — ONE shuffle for the whole profile, any number of columns:

* The input is melted once with ``stack`` into (column, value-as-string)
  rows — a Generate, no join per column.
* Everything reduces through a single ``groupBy(column, value)`` count
  (map-side combinable; NULL is just another group).
* Row/null/distinct tallies RE-AGGREGATE the tiny cells frame (sum of
  counts, count of non-null cells) — the input is scanned exactly once,
  and there is no ``countDistinct`` expand.
* Top-k per column is a window over the same cells frame, partitioned
  by column name (bounded partitions: one per profiled column), ranked
  by (count desc, value asc) so ties are deterministic on both engines.

All outputs are integers and strings — the driver oracle replays the
melt/count/window chain bit-for-bit.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, columns: Sequence[str], top_k: int = 5
) -> DataFrame:
    """One row per (column, top-k rank):
    (col_name, n_rows, n_null, n_distinct, rank, value, n_value).

    Values are profiled as strings (numerics cast canonically), NULLs
    count toward ``n_null`` and never appear in the top-k.
    """
    if not columns:
        raise ValueError("profile_columns needs at least one column")
    stack_args = ", ".join(
        f"'{c}', CAST(`{c}` AS STRING)" for c in columns
    )
    melted = df.select(
        F.expr(
            f"stack({len(columns)}, {stack_args}) AS (col_name, value)"
        )
    )
    # the cells frame feeds BOTH the tallies and the top-k window, whose
    # plans diverge after it — without help the table would be scanned
    # and melted twice.  Persist (memory-then-disk, token_join.py
    # precedent): one scan, one melt, one cells shuffle; the second
    # consumer reads the cache.
    from pyspark import StorageLevel

    cells = (
        melted.groupBy("col_name", "value")
        .agg(F.count(F.lit(1)).alias("n_value"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    stats = cells.groupBy("col_name").agg(
        F.sum("n_value").alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), F.col("n_value")).otherwise(0)).alias(
            "n_null"
        ),
        F.count(F.when(F.col("value").isNotNull(), F.lit(1))).alias(
            "n_distinct"
        ),
    )
    w = Window.partitionBy("col_name").orderBy(
        F.desc("n_value"), F.asc("value")
    )
    topk = (
        cells.where(F.col("value").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
    )
    # LEFT join: an all-NULL column has no top-k rows but MUST still
    # appear (100%-null is the single most important profiling finding);
    # it reports one row with NULL rank/value.
    return (
        stats.join(topk, "col_name", "left")
        .select(
            "col_name", "n_rows", "n_null", "n_distinct",
            "rank", "value", "n_value",
        )
    )
