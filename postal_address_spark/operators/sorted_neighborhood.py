"""Sorted-neighborhood blocking (Hernandez & Stolfo's merge/purge pass).

The third blocking family next to the exact key (`blocking.py`) and the
phonetic key: sort all records by a lexicographic key and pair every two
records within a sliding window of ``w`` rank positions.  It catches the
miss class BOTH other passes share — damage to the leading characters of
the blocking fields still usually leaves the records lexicographic
neighbours (multi-pass blocking UNIONS the passes' candidate sets).

Spark-first scale design — the naive expression of SNM is a global
``row_number() OVER (ORDER BY key)``, which Catalyst plans as a
SINGLE-PARTITION window: one task sorts the whole corpus — a
non-starter at 10^12 rows.  This implementation gets the identical total
order with every stage parallel:

1. ``repartitionByRange(key, id)`` — Spark's sampled range partitioner
   splits the key space into contiguous, disjoint ranges (the same
   machinery a distributed ORDER BY uses).
2. per-partition ``row_number()`` windowed ON the partition id — each
   task sorts only its own range (parallel, spills if needed).
3. partition row-counts -> cumulative offsets (a <= #partitions-row
   driver-side table, broadcast back as a literal map): local rank +
   offset of all earlier ranges == exact global rank, because ranges are
   ordered and disjoint.
4. window join WITHOUT a self-join on rank arithmetic: each record lands
   in bucket ``floor(rank / w)`` and also GHOSTS into the bucket below —
   any pair within ``w`` ranks shares a bucket (same bucket, or the
   higher record's ghost reaches down into the lower record's bucket).
   An equi-join on the bucket plus the ``0 < rank_b - rank_a < w`` filter
   yields each qualifying pair EXACTLY once (credited to the bucket that
   owns the lower rank), so candidate generation is an ordinary shuffled
   equi-join with ~2 rows per record — never a cartesian, never a
   single-task sort.

Determinism: the sort key is made total by appending the record id, so
ranks (and hence the pair set) are a pure function of the data — which is
what lets a plain ``row_number`` DuckDB oracle grade the operator
end-to-end.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame, key_col: str, id_col: str, num_partitions: int = 0
) -> DataFrame:
    """Exact 1-based global rank by ``(key, id)`` with no global window.

    The only driver-side materialisation is the per-partition row-count
    table (<= #partitions rows — metadata, not data).
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, F.col(key_col), F.col(id_col))
    ranged = ranged.withColumn("_pid", F.spark_partition_id())

    # Per-range local rank: the window partitions BY _pid, so every task
    # sorts only its own contiguous key range.  The frame is persisted
    # because it is referenced by the offset-count job AND by both sides
    # of the downstream pair join (3 plan references) — and, more
    # importantly, a cached frame guarantees the two executions see the
    # SAME range boundaries even if a caller ever passes a
    # nondeterministic plan (pipeline.py:186 precedent).
    w = Window.partitionBy("_pid").orderBy(key_col, id_col)
    local = ranged.withColumn("_local_rank", F.row_number().over(w)).persist()

    counts = {
        r["_pid"]: r["n"]
        for r in local.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    # Broadcast literal-map lookup: one str_to_map literal regardless of
    # partition count (engine rule: >200-arm when-chains cost O(N) py4j
    # calls at plan build — map_lookup_col folds to a single map literal).
    from ..functions import map_lookup_col

    offset_expr = F.coalesce(
        map_lookup_col(
            {str(pid): str(off) for pid, off in offsets.items()},
            F.col("_pid").cast("string"),
        ).cast("long"),
        F.lit(0),
    )
    return local.withColumn("rank", F.col("_local_rank") + offset_expr).drop(
        "_pid", "_local_rank"
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    window: int,
    carry_cols: tuple = (),
) -> DataFrame:
    """Records -> all pairs within ``window`` rank positions of the
    ``(key, id)`` sort order.  Output: id_a/id_b (id_a ranks lower),
    rank_gap in [1, window), plus ``carry_cols`` from each side.

    Candidate volume is exactly ``(n - window/2) * (window - 1)`` pairs —
    linear in n by construction (the defining property of SNM)."""
    if window < 2:
        raise ValueError("window must be >= 2 (window-1 neighbours per record)")
    ranked = global_rank(df, key_col, id_col)

    bucket = F.floor(F.col("rank") / window)
    # Primary bucket + ghost into the bucket below: a pair (a, b) with
    # rank_a < rank_b < rank_a + w is joined in bucket(a) — b is there
    # either natively (same bucket) or as a ghost (adjacent bucket).
    sides = ranked.select(
        F.col(id_col), F.col("rank"), *[F.col(c) for c in carry_cols]
    )
    a = sides.select(
        bucket.alias("_bkt"),
        F.col(id_col).alias("id_a"),
        F.col("rank").alias("rank_a"),
        *[F.col(c).alias(f"{c}_a") for c in carry_cols],
    )
    # explode_outer, not explode: the array is never empty, and plain
    # explode would add an inferred size>0 filter that re-inlines the
    # bucket expression (engine rule 2).
    b = sides.select(
        F.explode_outer(F.array(bucket, bucket - 1)).alias("_bkt"),
        F.col(id_col).alias("id_b"),
        F.col("rank").alias("rank_b"),
        *[F.col(c).alias(f"{c}_b") for c in carry_cols],
    )
    gap = F.col("rank_b") - F.col("rank_a")
    # a emits only its primary bucket, b emits primary + one-below ghost,
    # so each in-window pair joins exactly once (in bucket(a)).
    return (
        a.join(b, "_bkt")
        .where((gap > 0) & (gap < window))
        .select(
            "id_a",
            "id_b",
            gap.alias("rank_gap"),
            *[f"{c}_a" for c in carry_cols],
            *[f"{c}_b" for c in carry_cols],
        )
    )
