"""Range (interval-containment) join: points vs intervals.

The reference has no temporal operators (SURVEY §2.B documented absence —
this and asof.py fill the dataflow inventory).  The naive formulation —
``points JOIN intervals ON key AND start <= ts AND ts <= end`` — plans as
an equi-join on the key with the range as a post-filter, which degenerates
to per-key cartesian pair materialization when keys are few or hot: the
candidate space is O(points_per_key x intervals_per_key).

The scalable formulation is BUCKETED: discretize time into fixed-width
buckets, tag each point with its bucket, explode each interval across the
buckets it overlaps, equi-join on (key, bucket), then apply the exact
containment predicate.  Candidate volume becomes O(points x avg_overlap)
where avg_overlap = intervals actually sharing a bucket — data-local, not
key-cardinality-bound.  Pick ``bucket_width`` near the typical interval
length so each interval explodes into O(1) buckets; hot (key, bucket)
pairs are rebalanced by AQE skew-join like any other equi-join.

NULL keys, NULL timestamps, and NULL/inverted bounds never match
(standard SQL inequality semantics: any comparison with NULL is not true).
"""
from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: List[str],
    point_ts: str = "ts",
    start_ts: str = "start_ts",
    end_ts: str = "end_ts",
    bucket_width_sec: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point to every interval (same ``on`` keys) containing it:
    ``start_ts <= point_ts <= end_ts`` (closed bounds, DuckDB BETWEEN
    semantics).  ``how='inner'`` drops unmatched points; ``how='left'``
    keeps them with NULL interval columns.

    One shuffle on (keys..., bucket); the interval side is exploded
    ~(length / bucket_width) times — size ``bucket_width_sec`` accordingly.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    width_us = F.lit(int(bucket_width_sec) * 1_000_000)

    # cast("timestamp") admits TIMESTAMP_NTZ inputs; bucketing only needs a
    # consistent monotone mapping, which any one session's zone provides.
    p_us = F.unix_micros(F.col(point_ts).cast("timestamp"))
    pb = points.withColumn("_bucket", F.floor(p_us / width_us))

    s_us = F.unix_micros(F.col(start_ts).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_ts).cast("timestamp"))
    # NULL/inverted bounds and NULL keys can never satisfy the containment
    # predicate — drop before the explode, not after the join (sequence()
    # would also raise on a negative span).
    keys_ok = F.lit(True)
    for c in on:
        keys_ok = keys_ok & F.col(c).isNotNull()
    ib = (
        intervals
        .where(s_us <= e_us)
        .where(keys_ok)
        .withColumn(
            "_bucket",
            F.explode(F.sequence(F.floor(s_us / width_us), F.floor(e_us / width_us))),
        )
    )
    joined = pb.join(ib, [*on, "_bucket"], "inner").where(
        (F.col(start_ts) <= F.col(point_ts)) & (F.col(point_ts) <= F.col(end_ts))
    )
    out_cols = [c for c in points.columns] + [
        c for c in intervals.columns if c not in points.columns
    ]
    matched = joined.select(*out_cols)
    if how == "inner":
        return matched
    interval_only = [c for c in intervals.columns if c not in points.columns]
    unmatched = points.join(
        matched.select(*points.columns).dropDuplicates(points.columns),
        points.columns,
        "left_anti",
    ).select(
        *points.columns,
        *[
            F.lit(None).cast(intervals.schema[c].dataType).alias(c)
            for c in interval_only
        ],
    )
    return matched.unionByName(unmatched)
