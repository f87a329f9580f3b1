"""Mergeable quantile sketch over non-negative integer measures —
DDSketch-shaped (Masson, Rim, Lee, "DDSketch: a fast and fully-mergeable
quantile sketch with relative-error guarantees", VLDB 2019) but with
INTEGER power-of-two bins so the sketch table is bit-identical across
engines, completing the mergeable-sketch family (HLL/KMV in sketches.py,
CMS in cms.py).

Why not ``approxQuantile``/``percentile_approx``?  Same reason as the
others: their state is opaque.  The length distribution of a 100 TB
corpus (turn lengths, document sizes, tokens per conversation) is
monitored per day/partition and folded later; that needs the sketch to
be a tiny named TABLE with an associative merge.  This one is
(bucket, cnt) with at most ``63 * 2^s + 1`` live buckets; merge =
union + SUM.

Binning: value v >= 1 with bit length b lands in bucket
``b * 2^s + sub`` where ``sub`` is the next ``s`` bits after the leading
bit (DDSketch's gamma-log bins with gamma = 1 + 2^-s, snapped to powers
of two so every boundary is an INTEGER comparison — the float
``log(v)/log(gamma)`` boundary trap documented at sketches.py applies
here verbatim).  v <= 0 collapses to bucket 0 (counted, estimated as 0);
NULLs are skipped.  Bucket ids are monotone in v, each bucket spans
[lo, hi] with (hi - lo) / lo <= 2^-s, so any quantile estimated at the
bucket midpoint carries relative error <= 2^-(s+1) — pinned against
exact percentiles in tests/test_qsketch.py.

The bucket expression is GENERATED as one branch-descending CASE chain
emitted identically to Spark (``div``) and DuckDB (``//``) by
:func:`bucket_sql`, the rank_case_sql discipline.
"""
from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_sql(v_expr: str, s: int, div_op: str = "div") -> str:
    """The bucket-id CASE chain as SQL text.

    ``div_op``: ``"div"`` for Spark SQL, ``"//"`` for DuckDB — the only
    dialect difference.  Arms test the LARGEST bit length first; 63-bit
    values (v >= 2^62) land in the top arm, so any bigint is covered.
    """
    if not 0 <= s <= 8:
        raise ValueError("s must be in [0, 8]")
    arms = []
    for b in range(63, 0, -1):
        lo = 1 << (b - 1)
        if b - 1 >= s:
            sub = f"(({v_expr}) {div_op} {1 << (b - 1 - s)}) - {1 << s}"
        else:
            sub = f"(({v_expr}) - {lo}) * {1 << (s - (b - 1))}"
        arms.append(f"WHEN ({v_expr}) >= {lo} THEN {(b << s)} + ({sub})")
    joined = "\n".join(arms)
    return (
        f"CASE WHEN ({v_expr}) IS NULL THEN NULL\n{joined}\nELSE 0 END"
    )


def qsketch(
    df: DataFrame, col: str, s: int = 5, group_cols: tuple = ()
) -> DataFrame:
    """(*group_cols, bucket, cnt) — one narrow projection + one
    map-side-combinable aggregation; the shuffle carries at most
    groups x (63 * 2^s + 1) rows per map task.  ``col`` must be integral
    (cast upstream — a silent float cast would move bucket boundaries).
    """
    v = F.col(col).cast("long").alias("__q_v")
    base = (
        df.select(*group_cols, v)
        .where(F.col("__q_v").isNotNull())
        .select(
            *group_cols,
            F.expr(bucket_sql("__q_v", s, "div")).alias("bucket"),
        )
    )
    return base.groupBy(*group_cols, "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def qsketch_merge(*sketches: DataFrame, group_cols: tuple = ()) -> DataFrame:
    """Union + SUM: associative and commutative, so per-partition /
    per-day sketches fold in any order (merge == sketch-of-union is
    asserted exactly in tests/test_qsketch.py)."""
    u = reduce(lambda a, b: a.unionByName(b), sketches)
    return u.groupBy(*group_cols, "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def bucket_bounds(bucket: int, s: int) -> tuple[int, int]:
    """[lo, hi] integer value range of a bucket id (driver-side)."""
    if bucket == 0:
        return (0, 0)
    b, sub = bucket >> s, bucket & ((1 << s) - 1)
    if b - 1 >= s:
        width = 1 << (b - 1 - s)
        lo = ((1 << s) + sub) * width
        return (lo, lo + width - 1)
    v = (1 << (b - 1)) + (sub >> (s - (b - 1)))
    return (v, v)


def quantile_estimate(
    buckets: list[tuple[int, int]], q: float, s: int
) -> float:
    """Driver-side quantile from [(bucket, cnt)] rows: walk buckets in
    id order (monotone in value), return the midpoint of the bucket
    containing the ceil(q * n)-th value — relative error <= 2^-(s+1)."""
    if not 0.0 <= q <= 1.0:
        raise ValueError("q must be in [0, 1]")
    rows = sorted(buckets)
    total = sum(c for _, c in rows)
    if total == 0:
        raise ValueError("empty sketch")
    import math

    rank = max(1, math.ceil(q * total))
    seen = 0
    for bucket, cnt in rows:
        seen += cnt
        if seen >= rank:
            lo, hi = bucket_bounds(bucket, s)
            return (lo + hi) / 2.0
    lo, hi = bucket_bounds(rows[-1][0], s)
    return (lo + hi) / 2.0
