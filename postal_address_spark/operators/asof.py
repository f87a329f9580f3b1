"""As-of join: for each left row, the latest right row with
``right_ts <= left_ts`` in the same key group.

The reference has no temporal operators (SURVEY §2.B documented absence);
this fills the inventory with the scalable formulation: instead of a
range join (whose candidate space explodes with key cardinality x time
span), tag both sides, union them, and run one ``last(..., ignoreNulls)``
window over (key, ts) — a single shuffle on the join key, linear scan per
group, no pair materialization.  This is the plan you want at 10^12 rows;
a broadcast-range join is not.

Tie behavior: right rows at exactly ``left_ts`` are eligible
(``>=`` semantics, matching DuckDB/standard ASOF JOIN); among several
right rows sharing the winning timestamp the one with the greatest
payload struct is returned (deterministic at any parallelism).
"""
from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: List[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Optional[List[str]] = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join; right payload columns come back ``<col><suffix>``
    (NULL when no right row precedes the left row)."""
    right_cols = right_cols or [c for c in right.columns if c not in on]
    if right_ts not in right_cols:
        right_cols = right_cols + [right_ts]

    payload = F.struct(*[F.col(c) for c in right_cols])
    payload_type = right.select(payload.alias("_p")).schema["_p"].dataType

    # NULL join keys / NULL timestamps never match (standard ASOF / DuckDB
    # semantics — Window.partitionBy would otherwise group NULL keys into
    # one bogus partition and let them pair up).  Dropping them from the
    # RIGHT side alone is sufficient and keeps this single-scan: a left row
    # with a NULL key lands in a partition containing no right rows, and a
    # left row with a NULL ts sorts before every right row (nulls-first),
    # so both fall through to the no-match path with a NULL payload.
    right_match_ok = F.col(right_ts).isNotNull()
    for c in on:
        right_match_ok = right_match_ok & F.col(c).isNotNull()
    right = right.where(right_match_ok)

    right_tagged = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        payload.alias("_rpay"),
    )
    left_tagged = left.select(
        *[F.col(c) for c in left.columns],
    ).select(
        "*",
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(payload_type).alias("_rpay"),
    )
    # Schemas must line up for the union; left keeps its full row, right
    # carries only (key, _ats, _side, _rpay) with left-only columns nulled.
    left_only = [c for c in left.columns if c not in set(on)]
    right_aligned = right_tagged.select(
        *[F.col(c) for c in on],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_only
        ],
        "_ats", "_side", "_rpay",
    )
    unioned = left_tagged.select(
        *on, *left_only, "_ats", "_side", "_rpay"
    ).unionByName(right_aligned)

    # right rows sort before left at equal ts (>= semantics); ordering by
    # the payload struct makes the tie-winner deterministic.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ats"), F.col("_side"), F.col("_rpay"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "_match", F.last("_rpay", ignorenulls=True).over(w)
    ).where(F.col("_side") == 1)

    out = matched.select(
        *on,
        *left_only,
        *[
            F.col("_match").getField(c).alias(f"{c}{suffix}")
            for c in right_cols
        ],
    )
    return out
