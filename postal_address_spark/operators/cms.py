"""Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
persistable, mergeable FREQUENCY table, plus exact heavy-hitter
extraction — the third mergeable sketch next to HLL (distinct counts)
and KMV (set overlap) in operators/sketches.py.

Why: at 100 TB the "which keys are hot" question — stop tokens, hot
blocking keys, runaway conversation ids — is exactly what the skew
defenses (pairs.py salting, token_join.py df caps) need answered BEFORE
the expensive join runs.  An exact ``groupBy(key).count()`` shuffles one
row per distinct key (10^9+ at corpus scale); the CMS reduces the whole
stream to a fixed ``depth x width`` counter table (one map-side-
combinable aggregation), and per-partition / per-day sketch tables merge
by cell-wise SUM — the same Datasketches operating model as
sketches.py.

Guarantee (one-sided): every cell only OVER-counts, so
``min over rows of cell[d][h_d(v)]`` >= true count(v), with excess
<= e/width * total mass at the usual probability.  :func:`heavy_hitters`
turns that into an EXACT answer: pass 1 sketches, pass 2 keeps only rows
whose CMS estimate reaches the threshold (a superset of the true heavy
hitters — no false negative is possible), then an exact count over that
small candidate set drops the false positives.  The output is therefore
bit-identical to ``GROUP BY v HAVING count >= T`` while the full-
cardinality shuffle never happens — which is why the driver gate grades
it against a brute-force (non-mirrored) DuckDB oracle: a pass proves the
sketch path end-to-end exact, not merely self-consistent.

Hashing: same discipline as sketches.py — xxhash64 production rows
(seeded per depth), md5-prefix portable path (the 128-bit digest yields
four independent 32-bit words, so the portable path supports depth<=4);
bucket = word mod width, integers end to end.
"""
from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_U32 = 1 << 32


def _word(col: Column, d: int, method: str) -> Column:
    """d-th independent uniform 32-bit word (bigint in [0, 2^32))."""
    if method == "md5":
        if d >= 4:
            raise ValueError("md5 path supports depth <= 4")
        hexd = F.md5(col.cast("string"))
        return F.conv(F.substring(hexd, 8 * d + 1, 8), 16, 10).cast("long")
    if method == "xxhash64":
        return F.xxhash64(col.cast("string"), F.lit(d)).bitwiseAND(
            F.lit(_U32 - 1)
        )
    raise ValueError(f"unknown hash_method {method!r}")


def cms_bucket_sql(expr: str, d: int, width: int) -> str:
    """The md5-path bucket as ANSI SQL (oracle generation): the d-th
    8-hex word of md5(expr), mod width."""
    if d >= 4:
        raise ValueError("md5 path supports depth <= 4")
    word = (
        f"CAST('0x' || substr(md5(CAST({expr} AS VARCHAR)), "
        f"{8 * d + 1}, 8) AS BIGINT)"
    )
    return f"({word} % {width})"


def _check(depth: int, width: int) -> None:
    if not 1 <= depth <= 8:
        raise ValueError("depth must be in [1, 8]")
    if not 16 <= width <= 1 << 20:
        raise ValueError("width must be in [16, 2^20]")


def cms_table(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 2048,
    hash_method: str = "xxhash64",
    group_cols: tuple = (),
) -> DataFrame:
    """The counter table (*group_cols, d, bucket, cnt), at most
    depth*width rows per group.

    One projection exploding depth (d, bucket) structs per row
    (explode_outer per engine rule 2 — the array is never empty) + one
    map-side-combinable count; the shuffle carries <= groups x
    depth*width rows per map task whatever the input size.  NULLs are
    skipped.  ``group_cols`` gives the production shape — one frequency
    sketch per key (per day, per source) from the same single pass, the
    hll_registers/qsketch convention.
    """
    _check(depth, width)
    c = F.col(col)
    cells = F.explode_outer(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    F.pmod(_word(c, d, hash_method), F.lit(width)).alias(
                        "bucket"
                    ),
                )
                for d in range(depth)
            ]
        )
    )
    return (
        df.where(c.isNotNull())
        .select(*group_cols, cells.alias("cell"))
        .select(*group_cols, "cell.d", "cell.bucket")
        .groupBy(*group_cols, "d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame, group_cols: tuple = ()) -> DataFrame:
    """Cell-wise sum: associative, commutative — per-partition/per-day
    sketches fold in any order (merge of sketches == sketch of union,
    asserted exactly in tests/test_cms.py).  Pass the same
    ``group_cols`` the sketches were built with."""
    u = reduce(lambda a, b: a.unionByName(b), sketches)
    return u.groupBy(*group_cols, "d", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_lookup(
    cells: list[tuple[int, int, int]], value, depth: int, width: int
) -> int:
    """Driver-side point estimate from [(d, bucket, cnt)] rows (md5
    path): min over depths — an upper bound on the true count."""
    import hashlib

    table = {(d, b): cnt for d, b, cnt in cells}
    hexd = hashlib.md5(str(value).encode("utf-8")).hexdigest()
    est = None
    for d in range(depth):
        b = int(hexd[8 * d : 8 * d + 8], 16) % width
        c = table.get((d, b), 0)
        est = c if est is None else min(est, c)
    return int(est or 0)


def heavy_hitters(
    df: DataFrame,
    col: str,
    min_count: int,
    depth: int = 4,
    width: int = 2048,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """EXACT (value, cnt) for every value occurring >= min_count times,
    without ever shuffling the full distinct-key population.

    Pass 1 builds the CMS (collected — a bounded driver read of at most
    depth*width rows, the IVF-sample pattern) and rides it back as ONE
    literal map (engine rule 6: str_to_map above the create_map
    threshold, via functions.map_lookup_col).  Pass 2 re-scans the
    column, keeps rows whose min-over-depths cell estimate reaches
    ``min_count`` (a SUPERSET of the truth — CMS never undercounts) and
    exact-counts only those survivors; the final HAVING drops the false
    positives, so the result equals the brute-force GROUP BY/HAVING.

    The input is scanned twice — callers looping over many thresholds
    should persist ``df`` (or its projection) first.  Candidate volume
    after the filter is bounded by the CMS collision rate; size width
    so that total_rows/width << min_count to keep it tight.
    """
    from postal_address_spark.functions import map_lookup_col

    _check(depth, width)
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    if depth * width > 1 << 16:
        raise ValueError("depth*width > 65536: literal map too large")
    cells = cms_table(df, col, depth, width, hash_method).collect()
    table = {f"{r['d']}:{r['bucket']}": str(r["cnt"]) for r in cells}

    c = F.col(col)
    ests = [
        F.coalesce(
            map_lookup_col(
                table,
                F.concat(
                    F.lit(f"{d}:"),
                    F.pmod(_word(c, d, hash_method), F.lit(width)).cast(
                        "string"
                    ),
                ),
            ).cast("long"),
            F.lit(0),
        )
        for d in range(depth)
    ]
    est = ests[0] if depth == 1 else F.least(*ests)
    return (
        df.where(c.isNotNull())
        .where(est >= F.lit(int(min_count)))
        .groupBy(c.alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= F.lit(int(min_count)))
    )
