"""Mergeable distinct-count sketches: HyperLogLog register tables and
KMV (bottom-k) sketches, from scratch on portable integer hashing.

Why not ``approx_count_distinct``?  Spark's built-in HLL++ answers one
query in one pass, but its sketch state is opaque: it cannot be PERSISTED
as data, merged across independently-computed snapshots (yesterday's
partition sketches + today's), or diffed between runs.  At 100 TB the
whole point of a sketch is that the per-partition / per-day register
tables are tiny named TABLES you store next to the data and fold later
(the Datasketches operating model).  These operators emit exactly that:

* :func:`hll_registers` — (register, max_rank) with at most 2**p rows,
  computed by ONE map-side-combinable ``groupBy(register).max(rank)``
  whatever the input size.  Merging sketches = union + the same groupBy
  (:func:`hll_merge`), associative and idempotent, so sketches compose
  across files, days, or retries.  :func:`hll_estimate` turns a register
  table into the cardinality estimate driver-side (standard bias-corrected
  harmonic mean + linear counting below 2.5m).
* :func:`kmv_bottomk` — the k smallest distinct hash values (one
  ``TakeOrdered``: map-side partial top-k, never a full sort).  Besides
  cardinality (:func:`kmv_estimate`), bottom-k sketches support SET
  operations HLL cannot: :func:`kmv_overlap` estimates |A ∩ B| / |A ∪ B|
  from two columns' sketches — the "how much does today's crawl overlap
  yesterday's" question — with ONE union + one TakeOrdered, integer
  output only.

Hashing (the cross-engine discipline established by doc_fingerprints):
production uses ``xxhash64`` (engine rule 4: MessageDigest serializes at
high thread counts); the gate path uses the PORTABLE md5-prefix hash —
``conv(substr(md5(x), 1|9, 8), 16, 10)`` equals DuckDB
``CAST('0x' || substr(md5(x), ...) AS BIGINT)`` — so the DuckDB oracle
replays register tables and bottom-k sets bit-for-bit.  The HLL rank
(leading-zero count of a 32-bit word) is deliberately computed by a
GENERATED 32-arm integer CASE chain emitted identically to both engines:
``floor(log2(w))`` would put float-rounding boundaries exactly on powers
of two, the measured cross-engine trap fs_pattern_truth documents.

Estimator accuracy (~1.04/sqrt(2**p) for HLL, ~1/sqrt(k-2) for KMV) is
pinned by tests/test_sketches.py against exact distinct counts, and
merge associativity / split-merge equality are asserted exactly.
"""
from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_U32 = 1 << 32


def _hash32_pair(col: Column, method: str) -> tuple[Column, Column]:
    """Two independent uniform 32-bit words (as bigint columns) from one
    value.  'md5' is the portable gate path; 'xxhash64' the fast path."""
    if method == "md5":
        hexd = F.md5(col.cast("string"))
        h1 = F.conv(F.substring(hexd, 1, 8), 16, 10).cast("long")
        h2 = F.conv(F.substring(hexd, 9, 8), 16, 10).cast("long")
        return h1, h2
    if method == "xxhash64":
        h = F.xxhash64(col.cast("string"))
        # unsigned halves of the 64-bit word
        h1 = F.shiftrightunsigned(h, 32)
        h2 = h.bitwiseAND(F.lit(_U32 - 1))
        return h1, h2
    raise ValueError(f"unknown hash_method {method!r}")


def _rank_expr(w: Column) -> Column:
    """Leading-zero rank of a 32-bit word: 1 if the top bit is set, …,
    33 if w == 0.  Integer-comparison CASE chain only (no log2 floats —
    see module doc); the DuckDB oracle generates the same 32 arms."""
    expr = F.lit(33)
    # build from the smallest threshold up so the strongest test wins
    for i in range(32, 0, -1):
        expr = F.when(w >= F.lit(1 << (32 - i)), F.lit(i)).otherwise(expr)
    return expr


def rank_case_sql(w_sql: str) -> str:
    """The identical 32-arm rank chain as ANSI SQL (oracle generation)."""
    arms = "".join(
        f" WHEN {w_sql} >= {1 << (32 - i)} THEN {i}" for i in range(1, 33)
    )
    return f"CASE{arms} ELSE 33 END"


def hll_registers(
    df: DataFrame,
    col: str,
    p: int = 12,
    hash_method: str = "xxhash64",
    group_cols: tuple = (),
) -> DataFrame:
    """HyperLogLog register table: (*group_cols, register, max_rank),
    ≤ 2**p rows per group.

    NULLs are skipped (a NULL is not a value; matches COUNT(DISTINCT)).
    One narrow projection + one map-side-combinable aggregation; the
    shuffle carries at most groups x 2**p rows per map task.
    ``group_cols`` gives the production shape — one sketch per key
    (distinct users per day, distinct values per blocking key) in the
    same single pass, each group independently estimable and mergeable.
    """
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    h1, h2 = _hash32_pair(F.col(col), hash_method)
    # h1 is 0..2^32-1 in both paths; its top p bits pick the register
    # (integer shift engine-side, `//` integer division oracle-side —
    # exact in both, no float division anywhere)
    reg = F.shiftrightunsigned(h1, 32 - p)
    base = (
        df.where(F.col(col).isNotNull())
        .select(
            *group_cols, reg.alias("register"), _rank_expr(h2).alias("rank")
        )
    )
    return base.groupBy(*group_cols, "register").agg(
        F.max("rank").alias("max_rank")
    )


def hll_merge(*sketches: DataFrame, group_cols: tuple = ()) -> DataFrame:
    """Fold any number of register tables into one (associative,
    idempotent: max is both).  Pass the same ``group_cols`` the sketches
    were built with."""
    u = reduce(lambda a, b: a.unionByName(b), sketches)
    return u.groupBy(*group_cols, "register").agg(
        F.max("max_rank").alias("max_rank")
    )


def hll_estimate(registers: list[tuple[int, int]], p: int = 12) -> float:
    """Driver-side estimate from [(register, max_rank)] rows (missing
    registers count as 0).  Standard Flajolet et al. bias-corrected
    harmonic mean with the small-range linear-counting fallback."""
    m = 1 << p
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    ranks = dict(registers)
    inv_sum = 0.0
    zeros = 0
    for j in range(m):
        r = ranks.get(j, 0)
        inv_sum += 2.0 ** (-r)
        if r == 0:
            zeros += 1
    est = alpha * m * m / inv_sum
    if est <= 2.5 * m and zeros:
        import math

        est = m * math.log(m / zeros)
    return est


def kmv_bottomk(
    df: DataFrame, col: str, k: int, hash_method: str = "xxhash64"
) -> DataFrame:
    """The k smallest DISTINCT hash values of ``col``: one row per hash,
    (hval) ascending-unique.  orderBy+limit compiles to TakeOrdered —
    map-side partial top-k, no global sort materialization."""
    h1, h2 = _hash32_pair(F.col(col), hash_method)
    # 63 uniform bits: h1*2^31 + (h2 >> 1) spans exactly [0, 2^63-1] —
    # h1*2^32 + h2 would overflow the signed long
    hval = (
        h1 * F.lit(1 << 31) + F.shiftrightunsigned(h2, 1)
    ).alias("hval")
    return (
        df.where(F.col(col).isNotNull())
        .select(hval)
        .distinct()
        .orderBy("hval")
        .limit(k)
    )


def kmv_estimate(hvals: list[int], k: int) -> float:
    """(k-1) / kth-smallest-normalized; exact count if fewer than k.
    The hash domain is [0, 2^63) (see kmv_bottomk)."""
    if len(hvals) < k:
        return float(len(hvals))
    kth = max(hvals)
    return (k - 1) / (kth / float(1 << 63))


def kmv_overlap(
    a: DataFrame,
    b: DataFrame,
    col: str,
    k: int,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """One-row Jaccard evidence between two columns' value SETS:
    (k_union, n_common) where k_union = |bottom-k of A ∪ B| and n_common
    = how many of those union-sketch members appear in BOTH sides.
    n_common / k_union is the standard KMV Jaccard estimate; the emitted
    row is integers only (the division belongs to the caller — engine
    rule: no float partial-agg order in hash-graded output)."""
    sa = kmv_bottomk(a, col, k, hash_method).withColumn("in_a", F.lit(1))
    sb = kmv_bottomk(b, col, k, hash_method).withColumn("in_b", F.lit(1))
    union_k = (
        sa.select("hval")
        .unionByName(sb.select("hval"))
        .distinct()
        .orderBy("hval")
        .limit(k)
    )
    joined = (
        union_k.join(sa, "hval", "left").join(sb, "hval", "left")
    )
    return joined.agg(
        F.count(F.lit(1)).alias("k_union"),
        F.sum(
            (F.col("in_a").isNotNull() & F.col("in_b").isNotNull()).cast(
                "long"
            )
        ).alias("n_common"),
    )
