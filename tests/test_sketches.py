"""Distinct-count sketches (operators/sketches.py): estimator accuracy vs
exact counts, EXACT merge algebra, and bit-exact DuckDB portability of the
md5 gate path (the same replay the driver oracle runs)."""
from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from postal_address_spark.operators.sketches import (
    hll_estimate,
    hll_merge,
    hll_registers,
    kmv_bottomk,
    kmv_estimate,
    kmv_overlap,
    rank_case_sql,
)


def _values_df(spark, n, prefix="v", dup=3):
    """n distinct values, each repeated `dup` times, shuffled partitions."""
    return (
        spark.range(n * dup)
        .select(
            F.concat(
                F.lit(prefix), (F.col("id") % n).cast("string")
            ).alias("val")
        )
        .repartition(7)
    )


# --------------------------------------------------------------------------
# HLL
# --------------------------------------------------------------------------

@pytest.mark.parametrize("method", ["md5", "xxhash64"])
def test_hll_estimate_accuracy(spark, method):
    n = 5000
    regs = hll_registers(
        _values_df(spark, n), "val", p=12, hash_method=method
    ).collect()
    est = hll_estimate([(r[0], r[1]) for r in regs], p=12)
    # sigma ~ 1.04/sqrt(4096) = 1.6%; allow 4 sigma on the fixed seedless
    # (but deterministic) corpus
    assert abs(est - n) / n < 0.065


def test_hll_small_range_linear_counting(spark):
    n = 40
    regs = hll_registers(_values_df(spark, n), "val", p=12).collect()
    est = hll_estimate([(r[0], r[1]) for r in regs], p=12)
    assert abs(est - n) / n < 0.05


def test_hll_duplicates_do_not_move_the_sketch(spark):
    a = hll_registers(_values_df(spark, 1000, dup=1), "val").collect()
    b = hll_registers(_values_df(spark, 1000, dup=9), "val").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_hll_merge_equals_sketch_of_union(spark):
    a = _values_df(spark, 2000, prefix="a")
    b = _values_df(spark, 2000, prefix="b")
    direct = hll_registers(a.unionByName(b), "val")
    merged = hll_merge(hll_registers(a, "val"), hll_registers(b, "val"))
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_hll_md5_path_replays_in_duckdb(spark):
    pdf = pd.DataFrame({"val": [f"v{i}" for i in range(3000)]})
    sdf = spark.createDataFrame(pdf).repartition(5)
    got = sorted(
        map(tuple, hll_registers(sdf, "val", p=10, hash_method="md5").collect())
    )
    rank = rank_case_sql(
        "CAST('0x' || substr(md5(val), 9, 8) AS BIGINT)"
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(
        f"""
        SELECT CAST('0x' || substr(md5(val), 1, 8) AS BIGINT) // {1 << 22}
                 AS register,
               max({rank}) AS max_rank
        FROM t WHERE val IS NOT NULL
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    assert got == [(int(r), int(m)) for r, m in want]


# --------------------------------------------------------------------------
# KMV
# --------------------------------------------------------------------------

@pytest.mark.parametrize("method", ["md5", "xxhash64"])
def test_kmv_estimate_accuracy(spark, method):
    n, k = 5000, 256
    hv = [
        r["hval"]
        for r in kmv_bottomk(
            _values_df(spark, n), "val", k, hash_method=method
        ).collect()
    ]
    assert len(hv) == k
    assert hv == sorted(hv)
    est = kmv_estimate(hv, k)
    # sigma ~ 1/sqrt(k-2) = 6.3%; deterministic corpus, allow ~3 sigma
    assert abs(est - n) / n < 0.20


def test_kmv_exact_below_k(spark):
    hv = [
        r["hval"]
        for r in kmv_bottomk(_values_df(spark, 37), "val", 256).collect()
    ]
    assert kmv_estimate(hv, 256) == 37.0


def test_kmv_md5_path_replays_in_duckdb(spark):
    pdf = pd.DataFrame({"val": [f"x{i}" for i in range(2000)]})
    sdf = spark.createDataFrame(pdf).repartition(3)
    got = [
        r["hval"]
        for r in kmv_bottomk(sdf, "val", 64, hash_method="md5").collect()
    ]
    con = duckdb.connect()
    con.register("t", pdf)
    want = [
        r[0]
        for r in con.execute(
            f"""
            SELECT DISTINCT
              CAST('0x' || substr(md5(val), 1, 8) AS BIGINT) * {1 << 31}
              + CAST('0x' || substr(md5(val), 9, 8) AS BIGINT) // 2 AS hval
            FROM t WHERE val IS NOT NULL
            ORDER BY hval LIMIT 64
            """
        ).fetchall()
    ]
    assert got == want


def test_kmv_overlap_jaccard(spark):
    # A = 0..3999, B = 3000..6999: |A∩B| = 1000, |A∪B| = 7000 -> J = 1/7
    mk = lambda lo, hi: spark.range(lo, hi).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("val")
    )
    row = kmv_overlap(mk(0, 4000), mk(3000, 7000), "val", 512).collect()[0]
    assert row["k_union"] == 512
    j = row["n_common"] / row["k_union"]
    assert abs(j - 1 / 7) < 0.05


def test_kmv_overlap_disjoint_and_identical(spark):
    mk = lambda lo, hi: spark.range(lo, hi).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("val")
    )
    r0 = kmv_overlap(mk(0, 1000), mk(1000, 2000), "val", 128).collect()[0]
    assert r0["n_common"] == 0
    r1 = kmv_overlap(mk(0, 1000), mk(0, 1000), "val", 128).collect()[0]
    assert r1["n_common"] == r1["k_union"] == 128


def test_hll_grouped_registers(spark):
    import pyspark.sql.functions as F

    # one pass, two sketches.  g0: ids ≡ 0 (mod 5), val = a(id % 2500)
    # -> multiples of 5 mod 2500 = 500 distinct.  g1: ids !≡ 0 (mod 5),
    # val = b(id % 2000); id % 5 == (id % 2000) % 5, so residues that
    # are multiples of 5 never occur -> 2000 - 400 = 1600 distinct.
    df = (
        spark.range(10000)
        .select(
            F.when(F.col("id") % 5 == 0, "g0").otherwise("g1").alias("g"),
            F.when(
                F.col("id") % 5 == 0,
                F.concat(F.lit("a"), (F.col("id") % 2500).cast("string")),
            )
            .otherwise(
                F.concat(F.lit("b"), (F.col("id") % 2000).cast("string"))
            )
            .alias("val"),
        )
    )
    regs = hll_registers(df, "val", p=12, group_cols=("g",)).collect()
    by_g = {}
    for r in regs:
        by_g.setdefault(r["g"], []).append((r["register"], r["max_rank"]))
    est0 = hll_estimate(by_g["g0"], p=12)
    est1 = hll_estimate(by_g["g1"], p=12)
    assert abs(est0 - 500) / 500 < 0.07
    assert abs(est1 - 1600) / 1600 < 0.07
    # grouped merge algebra stays exact
    half1 = df.where(F.col("id") < 5000)
    half2 = df.where(F.col("id") >= 5000)
    direct = sorted(map(tuple, hll_registers(df, "val", group_cols=("g",)).collect()))
    merged = sorted(
        map(
            tuple,
            hll_merge(
                hll_registers(half1, "val", group_cols=("g",)),
                hll_registers(half2, "val", group_cols=("g",)),
                group_cols=("g",),
            ).collect(),
        )
    )
    assert direct == merged
