"""Quantile sketch (operators/qsketch.py): bucket algebra, merge
exactness, and the 2^-(s+1) relative-error bound vs exact percentiles."""
from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from postal_address_spark.operators.qsketch import (
    bucket_bounds,
    bucket_sql,
    qsketch,
    qsketch_merge,
    quantile_estimate,
)


def py_bucket(v: int, s: int) -> int:
    if v <= 0:
        return 0
    b = v.bit_length()
    if b - 1 >= s:
        sub = (v >> (b - 1 - s)) - (1 << s)
    else:
        sub = (v - (1 << (b - 1))) << (s - (b - 1))
    return (b << s) + sub


@pytest.mark.parametrize("s", [0, 3, 5])
def test_bucket_bounds_roundtrip(s):
    # every value in [0, 5000] plus high outliers lands in a bucket whose
    # bounds contain it; bucket ids are monotone in v
    vals = list(range(0, 5001)) + [10**9, 10**12, (1 << 62) + 5, (1 << 63) - 1]
    prev = -1
    for v in sorted(vals):
        bk = py_bucket(v, s)
        lo, hi = bucket_bounds(bk, s)
        assert lo <= v <= hi, (v, s, bk, lo, hi)
        assert bk >= prev
        prev = bk


def test_sql_matches_python_binning(spark):
    vals = [0, 1, 2, 3, 7, 8, 9, 100, 12345, 10**7, (1 << 40) + 17, -5]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = {
        r["v"]: r["bucket"]
        for r in df.select(
            "v", F.expr(bucket_sql("v", 5, "div")).alias("bucket")
        ).collect()
    }
    for v in vals:
        assert got[v] == py_bucket(v, 5), v


def test_duckdb_dialect_matches(spark):
    import duckdb

    vals = [0, 1, 5, 63, 64, 65, 999, 10**6, (1 << 50) - 1, -3]
    spark_df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got_spark = sorted(
        map(tuple, qsketch(spark_df, "v", s=4).collect())
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({v}::BIGINT)" for v in vals)
        + ") AS x(v)"
    )
    got_duck = sorted(
        con.execute(
            f"SELECT {bucket_sql('v', 4, '//')} AS bucket, "
            "COUNT(*) AS cnt FROM t WHERE v IS NOT NULL GROUP BY 1"
        ).fetchall()
    )
    assert got_spark == [(int(b), int(c)) for b, c in got_duck]


@pytest.mark.parametrize("s", [3, 5, 7])
def test_quantile_relative_error_bound(spark, s):
    rng = random.Random(42)
    # heavy-tailed positive lengths, like text sizes
    vals = [max(1, int(math.exp(rng.gauss(5.0, 1.5)))) for _ in range(20000)]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    sk = [(r["bucket"], r["cnt"]) for r in qsketch(df, "v", s=s).collect()]
    svals = sorted(vals)
    bound = 2.0 ** -(s + 1) + 1e-12
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        exact = svals[max(0, math.ceil(q * len(svals)) - 1)]
        est = quantile_estimate(sk, q, s)
        assert abs(est - exact) / exact <= bound, (q, est, exact)


def test_merge_equals_sketch_of_union_grouped(spark):
    rng = random.Random(7)
    rows = [
        ("g%d" % (i % 3), rng.randrange(0, 10**6)) for i in range(5000)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    a = df.where(F.xxhash64("v") % 2 == 0)
    b = df.where(F.xxhash64("v") % 2 != 0)
    direct = sorted(
        map(tuple, qsketch(df, "v", s=5, group_cols=("g",)).collect())
    )
    merged = sorted(
        map(
            tuple,
            qsketch_merge(
                qsketch(a, "v", s=5, group_cols=("g",)),
                qsketch(b, "v", s=5, group_cols=("g",)),
                group_cols=("g",),
            ).collect(),
        )
    )
    assert direct == merged


def test_nulls_skipped_zero_bucket_and_params(spark):
    df = spark.createDataFrame(
        [(None,), (0,), (-9,), (1,)], "v: bigint"
    )
    rows = {r["bucket"]: r["cnt"] for r in qsketch(df, "v", s=2).collect()}
    assert rows[0] == 2  # 0 and -9
    assert sum(rows.values()) == 3  # NULL skipped
    with pytest.raises(ValueError):
        bucket_sql("v", 9)
    with pytest.raises(ValueError):
        quantile_estimate([(1, 1)], 1.5, 2)
    with pytest.raises(ValueError):
        quantile_estimate([], 0.5, 2)
