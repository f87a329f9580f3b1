"""Count-min sketch + heavy hitters (operators/cms.py) vs exact truth."""
from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from postal_address_spark.operators.cms import (
    cms_lookup,
    cms_merge,
    cms_table,
    heavy_hitters,
)


def zipf_rows(seed, n, n_hot=8, hot_mass=40):
    """A skewed stream: n_hot values with ~hot_mass copies each over a
    long uniform tail; returns (rows, exact_counts)."""
    rng = random.Random(seed)
    rows = []
    for h in range(n_hot):
        rows += [f"hot{h}"] * (hot_mass + h)
    while len(rows) < n:
        rows.append(f"tail{rng.randrange(n * 10)}")
    rng.shuffle(rows)
    exact: dict[str, int] = {}
    for v in rows:
        exact[v] = exact.get(v, 0) + 1
    return rows, exact


@pytest.mark.parametrize("hash_method", ["xxhash64", "md5"])
def test_heavy_hitters_exact(spark, hash_method):
    rows, exact = zipf_rows(1, 4000)
    df = spark.createDataFrame([(v,) for v in rows], ["val"])
    min_count = 30
    want = sorted((v, c) for v, c in exact.items() if c >= min_count)
    got = sorted(
        (r["value"], r["cnt"])
        for r in heavy_hitters(
            df, "val", min_count, depth=4, width=1024, hash_method=hash_method
        ).collect()
    )
    assert got == want
    assert len(got) == 8  # all planted hot keys, nothing else


def test_heavy_hitters_tiny_width_still_exact(spark):
    # brutal collision rate: width 16 over ~1k distinct values.  The
    # candidate set inflates but the final exact HAVING keeps the
    # output identical to truth — the end-to-end exactness claim.
    rows, exact = zipf_rows(2, 2000)
    df = spark.createDataFrame([(v,) for v in rows], ["val"])
    want = sorted((v, c) for v, c in exact.items() if c >= 25)
    got = sorted(
        (r["value"], r["cnt"])
        for r in heavy_hitters(df, "val", 25, depth=4, width=16).collect()
    )
    assert got == want


def test_cms_never_undercounts(spark):
    rows, exact = zipf_rows(3, 3000)
    df = spark.createDataFrame([(v,) for v in rows], ["val"])
    cells = [
        (r["d"], r["bucket"], r["cnt"])
        for r in cms_table(df, "val", 4, 512, "md5").collect()
    ]
    for v, c in list(exact.items())[:200]:
        assert cms_lookup(cells, v, 4, 512) >= c


def test_merge_equals_sketch_of_union(spark):
    rows, _ = zipf_rows(4, 3000)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rows)], ["i", "val"]
    )
    a = df.where(F.col("i") % 2 == 0)
    b = df.where(F.col("i") % 2 == 1)
    direct = sorted(map(tuple, cms_table(df, "val", 4, 256).collect()))
    merged = sorted(
        map(
            tuple,
            cms_merge(
                cms_table(a, "val", 4, 256), cms_table(b, "val", 4, 256)
            ).collect(),
        )
    )
    assert direct == merged


def test_nulls_skipped_and_params_checked(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",)], ["val"])
    total = (
        cms_table(df, "val", 2, 64)
        .agg(F.sum("cnt").alias("s"))
        .collect()[0]["s"]
    )
    assert total == 2 * 2  # two non-null rows x depth
    with pytest.raises(ValueError):
        cms_table(df, "val", depth=0)
    with pytest.raises(ValueError):
        cms_table(df, "val", width=8)
    with pytest.raises(ValueError):
        cms_table(df, "val", depth=5, hash_method="md5").collect()
    with pytest.raises(ValueError):
        heavy_hitters(df, "val", 0)
    with pytest.raises(ValueError):
        heavy_hitters(df, "val", 1, depth=8, width=1 << 14)


def test_cms_grouped_table_and_merge(spark):
    # one pass, two per-group sketches: estimates and merge algebra must
    # behave per group exactly as ungrouped sketches over each slice
    rows_a, exact_a = zipf_rows(5, 1500)
    rows_b, exact_b = zipf_rows(6, 1500, n_hot=3, hot_mass=90)
    df = spark.createDataFrame(
        [(i, "ga", v) for i, v in enumerate(rows_a)]
        + [(i, "gb", v) for i, v in enumerate(rows_b)],
        ["i", "g", "val"],
    )
    grouped = cms_table(df, "val", 4, 512, "md5", group_cols=("g",))
    by_g: dict = {}
    for r in grouped.collect():
        by_g.setdefault(r["g"], []).append((r["d"], r["bucket"], r["cnt"]))
    for g, exact in (("ga", exact_a), ("gb", exact_b)):
        for v, c in list(exact.items())[:100]:
            assert cms_lookup(by_g[g], v, 4, 512) >= c
    # grouped merge == grouped sketch of union, exactly
    h1 = df.where(F.col("i") % 2 == 0)
    h2 = df.where(F.col("i") % 2 == 1)
    direct = sorted(map(tuple, grouped.collect()))
    merged = sorted(
        map(
            tuple,
            cms_merge(
                cms_table(h1, "val", 4, 512, "md5", group_cols=("g",)),
                cms_table(h2, "val", 4, 512, "md5", group_cols=("g",)),
                group_cols=("g",),
            ).collect(),
        )
    )
    assert direct == merged
