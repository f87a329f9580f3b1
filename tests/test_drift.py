"""Snapshot drift monitor (operators/drift.py)."""
from __future__ import annotations

import duckdb
import pandas as pd

from postal_address_spark.operators.drift import (
    psi_from_counts,
    snapshot_drift,
)


def _snap(spark, cities, texts=None):
    texts = texts or ["x" * 5] * len(cities)
    return spark.createDataFrame(
        pd.DataFrame({"city": cities, "line1": texts})
    )


def test_counts_and_zero_fill(spark):
    prev = _snap(spark, ["paris", "paris", "lyon"])
    curr = _snap(spark, ["paris", "nice", "nice", None])
    rows = {
        (r["field"], r["bin"]): (r["n_prev"], r["n_curr"])
        for r in snapshot_drift(prev, curr, [("city", "cat")]).collect()
    }
    assert rows[("city", "paris")] == (2, 1)
    assert rows[("city", "lyon")] == (1, 0)
    assert rows[("city", "nice")] == (0, 2)
    assert rows[("city", "<null>")] == (0, 1)


def test_top_n_cap_folds_tail(spark):
    prev = _snap(spark, [f"c{i}" for i in range(10)] + ["big"] * 5)
    curr = _snap(spark, [f"c{i}" for i in range(10)] + ["big"] * 7)
    out = snapshot_drift(prev, curr, [("city", "cat")], top_n=3).collect()
    by_bin = {r["bin"]: (r["n_prev"], r["n_curr"]) for r in out}
    assert len(out) == 4  # 3 kept + <other>
    assert by_bin["big"] == (5, 7)
    # tie-broken by bin asc: c0, c1 kept alongside big
    assert set(by_bin) == {"big", "c0", "c1", "<other>"}
    assert by_bin["<other>"] == (8, 8)


def test_len_bins(spark):
    prev = _snap(spark, ["a"] * 3, ["xy", "x" * 9, None])
    curr = _snap(spark, ["a"] * 2, ["x" * 17, "x" * 18])
    rows = {
        r["bin"]: (r["n_prev"], r["n_curr"])
        for r in snapshot_drift(prev, curr, [("line1", "len")]).collect()
    }
    assert rows["len_000000"] == (2, 0)  # len 2 and NULL->0
    assert rows["len_000008"] == (1, 0)
    assert rows["len_000016"] == (0, 2)


def test_psi_values():
    stable = [("f", "a", 500, 500), ("f", "b", 500, 500)]
    assert psi_from_counts(stable)["f"] == 0.0
    shifted = [("f", "a", 900, 100), ("f", "b", 100, 900)]
    assert psi_from_counts(shifted)["f"] > 0.25  # screaming drift
    mild = [("f", "a", 520, 480), ("f", "b", 480, 520)]
    assert 0 < psi_from_counts(mild)["f"] < 0.1


def test_duckdb_replay(spark):
    """The exact per-field capped count table replays in SQL — the same
    construction the driver oracle uses."""
    prev_pd = pd.DataFrame(
        {"city": [f"c{i % 7}" for i in range(40)],
         "line1": ["x" * (i % 20) for i in range(40)]}
    )
    curr_pd = pd.DataFrame(
        {"city": [f"c{i % 5}" for i in range(30)] + ["newtown"] * 4,
         "line1": ["y" * (i % 25) for i in range(34)]}
    )
    out = snapshot_drift(
        spark.createDataFrame(prev_pd),
        spark.createDataFrame(curr_pd),
        [("city", "cat"), ("line1", "len")],
        top_n=4,
    )
    got = sorted(map(tuple, out.collect()))
    con = duckdb.connect()
    con.register("prev", prev_pd)
    con.register("curr", curr_pd)
    want = sorted(
        map(
            tuple,
            con.execute(
                """
    WITH pb AS (
      SELECT 'city' AS field, coalesce(city, '<null>') AS bin FROM prev
      UNION ALL
      SELECT 'line1', 'len_' || lpad(CAST(
        (length(coalesce(line1, '')) // 8) * 8 AS VARCHAR), 6, '0')
      FROM prev
    ),
    cb AS (
      SELECT 'city' AS field, coalesce(city, '<null>') AS bin FROM curr
      UNION ALL
      SELECT 'line1', 'len_' || lpad(CAST(
        (length(coalesce(line1, '')) // 8) * 8 AS VARCHAR), 6, '0')
      FROM curr
    ),
    p AS (SELECT field, bin, count(*) AS n_prev FROM pb GROUP BY 1, 2),
    c AS (SELECT field, bin, count(*) AS n_curr FROM cb GROUP BY 1, 2),
    pc AS (
      SELECT coalesce(p.field, c.field) AS field,
             coalesce(p.bin, c.bin) AS bin,
             coalesce(n_prev, 0) AS n_prev,
             coalesce(n_curr, 0) AS n_curr
      FROM p FULL OUTER JOIN c USING (field, bin)
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY field ORDER BY n_prev + n_curr DESC, bin ASC
      ) AS rk FROM pc
    )
    SELECT field,
           CASE WHEN rk <= 4 THEN bin ELSE '<other>' END AS bin,
           SUM(n_prev) AS n_prev, SUM(n_curr) AS n_curr
    FROM ranked GROUP BY 1, 2
    """
            ).fetchall(),
        )
    )
    assert got == want
