"""Sorted-neighborhood blocking (operators/sorted_neighborhood.py).

The driver grades snm_pairs against a plain row_number() DuckDB oracle
(hash match at sf0.01); this file pins the distributed machinery itself:
exact equivalence to brute-force window pairing, exact global ranks, the
degenerate sizes, and the plan shape (no global-window single task, no
cartesian product).
"""
import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postal_address_spark.operators.sorted_neighborhood import (  # noqa: E402
    global_rank,
    sorted_neighborhood_pairs,
)


def _random_df(spark, n, seed=7):
    rng = random.Random(seed)
    rows = [
        (f"r{i:03d}", "".join(rng.choices("abcdef", k=4))) for i in range(n)
    ]
    return spark.createDataFrame(rows, "rid string, key string"), rows


def _brute_pairs(rows, w):
    order = sorted(rows, key=lambda t: (t[1], t[0]))
    return {
        (order[i][0], order[j][0], j - i)
        for i in range(len(order))
        for j in range(i + 1, min(i + w, len(order)))
    }


@pytest.mark.parametrize("w", [2, 5])
def test_pairs_equal_bruteforce(spark, w):
    df, rows = _random_df(spark, 200)
    got = {
        (r["id_a"], r["id_b"], r["rank_gap"])
        for r in sorted_neighborhood_pairs(df, "key", "rid", w).collect()
    }
    assert got == _brute_pairs(rows, w)


def test_global_rank_exact_total_order(spark):
    df, rows = _random_df(spark, 157)  # duplicate keys force id tiebreak
    order = sorted(rows, key=lambda t: (t[1], t[0]))
    ranks = {r["rid"]: r["rank"] for r in global_rank(df, "key", "rid").collect()}
    assert [ranks[rid] for rid, _ in order] == list(range(1, 158))


def test_degenerate_sizes(spark):
    one = spark.createDataFrame([("a", "k")], "rid string, key string")
    assert sorted_neighborhood_pairs(one, "key", "rid", 4).count() == 0
    two = spark.createDataFrame(
        [("a", "k"), ("b", "k")], "rid string, key string"
    )
    got = sorted_neighborhood_pairs(two, "key", "rid", 4).collect()
    assert [(r["id_a"], r["id_b"], r["rank_gap"]) for r in got] == [("a", "b", 1)]
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(two, "key", "rid", 1)


def test_plan_no_global_window_no_cartesian(spark):
    """The scale properties: every row_number window is partitioned (by
    the range-partition id — a global ORDER BY window would sort the
    whole corpus in ONE task), and the window join is an equi-join on
    the bucket, never a cartesian/BNLJ."""
    df, _ = _random_df(spark, 50)
    pairs = sorted_neighborhood_pairs(df, "key", "rid", 4)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        # first argument of a partitioned spec is the partition column
        assert spec.strip().startswith("_pid"), plan
