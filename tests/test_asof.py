"""asof_join semantics: latest right row with right_ts <= left_ts per key;
no-match -> NULL; equal timestamps are eligible; deterministic under ties."""
import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postal_address_spark.operators.asof import asof_join  # noqa: E402


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [("u1", "p1", _ts(10)), ("u1", "p2", _ts(30)), ("u2", "p3", _ts(5))],
        "user_id string, pid string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", _ts(8)), ("u1", _ts(25)), ("u1", _ts(31)), ("u3", _ts(1))],
        "user_id string, ts timestamp",
    )
    out = {
        r["pid"]: r["ts_asof"]
        for r in asof_join(left, right, on=["user_id"]).collect()
    }
    assert out["p1"] == _ts(8)      # latest of {8} <= 10
    assert out["p2"] == _ts(25)     # 31 is in the future
    assert out["p3"] is None        # u2 has no clicks


def test_asof_equal_ts_eligible(spark):
    left = spark.createDataFrame(
        [("u1", "p1", _ts(10))], "user_id string, pid string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u1", _ts(10))], "user_id string, ts timestamp"
    )
    row = asof_join(left, right, on=["user_id"]).collect()[0]
    assert row["ts_asof"] == _ts(10)


def test_asof_null_keys_never_match(spark):
    """Standard ASOF/equi-join semantics: NULL join keys and NULL
    timestamps never pair up — on either side (the Window.partitionBy
    formulation would otherwise group NULL keys into one bogus
    partition)."""
    left = spark.createDataFrame(
        [
            (None, "p_nullkey", _ts(10)),   # NULL key -> no match
            ("u1", "p_nullts", None),       # NULL ts -> no match
            ("u1", "p_ok", _ts(10)),        # sanity: still matches
            ("u9", "p_nullright", _ts(10)), # only NULL-key right rows exist
        ],
        "user_id string, pid string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", _ts(8)), (None, _ts(1)), ("u9", None)],
        "user_id string, ts timestamp",
    )
    out = {
        r["pid"]: r["ts_asof"]
        for r in asof_join(left, right, on=["user_id"]).collect()
    }
    assert out["p_nullkey"] is None
    assert out["p_nullts"] is None
    assert out["p_nullright"] is None
    assert out["p_ok"] == _ts(8)


def test_asof_matches_sql_correlated(spark):
    """Window-last plan == the quadratic correlated-subquery definition."""
    import random

    rng = random.Random(7)
    left = [
        (f"u{rng.randrange(5)}", f"p{i}", _ts(rng.randrange(60)))
        for i in range(80)
    ]
    right = [(f"u{rng.randrange(5)}", _ts(rng.randrange(60))) for _ in range(60)]
    ldf = spark.createDataFrame(left, "user_id string, pid string, ts timestamp")
    rdf = spark.createDataFrame(right, "user_id string, ts timestamp")
    got = {
        r["pid"]: r["ts_asof"]
        for r in asof_join(ldf, rdf, on=["user_id"]).collect()
    }
    by_user = {}
    for u, t in right:
        by_user.setdefault(u, []).append(t)
    for u, pid, t in left:
        eligible = [x for x in by_user.get(u, []) if x <= t]
        expected = max(eligible) if eligible else None
        assert got[pid] == expected, pid
