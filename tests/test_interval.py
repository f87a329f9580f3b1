"""range_join semantics: closed-bound containment, bucketed plan; NULL
keys / NULL or inverted bounds never match; bucket width does not change
results; left mode keeps unmatched points."""
import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postal_address_spark.operators.interval import range_join  # noqa: E402


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)


def _points(spark):
    return spark.createDataFrame(
        [
            ("u1", "p1", _ts(10)),
            ("u1", "p2", _ts(100)),
            ("u2", "p3", _ts(10)),
            (None, "p4", _ts(10)),
        ],
        "user_id string, pid string, ts timestamp",
    )


def _intervals(spark):
    return spark.createDataFrame(
        [
            ("u1", "i1", _ts(0), _ts(10)),      # closed end: contains p1
            ("u1", "i2", _ts(10), _ts(50)),     # closed start: contains p1
            ("u1", "i3", _ts(90), _ts(200)),    # contains p2
            ("u2", "i4", _ts(20), _ts(30)),     # misses p3
            ("u2", "i5", _ts(30), _ts(20)),     # inverted -> never matches
            ("u2", "i6", None, _ts(30)),        # NULL bound -> never matches
            (None, "i7", _ts(0), _ts(1000)),    # NULL key -> never matches
        ],
        "user_id string, iid string, start_ts timestamp, end_ts timestamp",
    )


def test_range_join_containment(spark):
    got = {
        (r["pid"], r["iid"])
        for r in range_join(
            _points(spark), _intervals(spark), on=["user_id"], bucket_width_sec=7
        ).collect()
    }
    assert got == {("p1", "i1"), ("p1", "i2"), ("p2", "i3")}


def test_range_join_bucket_width_invariant(spark):
    """The bucket width is a physical knob, never a semantic one."""
    expected = {("p1", "i1"), ("p1", "i2"), ("p2", "i3")}
    for width in (1, 3, 60, 86400):
        got = {
            (r["pid"], r["iid"])
            for r in range_join(
                _points(spark), _intervals(spark), on=["user_id"],
                bucket_width_sec=width,
            ).collect()
        }
        assert got == expected, f"width={width}"


def test_range_join_left_keeps_unmatched(spark):
    rows = range_join(
        _points(spark), _intervals(spark), on=["user_id"],
        bucket_width_sec=60, how="left",
    ).collect()
    by_pid = {}
    for r in rows:
        by_pid.setdefault(r["pid"], []).append(r["iid"])
    assert sorted(by_pid["p1"]) == ["i1", "i2"]
    assert by_pid["p3"] == [None]
    assert by_pid["p4"] == [None]
    assert len(rows) == 5
