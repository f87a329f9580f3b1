"""Data-quality expectation suite (operators/expectations.py): per-kind
violation semantics, rational thresholds, the one-melt uniqueness pass,
and Spark<->DuckDB dialect equality of the generated oracle."""
from __future__ import annotations

import pytest

from postal_address_spark.operators.expectations import (
    Check,
    expect,
    expectations_oracle_sql,
)

ROWS = [
    # id, name, seg, phone, bal
    (1, "alice", "AUTO", "12-345-678-9012", 100.0),
    (2, "bob", "AUTO", "99-000-111-2222", -50.0),
    (3, None, "HOUSE", "bad-phone", 9999.0),
    (4, "dave", "BOAT", None, 20000.0),
    (5, "alice", "AUTO", "33-444-555-6666", None),
    (5, "eve", "auto", "33-444-555-6666", 0.0),
]
SCHEMA = "id long, name string, seg string, phone string, bal double"

CHECKS = [
    Check("id_unique", "id", "unique"),
    Check("name_set", "name", "not_null", min_pass_num=4, min_pass_den=6),
    Check("seg_vals", "seg", "in_set", values=("AUTO", "HOUSE", "BOAT")),
    Check("phone_fmt", "phone", "matches",
          pattern="^[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}$",
          min_pass_num=1, min_pass_den=2),
    Check("name_len", "name", "len_between", lo=3, hi=5),
    Check("bal_range", "bal", "between", lo=-999.99, hi=9999.99),
]


def _report(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    return {
        r["check_name"]: (
            r["column"], r["kind"], r["n_rows"], r["n_violations"],
            r["passed"],
        )
        for r in expect(df, CHECKS).collect()
    }


def test_expectation_semantics(spark):
    got = _report(spark)
    # id 5 occurs twice -> both copies are violations
    assert got["id_unique"] == ("id", "unique", 6, 2, False)
    # one NULL name; threshold 4/6 allows it
    assert got["name_set"] == ("name", "not_null", 6, 1, True)
    # 'auto' (lowercase) not in the set
    assert got["seg_vals"] == ("seg", "in_set", 6, 1, False)
    # 'bad-phone' and the NULL both violate; threshold 1/2 tolerates 2/6
    assert got["phone_fmt"] == ("phone", "matches", 6, 2, True)
    # NULL name violates len_between (3..5); all non-null names fit
    assert got["name_len"] == ("name", "len_between", 6, 1, False)
    # 20000.0 above hi, one NULL -> 2 violations
    assert got["bal_range"] == ("bal", "between", 6, 2, False)


def test_unique_counts_null_as_value(spark):
    df = spark.createDataFrame(
        [(None,), (None,), (1,), (2,)], "v long"
    )
    got = expect(df, [Check("u", "v", "unique")]).collect()[0]
    assert (got["n_rows"], got["n_violations"], got["passed"]) == (4, 2, False)


def test_empty_input_passes(spark):
    df = spark.createDataFrame([], SCHEMA)
    rep = {r["check_name"]: r["passed"] for r in expect(df, CHECKS).collect()}
    assert all(rep.values()) and len(rep) == len(CHECKS)


def test_threshold_boundary_is_exact(spark):
    # 3 ok of 4 rows: passes 3/4 exactly, fails 4/5 — the integer
    # cross-multiplication must sit exactly on the boundary
    df = spark.createDataFrame([(1,), (2,), (3,), (None,)], "v long")
    ok = expect(df, [Check("c", "v", "not_null",
                           min_pass_num=3, min_pass_den=4)]).collect()[0]
    assert ok["passed"] is True
    bad = expect(df, [Check("c", "v", "not_null",
                            min_pass_num=4, min_pass_den=5)]).collect()[0]
    assert bad["passed"] is False


def test_bad_specs_raise():
    with pytest.raises(ValueError):
        Check("x", "c", "nope")
    with pytest.raises(ValueError):
        Check("x", "c", "in_set")
    with pytest.raises(ValueError):
        Check("x", "c", "matches")
    with pytest.raises(ValueError):
        Check("x", "c", "between", lo=1.0)
    with pytest.raises(ValueError):
        Check("x", "c", "not_null", min_pass_num=2, min_pass_den=1)
    with pytest.raises(ValueError):
        expect(None, [])
    # name/column feed selectExpr(stack(...)) + generated SQL unquoted:
    # anything needing quoting is rejected at construction
    with pytest.raises(ValueError):
        Check("x", "my col", "not_null")
    with pytest.raises(ValueError):
        Check("x", "c; DROP TABLE t", "not_null")
    with pytest.raises(ValueError):
        Check("bad'name", "c", "not_null")


def test_oracle_dialect_equality(spark):
    """The generated DuckDB replay must agree check-for-check with the
    Spark evaluation on the same rows (regex, length, NULL-grouping and
    threshold arithmetic all cross-dialect)."""
    import duckdb

    got = _report(spark)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (id BIGINT, name VARCHAR, seg VARCHAR,"
        " phone VARCHAR, bal DOUBLE)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?, ?)", ROWS)
    want = {
        r[0]: (r[1], r[2], r[3], r[4], bool(r[5]))
        for r in con.execute(expectations_oracle_sql("t", CHECKS)).fetchall()
    }
    assert got == want


def test_in_set_requires_string_values():
    # numeric sets would ride as quoted strings in the generated oracle
    # and lean on engine-specific coercion Spark-side — rejected loudly
    with pytest.raises(ValueError):
        Check("x", "c", "in_set", values=(1, 2))
