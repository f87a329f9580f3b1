"""profile_columns (operators/profiling.py): hand-checkable tallies,
NULL handling, deterministic tie-breaks, and the top-k cutoff."""
import pytest

from postal_address_spark.operators.profiling import profile_columns


def _df(spark):
    rows = [
        ("a", 1), ("a", 1), ("b", 1), ("b", 2), (None, 2), (None, None),
    ]
    return spark.createDataFrame(rows, "s string, n int")


def test_profile_hand_case(spark):
    out = profile_columns(_df(spark), ["s", "n"], top_k=5).collect()
    by_col = {}
    for r in out:
        by_col.setdefault(r.col_name, []).append(r)
    s = sorted(by_col["s"], key=lambda r: r.rank)
    assert all((r.n_rows, r.n_null, r.n_distinct) == (6, 2, 2) for r in s)
    assert [(r.rank, r.value, r.n_value) for r in s] == [(1, "a", 2), (2, "b", 2)]
    n = sorted(by_col["n"], key=lambda r: r.rank)
    assert all((r.n_rows, r.n_null, r.n_distinct) == (6, 1, 2) for r in n)
    assert [(r.rank, r.value, r.n_value) for r in n] == [(1, "1", 3), (2, "2", 2)]


def test_profile_top_k_cutoff(spark):
    rows = [(str(i % 4),) for i in range(12)]
    df = spark.createDataFrame(rows, "v string")
    out = profile_columns(df, ["v"], top_k=2).collect()
    assert len(out) == 2
    assert {r.rank for r in out} == {1, 2}


def test_profile_no_columns_rejected(spark):
    with pytest.raises(ValueError):
        profile_columns(_df(spark), [])
