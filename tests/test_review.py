"""apply_review (operators/review.py): clerical decisions fold into the
edge set — rejects anti-join out, confirms union in, pair order and
duplicates normalize away — and the closure reflects them."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def _clusters(spark, edges, nodes):
    from pyspark.sql import functions as F

    from postal_address_spark.operators.cluster import assign_clusters

    vdf = spark.createDataFrame([(n,) for n in nodes], "rec_id string")
    out = assign_clusters(vdf, edges)
    labels = {}
    for r in out.collect():
        labels.setdefault(r.cluster_id, set()).add(r.rec_id)
    return {frozenset(v) for v in labels.values()}


def test_reject_splits_bridge(spark):
    from postal_address_spark.operators.review import apply_review

    edges = _pairs(spark, [("a", "b"), ("b", "c")])
    adjusted = apply_review(edges, rejected=_pairs(spark, [("c", "b")]))  # reversed order
    assert _clusters(spark, adjusted, "abc") == {
        frozenset({"a", "b"}),
        frozenset({"c"}),
    }


def test_reject_redundant_edge_keeps_component(spark):
    from postal_address_spark.operators.review import apply_review

    triangle = _pairs(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    adjusted = apply_review(triangle, rejected=_pairs(spark, [("a", "c")]))
    assert _clusters(spark, adjusted, "abc") == {frozenset({"a", "b", "c"})}


def test_confirm_merges_new_pair(spark):
    from postal_address_spark.operators.review import apply_review

    edges = _pairs(spark, [("a", "b")])
    adjusted = apply_review(edges, confirmed=_pairs(spark, [("d", "c")]))
    assert _clusters(spark, adjusted, "abcd") == {
        frozenset({"a", "b"}),
        frozenset({"c", "d"}),
    }


def test_confirm_outranks_reject_and_dedups(spark):
    from postal_address_spark.operators.review import apply_review

    edges = _pairs(spark, [("a", "b"), ("b", "a")])  # duplicate reversed
    adjusted = apply_review(
        edges,
        rejected=_pairs(spark, [("a", "b")]),
        confirmed=_pairs(spark, [("b", "a"), ("a", "b")]),
    )
    rows = [(r.src, r.dst) for r in adjusted.collect()]
    assert rows == [("a", "b")]  # confirmed wins, normalized, deduped


def test_null_and_self_pairs_dropped(spark):
    from postal_address_spark.operators.review import apply_review

    edges = _pairs(spark, [("a", "b"), ("x", "x"), ("a", None)])
    adjusted = apply_review(edges)
    assert [(r.src, r.dst) for r in adjusted.collect()] == [("a", "b")]


def test_apply_review_matches_set_model(spark):
    """Property: apply_review == (normalized(edges) \\ rejected) ∪ confirmed
    for arbitrary pair sets (order, duplicates, self-pairs included)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from postal_address_spark.operators.review import apply_review

    ids = st.integers(min_value=0, max_value=9).map(lambda i: f"n{i}")
    pair = st.tuples(ids, ids)
    pairs = st.lists(pair, max_size=12)

    def norm(ps):
        return {
            (min(a, b), max(a, b)) for a, b in ps if a is not None and a != b
        }

    @given(pairs, pairs, pairs)
    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def check(edges, rejected, confirmed):
        e = _pairs(spark, edges) if edges else _pairs(spark, [])
        r = _pairs(spark, rejected) if rejected else None
        c = _pairs(spark, confirmed) if confirmed else None
        got = {
            (row.src, row.dst)
            for row in apply_review(e, rejected=r, confirmed=c).collect()
        }
        want = norm(edges)
        if rejected:
            want -= norm(rejected)
        if confirmed:
            want |= norm(confirmed)
        assert got == want

    check()
