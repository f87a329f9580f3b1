"""Cannot-link constrained clustering (operators/constraints.py).

The distributed operator is pinned against an INDEPENDENT brute-force
oracle: a plain-Python greedy constrained union-find that replays every
edge best-first and re-checks ALL constraint pairs on every proposed
merge (O(E*C), no shared code with the operator's per-root member-set
bookkeeping).
"""
from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from postal_address_spark.operators.cluster import assign_clusters
from postal_address_spark.operators.constraints import (
    constrained_clusters,
    constraint_violations,
)


# --------------------------------------------------------------------------
# brute-force oracle
# --------------------------------------------------------------------------

def naive_constrained(nodes, edges, cannot, scores=None):
    """nodes: list of ids; edges: list of (a, b); cannot: list of (a, b);
    scores: optional dict[(a, b)] -> float.  Returns {node: label}."""
    norm_e = {}
    cl = {tuple(sorted(p)) for p in cannot if p[0] != p[1]}
    for a, b in edges:
        if a == b:
            continue
        key = tuple(sorted((a, b)))
        s = (scores or {}).get((a, b), (scores or {}).get((b, a), 0.0))
        norm_e[key] = max(norm_e.get(key, float("-inf")), s)
    comp = {n: {n} for n in nodes}
    label = {n: n for n in nodes}

    def violates(merged):
        return any(x in merged and y in merged for x, y in cl)

    order = sorted(norm_e.items(), key=lambda kv: (-kv[1], kv[0]))
    for (a, b), _ in order:
        if (a, b) in cl:
            continue  # constraint outranks the edge
        ca, cb = comp[a], comp[b]
        if ca is cb:
            continue
        merged = ca | cb
        if violates(merged):
            continue
        for n in merged:
            comp[n] = merged
    seen = set()
    for n in nodes:
        c = frozenset(comp[n])
        if c not in seen:
            seen.add(c)
            m = min(c)
            for x in c:
                label[x] = m
    return label


def _run(spark, nodes, edges, cannot, scores=None, **kw):
    vdf = spark.createDataFrame([(n,) for n in nodes], "rec_id string")
    if scores:
        edf = spark.createDataFrame(
            [(a, b, float(scores.get((a, b), scores.get((b, a), 0.0))))
             for a, b in edges],
            "src string, dst string, score double",
        )
        kw.setdefault("score", "score")
    else:
        edf = spark.createDataFrame(
            [(a, b) for a, b in edges] or [("x", "x")],
            "src string, dst string",
        )
        if not edges:
            edf = edf.where(F.lit(False))
    cdf = spark.createDataFrame(
        [(a, b) for a, b in cannot] or [("x", "x")],
        "src string, dst string",
    )
    if not cannot:
        cdf = cdf.where(F.lit(False))
    out = constrained_clusters(vdf, edf, cdf, **kw)
    return {r["rec_id"]: r["cluster_id"] for r in out.collect()}


def _partition_of(labels):
    """label map -> set of frozensets (partition), for label-free compare"""
    groups = {}
    for n, c in labels.items():
        groups.setdefault(c, set()).add(n)
    return {frozenset(g) for g in groups.values()}


# --------------------------------------------------------------------------
# planted cases
# --------------------------------------------------------------------------

def test_planted_split(spark):
    # chain a-b-c-d with a cannot-link (a, d): greedy keeps the two
    # strongest edges and drops the chain at its weakest link
    nodes = list("abcd")
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    scores = {("a", "b"): 0.9, ("b", "c"): 0.5, ("c", "d"): 0.8}
    got = _run(spark, nodes, edges, [("a", "d")], scores)
    assert _partition_of(got) == {frozenset("ab"), frozenset("cd")}
    # min-id labels
    assert got == {"a": "a", "b": "a", "c": "c", "d": "c"}


def test_constraint_outranks_direct_edge(spark):
    got = _run(spark, ["a", "b"], [("a", "b")], [("a", "b")])
    assert got == {"a": "a", "b": "b"}


def test_clean_clusters_keep_closure_labels(spark):
    # constraint spans two different components: nothing changes
    nodes = list("abcd")
    edges = [("a", "b"), ("c", "d")]
    got = _run(spark, nodes, edges, [("a", "c")])
    assert got == {"a": "a", "b": "a", "c": "c", "d": "c"}


def test_empty_constraints_equals_closure(spark):
    nodes = [f"n{i}" for i in range(20)]
    rnd = random.Random(5)
    edges = [
        (nodes[rnd.randrange(20)], nodes[rnd.randrange(20)])
        for _ in range(30)
    ]
    got = _run(spark, nodes, edges, [])
    vdf = spark.createDataFrame([(n,) for n in nodes], "rec_id string")
    edf = spark.createDataFrame(edges, "src string, dst string")
    base = {
        r["rec_id"]: r["cluster_id"]
        for r in assign_clusters(vdf, edf).collect()
    }
    assert got == base


def test_oversized_cluster_left_unrepaired(spark):
    nodes = list("abc")
    edges = [("a", "b"), ("b", "c")]
    got = _run(spark, nodes, edges, [("a", "c")], max_cluster_edges=1)
    # too big to repair: keeps the (violated) closure label
    assert got == {"a": "a", "b": "a", "c": "a"}


def test_precomputed_assignment_with_edgeless_member(spark):
    # caller passes a closure computed WITH the cannot-linked edge; after
    # the constraint removes it, node b has no remaining edge and must
    # still be re-labeled out of the over-merge
    vdf = spark.createDataFrame([("a",), ("b",)], "rec_id string")
    edf = spark.createDataFrame([("a", "b")], "src string, dst string")
    cdf = spark.createDataFrame([("a", "b")], "src string, dst string")
    pre = assign_clusters(vdf, edf)  # a, b -> 'a'
    out = constrained_clusters(vdf, edf, cdf, assignments=pre)
    got = {r["rec_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {"a": "a", "b": "b"}


# --------------------------------------------------------------------------
# randomized equivalence vs the brute-force oracle
# --------------------------------------------------------------------------

@pytest.mark.parametrize("seed,n,ne,nc", [
    (1, 12, 18, 3),
    (2, 20, 35, 6),
    (3, 30, 50, 10),
    (4, 16, 40, 8),   # dense: many alternative paths
    (5, 40, 45, 12),  # sparse: many components
])
def test_matches_bruteforce(spark, seed, n, ne, nc):
    rnd = random.Random(seed)
    nodes = [f"n{i:03d}" for i in range(n)]
    edges, scores = [], {}
    for _ in range(ne):
        a, b = rnd.sample(nodes, 2)
        edges.append((a, b))
        scores[(a, b)] = round(rnd.uniform(0.5, 1.0), 3)
    cannot = [tuple(rnd.sample(nodes, 2)) for _ in range(nc)]
    got = _run(spark, nodes, edges, cannot, scores)
    want = naive_constrained(nodes, edges, cannot, scores)
    assert _partition_of(got) == _partition_of(want)
    assert got == want  # min-id labels agree too
    # hard guarantee: no output cluster contains a cannot-link pair
    for a, b in cannot:
        if a != b:
            assert got[a] != got[b]


def test_partitioning_independence(spark):
    rnd = random.Random(9)
    nodes = [f"n{i:03d}" for i in range(25)]
    edges, scores = [], {}
    for _ in range(40):
        a, b = rnd.sample(nodes, 2)
        edges.append((a, b))
        scores[(a, b)] = round(rnd.uniform(0.5, 1.0), 3)
    cannot = [tuple(rnd.sample(nodes, 2)) for _ in range(8)]
    vdf = spark.createDataFrame([(x,) for x in nodes], "rec_id string")
    edf = spark.createDataFrame(
        [(a, b, scores[(a, b)]) for a, b in edges],
        "src string, dst string, score double",
    )
    cdf = spark.createDataFrame(cannot, "src string, dst string")
    one = constrained_clusters(
        vdf.repartition(1), edf.repartition(1), cdf, score="score"
    )
    many = constrained_clusters(
        vdf.repartition(7), edf.repartition(11), cdf, score="score"
    )
    assert sorted(map(tuple, one.collect())) == sorted(
        map(tuple, many.collect())
    )


def test_constraint_violations_report(spark):
    vdf = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",)], "rec_id string"
    )
    edf = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    asg = assign_clusters(vdf, edf)
    cdf = spark.createDataFrame(
        # (a,c) violated; (a,d) spans clusters; (b,a) tests orientation
        [("a", "c"), ("a", "d"), ("b", "a")],
        "x string, y string",
    )
    rows = sorted(map(tuple, constraint_violations(asg, cdf).collect()))
    assert rows == [("a", "b", "a"), ("a", "c", "a")]
