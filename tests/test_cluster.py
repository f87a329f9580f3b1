"""Connected-components correctness: large/small-star DataFrame loop vs a
driver-side union-find oracle on seeded random graphs (SURVEY §7.5)."""
import random

import pytest
from pyspark.sql import functions as F

from postal_address_spark.operators.cluster import assign_clusters, connected_components


def union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical: every node -> min node of its component
    comp = {}
    for x in range(n_nodes):
        comp.setdefault(find(x), []).append(x)
    label = {}
    for members in comp.values():
        m = min(members)
        for x in members:
            label[x] = m
    return label


@pytest.mark.parametrize("seed,n,m", [(1, 30, 15), (2, 60, 80), (3, 100, 40), (4, 12, 66)])
def test_cc_matches_union_find(spark, seed, n, m):
    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    edges = [(u, v) for u, v in edges if u != v]
    ids = [f"n{idx:04d}" for idx in range(n)]
    edges_df = spark.createDataFrame(
        [(ids[u], ids[v]) for u, v in edges], ["src", "dst"]
    )
    got = {
        r["rec_id"]: r["cluster_id"]
        for r in connected_components(edges_df).collect()
    }
    want_int = union_find(n, edges)
    touched = {u for e in edges for u in e}
    want = {ids[x]: ids[want_int[x]] for x in touched}
    assert got == want


def test_chain_graph_converges(spark):
    # Worst case for naive label propagation: a long path.
    n = 64
    ids = [f"n{idx:04d}" for idx in range(n)]
    edges_df = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(n - 1)], ["src", "dst"]
    )
    got = connected_components(edges_df).collect()
    assert {r["cluster_id"] for r in got} == {ids[0]}
    assert len(got) == n


def test_assign_clusters_singletons(spark):
    vertices = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], ["rec_id"])
    edges = spark.createDataFrame([("c", "b")], ["src", "dst"])
    got = dict(
        (r["rec_id"], r["cluster_id"])
        for r in assign_clusters(vertices, edges).collect()
    )
    assert got == {"a": "a", "b": "b", "c": "b", "d": "d"}


def test_empty_edges(spark):
    vertices = spark.createDataFrame([("a",), ("b",)], ["rec_id"])
    edges = spark.createDataFrame([], "src string, dst string")
    got = dict(
        (r["rec_id"], r["cluster_id"])
        for r in assign_clusters(vertices, edges).collect()
    )
    assert got == {"a": "a", "b": "b"}
