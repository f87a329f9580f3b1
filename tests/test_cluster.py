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


@pytest.mark.parametrize("seed", [11, 12])
def test_blocked_cc_matches_star_cc(spark, seed):
    """Per-block union-find closure == global large/small-star CC when
    edges are block-local (the pipeline's guarantee)."""
    from postal_address_spark.operators.cluster import (
        assign_clusters_blocked,
        connected_components_blocked,
    )

    rng = random.Random(seed)
    rows = []
    for b in range(12):
        n = rng.randrange(2, 30)
        ids = [f"b{b:02d}#n{i:03d}" for i in range(n)]
        for _ in range(rng.randrange(1, 3 * n)):
            u, v = rng.randrange(n), rng.randrange(n)
            if u != v:
                rows.append((ids[u], ids[v], f"block{b:02d}"))
    edges = spark.createDataFrame(rows, ["src", "dst", "block_key"])

    star = {
        r["rec_id"]: r["cluster_id"]
        for r in connected_components(edges.select("src", "dst")).collect()
    }
    blocked = {
        r["rec_id"]: r["cluster_id"]
        for r in connected_components_blocked(edges).collect()
    }
    assert blocked == star

    # assign variant: singleton vertices keep their own id
    verts = edges.select(F.col("src").alias("rec_id")).union(
        edges.select("dst")
    ).union(spark.createDataFrame([("zz#lonely",)], ["rec_id"])).distinct()
    assigned = {
        r["rec_id"]: r["cluster_id"]
        for r in assign_clusters_blocked(verts, edges).collect()
    }
    assert assigned["zz#lonely"] == "zz#lonely"
    for k, v in star.items():
        assert assigned[k] == v


def test_forest_reduce_collapses_clique_and_preserves_labels(spark):
    """The map-side spanning-forest reduction: a dense same-entity clique
    (the hot-entity shape from stress_bench.py) must collapse to ~one
    edge per node per batch WITHOUT changing the final labeling, at any
    partitioning of the edge input."""
    from postal_address_spark.operators.cluster import (
        _forest_reduce,
        connected_components_blocked,
    )

    n = 60
    ids = [f"m{i:04d}" for i in range(n)]
    clique = [
        (ids[i], ids[j], "hotblock") for i in range(n) for j in range(i + 1, n)
    ]
    extra = [("x0001", "x0002", "other"), ("x0002", "x0003", "other")]
    for parts in (1, 7):
        edges = spark.createDataFrame(
            clique + extra, ["src", "dst", "block_key"]
        ).repartition(parts)
        reduced = _forest_reduce(edges)
        # <= one edge per distinct node per partition/batch
        assert reduced.count() <= (n + 3) * parts
        labels = {
            r["rec_id"]: r["cluster_id"]
            for r in connected_components_blocked(edges).collect()
        }
        assert all(labels[i] == ids[0] for i in ids)
        assert labels["x0003"] == "x0001"


def _brute_bridges(edges):
    """Ground truth: edge is a bridge iff removing it disconnects its
    endpoints (BFS)."""
    out = set()
    for cut in edges:
        adj = {}
        for e in edges:
            if e == cut:
                continue
            adj.setdefault(e[0], []).append(e[1])
            adj.setdefault(e[1], []).append(e[0])
        seen, frontier = {cut[0]}, [cut[0]]
        while frontier:
            u = frontier.pop()
            for v in adj.get(u, []):
                if v not in seen:
                    seen.add(v)
                    frontier.append(v)
        if cut[1] not in seen:
            out.add(cut)
    return out


def _run_bridges(spark, edges):
    from postal_address_spark.operators.cluster import bridge_edges

    e = spark.createDataFrame(edges, "src string, dst string")
    asg = assign_clusters(
        e.select(F.col("src").alias("rec_id"))
        .union(e.select("dst"))
        .distinct(),
        e,
    )
    return {
        (r.src, r.dst): r.is_bridge
        for r in bridge_edges(e, asg).collect()
    }


def test_bridges_planted_shapes(spark):
    # path: every edge a bridge; cycle: none; barbell: only the bar
    path = [("a", "b"), ("b", "c"), ("c", "d")]
    assert _run_bridges(spark, path) == {e: True for e in path}

    cycle = [("a", "b"), ("b", "c"), ("a", "c")]
    assert _run_bridges(spark, cycle) == {e: False for e in cycle}

    barbell = [
        ("a", "b"), ("b", "c"), ("a", "c"),      # triangle 1
        ("x", "y"), ("y", "z"), ("x", "z"),      # triangle 2
        ("c", "x"),                               # the bar
    ]
    got = _run_bridges(spark, barbell)
    assert got[("c", "x")] is True
    assert sum(got.values()) == 1


@pytest.mark.parametrize("seed", [7, 23])
def test_bridges_match_brute_force(spark, seed):
    rng = random.Random(seed)
    nodes = [f"n{i:02d}" for i in range(18)]
    edges = set()
    # random components: a few spanning paths plus chords
    for _ in range(22):
        a, b = rng.sample(nodes, 2)
        edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)
    assert _run_bridges(spark, edges) == {
        e: (e in _brute_bridges(edges)) for e in edges
    }


def test_bridges_oversized_cluster_excluded(spark):
    from postal_address_spark.operators.cluster import bridge_edges

    path = [("a", "b"), ("b", "c"), ("c", "d")]
    e = spark.createDataFrame(path, "src string, dst string")
    asg = assign_clusters(
        e.select(F.col("src").alias("rec_id")).union(e.select("dst")).distinct(),
        e,
    )
    assert bridge_edges(e, asg, max_cluster_edges=2).count() == 0


# ---- cluster_at_thresholds (incremental threshold sweep) ----

def _scored_graph(spark, seed, n=60, m=120):
    """Seeded random scored edges over n string vertices."""
    rng = random.Random(seed)
    rows = []
    for _ in range(m):
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            rows.append((f"v{u:03d}", f"v{v:03d}", rng.randint(0, 10)))
    verts = spark.createDataFrame(
        [(f"v{i:03d}",) for i in range(n)], "rec_id string"
    )
    edges = spark.createDataFrame(rows, "src string, dst string, score int")
    return verts, edges


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_threshold_sweep_equals_direct_closures(spark, seed):
    """The contracted incremental sweep must equal an independent direct
    closure at EVERY threshold (labels included — min-id contraction is
    exactly label-preserving)."""
    from postal_address_spark.operators.cluster import cluster_at_thresholds

    verts, edges = _scored_graph(spark, seed)
    ts = [2, 5, 8]
    sweep = {
        (r.rec_id, r.threshold): r.cluster_id
        for r in cluster_at_thresholds(verts, edges, ts).collect()
    }
    for t in ts:
        direct = {
            r.rec_id: r.cluster_id
            for r in assign_clusters(
                verts, edges.where(F.col("score") <= t).select("src", "dst")
            ).collect()
        }
        got = {k[0]: v for k, v in sweep.items() if k[1] == t}
        assert got == direct, t


def test_threshold_sweep_nesting(spark):
    """Stricter-threshold clusters refine looser ones: two records
    together at t must stay together at every t' > t."""
    from postal_address_spark.operators.cluster import cluster_at_thresholds

    verts, edges = _scored_graph(spark, 7)
    ts = [1, 4, 9]
    rows = cluster_at_thresholds(verts, edges, ts).collect()
    by_t = {}
    for r in rows:
        by_t.setdefault(r.threshold, {})[r.rec_id] = r.cluster_id
    for a, b in zip(ts, ts[1:]):
        strict, loose = by_t[a], by_t[b]
        mapped = {}
        for rec, cid in strict.items():
            # all members of a strict cluster map to ONE loose cluster
            mapped.setdefault(cid, set()).add(loose[rec])
        assert all(len(s) == 1 for s in mapped.values())


def test_threshold_sweep_rejects_bad_thresholds(spark):
    from postal_address_spark.operators.cluster import cluster_at_thresholds

    verts, edges = _scored_graph(spark, 1)
    with pytest.raises(ValueError):
        cluster_at_thresholds(verts, edges, [])
    with pytest.raises(ValueError):
        cluster_at_thresholds(verts, edges, [5, 5])
    with pytest.raises(ValueError):
        cluster_at_thresholds(verts, edges, [8, 2])


# ---- membership_history (SCD2-style interval consolidation) ----

def test_membership_history_hand_computed(spark):
    from postal_address_spark.operators.cluster import membership_history

    rows = [
        # r1: A,A,B,B,A -> three islands (A 1-2, B 3-4, A 5-5)
        (1, "r1", "A"), (2, "r1", "A"), (3, "r1", "B"),
        (4, "r1", "B"), (5, "r1", "A"),
        # r2: constant -> one island
        (1, "r2", "C"), (2, "r2", "C"), (3, "r2", "C"),
        # r3: absent at version 2; observed-run semantics bridge the gap
        (1, "r3", "D"), (3, "r3", "D"), (4, "r3", "E"),
    ]
    asg = spark.createDataFrame(
        rows, "version int, rec_id string, cluster_id string"
    )
    got = {
        (r.rec_id, r.cluster_id, r.version_from, r.version_to, r.n_versions)
        for r in membership_history(asg).collect()
    }
    assert got == {
        ("r1", "A", 1, 2, 2), ("r1", "B", 3, 4, 2), ("r1", "A", 5, 5, 1),
        ("r2", "C", 1, 3, 3),
        ("r3", "D", 1, 3, 2), ("r3", "E", 4, 4, 1),
    }


def test_membership_history_over_threshold_sweep(spark):
    """Composed with cluster_at_thresholds: intervals tile each record's
    threshold axis exactly once, labels match the sweep, and interval
    count = 1 + number of label changes."""
    from postal_address_spark.operators.cluster import (
        cluster_at_thresholds,
        membership_history,
    )

    verts, edges = _scored_graph(spark, 5)
    ts = [2, 5, 8]
    sweep = cluster_at_thresholds(verts, edges, ts)
    hist = membership_history(
        sweep, version_col="threshold"
    ).collect()
    sweep_rows = sweep.collect()
    labels = {}
    for r in sweep_rows:
        labels.setdefault(r.rec_id, {})[r.threshold] = r.cluster_id
    by_rec = {}
    for r in hist:
        by_rec.setdefault(r.rec_id, []).append(r)
    assert set(by_rec) == set(labels)
    for rec, ivs in by_rec.items():
        ivs.sort(key=lambda r: r.version_from)
        covered = []
        for iv in ivs:
            for t in ts:
                if iv.version_from <= t <= iv.version_to:
                    covered.append(t)
                    assert labels[rec][t] == iv.cluster_id, (rec, t)
        assert covered == ts, rec
        changes = sum(
            1 for a, b in zip(ts, ts[1:]) if labels[rec][a] != labels[rec][b]
        )
        assert len(ivs) == changes + 1, rec


# ---- with_entity_split (leakage-safe matcher-training split) ----

@pytest.mark.parametrize("method", ["xxhash", "lcg"])
def test_entity_split_no_entity_straddles(spark, method):
    from postal_address_spark.operators.cluster import with_entity_split

    rows = [(f"m{i:08d}", f"m{(i // 3) * 3:08d}") for i in range(300)]
    asg = spark.createDataFrame(rows, "rec_id string, cluster_id string")
    key = (
        F.substring("cluster_id", 2, 8).cast("long")
        if method == "lcg"
        else None
    )
    out = with_entity_split(asg, method=method, key=key)
    straddle = (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .where("k > 1")
        .count()
    )
    assert straddle == 0
    splits = {r.split for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "valid", "test"} and "train" in splits
    # pure function of the cluster: same label -> same split, rerun-stable
    again = {
        (r.rec_id, r.split)
        for r in with_entity_split(asg, method=method, key=key).collect()
    }
    assert again == {(r.rec_id, r.split) for r in out.collect()}


# ---- stable_entity_ids (persistent entity-id carryover) ----

def _stable(spark, old_rows, new_rows):
    from postal_address_spark.operators.cluster import stable_entity_ids

    old = spark.createDataFrame(old_rows, "rec_id string, entity_id string")
    new = spark.createDataFrame(new_rows, "rec_id string, cluster_id string")
    return {
        r.cluster_id: (r.entity_id, r.n_members, r.n_overlap, r.status)
        for r in stable_entity_ids(old, new).collect()
    }


def test_stable_ids_split_merge_new(spark):
    old = (
        [(x, "E1") for x in "abcd"]
        + [(x, "E2") for x in "ef"]
        + [("g", "E3"), ("x", "E4")]
    )
    new = (
        [(x, "C1") for x in "abc"]          # big E1 fragment
        + [("d", "C2"), ("z", "C2")]          # small E1 fragment + new rec
        + [(x, "C3") for x in "efg"]        # E2+E3 merged
        + [("n1", "C4"), ("n2", "C4")]        # all-new cluster
    )
    got = _stable(spark, old, new)
    assert got == {
        # the larger fragment keeps the split entity's id
        "C1": ("E1", 3, 3, "inherited"),
        # the losing fragment mints a fresh id but reports its overlap
        "C2": ("e:C2", 2, 1, "contended"),
        # a merged cluster inherits its max-overlap constituent
        "C3": ("E2", 3, 2, "inherited"),
        "C4": ("e:C4", 2, 0, "new"),
    }
    # removed old entity E4: no output row (output is per NEW cluster)


def test_stable_ids_deterministic_tiebreaks(spark):
    old = [("p", "EA"), ("q", "EA"), ("r", "EB"), ("s", "EB")]
    # D1 overlaps EA and EB equally -> candidate = smaller entity id (EA);
    # D1 and D2 then claim EA with equal overlap -> smaller cluster id wins.
    new = [("p", "D1"), ("r", "D1"), ("q", "D2")]
    got = _stable(spark, old, new)
    assert got == {
        "D1": ("EA", 2, 1, "inherited"),
        "D2": ("e:D2", 1, 1, "contended"),
    }


def test_stable_ids_identity_run_is_all_inherited(spark):
    old = [(f"m{i:04d}", f"E{i // 4}") for i in range(40)]
    new = [(rid, ent.replace("E", "C")) for rid, ent in old]
    got = _stable(spark, old, new)
    assert all(s == "inherited" for _, _, _, s in got.values())
    # each cluster inherits exactly its own old entity, full overlap
    assert all(
        ent == cl.replace("C", "E") and n == ov == 4
        for cl, (ent, n, ov, s) in got.items()
    )
