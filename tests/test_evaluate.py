"""Linkage evaluation + survivorship operators: hand-computed ground
truth for pairwise / B³ metrics and golden-record election."""
import pytest

from postal_address_spark.operators.evaluate import (
    b_cubed,
    b_cubed_stats,
    merge_distance,
    pairwise_metrics,
)
from postal_address_spark.operators.survivorship import golden_records


def _assignments(spark):
    # truth: {a,b,c} -> X, {d,e} -> Y
    # pred : {a,b} -> c1, {c,d} -> c2, {e} -> c3
    rows = [
        ("a", "c1", "X"),
        ("b", "c1", "X"),
        ("c", "c2", "X"),
        ("d", "c2", "Y"),
        ("e", "c3", "Y"),
    ]
    return spark.createDataFrame(rows, "rec_id string, cluster_id string, truth_id string")


def test_pairwise_hand_case(spark):
    row = pairwise_metrics(_assignments(spark)).collect()[0]
    assert row.n_records == 5
    assert row.n_pred_clusters == 3
    assert row.n_truth_entities == 2
    # truth pairs: C(3,2)+C(2,2)=4; pred pairs: 1+1+0=2; tp: only (a,b).
    assert row.truth_pairs == 4
    assert row.pred_pairs == 2
    assert row.tp_pairs == 1
    assert row.precision == 0.5
    assert row.recall == 0.25
    assert row.f1 == 2 * 1 / (2 + 4)
    assert row.n_null_labels == 0


def test_pairwise_perfect_and_degenerate(spark):
    perfect = spark.createDataFrame(
        [("a", "p", "t"), ("b", "p", "t"), ("c", "q", "u")],
        "rec_id string, cluster_id string, truth_id string",
    )
    row = pairwise_metrics(perfect).collect()[0]
    assert (row.precision, row.recall, row.f1) == (1.0, 1.0, 1.0)

    # all singletons on both sides: zero pairs anywhere -> NULL ratios,
    # never a divide-by-zero difference between engines.
    singles = spark.createDataFrame(
        [("a", "p1", "t1"), ("b", "p2", "t2")],
        "rec_id string, cluster_id string, truth_id string",
    )
    row = pairwise_metrics(singles).collect()[0]
    assert row.tp_pairs == 0 and row.pred_pairs == 0 and row.truth_pairs == 0
    assert row.precision is None and row.recall is None and row.f1 is None


def test_pairwise_null_labels_counted_not_conflated(spark):
    df = spark.createDataFrame(
        [("a", "p", "t"), ("b", "p", "t"), ("c", None, "t"), ("d", "p", None)],
        "rec_id string, cluster_id string, truth_id string",
    )
    row = pairwise_metrics(df).collect()[0]
    assert row.n_null_labels == 2
    assert row.n_records == 2  # nulls excluded from the metric base
    assert row.tp_pairs == 1 and row.precision == 1.0 and row.recall == 1.0


def test_b_cubed_hand_case(spark):
    row = b_cubed(_assignments(spark)).collect()[0]
    assert row.n_records == 5
    assert row.b3_precision == pytest.approx(0.8, abs=1e-12)
    assert row.b3_recall == pytest.approx(8 / 15, abs=1e-12)
    f1 = 2 * 0.8 * (8 / 15) / (0.8 + 8 / 15)
    assert row.b3_f1 == pytest.approx(f1, abs=1e-12)


def test_b_cubed_stats_hand_case_and_consistency(spark):
    rows = {r.rec_id: r for r in b_cubed_stats(_assignments(spark)).collect()}
    assert len(rows) == 5
    # record c: pred c2 (size 2), truth X (size 3), cell (c2, X) = {c}
    assert (rows["c"].pred_size, rows["c"].truth_size, rows["c"].inter_size) == (2, 3, 1)
    assert (rows["a"].pred_size, rows["a"].truth_size, rows["a"].inter_size) == (2, 3, 2)
    assert (rows["e"].pred_size, rows["e"].truth_size, rows["e"].inter_size) == (1, 2, 1)
    # the averages of the per-record ratios ARE b_cubed's metrics
    prec = sum(r.inter_size / r.pred_size for r in rows.values()) / len(rows)
    rec = sum(r.inter_size / r.truth_size for r in rows.values()) / len(rows)
    b3 = b_cubed(_assignments(spark)).collect()[0]
    assert prec == pytest.approx(b3.b3_precision, abs=1e-12)
    assert rec == pytest.approx(b3.b3_recall, abs=1e-12)


def test_merge_distance_hand_case(spark):
    # pred {a,b},{c,d},{e} vs truth {a,b,c},{d,e}: split c2 into {c},{d}
    # (1 split), merge {a,b}+{c} and {d}+{e} (2 merges) -> GMD 3
    row = merge_distance(_assignments(spark)).collect()[0]
    assert (row.n_records, row.n_cells) == (5, 4)
    assert (row.n_pred_clusters, row.n_truth_entities) == (3, 2)
    assert (row.n_splits, row.n_merges, row.gmd) == (1, 2, 3)
    # identity clustering: GMD 0
    perfect = spark.createDataFrame(
        [("a", "p", "p"), ("b", "p", "p"), ("c", "q", "q")],
        "rec_id string, cluster_id string, truth_id string",
    )
    r2 = merge_distance(perfect).collect()[0]
    assert (r2.n_splits, r2.n_merges, r2.gmd) == (0, 0, 0)


def _records(spark):
    rows = [
        # cluster A: modal line1 = "x" (2 votes), city tie "a"/"b" -> "a",
        # postal all NULL -> NULL
        ("r1", "A", "x", "b", None),
        ("r2", "A", "x", "a", None),
        ("r3", "A", "y", None, None),
        # cluster B: singleton
        ("r4", "B", "z", "c", "75008"),
    ]
    return spark.createDataFrame(
        rows, "rec_id string, cluster_id string, line1 string, city string, postal string"
    )


def test_golden_records_election(spark):
    out = {
        r.cluster_id: r
        for r in golden_records(
            _records(spark), fields=["line1", "city", "postal"]
        ).collect()
    }
    a, b = out["A"], out["B"]
    assert a.n_records == 3 and a.rep_rec_id == "r1"
    assert a.line1 == "x"  # modal wins over tie-break
    assert a.city == "a"  # tie at 1 vote each -> code-point smallest
    assert a.postal is None  # all-null field: no winner, not a NULL vote
    assert b.n_records == 1 and b.rep_rec_id == "r4"
    assert (b.line1, b.city, b.postal) == ("z", "c", "75008")


def test_golden_records_deterministic_across_shuffles(spark):
    df = _records(spark)
    one = golden_records(df.repartition(7), ["line1", "city"]).sort("cluster_id").collect()
    two = golden_records(df.repartition(2), ["line1", "city"]).sort("cluster_id").collect()
    assert one == two


def test_golden_records_requires_fields(spark):
    with pytest.raises(ValueError):
        golden_records(_records(spark), fields=[])


def test_cluster_cohesion_ground_truth(spark):
    from postal_address_spark.operators.evaluate import cluster_cohesion

    df = spark.createDataFrame(
        [
            ("r1", "c1", "1 main st"),
            ("r2", "c1", "1 main st!"),
            ("r3", "c1", "totally different ave 99"),
            ("r4", "c2", "solo row"),                      # singleton: excluded
            ("r5", "c3", None),                            # NULL value pair
            ("r6", "c3", "x"),
        ],
        "rec_id string, cluster_id string, line1 string",
    )
    rows = {r["cluster_id"]: r for r in cluster_cohesion(df).collect()}
    assert set(rows) == {"c1", "c3"}
    # c1: 3 pairs, only (r1, r2) within lev 5
    assert rows["c1"]["n_members"] == 3
    assert rows["c1"]["n_pairs"] == 3 and rows["c1"]["n_cohesive"] == 1
    # NULL value counts 0 cohesive (CASE semantics), pair still counted
    assert rows["c3"]["n_pairs"] == 1 and rows["c3"]["n_cohesive"] == 0

    # quadratic bound: oversized clusters are excluded, not paired
    capped = {
        r["cluster_id"]
        for r in cluster_cohesion(df, max_members=2).collect()
    }
    assert capped == {"c3"}


def test_cluster_diff_hand_case(spark):
    from postal_address_spark.operators.evaluate import cluster_diff

    old = spark.createDataFrame(
        [("a", "o1"), ("b", "o1"),
         ("c", "o2"), ("d", "o2"), ("e", "o2"),
         ("f", "o3"),
         ("g", "o4"), ("h", "o4"),
         ("i", "o5")],
        "rec_id string, cluster_id string",
    )
    new = spark.createDataFrame(
        [("a", "n1"), ("b", "n1"),
         ("c", "n2"), ("d", "n2"), ("e", "n3"),
         ("f", "n4"), ("g", "n4")],
        "rec_id string, cluster_id string",
    )
    rows = {r["old_cluster_id"]: r for r in cluster_diff(old, new).collect()}
    assert set(rows) == {"o1", "o2", "o3", "o4", "o5"}

    assert rows["o1"]["status"] == "unchanged"
    assert rows["o1"]["main_new_cluster"] == "n1"

    s = rows["o2"]  # shattered across n2/n3, nothing foreign joined
    assert s["status"] == "split"
    assert (s.n_fragments, s.largest_fragment, s.main_new_cluster) == (2, 2, "n2")
    assert (s.n_surviving, s.n_removed, s.n_external) == (3, 0, 0)

    m = rows["o3"]  # swallowed into n4 next to o4's g
    assert m["status"] == "merged"
    assert (m.n_fragments, m.n_external) == (1, 1)

    x = rows["o4"]  # lost h AND merged with o3's f
    assert x["status"] == "mixed"
    assert (x.n_members, x.n_surviving, x.n_removed, x.n_external) == (2, 1, 1, 1)

    r = rows["o5"]  # vanished entirely
    assert r["status"] == "removed"
    assert (r.n_fragments, r.largest_fragment) == (0, 0)
    assert r["main_new_cluster"] is None

    # argmax tie-break: equal fragments -> smallest new cluster id wins
    old2 = spark.createDataFrame(
        [("p", "o9"), ("q", "o9")], "rec_id string, cluster_id string"
    )
    new2 = spark.createDataFrame(
        [("p", "zz"), ("q", "aa")], "rec_id string, cluster_id string"
    )
    tie = cluster_diff(old2, new2).collect()[0]
    assert tie["main_new_cluster"] == "aa" and tie["status"] == "split"


def test_cluster_graph_stats_hand_case(spark):
    from postal_address_spark.operators.evaluate import cluster_graph_stats

    # c1 = path a-b-c; c2 = triangle e-f-g; c3 = singleton d
    asg = spark.createDataFrame(
        [("a", "c1"), ("b", "c1"), ("c", "c1"),
         ("e", "c2"), ("f", "c2"), ("g", "c2"),
         ("d", "c3")],
        "rec_id string, cluster_id string",
    )
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"),
         ("e", "f"), ("f", "g"), ("e", "g")],
        "src string, dst string",
    )
    rows = {r["cluster_id"]: r for r in cluster_graph_stats(asg, edges).collect()}
    assert set(rows) == {"c1", "c2", "c3"}

    p = rows["c1"]  # path: 3 nodes, 2 edges, degrees 1/2/1
    assert (p.n_nodes, p.n_edges, p.possible_edges) == (3, 2, 3)
    assert (p.min_degree, p.max_degree) == (1, 2)
    assert p.density == pytest.approx(2 / 3)
    assert p.avg_degree == pytest.approx(4 / 3)

    t = rows["c2"]  # triangle: complete graph, density exactly 1
    assert (t.n_nodes, t.n_edges, t.possible_edges) == (3, 3, 3)
    assert (t.min_degree, t.max_degree) == (2, 2)
    assert t.density == 1.0 and t.avg_degree == 2.0

    s = rows["c3"]  # singleton: density NULL (0/0), degree 0 — rule 5
    assert (s.n_nodes, s.n_edges, s.possible_edges) == (1, 0, 0)
    assert s.density is None
    assert (s.min_degree, s.max_degree, s.avg_degree) == (0, 0, 0.0)

    # ordering/partitioning invariance
    again = cluster_graph_stats(asg.repartition(5), edges.repartition(3))
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, cluster_graph_stats(asg, edges).collect())
    )
