"""Blocking-rule coverage analysis (operators/blocking_analysis.py).

The driver grades blocking_rule_coverage against a DuckDB replay of the
three production rules (hash match, all-integer); this file pins the
combinators themselves on hand-checkable inputs.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postal_address_spark.operators.blocking_analysis import (  # noqa: E402
    blocking_rule_analysis,
    key_pairs,
    meta_blocking_prune,
    unblocked_records,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "rec_id_a string, rec_id_b string")


def test_key_pairs_basic(spark):
    df = spark.createDataFrame(
        [("a", "k1"), ("b", "k1"), ("c", "k1"), ("d", "k2"), ("e", None)],
        "rid string, key string",
    )
    got = {
        (r["rec_id_a"], r["rec_id_b"])
        for r in key_pairs(df, "key", "rid").collect()
    }
    assert got == {("a", "b"), ("a", "c"), ("b", "c")}


def test_first_rule_assignment_and_cumulative(spark):
    r1 = _pairs(spark, [("a", "b"), ("c", "d")])
    r2 = _pairs(spark, [("a", "b"), ("e", "f"), ("c", "d")])
    r3 = _pairs(spark, [("e", "f"), ("g", "h")])
    out = blocking_rule_analysis([("r1", r1), ("r2", r2), ("r3", r3)]).collect()
    got = {
        r["rule"]: (r["n_pairs"], r["n_new_pairs"], r["n_cumulative"])
        for r in out
    }
    assert got == {
        "r1": (2, 2, 2),   # both pairs novel
        "r2": (3, 1, 3),   # only (e,f) new
        "r3": (2, 1, 4),   # only (g,h) new
    }
    assert [r["rule_idx"] for r in out] == [0, 1, 2]


def test_rule_with_no_new_pairs_reports_zero(spark):
    r1 = _pairs(spark, [("a", "b")])
    r2 = _pairs(spark, [("a", "b")])
    got = {
        r["rule"]: (r["n_pairs"], r["n_new_pairs"], r["n_cumulative"])
        for r in blocking_rule_analysis([("r1", r1), ("r2", r2)]).collect()
    }
    assert got == {"r1": (1, 1, 1), "r2": (1, 0, 1)}


def test_empty_rules_rejected(spark):
    with pytest.raises(ValueError):
        blocking_rule_analysis([])


def test_unblocked_records(spark):
    records = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("z",)], "rid string"
    )
    r1 = _pairs(spark, [("a", "b")])
    r2 = _pairs(spark, [("b", "c")])
    got = {
        r["rec_id"]
        for r in unblocked_records(records, "rid", [("r1", r1), ("r2", r2)]).collect()
    }
    assert got == {"z"}


def test_meta_blocking_prune_hand_case(spark):
    # weights: (1,2)=3, (2,3)=2, (1,3)=1, (4,5)=1; sum=7 over 4 pairs,
    # mean=1.75 -> keep weight*4 >= 7, i.e. (1,2) and (2,3) only
    r1 = _pairs(spark, [("1", "2"), ("1", "3"), ("2", "3")])
    r2 = _pairs(spark, [("1", "2"), ("4", "5")])
    r3 = _pairs(spark, [("1", "2"), ("2", "3")])
    out = {
        (r.rec_id_a, r.rec_id_b): r.weight
        for r in meta_blocking_prune(
            [("a", r1), ("b", r2), ("c", r3)]
        ).collect()
    }
    assert out == {("1", "2"): 3, ("2", "3"): 2}


def test_meta_blocking_single_rule_keeps_everything(spark):
    # one rule: every weight is 1 == the mean, so nothing is pruned
    r1 = _pairs(spark, [("1", "2"), ("3", "4")])
    assert meta_blocking_prune([("only", r1)]).count() == 2


def test_meta_blocking_empty_rules_rejected(spark):
    with pytest.raises(ValueError):
        meta_blocking_prune([])


def test_unlinkable_records_distance_orientation(spark):
    from postal_address_spark.operators.blocking_analysis import (
        unlinkable_records,
    )

    records = spark.createDataFrame(
        [("r1",), ("r2",), ("r3",), ("r4",)], "rec_id string"
    )
    scored = spark.createDataFrame(
        [("r1", "r2", 3), ("r2", "r3", 9)],
        "rec_id_a string, rec_id_b string, lev long",
    )
    rows = {
        r["rec_id"]: r
        for r in unlinkable_records(
            records, scored, score_col="lev", threshold=5,
            higher_is_better=False,
        ).collect()
    }
    assert rows["r1"]["status"] == "linked"
    assert (rows["r1"].n_candidates, rows["r1"].best_score) == (1, 3)
    # best = MIN under distance orientation, candidates count both pairs
    assert rows["r2"]["status"] == "linked"
    assert (rows["r2"].n_candidates, rows["r2"].best_score) == (2, 3)
    assert rows["r3"]["status"] == "unlinkable"
    assert rows["r3"]["best_score"] == 9
    assert rows["r4"]["status"] == "no_candidates"
    assert rows["r4"]["best_score"] is None
    assert rows["r4"]["n_candidates"] == 0


def test_unlinkable_records_similarity_orientation(spark):
    from postal_address_spark.operators.blocking_analysis import (
        unlinkable_records,
    )

    records = spark.createDataFrame(
        [("a",), ("b",), ("c",)], "rec_id string"
    )
    scored = spark.createDataFrame(
        [("a", "b", 0.9), ("b", "c", 0.5)],
        "rec_id_a string, rec_id_b string, score double",
    )
    rows = {
        r["rec_id"]: r["status"]
        for r in unlinkable_records(records, scored, threshold=0.8).collect()
    }
    assert rows == {"a": "linked", "b": "linked", "c": "unlinkable"}


# ---- blocking_key_profile (pre-run key costing) ----

def test_blocking_key_profile_hand_computed(spark):
    from pyspark.sql import functions as F

    from postal_address_spark.operators.blocking_analysis import (
        blocking_key_profile,
    )

    rows = [
        ("r1", "75", "paris"), ("r2", "75", "paris"), ("r3", "75", None),
        ("r4", "13", "lyon"), ("r5", None, "lyon"), ("r6", "13", "paris"),
    ]
    df = spark.createDataFrame(rows, "rec_id string, pc string, city string")
    prof = {
        r.rule: r
        for r in blocking_key_profile(
            df,
            {
                "postal": F.col("pc"),
                "city": F.col("city"),
                "pc_city": F.concat_ws("|", "pc", "city"),
            },
        ).collect()
    }
    assert set(prof) == {"postal", "city", "pc_city"}
    for r in prof.values():
        assert r.n_records == 6
    # postal: 75 x3, 13 x2, one null -> pairs 3+1
    p = prof["postal"]
    assert (p.n_keyed, p.n_distinct_keys, p.n_pairs, p.max_block) == (5, 2, 4, 3)
    # city: paris x3, lyon x2 -> pairs 3+1
    c = prof["city"]
    assert (c.n_keyed, c.n_distinct_keys, c.n_pairs, c.max_block) == (5, 2, 4, 3)
    # concat_ws skips nulls (never abstains): 75|paris x2 is the only pair
    pc = prof["pc_city"]
    assert (pc.n_keyed, pc.n_pairs, pc.max_block) == (6, 1, 2)


def test_blocking_key_profile_matches_actual_join_volume(spark):
    """n_pairs must equal the EXACT row count of the equi self-join the
    key would generate (a < b) — the estimate is not an estimate."""
    import random

    from pyspark.sql import functions as F

    from postal_address_spark.operators.blocking_analysis import (
        blocking_key_profile,
    )

    rng = random.Random(4)
    rows = [(f"r{i:03d}", f"k{rng.randrange(17)}") for i in range(300)]
    df = spark.createDataFrame(rows, "rec_id string, k string")
    n_pairs = blocking_key_profile(df, ["k"]).collect()[0].n_pairs
    actual = (
        df.alias("a")
        .join(df.alias("b"), "k")
        .where(F.col("a.rec_id") < F.col("b.rec_id"))
        .count()
    )
    assert n_pairs == actual


def test_blocking_key_profile_empty_and_bad_args(spark):
    import pytest as _pytest

    from postal_address_spark.operators.blocking_analysis import (
        blocking_key_profile,
    )

    df = spark.createDataFrame([], "rec_id string, k string")
    r = blocking_key_profile(df, ["k"]).collect()[0]
    assert (r.n_records, r.n_keyed, r.n_distinct_keys, r.n_pairs,
            r.max_block) == (0, 0, 0, 0, 0)
    with _pytest.raises(ValueError):
        blocking_key_profile(df, {})


# ---- edge_provenance (match_key attribution) ----

def test_edge_provenance_first_rule_credit_and_none(spark):
    from postal_address_spark.operators.blocking_analysis import (
        blocking_rule_analysis,
        edge_provenance,
    )

    def pairs(rows):
        return spark.createDataFrame(
            rows, "rec_id_a string, rec_id_b string"
        )

    rules = [
        ("r0", pairs([("a", "b"), ("a", "c")])),
        ("r1", pairs([("a", "b"), ("c", "d")])),
        ("r2", pairs([("a", "c"), ("c", "d"), ("e", "f")])),
    ]
    edges = pairs([("a", "b"), ("c", "d"), ("e", "f"), ("x", "y")])
    got = {
        (r.rec_id_a, r.rec_id_b): (r.match_rule_idx, r.match_key)
        for r in edge_provenance(rules, edges).collect()
    }
    assert got == {
        ("a", "b"): (0, "r0"),
        ("c", "d"): (1, "r1"),
        ("e", "f"): (2, "r2"),
        ("x", "y"): (-1, "none"),   # review-injected edge: kept, flagged
    }
    # agreement with the coverage analysis' first-rule convention
    cov = {r.rule: r.n_new_pairs
           for r in blocking_rule_analysis(rules).collect()}
    from collections import Counter

    prov_new = Counter(
        v[1] for k, v in got.items() if v[0] >= 0
    )
    # every distinct pair here is an admitted edge except ('a','c')
    assert cov["r0"] == prov_new["r0"] + 1  # ('a','c') credited to r0
    assert cov["r1"] == prov_new["r1"]
    assert cov["r2"] == prov_new["r2"]


def test_edge_provenance_rejects_empty_rules(spark):
    import pytest as _pytest

    from postal_address_spark.operators.blocking_analysis import (
        edge_provenance,
    )

    edges = spark.createDataFrame([], "rec_id_a string, rec_id_b string")
    with _pytest.raises(ValueError):
        edge_provenance([], edges)


def test_blocking_rule_recall_hand_case(spark):
    from postal_address_spark.operators.blocking_analysis import (
        blocking_rule_recall,
        missed_truth_pairs,
    )

    # rule1 catches (a,b) and (c,d); rule2 catches (a,b) and (e,f);
    # truth = {(a,b) both, (c,d) rule1 only, (g,h) missed} plus a
    # non-match candidate (x,y) that must not count anywhere.
    r1 = _pairs(spark, [("a", "b"), ("c", "d"), ("x", "y")])
    r2 = _pairs(spark, [("a", "b"), ("e", "f")])
    truth = _pairs(spark, [("a", "b"), ("c", "d"), ("g", "h")])
    out = blocking_rule_recall([("r1", r1), ("r2", r2)], truth).collect()
    got = {
        r["rule"]: (
            r["n_true_caught"], r["n_new_true"], r["n_cumulative_true"],
            r["total_truth_pairs"], r["recall_rule"], r["recall_cumulative"],
        )
        for r in out
    }
    assert got == {
        "r1": (2, 2, 2, 3, 2 / 3, 2 / 3),
        "r2": (1, 0, 2, 3, 1 / 3, 2 / 3),
    }
    missed = {
        (r["rec_id_a"], r["rec_id_b"])
        for r in missed_truth_pairs([("r1", r1), ("r2", r2)], truth).collect()
    }
    assert missed == {("g", "h")}


def test_blocking_rule_recall_empty_truth_gives_null_recall(spark):
    from postal_address_spark.operators.blocking_analysis import (
        blocking_rule_recall,
    )

    r1 = _pairs(spark, [("a", "b")])
    truth = _pairs(spark, []).limit(0)
    [row] = blocking_rule_recall([("r1", r1)], truth).collect()
    assert row["n_true_caught"] == 0
    assert row["total_truth_pairs"] == 0
    assert row["recall_rule"] is None
    assert row["recall_cumulative"] is None


def test_blocking_rule_recall_rejects_empty_rules(spark):
    from postal_address_spark.operators.blocking_analysis import (
        blocking_rule_recall,
        missed_truth_pairs,
    )

    truth = _pairs(spark, [("a", "b")])
    with pytest.raises(ValueError):
        blocking_rule_recall([], truth)
    with pytest.raises(ValueError):
        missed_truth_pairs([], truth)


def test_missed_truth_pairs_extra_columns_survive(spark):
    # truth frames in practice carry label metadata (source, labeler);
    # the anti-join must keep those columns on the missed rows.
    from postal_address_spark.operators.blocking_analysis import (
        missed_truth_pairs,
    )

    r1 = _pairs(spark, [("a", "b")])
    truth = spark.createDataFrame(
        [("a", "b", "clerical"), ("g", "h", "clerical")],
        "rec_id_a string, rec_id_b string, label_source string",
    )
    rows = missed_truth_pairs([("r1", r1)], truth).collect()
    assert [(r["rec_id_a"], r["rec_id_b"], r["label_source"]) for r in rows] \
        == [("g", "h", "clerical")]


def test_capture_recapture_chapman_hand_case(spark):
    """n_a=4, n_b=3, both=2 -> Chapman N_hat = 5*4/3 - 1 = 17/3;
    union = 5, est_missed = 17/3 - 5 = 2/3."""
    from postal_address_spark.operators.blocking_analysis import (
        capture_recapture,
    )

    a = _pairs(spark, [("a", "b"), ("c", "d"), ("e", "f"), ("g", "h")])
    b = _pairs(spark, [("a", "b"), ("c", "d"), ("i", "j")])
    [row] = capture_recapture(a, b, "ruleA", "ruleB").collect()
    assert (row["system_a"], row["system_b"]) == ("ruleA", "ruleB")
    assert (row["n_a"], row["n_b"], row["n_both"], row["n_union"]) \
        == (4, 3, 2, 5)
    assert row["est_total_matches"] == (5 * 4 - 3) / 3   # 17/3
    assert row["est_missed"] == (17 - 5 * 3) / 3         # 2/3


def test_capture_recapture_dedupes_and_degenerates(spark):
    from postal_address_spark.operators.blocking_analysis import (
        capture_recapture,
    )

    # duplicate capture rows must not inflate counts
    a = _pairs(spark, [("a", "b"), ("a", "b"), ("c", "d")])
    b = _pairs(spark, [("a", "b"), ("a", "b")])
    [row] = capture_recapture(a, b).collect()
    assert (row["n_a"], row["n_b"], row["n_both"]) == (2, 1, 1)
    # perfect overlap -> estimator says nothing is missed
    [same] = capture_recapture(a, a).collect()
    assert same["est_missed"] == 0.0
    assert same["est_total_matches"] == float(same["n_union"])
    # both systems empty -> all zeros, no div-by-zero
    empty = _pairs(spark, []).limit(0)
    [z] = capture_recapture(empty, empty).collect()
    assert (z["n_a"], z["n_b"], z["n_both"], z["n_union"]) == (0, 0, 0, 0)
    assert z["est_total_matches"] == 0.0 and z["est_missed"] == 0.0


def test_blocking_recall_normalizes_orientation_and_duplicates(spark):
    """Clerical labels arrive in click order and sometimes twice — the
    recall math must be invariant to both (a reversed pair reading as
    0% recall is a footgun, not a semantics choice)."""
    from postal_address_spark.operators.blocking_analysis import (
        blocking_rule_recall,
        missed_truth_pairs,
    )

    r1 = _pairs(spark, [("a", "b"), ("c", "d")])
    messy = _pairs(
        spark, [("b", "a"), ("a", "b"), ("d", "c"), ("h", "g")]
    )
    [row] = blocking_rule_recall([("r1", r1)], messy).collect()
    assert row["total_truth_pairs"] == 3      # dedup to {ab, cd, gh}
    assert row["n_true_caught"] == 2
    assert row["recall_rule"] == 2 / 3
    missed = missed_truth_pairs([("r1", r1)], messy).collect()
    # the reversed duplicate labels each survive, id-ordered
    assert [(r["rec_id_a"], r["rec_id_b"]) for r in missed] == [("g", "h")]


def test_blocking_rule_tradeoff_hand_case(spark):
    """Joins the cost and benefit tallies rule-by-rule; the price
    divisions NULL out when a rule catches no labeled match."""
    from postal_address_spark.operators.blocking_analysis import (
        blocking_rule_tradeoff,
    )

    r1 = _pairs(spark, [("a", "b"), ("c", "d"), ("x", "y")])
    r2 = _pairs(spark, [("a", "b"), ("e", "f"), ("p", "q")])
    truth = _pairs(spark, [("a", "b"), ("c", "d"), ("g", "h")])
    out = {
        r["rule"]: r
        for r in blocking_rule_tradeoff(
            [("r1", r1), ("r2", r2)], truth
        ).collect()
    }
    assert (out["r1"]["n_pairs"], out["r1"]["n_new_pairs"]) == (3, 3)
    assert (out["r1"]["n_true_caught"], out["r1"]["n_new_true"]) == (2, 2)
    assert out["r1"]["pairs_per_true"] == 3 / 2
    assert out["r1"]["new_pairs_per_new_true"] == 3 / 2
    # r2's only true catch was already credited to r1 -> marginal price NULL
    assert (out["r2"]["n_pairs"], out["r2"]["n_new_pairs"]) == (3, 2)
    assert (out["r2"]["n_true_caught"], out["r2"]["n_new_true"]) == (1, 0)
    assert out["r2"]["pairs_per_true"] == 3 / 1
    assert out["r2"]["new_pairs_per_new_true"] is None
    assert all(r["total_truth_pairs"] == 3 for r in out.values())


# ---- blocking_subset_costs (rule-subset cost/recall lattice) ----

def test_subset_costs_hand_case(spark):
    from postal_address_spark.operators.blocking_analysis import (
        blocking_subset_costs,
    )

    # rule A: {ab, cd, ef}; rule B: {ab, gh} — overlap on ab, so the
    # union cost is 4, not 5
    r_a = _pairs(spark, [("a", "b"), ("c", "d"), ("e", "f")])
    r_b = _pairs(spark, [("a", "b"), ("g", "h")])
    # truth: ab (both rules), gh (B only), xy (missed by both)
    truth = _pairs(spark, [("a", "b"), ("g", "h"), ("x", "y")])
    out = {
        r.subset_id: r.asDict()
        for r in blocking_subset_costs([("A", r_a), ("B", r_b)], truth).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["rules"] == "A" and out[2]["rules"] == "B"
    assert out[3]["rules"] == "A+B" and out[3]["n_rules"] == 2
    assert out[1]["n_pairs"] == 3 and out[1]["n_true_caught"] == 1
    assert out[2]["n_pairs"] == 2 and out[2]["n_true_caught"] == 2
    # union deduplicates the shared ab pair
    assert out[3]["n_pairs"] == 4 and out[3]["n_true_caught"] == 2
    assert all(r["total_truth_pairs"] == 3 for r in out.values())
    assert out[2]["recall"] == 2 / 3 and out[2]["pairs_per_true"] == 1.0
    # frontier: B dominates A+B (same recall, fewer pairs) and A
    # (fewer pairs AND more recall); only B survives
    assert out[2]["on_frontier"] is True
    assert out[1]["on_frontier"] is False
    assert out[3]["on_frontier"] is False


def test_subset_costs_truth_orientation_normalized(spark):
    from postal_address_spark.operators.blocking_analysis import (
        blocking_subset_costs,
    )

    r_a = _pairs(spark, [("a", "b")])
    # reversed + duplicated clerical label still counts once, as caught
    truth = _pairs(spark, [("b", "a"), ("a", "b")])
    row = blocking_subset_costs([("A", r_a)], truth).collect()[0]
    assert row.n_true_caught == 1 and row.total_truth_pairs == 1
    assert row.on_frontier is True


def test_subset_costs_guards(spark):
    from postal_address_spark.operators.blocking_analysis import (
        blocking_subset_costs,
    )

    truth = _pairs(spark, [("a", "b")])
    with pytest.raises(ValueError):
        blocking_subset_costs([], truth)
    rules = [(f"r{i}", _pairs(spark, [("a", "b")])) for i in range(7)]
    with pytest.raises(ValueError):
        blocking_subset_costs(rules, truth)  # 127 subsets > default cap
