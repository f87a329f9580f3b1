"""Fellegi-Sunter EM (operators/fs_em.py) ground truth.

The driver grades fs_pattern_counts against the mirrored DuckDB oracle
(hash match); the EM fit itself is iterative (rows-only at the gate), so
THIS file is its correctness pin: planted-parameter recovery from exact
expected counts, bit-determinism, and label separation on synthetic pairs
with known match/non-match structure.
"""
import itertools
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postal_address_spark.operators import fs_em  # noqa: E402

TRUE_LAM = 0.2
TRUE_M = {
    "line1_jw": [0.02, 0.08, 0.90],
    "line1_tsl": [0.05, 0.15, 0.80],
    "city_jw": [0.10, 0.90],
}
TRUE_U = {
    "line1_jw": [0.85, 0.10, 0.05],
    "line1_tsl": [0.80, 0.15, 0.05],
    "city_jw": [0.70, 0.30],
}


def _planted_counts(n=1_000_000):
    """EXACT expected pattern counts under (TRUE_LAM, TRUE_M, TRUE_U) —
    no sampling, so recovery tolerance tests the estimator, not luck."""
    names = [n_ for n_, _, _ in fs_em.COMPARISONS]
    levels = [len(t) + 1 for _, _, t in fs_em.COMPARISONS]
    pats, cnts = [], []
    for g in itertools.product(*[range(k) for k in levels]):
        pm, pu = TRUE_LAM, 1.0 - TRUE_LAM
        for c, name in enumerate(names):
            pm *= TRUE_M[name][g[c]]
            pu *= TRUE_U[name][g[c]]
        pats.append(list(g))
        cnts.append(round(n * (pm + pu)))
    return pats, cnts


def test_em_recovers_planted_parameters():
    pats, cnts = _planted_counts()
    params = fs_em.em_fit(pats, cnts)
    assert abs(params.lam - TRUE_LAM) < 0.02
    for name in TRUE_M:
        for level, (tm, tu) in enumerate(zip(TRUE_M[name], TRUE_U[name])):
            assert abs(params.m[name][level] - tm) < 0.05, (name, level)
            assert abs(params.u[name][level] - tu) < 0.05, (name, level)


def test_em_fit_is_deterministic():
    pats, cnts = _planted_counts()
    a, b = fs_em.em_fit(pats, cnts), fs_em.em_fit(pats, cnts)
    assert a == b  # dataclass equality: bit-identical floats


def test_em_rejects_empty_and_misshaped_input():
    with pytest.raises(ValueError):
        fs_em.em_fit([[0, 0, 0]], [0])
    with pytest.raises(ValueError):
        fs_em.em_fit([[0, 0]], [5])  # wrong gamma arity


def test_fs_weights_separate_labeled_pairs(spark):
    """End-to-end on labeled synthetic comparison data: pairs drawn from
    the planted match/non-match level distributions must be separated by
    the LEARNED match probability at 0.5 with near-perfect accuracy."""
    rng = np.random.default_rng(1234)
    names = [n for n, _, _ in fs_em.COMPARISONS]
    ths = {n: th for n, _, th in fs_em.COMPARISONS}
    srcs = {n: s for n, s, _ in fs_em.COMPARISONS}

    def draw(dist, n_rows, is_match):
        rows = []
        for i in range(n_rows):
            row = {
                "rec_id_a": f"{'m' if is_match else 'n'}{i:05d}a",
                "rec_id_b": f"{'m' if is_match else 'n'}{i:05d}b",
                "s_postal": 1.0,
                "s_housenum": 1.0,
                "score": 0.0,
            }
            for name in names:
                level = int(rng.choice(len(dist[name]), p=dist[name]))
                th = ths[name]
                # a similarity value strictly inside the level's band
                if level == len(th):
                    v = th[0] + 0.01
                elif level == 0:
                    v = (th[-1] if th else 1.0) - 0.05
                else:
                    v = (th[len(th) - level] + th[len(th) - level - 1]) / 2
                row[srcs[name]] = float(v)
            rows.append(row)
        return rows

    matches = draw(TRUE_M, 300, True)
    nons = draw(TRUE_U, 1200, False)
    explained = spark.createDataFrame(
        matches + nons,
        "rec_id_a string, rec_id_b string, s_postal double, s_housenum double,"
        " score double, jw_line1 double, tsl_line1 double, jw_city double",
    )
    counts = fs_em.pattern_counts(fs_em.comparison_vectors(explained))
    params = fs_em.em_fit_df(counts)
    scored = fs_em.fs_score_pairs(explained, params)
    rows = scored.select("rec_id_a", "match_probability").collect()
    correct = sum(
        1
        for r in rows
        if (r["rec_id_a"].startswith("m")) == (r["match_probability"] > 0.5)
    )
    assert correct / len(rows) >= 0.95
    # learned prior should be near the planted 300/1500 match share
    assert abs(params.lam - 0.2) < 0.05


def test_pattern_counts_partial_aggregation(spark):
    """The sufficient-statistic reduction must partial-aggregate map-side
    (two HashAggregates around one Exchange) and stay pure codegen — no
    Python evaluation node anywhere in the count plan."""
    vec = spark.range(1000).selectExpr(
        "cast(id % 3 as int) as gamma_line1_jw",
        "cast(id % 2 as int) as gamma_line1_tsl",
        "cast(id % 2 as int) as gamma_city_jw",
    )
    plan = (
        fs_em.pattern_counts(vec)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("HashAggregate") >= 2, plan
    assert "Python" not in plan and "Arrow" not in plan


def test_pair_sample_deterministic_subset(spark):
    pairs = spark.createDataFrame(
        [(f"a{i}", f"b{i}") for i in range(400)],
        "rec_id_a string, rec_id_b string",
    )
    s1 = {tuple(r) for r in fs_em.pair_sample(pairs, 4).collect()}
    s2 = {tuple(r) for r in fs_em.pair_sample(pairs, 4).collect()}
    assert s1 == s2  # pure function of the data
    assert s1 < {tuple(r) for r in pairs.collect()}
    # roughly 1-in-4 (hash uniformity, generous bounds)
    assert 50 <= len(s1) <= 150
    # identity and validation
    assert fs_em.pair_sample(pairs, 1) is pairs
    with pytest.raises(ValueError):
        fs_em.pair_sample(pairs, 0)


def test_tf_adjustment_math(spark):
    """Float half of the TF adjustment (the gate grades the integer
    evidence): agreeing on a rare value adds log2(u_col / tf_v) > 0,
    on a common value < 0; disagreeing pairs are untouched."""
    records = spark.createDataFrame(
        [("r%d" % i, "SPRINGFIELD") for i in range(8)]
        + [("r8", "ZZURITZ"), ("r9", "ZZURITZ"), ("r10", None)],
        "rec_id string, city string",
    )
    tf = fs_em.term_frequency_table(records, "city")
    n_total, sum_sq = fs_em.tf_column_stats(tf)
    assert (n_total, sum_sq) == (10, 68)  # 8 + 2; 64 + 4

    pairs = spark.createDataFrame(
        [
            ("a", "b", "SPRINGFIELD", "SPRINGFIELD"),
            ("c", "d", "ZZURITZ", "ZZURITZ"),
            ("e", "f", "SPRINGFIELD", "ZZURITZ"),
            ("g", "h", None, None),
        ],
        "rec_id_a string, rec_id_b string, city_a string, city_b string",
    )
    ev = fs_em.tf_adjustment_evidence(pairs, tf, "city")
    got_ev = {(r["rec_id_a"]): (r["agreed_value"], r["n_value"]) for r in ev.collect()}
    assert got_ev == {
        "a": ("SPRINGFIELD", 8),
        "c": ("ZZURITZ", 2),
        "e": (None, None),
        "g": (None, None),
    }

    scored = pairs.select("rec_id_a", "rec_id_b").withColumn(
        "match_weight", __import__("pyspark.sql.functions", fromlist=["lit"]).lit(1.0)
    )
    adj = fs_em.with_tf_adjusted_weight(scored, ev)
    got = {r["rec_id_a"]: r["match_weight_tf"] for r in adj.collect()}
    assert got["a"] == pytest.approx(1.0 + np.log2(68 / (10 * 8)))
    assert got["c"] == pytest.approx(1.0 + np.log2(68 / (10 * 2)))
    assert got["a"] < 1.0 < got["c"]  # common penalised, rare boosted
    assert got["e"] == 1.0 and got["g"] == 1.0


def test_gamma_discretisation_levels(spark):
    df = spark.createDataFrame(
        [
            ("a", "b", 1.0, 1.0, 0.95, 0.95, 0.95, 0.0),
            ("c", "d", 1.0, 1.0, 0.90, 0.85, 0.90, 0.0),
            ("e", "f", 1.0, 1.0, 0.50, None, 0.10, 0.0),
        ],
        "rec_id_a string, rec_id_b string, s_postal double, s_housenum double,"
        " jw_line1 double, tsl_line1 double, jw_city double, score double",
    )
    got = {
        r["rec_id_a"]: (
            r["gamma_line1_jw"], r["gamma_line1_tsl"], r["gamma_city_jw"]
        )
        for r in fs_em.comparison_vectors(df).collect()
    }
    assert got == {"a": (2, 2, 1), "c": (1, 1, 0), "e": (0, 0, 0)}


def test_review_queue_structural_band(spark):
    from postal_address_spark.operators.fs_em import review_queue

    rows = [
        # all-top pattern (2+2+1): confident match, not reviewable
        ("a", "b", 2, 2, 1),
        # all-bottom: confident non-match, not reviewable
        ("c", "d", 0, 0, 0),
        # mixed: the possible-match band
        ("e", "f", 2, 0, 1),
        ("g", "h", 0, 0, 1),
    ]
    vecs = spark.createDataFrame(
        rows,
        "rec_id_a string, rec_id_b string, gamma_line1_jw int,"
        " gamma_line1_tsl int, gamma_city_jw int",
    )
    out = {(r.rec_id_a, r.rec_id_b): r.gamma_sum
           for r in review_queue(vecs).collect()}
    assert out == {("e", "f"): 3, ("g", "h"): 1}


def test_review_queue_sampling_deterministic(spark):
    from postal_address_spark.operators.fs_em import review_queue

    rows = [
        (f"m{i:08d}", f"m{i + 1:08d}", 1, 1, 0) for i in range(0, 200, 2)
    ]
    vecs = spark.createDataFrame(
        rows,
        "rec_id_a string, rec_id_b string, gamma_line1_jw int,"
        " gamma_line1_tsl int, gamma_city_jw int",
    )
    s1 = {tuple(r) for r in review_queue(vecs, one_in=4).collect()}
    s2 = {tuple(r) for r in review_queue(vecs, one_in=4).collect()}
    assert s1 == s2  # pure function of the data
    full = {tuple(r) for r in review_queue(vecs).collect()}
    assert s1 < full and len(s1) > 0


def test_pattern_truth_counts_hand_computed(spark):
    """(n_pairs, n_true_pairs) tallies per pattern; truth never changes
    the pattern grouping, only the sum."""
    from pyspark.sql import functions as F

    from postal_address_spark import operators
    from postal_address_spark.operators import fs_em

    names = [n for n, _, _ in fs_em.COMPARISONS]
    rows = [
        # (gammas..., truth)
        ([2, 0, 0], 1),
        ([2, 0, 0], 0),
        ([2, 0, 0], 1),
        ([0, 1, 1], 0),
    ]
    df = spark.createDataFrame(
        [tuple(g) + (t,) for g, t in rows],
        ", ".join(f"gamma_{n} int" for n in names) + ", truth_match int",
    )
    out = {
        tuple(r[f"gamma_{n}"] for n in names): (r.n_pairs, r.n_true_pairs)
        for r in fs_em.pattern_truth_counts(df).collect()
    }
    assert out == {(2, 0, 0): (3, 2), (0, 1, 1): (1, 0)}

    # threshold-selection consumer math: cumulative precision over
    # patterns admitted in descending weight order is derivable from the
    # two integer columns alone
    ranked = sorted(out.values(), key=lambda v: -(v[1] / v[0]))
    cum_pairs = cum_true = 0
    precisions = []
    for n_pairs, n_true in ranked:
        cum_pairs += n_pairs
        cum_true += n_true
        precisions.append(cum_true / cum_pairs)
    assert precisions == [2 / 3, 2 / 4]


# ---- labeling_sample (stratified k-per-pattern clerical sample) ----

def _labeling_vectors(spark):
    """Uneven strata: one dominant pattern, two mid, one tiny (< k)."""
    patterns = [((2, 2, 1), 50), ((0, 0, 0), 300), ((1, 1, 0), 40),
                ((2, 0, 1), 3)]
    rows, i = [], 0
    for p, w in patterns:
        for _ in range(w):
            rows.append((f"m{i:08d}", f"m{i + 1:08d}") + p)
            i += 2
    return spark.createDataFrame(
        rows,
        "rec_id_a string, rec_id_b string, gamma_line1_jw int,"
        " gamma_line1_tsl int, gamma_city_jw int",
    )


def _brute_sample(rows, k, hash_fn):
    """Python oracle: per pattern, top-k by (hash, a, b) with rank."""
    from collections import defaultdict

    by_pat = defaultdict(list)
    for a, b, *g in rows:
        by_pat[tuple(g)].append((hash_fn(a, b), a, b))
    out = set()
    for g, items in by_pat.items():
        for rank, (_, a, b) in enumerate(sorted(items)[:k], start=1):
            out.add((a, b) + g + (len(items), rank))
    return out


def test_labeling_sample_md5_matches_python_oracle(spark):
    import hashlib

    vecs = _labeling_vectors(spark)
    got = {tuple(r) for r in fs_em.labeling_sample(
        vecs, 5, seed=7, rank_method="md5").collect()}

    def h(a, b):
        return int(hashlib.md5(f"7|{a}|{b}".encode()).hexdigest()[:8], 16)

    rows = [tuple(r) for r in vecs.collect()]
    assert got == _brute_sample(rows, 5, h)


def test_labeling_sample_xxhash_matches_python_oracle(spark):
    """Production path: rank hashes read back from Spark, ranking replayed
    in python — pins the (hash, a, b) total order and the two-phase
    equivalence without needing an xxhash implementation here."""
    from pyspark.sql import functions as F

    vecs = _labeling_vectors(spark)
    got = {tuple(r) for r in fs_em.labeling_sample(
        vecs, 4, seed=11, rank_method="xxhash").collect()}
    hmap = {
        (r.rec_id_a, r.rec_id_b): r.h
        for r in vecs.select(
            "rec_id_a", "rec_id_b",
            F.xxhash64("rec_id_a", "rec_id_b", F.lit(11)).alias("h"),
        ).collect()
    }
    rows = [tuple(r) for r in vecs.collect()]
    assert got == _brute_sample(rows, 4, lambda a, b: hmap[(a, b)])


def test_labeling_sample_salted_equals_naive(spark):
    """n_salt=1 IS the naive single-window formulation; the default
    salted two-phase must return identical rows (top-k decomposability)."""
    vecs = _labeling_vectors(spark)
    for method in ("md5", "xxhash"):
        naive = {tuple(r) for r in fs_em.labeling_sample(
            vecs, 5, seed=7, rank_method=method, n_salt=1).collect()}
        salted = {tuple(r) for r in fs_em.labeling_sample(
            vecs, 5, seed=7, rank_method=method, n_salt=64).collect()}
        assert naive == salted, method


def test_labeling_sample_small_stratum_and_counts(spark):
    """A stratum smaller than k is kept whole with contiguous ranks, and
    n_pattern_pairs is the PRE-sample stratum size."""
    vecs = _labeling_vectors(spark)
    out = fs_em.labeling_sample(vecs, 5, seed=7, rank_method="md5").collect()
    by_pat = {}
    for r in out:
        g = (r.gamma_line1_jw, r.gamma_line1_tsl, r.gamma_city_jw)
        by_pat.setdefault(g, []).append(r)
    sizes = {(2, 2, 1): 50, (0, 0, 0): 300, (1, 1, 0): 40, (2, 0, 1): 3}
    assert set(by_pat) == set(sizes)
    for g, rs in by_pat.items():
        assert len(rs) == min(5, sizes[g])
        assert sorted(r.sample_rank for r in rs) == list(
            range(1, len(rs) + 1))
        assert {r.n_pattern_pairs for r in rs} == {sizes[g]}


def test_labeling_sample_seed_changes_sample(spark):
    vecs = _labeling_vectors(spark)
    s7 = {(r.rec_id_a, r.rec_id_b) for r in fs_em.labeling_sample(
        vecs, 5, seed=7, rank_method="md5").collect()}
    s8 = {(r.rec_id_a, r.rec_id_b) for r in fs_em.labeling_sample(
        vecs, 5, seed=8, rank_method="md5").collect()}
    assert s7 != s8  # 300-row stratum: identical top-5 is ~impossible


def test_labeling_sample_rejects_bad_args(spark):
    vecs = _labeling_vectors(spark)
    with pytest.raises(ValueError):
        fs_em.labeling_sample(vecs, 0)
    with pytest.raises(ValueError):
        fs_em.labeling_sample(vecs, 5, rank_method="sha2")


def test_labeling_sample_plan_shape(spark):
    """Exactly two Window nodes (salted local + final re-rank) and the
    stratum-count join stays a broadcast — no pattern-keyed sort-merge."""
    vecs = _labeling_vectors(spark)
    df = fs_em.labeling_sample(vecs, 5, seed=7)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("RunningWindowFunction") + plan.count(
        "Window") >= 2
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "SortMergeJoin" not in plan, plan[:3000]


# ---- mu_from_labels / labeled_params (supervised m/u from labels) ----

def _labeled_vectors(spark):
    """Hand-sized labeled pairs with known per-level tallies."""
    rows = [
        # (a, b, g_jw, g_tsl, g_city, is_match)
        ("a1", "b1", 2, 2, 1, True),
        ("a2", "b2", 2, 1, 1, True),
        ("a3", "b3", 1, 2, 1, True),
        ("a4", "b4", 0, 0, 0, False),
        ("a5", "b5", 0, 1, 0, False),
        ("a6", "b6", 1, 0, 0, False),
        ("a7", "b7", 2, 0, 1, False),
    ]
    return spark.createDataFrame(
        rows,
        "rec_id_a string, rec_id_b string, gamma_line1_jw int,"
        " gamma_line1_tsl int, gamma_city_jw int, is_match boolean",
    )


def test_mu_from_labels_hand_computed(spark):
    out = {
        (r.comparison, r.gamma): (r.n_match, r.n_nonmatch)
        for r in fs_em.mu_from_labels(_labeled_vectors(spark)).collect()
    }
    assert out == {
        ("line1_jw", 2): (2, 1),
        ("line1_jw", 1): (1, 1),
        ("line1_jw", 0): (0, 2),
        ("line1_tsl", 2): (2, 0),
        ("line1_tsl", 1): (1, 1),
        ("line1_tsl", 0): (0, 3),
        ("city_jw", 1): (3, 1),
        ("city_jw", 0): (0, 3),
    }


def test_mu_from_labels_single_shuffle_plan(spark):
    """One stack generator + one aggregate: no joins, no windows."""
    df = fs_em.mu_from_labels(_labeled_vectors(spark))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]
    assert plan.count("Exchange") == 1, plan[:2000]


def test_labeled_params_ht_reweighting():
    """Stratified sample: 2 labels from a 100-pair stratum (weight 50)
    and 2 from a fully-enumerated 2-pair stratum (weight 1) — parameters
    must match the hand-computed Horvitz-Thompson estimates."""
    gcols = ("gamma_line1_jw", "gamma_line1_tsl", "gamma_city_jw")

    def row(a, g, n_pat, lbl):
        d = {"rec_id_a": a, "rec_id_b": a + "x", "n_pattern_pairs": n_pat,
             "is_match": lbl}
        d.update(dict(zip(gcols, g)))
        return d

    rows = [
        row("p1", (2, 2, 1), 100, True),
        row("p2", (2, 2, 1), 100, True),
        row("q1", (0, 0, 0), 2, False),
        row("q2", (0, 0, 0), 2, True),
    ]
    p = fs_em.labeled_params(rows)
    # weights: 50, 50, 1, 1 -> match mass 101 of 102
    assert p.lam == pytest.approx(101 / 102)
    # m(line1_jw): level2 = 100/101, level0 = 1/101
    assert p.m["line1_jw"][2] == pytest.approx(100 / 101)
    assert p.m["line1_jw"][0] == pytest.approx(1 / 101)
    # u: the only non-match sits at all-zero with weight 1
    assert p.u["line1_jw"][0] == pytest.approx(1.0)
    assert p.u["city_jw"][0] == pytest.approx(1.0)


def test_labeled_params_recovers_planted_on_full_census():
    """Labeling EVERY pair of the planted population (label = latent
    class) must recover the planted m/u/lam exactly — the supervised
    estimator has no EM identifiability slack.  Each pattern contributes
    one match row (expected mass n*pm) and one non-match row (n*pu);
    with both rows present n_sampled(stratum) = 2, so n_pattern_pairs
    is set to 2x the mass to make the HT weight the mass itself."""
    n = 1_000_000
    names = [nm for nm, _, _ in fs_em.COMPARISONS]
    levels = [len(t) + 1 for _, _, t in fs_em.COMPARISONS]
    gcols = [f"gamma_{nm}" for nm in names]
    rows = []
    for g in itertools.product(*[range(k) for k in levels]):
        pm, pu = TRUE_LAM, 1.0 - TRUE_LAM
        for c, name in enumerate(names):
            pm *= TRUE_M[name][g[c]]
            pu *= TRUE_U[name][g[c]]
        for lbl, mass in ((True, n * pm), (False, n * pu)):
            d = {"n_pattern_pairs": 2 * mass, "is_match": lbl}
            d.update(dict(zip(gcols, g)))
            rows.append(d)
    p = fs_em.labeled_params(rows)
    assert p.lam == pytest.approx(TRUE_LAM, abs=1e-9)
    for nm in names:
        for lvl, (tm, tu) in enumerate(zip(TRUE_M[nm], TRUE_U[nm])):
            assert p.m[nm][lvl] == pytest.approx(tm, abs=1e-9), (nm, lvl)
            assert p.u[nm][lvl] == pytest.approx(tu, abs=1e-9), (nm, lvl)


def test_mu_audit_shape_and_delta():
    pats, cnts = _planted_counts()
    em = fs_em.em_fit(pats, cnts)
    rows = fs_em.mu_audit(em, em)
    n_levels = sum(len(t) + 1 for _, _, t in fs_em.COMPARISONS)
    assert len(rows) == n_levels
    assert all(r[-1] == pytest.approx(0.0) for r in rows)


def test_labeled_params_empty_raises():
    with pytest.raises(ValueError):
        fs_em.labeled_params([])


# ---------------------------------------------------------------------------
# threshold_curve / select_threshold (pure driver-side functions)
# ---------------------------------------------------------------------------

def _toy_params():
    # weights separate cleanly: higher gamma everywhere -> bigger log2 BF
    from postal_address_spark.operators.fs_em import FSParams

    return FSParams(
        lam=0.2,
        m={"line1_jw": [0.05, 0.15, 0.8], "line1_tsl": [0.1, 0.2, 0.7],
           "city_jw": [0.2, 0.8]},
        u={"line1_jw": [0.8, 0.15, 0.05], "line1_tsl": [0.7, 0.2, 0.1],
           "city_jw": [0.8, 0.2]},
    )


def _row(g1, g2, g3, n_pairs, n_true):
    return {
        "gamma_line1_jw": g1, "gamma_line1_tsl": g2, "gamma_city_jw": g3,
        "n_pairs": n_pairs, "n_true_pairs": n_true,
    }


def test_threshold_curve_monotone_and_exact():
    from postal_address_spark.operators.fs_em import threshold_curve

    rows = [
        _row(2, 2, 1, 100, 98),   # strong pattern: nearly all true
        _row(1, 1, 1, 50, 25),    # middling
        _row(0, 0, 0, 1000, 2),   # junk
    ]
    curve = threshold_curve(rows, _toy_params())
    assert [c["pattern"] for c in curve] == [
        (2, 2, 1), (1, 1, 1), (0, 0, 0)
    ]  # admitted best-first by weight
    assert [c["cum_pairs"] for c in curve] == [100, 150, 1150]
    assert [c["cum_true"] for c in curve] == [98, 123, 125]
    # recall rises monotonically; precision falls as junk is admitted
    assert curve[0]["precision"] == 98 / 100
    assert curve[-1]["recall"] == 1.0
    assert curve[0]["recall"] == 98 / 125
    assert curve[-1]["precision"] < curve[0]["precision"]
    # weights strictly decrease along the admission order
    ws = [c["weight"] for c in curve]
    assert ws == sorted(ws, reverse=True)


def test_select_threshold_picks_f1_max():
    from postal_address_spark.operators.fs_em import select_threshold

    rows = [
        _row(2, 2, 1, 100, 98),
        _row(1, 1, 1, 50, 25),
        _row(0, 0, 0, 1000, 2),
    ]
    best = select_threshold(rows, _toy_params())
    # F1 at cut 1: p=.98, r=.784 -> .871; cut 2: p=.82, r=.984 -> .894;
    # cut 3: p=.109 -> tiny.  The middle cut wins.
    assert best["pattern"] == (1, 1, 1)
    assert best["cum_pairs"] == 150
    # beta >> 1 weights recall: admitting junk buys the last 2 matches
    best_rec = select_threshold(rows, _toy_params(), beta=100.0)
    assert best_rec["recall"] == 1.0


def test_select_threshold_edge_cases():
    import pytest as _pytest

    from postal_address_spark.operators.fs_em import (
        select_threshold,
        threshold_curve,
    )

    # no labeled matches anywhere: recall is defined as 0, F stays 0,
    # ties resolve to the most conservative (highest-weight) cut
    rows = [_row(2, 2, 1, 10, 0), _row(0, 0, 0, 10, 0)]
    best = select_threshold(rows, _toy_params())
    assert best["f_beta"] == 0.0 and best["pattern"] == (2, 2, 1)
    assert all(c["recall"] == 0.0 for c in threshold_curve(rows, _toy_params()))
    with _pytest.raises(ValueError):
        select_threshold([], _toy_params())


def test_params_json_round_trip_bit_exact(tmp_path):
    """save_params/load_params (the Splink save_model_to_json shape):
    every m/u/lambda survives the JSON round trip BIT-FOR-BIT (repr-exact
    float serialization), so a model fitted once scores identically
    forever; a model with a different comparison schema fails loudly."""
    pats, cnts = _planted_counts()
    params = fs_em.em_fit(pats, cnts)
    path = str(tmp_path / "model.json")
    fs_em.save_params(params, path)
    loaded = fs_em.load_params(path)
    assert loaded == params  # dataclass equality: bit-identical floats

    # serialization is deterministic (stable key order, stable text)
    assert fs_em.params_to_json(loaded) == fs_em.params_to_json(params)

    # schema validation: a foreign comparison list is rejected
    import json as _json

    d = _json.loads(fs_em.params_to_json(params))
    d["comparisons"] = ["something_else"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        fs_em.params_from_json(_json.dumps(d))


def test_loaded_params_score_identically(spark):
    """match_weight_expr over reloaded params must emit the identical
    literal when-chain result for every gamma pattern."""
    import itertools as _it

    pats = [
        list(g)
        for g in _it.product(
            *[range(len(t) + 1) for _, _, t in fs_em.COMPARISONS]
        )
    ]
    params = fs_em.em_fit(*_planted_counts())
    loaded = fs_em.params_from_json(fs_em.params_to_json(params))
    names = [n_ for n_, _, _ in fs_em.COMPARISONS]
    df = spark.createDataFrame(
        [tuple(g) for g in pats],
        ", ".join(f"gamma_{n} int" for n in names),
    )
    a = [r[0] for r in df.select(
        fs_em.match_weight_expr(params)).collect()]
    b = [r[0] for r in df.select(
        fs_em.match_weight_expr(loaded)).collect()]
    assert a == b
