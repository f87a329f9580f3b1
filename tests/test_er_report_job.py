"""jobs/er_report.py — the model-quality report deploy surface: runs
end-to-end on a parquet transcript table and writes the report
artifacts (coverage, unblocked, FS patterns/params, city TF, column
profile, review queue) with an internally consistent summary."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_er_report_job_end_to_end(spark, tmp_path):
    from postal_address_spark.synth import synth_transcripts_spark

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    import er_report

    inp = str(tmp_path / "transcripts")
    root = str(tmp_path / "report")
    synth_transcripts_spark(spark, seed=11, n_convs=80, n_entities=30).write.parquet(inp)

    model_path = str(tmp_path / "model.json")
    spec_path = str(tmp_path / "checks.json")
    with open(spec_path, "w") as fh:
        import json as _json

        _json.dump(
            [{"name": "conv_set", "column": "conv_id", "kind": "not_null"}],
            fh,
        )
    summary = er_report.main(
        ["--input", inp, "--output-root", root, "--model-json", model_path,
         "--expect", spec_path],
        spark=spark,
    )

    assert summary["n_mentions"] > 0
    # --expect: the shared input gate reports through the summary
    assert summary["expectations"]["conv_set"]["passed"] is True
    assert os.path.isdir(os.path.join(root, "expectations"))
    cov = summary["coverage"]
    assert set(cov) == {"exact_postal_hn", "phonetic_city", "snm_window4"}
    # first rule's new == its pair count; cumulative is monotone and ends
    # at the distinct union size
    assert cov["exact_postal_hn"]["n_new_pairs"] == cov["exact_postal_hn"]["n_pairs"]
    cums = [cov[r]["n_cumulative"] for r in
            ("exact_postal_hn", "phonetic_city", "snm_window4")]
    assert cums == sorted(cums)
    assert cums[-1] == sum(cov[r]["n_new_pairs"] for r in cov)

    # FS fit: a valid prior and 8 parameter rows with finite weights
    assert 0.0 < summary["fs_lambda"] < 1.0
    params = spark.read.parquet(f"{root}/fs_params").collect()
    assert len(params) == 8
    assert all(abs(r["log2_bf"]) < 60 for r in params)

    # --model-json: the exported model reloads and agrees with both the
    # summary prior and the written (round-6) params table
    from postal_address_spark.operators import fs_em as _fs

    assert summary["model_json"] == model_path
    model = _fs.load_params(model_path)
    assert model.lam == summary["fs_lambda"]
    for r in params:
        assert abs(model.m[r["comparison"]][r["gamma"]] - r["m"]) < 5e-7
        assert abs(model.u[r["comparison"]][r["gamma"]] - r["u"]) < 5e-7

    # TF profile consistency: totals re-derivable from the written table
    tf = spark.read.parquet(f"{root}/city_tf").collect()
    assert summary["city_tf"]["n_values"] == len(tf)
    assert summary["city_tf"]["n_total"] == sum(r["n_value"] for r in tf)
    assert summary["city_tf"]["agree_mass_num"] == sum(
        r["n_value"] ** 2 for r in tf
    )

    # unblocked population is a subset of all mentions
    assert 0 <= summary["n_unblocked"] < summary["n_mentions"]

    # review queue: ambiguous patterns only (0 < gamma_sum < max), and
    # the summary count matches the written table
    rq = spark.read.parquet(f"{root}/review_queue").collect()
    assert summary["n_review_queue"] == len(rq)
    gmax = 5  # 2 + 2 + 1 levels (fs_em.COMPARISONS)
    assert all(0 < r["gamma_sum"] < gmax for r in rq)

    # column profile covers the comparison/blocking fields with sane
    # tallies (distinct city values must agree with the TF vocabulary)
    prof = summary["column_profile"]
    assert set(prof) == {
        "city_name", "postal_code", "top_country", "phonetic_key"
    }
    assert prof["city_name"]["n_distinct"] == summary["city_tf"]["n_values"]
    assert all(
        0 <= v["n_null"] <= summary["n_mentions"] for v in prof.values()
    )


def test_er_report_review_impact(spark, tmp_path):
    """--decisions: adjudications fold into the production edges and the
    re-closure delta is reported.  Rejecting EVERY automatic edge must
    split every non-singleton cluster; confirming queue pairs can only
    merge."""
    from pyspark.sql import functions as F

    from postal_address_spark.operators.blocking import with_block_key
    from postal_address_spark.operators.extract import extract_mentions
    from postal_address_spark.operators.normalize_op import normalize_mentions
    from postal_address_spark.operators.pairs import candidate_pairs
    from postal_address_spark.operators.scoring import score_pairs
    from postal_address_spark.synth import synth_transcripts_spark

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    import er_report

    inp = str(tmp_path / "transcripts")
    synth_transcripts_spark(
        spark, seed=11, n_convs=80, n_entities=30
    ).write.parquet(inp)

    # adjudications: reject every production edge, confirm nothing — the
    # strongest possible reviewer override, with a provable outcome
    norm = with_block_key(
        normalize_mentions(extract_mentions(spark.read.parquet(inp)))
    )
    edges = score_pairs(
        candidate_pairs(norm, threshold=0.82), threshold=0.82
    ).select("rec_id_a", "rec_id_b")
    decisions_path = str(tmp_path / "decisions")
    edges.withColumn("decision", F.lit("reject")).write.parquet(decisions_path)

    root = str(tmp_path / "report_impact")
    summary = er_report.main(
        ["--input", inp, "--output-root", root,
         "--decisions", decisions_path],
        spark=spark,
    )
    impact = summary["review_impact"]
    assert impact is not None
    assert impact["n_decisions_reject"] > 0
    assert impact["n_decisions_confirm"] == 0
    # with every edge rejected the after-closure is all singletons
    n_nodes = norm.where(F.col("block_key").isNotNull()).count()
    assert impact["n_clusters_after"] == n_nodes
    assert impact["n_clusters_after"] > impact["n_clusters_before"]
    # every member of a non-singleton cluster except its min-id label
    # holder changes label; the written table matches the count
    assert impact["n_labels_changed"] > 0
    assert impact["n_labels_changed"] == spark.read.parquet(
        f"{root}/review_impact"
    ).count()


def test_er_report_cluster_audit(spark, tmp_path):
    """--cluster-audit: the unlinkables / graph-metrics / bridge-edge
    artifacts land, internally consistent with each other and the
    summary."""
    from pyspark.sql import functions as F

    from postal_address_spark.synth import synth_transcripts_spark

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    import er_report

    inp = str(tmp_path / "transcripts")
    root = str(tmp_path / "report_audit")
    synth_transcripts_spark(
        spark, seed=11, n_convs=80, n_entities=30
    ).write.parquet(inp)

    summary = er_report.main(
        ["--input", inp, "--output-root", root, "--cluster-audit"],
        spark=spark,
    )
    audit = summary["cluster_audit"]
    assert audit is not None

    unl = spark.read.parquet(f"{root}/unlinkables")
    status = audit["unlinkable_status_counts"]
    assert sum(status.values()) == unl.count()
    assert status.get("linked", 0) > 0
    # a no-candidates record has NULL best_score, and vice versa
    assert unl.where(
        (F.col("status") == "no_candidates") != F.col("best_score").isNull()
    ).count() == 0

    graph = spark.read.parquet(f"{root}/cluster_graph")
    assert audit["n_clusters"] == graph.count()
    # linked records live in some multi-node cluster; totals agree with
    # the graph table's node sum
    assert graph.agg(F.sum("n_nodes")).collect()[0][0] == unl.count()
    assert graph.where(
        (F.col("n_nodes") > 1) & (F.col("n_edges") == 0)
    ).count() == 0

    bridges = spark.read.parquet(f"{root}/bridge_edges")
    assert audit["n_bridges"] == bridges.where(F.col("is_bridge")).count()
    # every audited edge belongs to a cluster the graph table knows
    assert bridges.join(
        graph.select("cluster_id"), "cluster_id", "left_anti"
    ).count() == 0


def test_er_report_labeling_loop(spark, tmp_path):
    """--labeling-sample writes the stratified queue; labeling it and
    rerunning with --labels writes labeled_mu/ + mu_audit/ with a
    consistent summary block."""
    from pyspark.sql import functions as F

    from postal_address_spark.synth import synth_transcripts_spark

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    import er_report

    inp = str(tmp_path / "transcripts")
    root = str(tmp_path / "report")
    synth_transcripts_spark(
        spark, seed=11, n_convs=80, n_entities=30
    ).write.parquet(inp)

    er_report.main(
        ["--input", inp, "--output-root", root, "--labeling-sample", "4"],
        spark=spark,
    )
    queue = spark.read.parquet(f"{root}/labeling_queue")
    qrows = queue.collect()
    assert len(qrows) > 0
    # per stratum: at most 4 rows, contiguous ranks, constant total
    strata = {}
    for r in qrows:
        g = (r.gamma_line1_jw, r.gamma_line1_tsl, r.gamma_city_jw)
        strata.setdefault(g, []).append(r)
    for g, rs in strata.items():
        assert len(rs) <= 4, g
        assert sorted(x.sample_rank for x in rs) == list(
            range(1, len(rs) + 1)), g
        assert len({x.n_pattern_pairs for x in rs}) == 1, g

    # "label" the queue deterministically and rerun with --labels
    labels_path = str(tmp_path / "labels")
    queue.withColumn(
        "is_match",
        F.pmod(
            F.xxhash64("rec_id_a", "rec_id_b"), F.lit(3)
        ) == 0,
    ).write.parquet(labels_path)
    summary = er_report.main(
        ["--input", inp, "--output-root", str(tmp_path / "report2"),
         "--labels", labels_path],
        spark=spark,
    )
    lm = summary["labeled_mu"]
    assert lm["n_labels"] == len(qrows)
    assert 0.0 <= lm["labeled_lambda"] <= 1.0
    assert lm["max_abs_delta_log2_bf"] >= 0.0
    tallies = spark.read.parquet(str(tmp_path / "report2") + "/labeled_mu")
    got = {
        (r.comparison, r.gamma): (r.n_match, r.n_nonmatch)
        for r in tallies.collect()
    }
    # totals across levels must equal the label counts per comparison
    for comp in ("line1_jw", "line1_tsl", "city_jw"):
        tot = sum(m + u for (c, _), (m, u) in got.items() if c == comp)
        assert tot == len(qrows), comp
    audit = spark.read.parquet(str(tmp_path / "report2") + "/mu_audit")
    arows = audit.collect()
    assert len(arows) == 8
    for r in arows:
        assert abs(
            (r.labeled_log2_bf - r.em_log2_bf) - r.delta_log2_bf
        ) < 1e-5


def test_er_report_key_profile_consistency(spark, tmp_path):
    """key_profile/ covers the candidate keys with integer tallies, and
    the exact-key pair volume upper-bounds the refined production rule's
    pair count from coverage/."""
    from postal_address_spark.synth import synth_transcripts_spark

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    import er_report

    inp = str(tmp_path / "transcripts")
    root = str(tmp_path / "report")
    synth_transcripts_spark(
        spark, seed=5, n_convs=60, n_entities=25
    ).write.parquet(inp)
    summary = er_report.main(
        ["--input", inp, "--output-root", root], spark=spark,
    )
    kp = summary["key_profile"]
    assert set(kp) == {
        "city", "phonetic_city", "country_postal", "country_postal_hn"
    }
    for v in kp.values():
        assert v["n_keyed"] >= 0 and v["n_pairs"] >= 0
        assert v["max_block"] * (v["max_block"] - 1) // 2 <= max(
            v["n_pairs"], 1
        ) or v["n_pairs"] == 0
    # the hn-refined key partitions the country_postal key's blocks
    assert (
        kp["country_postal_hn"]["n_pairs"] <= kp["country_postal"]["n_pairs"]
    )
    # the production exact rule (same key + hn refinement) generates
    # exactly the costed volume
    assert (
        summary["coverage"]["exact_postal_hn"]["n_pairs"]
        == kp["country_postal_hn"]["n_pairs"]
    )


def test_er_report_truth_recall_and_dup_estimate(spark, tmp_path):
    """--truth-pairs writes the per-rule labeled recall + the missed-pair
    casualty list; --dup-estimate writes the Chapman one-row report.
    Truth here = pairs guaranteed co-blocked by rule 1 (same refined
    exact key) plus one impossible pair no rule can produce — so
    recall_cumulative < 1, the impossible pair is the missed_truth/
    content, and the estimator identity N_hat = ((nA+1)(nB+1)-(m+1))/
    (m+1) is checkable from the written integers."""
    from pyspark.sql import functions as F

    from postal_address_spark.operators.blocking import (
        with_block_key,
        with_phonetic_block_key,
    )
    from postal_address_spark.operators.extract import extract_mentions
    from postal_address_spark.operators.normalize_op import (
        normalize_mentions,
    )
    from postal_address_spark.synth import synth_transcripts_spark

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    import er_report

    inp = str(tmp_path / "transcripts_tr")
    root = str(tmp_path / "report_tr")
    synth_transcripts_spark(
        spark, seed=11, n_convs=80, n_entities=30
    ).write.parquet(inp)

    # pairs sharing the REFINED exact key (block_key + house number) are
    # caught by rule 1 by construction (threshold 0.82 > refine bound)
    norm = with_phonetic_block_key(with_block_key(normalize_mentions(
        extract_mentions(spark.read.parquet(inp))
    )))
    keyed = norm.where(F.col("block_key").isNotNull()).select(
        "rec_id",
        F.concat_ws(
            "#", "block_key", F.regexp_extract("line1", r"^(\d+)", 1)
        ).alias("k"),
    )
    co = (
        keyed.alias("a").join(keyed.alias("b"), "k")
        .where(F.col("a.rec_id") < F.col("b.rec_id"))
        .select(
            F.col("a.rec_id").alias("rec_id_a"),
            F.col("b.rec_id").alias("rec_id_b"),
        )
        .limit(10)
    )
    truth = co.unionByName(spark.createDataFrame(
        [("zzz#0", "zzz#1")], "rec_id_a string, rec_id_b string"
    ))
    truth_path = str(tmp_path / "truth_pairs")
    truth.write.parquet(truth_path)
    n_truth = spark.read.parquet(truth_path).count()
    assert n_truth >= 2

    summary = er_report.main(
        ["--input", inp, "--output-root", root,
         "--truth-pairs", truth_path, "--dup-estimate"],
        spark=spark,
    )

    rec = {r["rule"]: r for r in
           spark.read.parquet(f"{root}/blocking_recall").collect()}
    assert set(rec) == {"exact_postal_hn", "phonetic_city", "snm_window4"}
    # rule 1 catches every co-keyed truth pair; the impossible pair is
    # caught by nothing
    assert rec["exact_postal_hn"]["n_true_caught"] == n_truth - 1
    assert all(r["total_truth_pairs"] == n_truth for r in rec.values())
    last = rec["snm_window4"]
    assert last["n_cumulative_true"] < n_truth
    missed = spark.read.parquet(f"{root}/missed_truth").collect()
    assert {(r["rec_id_a"], r["rec_id_b"]) for r in missed} \
        == {("zzz#0", "zzz#1")}
    assert summary["blocking_recall"]["exact_postal_hn"][
        "n_true_caught"] == n_truth - 1

    # the two decision tables ride the same truth stage
    trade = {r["rule"]: r for r in
             spark.read.parquet(f"{root}/tradeoff").collect()}
    assert set(trade) == set(rec)
    assert all(
        trade[k]["n_true_caught"] == rec[k]["n_true_caught"] for k in rec
    )
    subs = {r["subset_id"]: r for r in
            spark.read.parquet(f"{root}/subset_costs").collect()}
    assert set(subs) == set(range(1, 8))  # 3 rules -> 7 subsets
    # single-rule subsets agree with the per-rule recall tallies
    assert subs[1]["n_true_caught"] == rec["exact_postal_hn"]["n_true_caught"]
    assert subs[2]["n_true_caught"] == rec["phonetic_city"]["n_true_caught"]
    full = subs[7]
    assert full["rules"] == "exact_postal_hn+phonetic_city+snm_window4"
    # the all-rules union can't beat total truth, can't lose to any subset
    assert all(
        s["n_true_caught"] <= full["n_true_caught"] <= n_truth
        for s in subs.values()
    )
    # union dedup: the full subset costs at most the per-rule sum
    assert full["n_pairs"] <= sum(subs[b]["n_pairs"] for b in (1, 2, 4))
    assert any(s["on_frontier"] for s in subs.values())

    est = summary["dup_estimate"]
    assert est["system_a"] == "exact_postal_hn"
    assert est["system_b"] == "phonetic_city"
    na, nb, m, u = est["n_a"], est["n_b"], est["n_both"], est["n_union"]
    assert m <= min(na, nb) and u == na + nb - m
    assert est["est_total_matches"] == ((na + 1) * (nb + 1) - (m + 1)) / (m + 1)
    # same single-division form as the engine/oracle (NOT est_total - u,
    # which rounds twice and can differ in the last ulp)
    assert est["est_missed"] == (
        ((na + 1) * (nb + 1) - (m + 1) - u * (m + 1)) / (m + 1)
    )
    # the estimate can never fall below what was observed
    assert est["est_total_matches"] >= u


def test_er_report_drift_baseline(spark, tmp_path):
    """--drift-baseline: the drift/ table compares the baseline
    snapshot's normalized mentions against the current run's, PSI lands
    per field in the summary, and a same-snapshot run reads ~0 drift."""
    from postal_address_spark.synth import synth_transcripts_spark

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    import er_report

    base = str(tmp_path / "base")
    curr = str(tmp_path / "curr")
    synth_transcripts_spark(
        spark, seed=11, n_convs=60, n_entities=25
    ).write.parquet(base)
    # a different seed shifts the entity/value mix: nonzero drift
    synth_transcripts_spark(
        spark, seed=99, n_convs=60, n_entities=25
    ).write.parquet(curr)

    root = str(tmp_path / "report")
    summary = er_report.main(
        ["--input", curr, "--output-root", root,
         "--drift-baseline", base],
        spark=spark,
    )
    psi = summary["drift_psi"]
    assert set(psi) == {"city_name", "top_country", "postal_code", "line1"}
    assert all(v >= 0.0 for v in psi.values())
    rows = spark.read.parquet(f"{root}/drift").collect()
    assert rows and all(r["n_prev"] >= 0 and r["n_curr"] >= 0 for r in rows)
    # both snapshots actually contributed mentions
    assert sum(r["n_prev"] for r in rows) > 0
    assert sum(r["n_curr"] for r in rows) > 0

    # identical snapshots -> PSI exactly 0 everywhere
    root2 = str(tmp_path / "report_same")
    same = er_report.main(
        ["--input", base, "--output-root", root2,
         "--drift-baseline", base],
        spark=spark,
    )
    assert all(v == 0.0 for v in same["drift_psi"].values())


def test_er_report_recommended_threshold(spark, tmp_path):
    """--truth-pairs also yields pattern_truth/ and a driver-side
    recommended admission weight: the curve point tallies must be
    internally consistent and the pick must maximize F1 over the written
    table (re-derived independently here)."""
    from pyspark.sql import functions as F

    from postal_address_spark.operators.blocking import with_block_key
    from postal_address_spark.operators.extract import extract_mentions
    from postal_address_spark.operators.normalize_op import (
        normalize_mentions,
    )
    from postal_address_spark.synth import synth_transcripts_spark

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    import er_report

    inp = str(tmp_path / "transcripts_th")
    root = str(tmp_path / "report_th")
    synth_transcripts_spark(
        spark, seed=7, n_convs=80, n_entities=30
    ).write.parquet(inp)

    # truth = the generator's latent entity: mentions of the same entity
    # share custkey mod n_entities in the synth; approximate with the
    # refined-key pairs (guaranteed candidates) labeled true
    norm = with_block_key(normalize_mentions(
        extract_mentions(spark.read.parquet(inp))
    ))
    keyed = norm.where(F.col("block_key").isNotNull()).select(
        "rec_id",
        F.concat_ws(
            "#", "block_key", F.regexp_extract("line1", r"^(\d+)", 1)
        ).alias("k"),
    )
    truth = (
        keyed.alias("a").join(keyed.alias("b"), "k")
        .where(F.col("a.rec_id") < F.col("b.rec_id"))
        .select(
            F.col("a.rec_id").alias("rec_id_a"),
            F.col("b.rec_id").alias("rec_id_b"),
        )
        .limit(40)
    )
    truth_path = str(tmp_path / "truth_th")
    truth.write.parquet(truth_path)

    summary = er_report.main(
        ["--input", inp, "--output-root", root,
         "--truth-pairs", truth_path],
        spark=spark,
    )
    best = summary["recommended_threshold"]
    assert best is not None
    assert 0.0 <= best["precision"] <= 1.0
    assert 0.0 <= best["recall"] <= 1.0
    assert 0 < best["cum_true"] <= best["cum_pairs"]

    # re-derive the F1-max over the written pattern_truth independently
    from postal_address_spark.operators.fs_em import (
        em_fit_df,
        threshold_curve,
    )

    params = em_fit_df(spark.read.parquet(f"{root}/fs_patterns"))
    curve = threshold_curve(
        spark.read.parquet(f"{root}/pattern_truth").collect(), params
    )
    assert best["f_beta"] == max(c["f_beta"] for c in curve)
    # tallies: the final curve point covers every candidate pair
    assert curve[-1]["cum_pairs"] == sum(c["n_pairs"] for c in curve)


def test_er_report_hot_keys_and_len_sketch(spark, tmp_path):
    """--hot-keys must equal the exact GROUP BY/HAVING truth over block
    keys; --len-sketch buckets must re-count the corpus exactly and the
    summary quantiles must bracket the true percentiles within the
    2^-(s+1) bound."""
    import math

    from pyspark.sql import functions as F

    from postal_address_spark.synth import synth_transcripts_spark

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    import er_report

    inp = str(tmp_path / "transcripts")
    root = str(tmp_path / "report")
    synth_transcripts_spark(
        spark, seed=13, n_convs=80, n_entities=25
    ).write.parquet(inp)

    summary = er_report.main(
        [
            "--input", inp, "--output-root", root,
            "--hot-keys", "20000",       # >= 2% of mentions
            "--len-sketch", "5",
        ],
        spark=spark,
    )

    # recompute the truth from the same normalize chain
    from postal_address_spark.operators.blocking import (
        with_block_key,
        with_phonetic_block_key,
    )
    from postal_address_spark.operators.extract import extract_mentions
    from postal_address_spark.operators.normalize_op import (
        normalize_mentions,
    )

    norm = with_phonetic_block_key(
        with_block_key(
            normalize_mentions(extract_mentions(spark.read.parquet(inp)))
        )
    ).persist()

    hk = summary["hot_keys"]
    t = hk["min_count"]
    assert t == max(2, summary["n_mentions"] * 20000 // 1_000_000)
    truth = {
        (r["block_key"], r["n"])
        for r in norm.where(F.col("block_key").isNotNull())
        .groupBy("block_key").agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= t).collect()
    }
    got = {
        (r["value"], r["cnt"])
        for r in spark.read.parquet(f"{root}/hot_keys").collect()
    }
    assert got == truth
    assert hk["n_hot"] == len(truth)
    if truth:
        assert hk["max_block"] == max(n for _, n in truth)

    # len sketch: bucket counts cover every non-null line1 exactly, and
    # the p50/p95/p99 estimates respect the relative-error bound
    lens = sorted(
        r["l"]
        for r in norm.select(F.length("line1").alias("l"))
        .where(F.col("l").isNotNull()).collect()
    )
    sk_total = sum(
        r["cnt"] for r in spark.read.parquet(f"{root}/len_sketch").collect()
    )
    assert sk_total == len(lens)
    lq = summary["len_quantiles"]
    assert lq["s"] == 5
    for q in (0.5, 0.95, 0.99):
        exact = lens[max(0, math.ceil(q * len(lens)) - 1)]
        est = lq[f"p{int(q * 100)}"]
        assert abs(est - exact) / max(exact, 1) <= 2 ** -6 + 1e-9, (q, est, exact)
    norm.unpersist()


def test_er_report_frozen_model_mode(spark, tmp_path):
    """--model: a previously exported model is reloaded (no EM refit)
    and every downstream surface reports against it — the written
    fs_params table must replay the frozen model's values exactly."""
    from postal_address_spark.operators import fs_em as _fs
    from postal_address_spark.synth import synth_transcripts_spark

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    import er_report

    inp = str(tmp_path / "transcripts_fm")
    synth_transcripts_spark(
        spark, seed=13, n_convs=40, n_entities=16
    ).write.parquet(inp)

    # run 1: fit and export
    root1 = str(tmp_path / "rep1")
    model_path = str(tmp_path / "model.json")
    s1 = er_report.main(
        ["--input", inp, "--output-root", root1, "--model-json", model_path],
        spark=spark,
    )
    # run 2: frozen-model mode on the same corpus
    root2 = str(tmp_path / "rep2")
    s2 = er_report.main(
        ["--input", inp, "--output-root", root2, "--model", model_path],
        spark=spark,
    )
    assert s2["fs_lambda"] == s1["fs_lambda"]
    p1 = sorted(
        (r["comparison"], r["gamma"], r["m"], r["u"], r["log2_bf"])
        for r in spark.read.parquet(f"{root1}/fs_params").collect()
    )
    p2 = sorted(
        (r["comparison"], r["gamma"], r["m"], r["u"], r["log2_bf"])
        for r in spark.read.parquet(f"{root2}/fs_params").collect()
    )
    assert p1 == p2
