"""Linkage model-quality report job — the ``spark-submit`` deploy surface
for the diagnostic layer (the artifacts an ER practitioner reviews BEFORE
and AFTER committing a full linkage run):

* **blocking-rule coverage** (Splink's cumulative-comparisons chart):
  per rule the candidate-pair volume, first-rule-credited new pairs and
  the cumulative distinct total — what each pass costs and adds;
* **unblocked records**: the population no abstaining rule pairs with
  anything (unlinkable-by-blocking — singleton clusters by construction);
* **Fellegi-Sunter model fit**: comparison-pattern sufficient statistics
  (one aggregation) + EM-learned m/u probabilities and log2 Bayes factors;
* **term-frequency profile** of the city column (value counts + the
  column-agreement mass the TF adjustment divides by);
* **column profile** of the comparison/blocking fields (null rates,
  distinct counts, top values — the measured skew behind key choices);
* **blocking-key costing** (``key_profile/``): per CANDIDATE key the
  coverage, distinct keys, exact equi-join pair volume and max block —
  what each key would cost before a single pair is generated;
* **clerical-review queue**: the structural possible-match band
  (ambiguous integer comparison patterns), deterministically thinned;
* **cluster-structure audit** (opt-in, ``--cluster-audit``): per-record
  linkability (best score + linked/unlinkable/no_candidates status),
  per-cluster graph metrics (density, degree extremes) and Tarjan
  bridge-edge flags over the production score and closure — the
  truth-free quality dashboard (``unlinkables/``, ``cluster_graph/``,
  ``bridge_edges/``);
* **labeling budget + labeled m/u audit** (opt-in,
  ``--labeling-sample`` / ``--labels``): write the stratified k-per-
  pattern labeling queue (``labeling_queue/``); on a later run, fold the
  returned ``is_match`` labels into per-level match/non-match tallies
  (``labeled_mu/``) and the Horvitz-Thompson-reweighted labeled-vs-EM
  parameter audit (``mu_audit/``) — the trust check that the
  unsupervised fit converged to the match/non-match dichotomy;
* **labeled blocking recall** (opt-in, ``--truth-pairs``): per rule the
  fraction of KNOWN matches it co-blocks (first-rule-credited) plus the
  concrete missed-match list (``blocking_recall/``, ``missed_truth/``) —
  the recall side the cost-side coverage chart can't see;
* **capture–recapture missed-match estimate** (opt-in,
  ``--dup-estimate``): Chapman dual-system estimate of the matches BOTH
  keyed rules missed, label-free (``dup_estimate/``; correlated rules
  bias it downward — read as a lower bound);
* **hot blocking keys** (opt-in, ``--hot-keys PPM``): the exact
  heavy-hitter table of block keys holding >= PPM parts-per-million of
  the mentions (``hot_keys/``) via the count-min two-pass path
  (operators/cms.py) — the full key population never shuffles; this is
  the measured input the salting threshold and df caps are sized from;
* **field-length quantile sketch** (opt-in, ``--len-sketch S``): the
  mergeable (bucket, cnt) length-distribution table (``len_sketch/``,
  operators/qsketch.py) with p50/p95/p99 estimates in the summary —
  per-day tables fold by union+SUM;
* **review impact** (opt-in, ``--decisions``): fold adjudicated
  confirm/reject decisions back into the production match edges
  (operators/review.py) and report what the re-closure changes —
  before/after cluster counts plus the records whose label moves
  (``review_impact/``).

Package the engine and submit::

    (cd /root/repo && zip -qr engine.zip postal_address_spark)
    spark-submit --py-files engine.zip jobs/er_report.py \
        --input  <transcripts>    # parquet path or Iceberg table ref \
        --output-root <dir>       # writes coverage/ unblocked/ \
                                  #   fs_patterns/ fs_params/ city_tf/ \
                                  #   column_profile/ review_queue/ \
        [--snm-window 4] [--threshold 0.82]

No ``master`` is set — the cluster manager provides it.  Cost profile:
the normalize chain runs once (persisted), the coverage analysis is one
shuffle on the pair key, the FS fit is one aggregation plus a driver-side
EM over <= 18 rows, and the TF profile is one vocabulary-scale
aggregation — strictly cheaper than the linkage run it de-risks.
"""
from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="postal-address-spark ER model report")
    p.add_argument("--input", required=True, help="transcripts table (parquet path or iceberg ref)")
    p.add_argument("--output-root", required=True, help="report destination dir")
    p.add_argument("--snm-window", type=int, default=4)
    p.add_argument("--threshold", type=float, default=0.82)
    p.add_argument(
        "--estimation-sample", type=int, default=1, metavar="K",
        help="fit the FS model on a deterministic 1-in-K candidate-pair "
        "sample (hash of the pair key) — m/u are population ratios, so "
        "a sample estimates them while cutting kernel work K-fold at "
        "10^12-pair scale; 1 = every pair",
    )
    p.add_argument(
        "--review-sample", type=int, default=1, metavar="K",
        help="thin the clerical-review queue to a deterministic 1-in-K "
        "pair sample before writing it; 1 = every ambiguous pair",
    )
    p.add_argument(
        "--cluster-audit", action="store_true",
        help="opt-in: score the production candidate pairs WITHOUT the "
        "cascade short-circuit, run the closure, and write the cluster "
        "structure audits — unlinkables/ (per-record best score + "
        "linked/unlinkable/no_candidates status), cluster_graph/ "
        "(per-cluster density/degree stats), bridge_edges/ (Tarjan "
        "weakest-link flags).  Pays the full kernel cost on every pair "
        "(like --decisions); at extreme pair volumes run it on a "
        "partitioned slice of the corpus instead",
    )
    p.add_argument(
        "--labeling-sample", type=int, default=0, metavar="KPP",
        help="opt-in: write labeling_queue/ — KPP deterministically "
        "pseudo-random candidate pairs from EVERY comparison pattern "
        "with the stratum's total pair count (fs_em.labeling_sample): "
        "the fixed labeling budget that validates learned m/u in all "
        "strata, not just the ambiguous review band; 0 = off",
    )
    p.add_argument(
        "--labels",
        help="labeled-pairs table: the written labeling_queue/ plus an "
        "is_match boolean (the --decisions pattern).  When given, the "
        "report writes labeled_mu/ (per comparison-level match/non-match "
        "tallies, fs_em.mu_from_labels) and — when the EM fit ran — "
        "mu_audit/ (labeled vs EM m/u and log2-Bayes-factor deltas via "
        "the Horvitz-Thompson-reweighted fs_em.labeled_params), the "
        "trust check that EM converged to the match/non-match dichotomy",
    )
    p.add_argument(
        "--truth-pairs",
        help="labeled TRUE match pairs table (rec_id_a, rec_id_b, id-"
        "ordered; label metadata columns ride along) — when given, the "
        "report writes blocking_recall/ (per-rule labeled-match recall, "
        "blocking_analysis.blocking_rule_recall: the fraction of known "
        "matches each rule co-blocks, first-rule-credited) and "
        "missed_truth/ (the labeled matches NO rule co-blocks — the "
        "casualty list a new rule should be designed around), plus the "
        "two decision tables: tradeoff/ (per-rule cost-per-recall, "
        "blocking_rule_tradeoff) and subset_costs/ (every rule SUBSET's "
        "union-deduplicated pair cost + labeled recall with the Pareto "
        "frontier flagged, blocking_subset_costs — which combination "
        "ships under a comparison budget).  The truth set broadcasts; "
        "cost is one map-side reduction per rule plus one bitmask fold "
        "over the unioned candidate volume",
    )
    p.add_argument(
        "--dup-estimate", action="store_true",
        help="opt-in: write dup_estimate/ — the Chapman capture-"
        "recapture estimate of matches BOTH keyed rules missed "
        "(blocking_analysis.capture_recapture; label-free, independence "
        "caveat documented there: correlated rules bias it downward).  "
        "Pays the scoring kernel over the union of the two keyed "
        "rules' candidates",
    )
    p.add_argument(
        "--drift-baseline",
        default=None,
        help="opt-in: the BASELINE transcripts table (the snapshot the "
        "FS weights / blocking rules were tuned on).  Writes drift/ — "
        "per-field binned frequency comparison of the baseline's "
        "normalized mentions vs this run's (operators/drift.py: one "
        "unpivot + one count per snapshot, deterministic top-N "
        "'<other>' cap) — and puts the per-field PSI in the summary "
        "(driver-side psi_from_counts; >0.25 = investigate before "
        "trusting the fitted weights)",
    )
    p.add_argument(
        "--hot-keys", type=int, default=0, metavar="PPM",
        help="opt-in: write hot_keys/ — the EXACT heavy-hitter table of "
        "block keys whose mention count >= PPM parts-per-million of the "
        "corpus (operators/cms.py heavy_hitters: two-pass count-min "
        "sketch — candidate filter from a folded literal sketch map, "
        "exact count over survivors only — so the full key population "
        "never shuffles).  This is the measured input the salting "
        "defense (pairs.py hot-block threshold) and the df caps are "
        "sized from; 0 = off",
    )
    p.add_argument(
        "--len-sketch", type=int, default=0, metavar="S",
        help="opt-in: write len_sketch/ — the mergeable quantile sketch "
        "(operators/qsketch.py, S sub-bucket bits -> relative error <= "
        "2^-(S+1)) of normalized line1 lengths, one (bucket, cnt) table "
        "per run that folds across runs/days by union+SUM; the summary "
        "gets p50/p95/p99 estimates.  0 = off",
    )
    p.add_argument(
        "--decisions",
        help="adjudicated decisions table (rec_id_a, rec_id_b, decision in "
        "{'confirm','reject'}) — typically the written review_queue plus a "
        "decision column.  When given, the report scores the production "
        "edges, folds the decisions in (operators/review.py), re-runs the "
        "closure and writes review_impact/ (the records whose cluster "
        "label changes) with before/after cluster counts in the summary",
    )
    p.add_argument(
        "--expect",
        help="JSON expectation specs (operators/expectations.py Check "
        "kwargs) evaluated on the INPUT transcript table before any "
        "report stage; report table written to <output-root>/expectations",
    )
    p.add_argument(
        "--expect-fail-hard", action="store_true",
        help="exit 3 when any expectation fails",
    )
    p.add_argument(
        "--model",
        help="previously exported model JSON (fs_em.load_params): SKIP "
        "the EM fit and run every downstream stage — threshold "
        "recommendation, mu_audit, fs_params table — against this "
        "FROZEN model (the fit-once/monitor-later workflow; the "
        "comparison schema is validated on load)",
    )
    p.add_argument(
        "--model-json",
        help="also export the fitted Fellegi-Sunter model to this "
        "driver-local JSON path (fs_em.save_params — bit-exact m/u/"
        "lambda round trip, the Splink save_model_to_json shape); a "
        "later run or scorer reloads it with fs_em.load_params and "
        "scores identically without re-fitting",
    )
    return p


def main(argv=None, spark=None) -> dict:
    args = build_parser().parse_args(argv)

    if spark is None:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("postal-address-er-report")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .getOrCreate()
        )

    from pyspark.sql import functions as F

    from postal_address_spark.operators.blocking import (
        with_block_key,
        with_phonetic_block_key,
    )
    from postal_address_spark.operators.blocking_analysis import (
        blocking_rule_analysis,
        standard_blocking_rules,
        unblocked_records,
    )
    from postal_address_spark.operators.extract import extract_mentions
    from postal_address_spark.operators.fs_em import (
        comparison_vectors,
        em_fit_df,
        pair_sample,
        params_df,
        pattern_counts,
        review_queue,
        term_frequency_table,
        tf_column_stats,
    )
    from postal_address_spark.operators.normalize_op import normalize_mentions
    from postal_address_spark.operators.profiling import profile_columns
    from postal_address_spark.operators.pairs import (
        REFINE_SAFE_THRESHOLD,
        candidate_pairs,
    )
    from postal_address_spark.operators.scoring import explain_pairs
    from postal_address_spark.sources.io import read_table, write_table

    transcripts = read_table(spark, args.input)

    # 0. declarative input expectations (shared gate with the other
    # jobs): refuse a degraded feed before the report spends compute.
    expect_results = None
    if args.expect:
        from postal_address_spark.operators.expectations import (
            run_expectation_gate,
        )

        expect_results = run_expectation_gate(
            spark, transcripts, args.expect,
            f"{args.output_root.rstrip('/')}/expectations",
            fail_hard=args.expect_fail_hard,
        )

    mentions = extract_mentions(transcripts)
    # one normalize pass feeds every report surface (pipeline.py:186)
    norm = with_phonetic_block_key(
        with_block_key(normalize_mentions(mentions))
    ).persist()
    n_mentions = norm.count()

    # ---- blocking-rule coverage + unblocked population.  The exact rule
    # mirrors the run being de-risked: candidate_pairs refines the key
    # with the house number only above REFINE_SAFE_THRESHOLD, so the
    # report must describe the same rule the linkage would execute.
    rules = standard_blocking_rules(
        norm,
        snm_window=args.snm_window,
        refine_house_number=args.threshold > REFINE_SAFE_THRESHOLD,
    )
    root = args.output_root.rstrip("/")
    coverage = blocking_rule_analysis(rules)
    write_table(coverage, f"{root}/coverage")
    # unblocked vs the abstaining keyed rules (SNM never abstains)
    unblocked = unblocked_records(norm, "rec_id", rules[:2])
    write_table(unblocked, f"{root}/unblocked")

    # ---- labeled-match recall per rule (opt-in): the RECALL side the
    # cost-side coverage above can't see — what fraction of KNOWN
    # matches each rule co-blocks, plus the concrete missed-pair list.
    # The clerical truth set broadcasts, so each rule's candidate stream
    # reduces to its labeled survivors map-side (cost ~ coverage's).
    recall_rows = None
    if args.truth_pairs:
        from postal_address_spark.operators.blocking_analysis import (
            blocking_rule_recall,
            missed_truth_pairs,
        )

        truth = read_table(spark, args.truth_pairs)
        recall = blocking_rule_recall(rules, truth)
        write_table(recall, f"{root}/blocking_recall")
        write_table(
            missed_truth_pairs(rules, truth), f"{root}/missed_truth"
        )
        from postal_address_spark.operators.blocking_analysis import (
            blocking_rule_tradeoff,
            blocking_subset_costs,
        )

        write_table(
            blocking_rule_tradeoff(rules, truth), f"{root}/tradeoff"
        )
        write_table(
            blocking_subset_costs(rules, truth), f"{root}/subset_costs"
        )
        recall_rows = {
            r["rule"]: {
                "n_true_caught": int(r["n_true_caught"]),
                "recall_rule": r["recall_rule"],
                "recall_cumulative": r["recall_cumulative"],
            }
            for r in spark.read.parquet(f"{root}/blocking_recall").collect()
        }

    # ---- capture-recapture missed-match estimate (opt-in, label-free):
    # the two keyed rules as dual capture systems over the production
    # score — the kernel runs ONCE over the distinct candidate union,
    # each rule's matches recovered by a semi-join.
    dup_est = None
    if args.dup_estimate:
        from postal_address_spark.operators.blocking_analysis import (
            capture_recapture,
        )
        from postal_address_spark.operators.scoring import score_pairs

        (sys_a, cap_a), (sys_b, cap_b) = rules[0], rules[1]
        cand = cap_a.unionByName(cap_b).distinct()
        vcols = ["line1", "city_name", "postal_code"]
        paired = cand.join(
            norm.select(
                F.col("rec_id").alias("rec_id_a"),
                F.col("block_key"),
                *[F.col(c).alias(f"{c}_a") for c in vcols],
            ),
            "rec_id_a",
        ).join(
            norm.select(
                F.col("rec_id").alias("rec_id_b"),
                *[F.col(c).alias(f"{c}_b") for c in vcols],
            ),
            "rec_id_b",
        )
        match_edges = score_pairs(paired, threshold=args.threshold).select(
            "rec_id_a", "rec_id_b"
        )
        est = capture_recapture(
            cap_a.join(match_edges, ["rec_id_a", "rec_id_b"], "left_semi"),
            cap_b.join(match_edges, ["rec_id_a", "rec_id_b"], "left_semi"),
            system_a=sys_a,
            system_b=sys_b,
        )
        write_table(est, f"{root}/dup_estimate")
        [er] = spark.read.parquet(f"{root}/dup_estimate").collect()
        dup_est = {
            "system_a": er["system_a"],
            "system_b": er["system_b"],
            "n_a": int(er["n_a"]),
            "n_b": int(er["n_b"]),
            "n_both": int(er["n_both"]),
            "n_union": int(er["n_union"]),
            "est_total_matches": er["est_total_matches"],
            "est_missed": er["est_missed"],
        }

    # ---- Fellegi-Sunter fit over the production candidate pairs.  A
    # zero-pair corpus is a legitimate report outcome (it is exactly the
    # de-risking answer "blocking produces nothing"), not a crash: the
    # fit is skipped and the params table written empty.
    explained = explain_pairs(
        pair_sample(
            candidate_pairs(norm, threshold=args.threshold),
            args.estimation_sample,
        )
    )
    vectors = comparison_vectors(explained)
    patterns = pattern_counts(vectors)
    write_table(patterns, f"{root}/fs_patterns")

    # ---- clerical-review queue: the structural possible-match band
    # (0 < gamma sum < max), thinned by the deterministic pair sample.
    write_table(
        review_queue(vectors, one_in=args.review_sample),
        f"{root}/review_queue",
    )
    # ---- labeling-budget queue (opt-in): k pairs per comparison pattern
    # (confident strata included) with stratum totals — what a labeling
    # pass actually works through; feeds --labels on the next run.
    if args.labeling_sample:
        from postal_address_spark.operators.fs_em import labeling_sample

        write_table(
            labeling_sample(vectors, args.labeling_sample),
            f"{root}/labeling_queue",
        )

    params = None
    model_json_written = None
    written_patterns = spark.read.parquet(f"{root}/fs_patterns")
    if args.model:
        # frozen-model mode: every downstream stage audits THIS model
        # against the fresh corpus instead of refitting
        from postal_address_spark.operators.fs_em import load_params

        params = load_params(args.model)
        write_table(params_df(spark, params), f"{root}/fs_params")
    elif written_patterns.limit(1).count() > 0:
        params = em_fit_df(written_patterns)
        write_table(params_df(spark, params), f"{root}/fs_params")
        if args.model_json:
            from postal_address_spark.operators.fs_em import save_params

            save_params(params, args.model_json)
            model_json_written = args.model_json
    else:
        write_table(
            spark.createDataFrame(
                [],
                "comparison string, gamma int, m double, u double,"
                " log2_bf double",
            ),
            f"{root}/fs_params",
        )

    # ---- threshold recommendation (opt-in, needs --truth-pairs and a
    # successful EM fit): label the candidate comparison vectors with the
    # clerical truth (broadcast — truth is human-sized), reduce to the
    # pattern_truth table, and pick the F-beta-maximizing admission
    # weight driver-side (fs_em.select_threshold over <= prod(levels)
    # rows).  Recall here is vs the candidates' labeled matches —
    # blocking recall is its own chart above.
    recommended = None
    if args.truth_pairs and params is not None:
        from postal_address_spark.operators.fs_em import (
            pattern_truth_counts,
            select_threshold,
        )

        tdf = read_table(spark, args.truth_pairs)
        ta, tb = tdf.columns[:2]
        tt = (
            tdf.select(
                F.least(F.col(ta), F.col(tb)).alias("_ta"),
                F.greatest(F.col(ta), F.col(tb)).alias("_tb"),
            )
            .distinct()
            .withColumn("_is_true", F.lit(1))
        )
        lv = (
            vectors.withColumn(
                "_ta", F.least("rec_id_a", "rec_id_b")
            )
            .withColumn("_tb", F.greatest("rec_id_a", "rec_id_b"))
            .join(F.broadcast(tt), ["_ta", "_tb"], "left")
            .withColumn(
                "truth_match", F.coalesce("_is_true", F.lit(0))
            )
        )
        pt = pattern_truth_counts(lv)
        write_table(pt, f"{root}/pattern_truth")
        best = select_threshold(
            spark.read.parquet(f"{root}/pattern_truth").collect(), params
        )
        recommended = {
            "weight_cutoff": best["weight"],
            "precision": best["precision"],
            "recall": best["recall"],
            "f_beta": best["f_beta"],
            "cum_pairs": best["cum_pairs"],
            "cum_true": best["cum_true"],
        }

    # ---- labeled m/u (opt-in): clerical labels over the labeling queue
    # -> per-level match/non-match tallies, plus the labeled-vs-EM audit
    # when the EM fit ran.  The collect is the labeled sample itself
    # (<= #patterns x k rows — model state, the em_fit_df precedent).
    labeled_mu = None
    if args.labels:
        from postal_address_spark.operators.fs_em import (
            labeled_params,
            mu_audit,
            mu_from_labels,
        )

        labels = read_table(spark, args.labels)
        write_table(mu_from_labels(labels), f"{root}/labeled_mu")
        lrows = labels.collect()
        lp = labeled_params(lrows)
        labeled_mu = {
            "n_labels": len(lrows),
            "labeled_lambda": lp.lam,
        }
        if params is not None:
            audit_rows = mu_audit(lp, params)
            write_table(
                spark.createDataFrame(
                    [
                        tuple([r[0], r[1]] + [round(x, 6) for x in r[2:]])
                        for r in audit_rows
                    ],
                    "comparison string, gamma int, labeled_m double,"
                    " labeled_u double, em_m double, em_u double,"
                    " labeled_log2_bf double, em_log2_bf double,"
                    " delta_log2_bf double",
                ),
                f"{root}/mu_audit",
            )
            labeled_mu["max_abs_delta_log2_bf"] = round(
                max(abs(r[-1]) for r in audit_rows), 6
            )

    # ---- term-frequency profile (city)
    tf = term_frequency_table(norm, "city_name")
    write_table(tf, f"{root}/city_tf")
    n_total, sum_sq = tf_column_stats(spark.read.parquet(f"{root}/city_tf"))

    # ---- column profile of the comparison/blocking fields: null rates,
    # distinct counts and the top values — the skew evidence blocking-key
    # choices are made from (one melt, one cells shuffle; profiling.py).
    profile = profile_columns(
        norm,
        ["city_name", "postal_code", "top_country", "phonetic_key"],
        top_k=10,
    )
    write_table(profile, f"{root}/column_profile")

    # ---- candidate blocking-key costing: coverage, distinct keys, the
    # EXACT equi-join pair volume and max block per candidate key — the
    # decision table for key choices, one vocabulary-scale value count
    # per key, no pair materialized (blocking_key_profile).
    from postal_address_spark.operators.blocking_analysis import (
        blocking_key_profile,
    )

    key_candidates = {
        "city": F.col("city_name"),
        "phonetic_city": F.col("phonetic_key"),
        "country_postal": F.concat(
            F.col("top_country"), F.lit("|"), F.col("postal_code")
        ),
        "country_postal_hn": F.concat(
            F.col("top_country"),
            F.lit("|"),
            F.col("postal_code"),
            F.lit("|"),
            F.regexp_extract("line1", r"^(\d+)", 1),
        ),
    }
    write_table(
        blocking_key_profile(norm, key_candidates), f"{root}/key_profile"
    )

    # ---- review impact (opt-in): fold adjudicated decisions into the
    # production match edges and measure what the re-closure changes.
    # This is the only stage that runs the full scoring kernels; it is
    # exactly the delta a practitioner wants before committing a relink.
    impact = None
    if args.decisions:
        from postal_address_spark.operators.cluster import assign_clusters
        from postal_address_spark.operators.review import apply_review
        from postal_address_spark.operators.scoring import score_pairs

        decisions = read_table(spark, args.decisions)
        dec = decisions.select(
            F.col("rec_id_a"), F.col("rec_id_b"),
            F.lower(F.col("decision")).alias("decision"),
        )
        rejected = dec.where(F.col("decision") == "reject").drop("decision")
        confirmed = dec.where(F.col("decision") == "confirm").drop("decision")
        # edges feed BOTH closures (before + after); persist so the
        # kernel scoring pass — the expensive stage — runs exactly once.
        edges = score_pairs(
            candidate_pairs(norm, threshold=args.threshold),
            threshold=args.threshold,
        ).select(
            F.col("rec_id_a").alias("src"), F.col("rec_id_b").alias("dst")
        ).persist()
        adjusted = apply_review(edges, rejected, confirmed)
        nodes = norm.where(F.col("block_key").isNotNull()).select("rec_id")
        before = assign_clusters(nodes, edges).withColumnRenamed(
            "cluster_id", "cluster_before"
        )
        after = assign_clusters(nodes, adjusted).withColumnRenamed(
            "cluster_id", "cluster_after"
        )
        changed = before.join(after, "rec_id").where(
            F.col("cluster_before") != F.col("cluster_after")
        )
        write_table(changed, f"{root}/review_impact")
        impact = {
            "n_decisions_reject": int(rejected.count()),
            "n_decisions_confirm": int(confirmed.count()),
            "n_clusters_before": int(
                before.agg(F.countDistinct("cluster_before")).collect()[0][0]
            ),
            "n_clusters_after": int(
                after.agg(F.countDistinct("cluster_after")).collect()[0][0]
            ),
            "n_labels_changed": int(
                spark.read.parquet(f"{root}/review_impact").count()
            ),
        }

    # ---- cluster-structure audit (opt-in): unlinkables + graph metrics
    # + bridge edges over the production score and closure.  Shares the
    # full-kernel cost profile of --decisions; the scored pair frame is
    # persisted so the kernels run once across the three audits.
    audit = None
    if args.cluster_audit:
        from postal_address_spark.operators.blocking_analysis import (
            unlinkable_records,
        )
        from postal_address_spark.operators.cluster import (
            assign_clusters,
            bridge_edges,
        )
        from postal_address_spark.operators.evaluate import (
            cluster_graph_stats,
        )

        scored = (
            explain_pairs(candidate_pairs(norm, threshold=args.threshold))
            .select("rec_id_a", "rec_id_b", "score")
            .persist()
        )
        nodes = norm.where(F.col("block_key").isNotNull()).select("rec_id")
        write_table(
            unlinkable_records(
                nodes, scored, score_col="score", threshold=args.threshold
            ),
            f"{root}/unlinkables",
        )
        edges = scored.where(F.col("score") >= args.threshold).select(
            F.col("rec_id_a").alias("src"), F.col("rec_id_b").alias("dst")
        )
        asg = assign_clusters(nodes, edges)
        write_table(cluster_graph_stats(asg, edges), f"{root}/cluster_graph")
        write_table(bridge_edges(edges, asg), f"{root}/bridge_edges")
        scored.unpersist()
        unl = spark.read.parquet(f"{root}/unlinkables")
        status_counts = {
            r["status"]: int(r["n"])
            for r in unl.groupBy("status").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        audit = {
            "unlinkable_status_counts": status_counts,
            "n_clusters": int(
                spark.read.parquet(f"{root}/cluster_graph").count()
            ),
            "n_bridges": int(
                spark.read.parquet(f"{root}/bridge_edges")
                .where(F.col("is_bridge"))
                .count()
            ),
        }

    # ---- input drift vs the model-fit baseline snapshot (opt-in)
    drift_psi = None
    if args.drift_baseline:
        from postal_address_spark.operators.drift import (
            psi_from_counts,
            snapshot_drift,
        )

        base_norm = normalize_mentions(
            extract_mentions(read_table(spark, args.drift_baseline))
        )
        drift = snapshot_drift(
            base_norm,
            norm,
            [
                ("city_name", "cat"),
                ("top_country", "cat"),
                ("postal_code", "len"),
                ("line1", "len"),
            ],
            top_n=20,
        )
        write_table(drift, f"{root}/drift")
        drift_psi = psi_from_counts(
            [
                (r["field"], r["bin"], r["n_prev"], r["n_curr"])
                for r in spark.read.parquet(f"{root}/drift").collect()
            ]
        )

    # ---- hot blocking keys (opt-in): the exact heavy-hitter table the
    # skew defenses are sized from, via the CMS two-pass path — the full
    # key population never shuffles (cms.py end-to-end-exactness grade).
    hot_keys = None
    if args.hot_keys:
        from postal_address_spark.operators.cms import heavy_hitters

        min_count = max(
            2, (int(n_mentions) * int(args.hot_keys)) // 1_000_000
        )
        hh = heavy_hitters(
            norm.where(F.col("block_key").isNotNull()),
            "block_key",
            min_count,
        )
        write_table(hh.orderBy(F.col("cnt").desc(), "value"),
                    f"{root}/hot_keys")
        hot_rows = spark.read.parquet(f"{root}/hot_keys").collect()
        hot_keys = {
            "min_count": min_count,
            "n_hot": len(hot_rows),
            "max_block": max((int(r["cnt"]) for r in hot_rows), default=0),
        }

    # ---- field-length quantile sketch (opt-in): a mergeable
    # (bucket, cnt) table per run; per-day tables fold by union+SUM.
    len_quantiles = None
    if args.len_sketch:
        from postal_address_spark.operators.qsketch import (
            qsketch,
            quantile_estimate,
        )

        s_bits = int(args.len_sketch)
        sk = qsketch(
            norm.select(F.length("line1").alias("line1_len")),
            "line1_len",
            s=s_bits,
        )
        write_table(sk.orderBy("bucket"), f"{root}/len_sketch")
        buckets = [
            (int(r["bucket"]), int(r["cnt"]))
            for r in spark.read.parquet(f"{root}/len_sketch").collect()
        ]
        # an all-NULL column writes an empty sketch — a legitimate
        # report outcome (like the zero-pair corpus above), not a crash
        len_quantiles = {"s": s_bits}
        if buckets:
            len_quantiles.update(
                {
                    f"p{int(q * 100)}": quantile_estimate(
                        buckets, q, s_bits
                    )
                    for q in (0.5, 0.95, 0.99)
                }
            )

    cov_rows = {
        r["rule"]: {
            "n_pairs": r["n_pairs"],
            "n_new_pairs": r["n_new_pairs"],
            "n_cumulative": r["n_cumulative"],
        }
        for r in spark.read.parquet(f"{root}/coverage").collect()
    }
    summary = {
        "input": args.input,
        "n_mentions": int(n_mentions),
        "coverage": cov_rows,
        "n_unblocked": int(spark.read.parquet(f"{root}/unblocked").count()),
        "fs_lambda": params.lam if params else None,
        "fs_prior_log2_odds": params.prior_log2_odds if params else None,
        # only set when save_params actually ran this run (fresh-fit mode)
        # — in --model mode the export is skipped, so the summary must not
        # point an orchestrator at a stale/absent file
        "model_json": model_json_written,
        "expectations": expect_results,
        "city_tf": {
            "n_values": int(spark.read.parquet(f"{root}/city_tf").count()),
            "n_total": n_total,
            "agree_mass_num": sum_sq,
        },
        "n_review_queue": int(
            spark.read.parquet(f"{root}/review_queue").count()
        ),
        "key_profile": {
            r["rule"]: {
                "n_keyed": int(r["n_keyed"]),
                "n_pairs": int(r["n_pairs"]),
                "max_block": int(r["max_block"]),
            }
            for r in spark.read.parquet(f"{root}/key_profile").collect()
        },
        "review_impact": impact,
        "cluster_audit": audit,
        "blocking_recall": recall_rows,
        "recommended_threshold": recommended,
        "drift_psi": drift_psi,
        "hot_keys": hot_keys,
        "len_quantiles": len_quantiles,
        "dup_estimate": dup_est,
        "labeled_mu": labeled_mu,
        "column_profile": {
            r["col_name"]: {
                "n_null": r["n_null"], "n_distinct": r["n_distinct"]
            }
            for r in spark.read.parquet(f"{root}/column_profile")
            .where(F.col("rank") == 1)
            .collect()
        },
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main(sys.argv[1:])
