"""Record-linkage job — the ``spark-submit`` deploy surface (north rule:
"run via spark-submit --py-files on a multi-executor cluster").

Package the engine and submit::

    (cd /root/repo && zip -qr engine.zip postal_address_spark)
    spark-submit --py-files engine.zip jobs/link.py \
        --input  <transcripts>   # parquet path or Iceberg table ref \
        --output <clusters-out>  # parquet path or Iceberg table ref \
        --checkpoint <dir>       # content-addressed stage checkpoints \
        [--strict] [--threshold 0.82] [--hot-threshold 20000] \
        [--n-salt 16] [--max-block-size N] [--postal-prefix-len N] \
        [--golden-output <goldens-out>]  # per-cluster survivorship records

No ``master`` is set here — the cluster manager provides it; running
locally (tests, smoke) inherits whatever session config the caller set.
The job is idempotent: re-submitting with the same input and checkpoint
root resumes after the last stage whose ``_SUCCESS`` marker exists and
produces byte-identical output (plans/pipeline.py).  Per-stage lineage
(fingerprint, rows, wall ms, resumed flag) lands in
``<checkpoint>/lineage.jsonl`` and is echoed to stdout as one JSON line.
"""
from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="postal-address-spark linkage job")
    p.add_argument("--input", required=True, help="transcripts table (parquet path or iceberg ref)")
    p.add_argument("--output", required=True, help="cluster table destination")
    p.add_argument("--checkpoint", default=None, help="stage checkpoint root (enables resume)")
    p.add_argument("--strict", action="store_true", help="strict normalize conflicts")
    p.add_argument("--threshold", type=float, default=0.82)
    p.add_argument("--hot-threshold", type=int, default=20000)
    p.add_argument("--n-salt", type=int, default=16)
    p.add_argument("--max-block-size", type=int, default=None)
    p.add_argument("--postal-prefix-len", type=int, default=None)
    p.add_argument(
        "--golden-output",
        default=None,
        help="optional destination for per-cluster golden records "
        "(survivorship: modal non-null value per field, min-rec_id "
        "representative — operators/survivorship.py)",
    )
    p.add_argument(
        "--entity-index-output",
        default=None,
        help="optional destination for the entity↔conversation index "
        "(per resolved entity its conversation footprint — "
        "operators/entity_index.py); writes <dir>/by_entity + <dir>/by_conv",
    )
    p.add_argument(
        "--entities-output",
        default=None,
        help="optional destination for the PUBLISHABLE entity table "
        "(operators/cluster.py stable_entity_ids): writes "
        "<dir>/entities (per-cluster: durable entity_id, overlap, "
        "inherited/contended/new status) and <dir>/by_record (rec_id -> "
        "entity_id — feed THIS path to the next run's "
        "--previous-entities to keep ids stable across relinks)",
    )
    p.add_argument(
        "--previous-entities",
        default=None,
        help="the last run's <entities-output>/by_record table; omit on "
        "the bootstrap run (every cluster then mints a fresh id)",
    )
    p.add_argument(
        "--entity-prefix",
        default=None,
        help="prefix for freshly minted entity ids; default "
        "'e<input-fingerprint[:8]>:' — unique per input snapshot, so "
        "fresh ids can never collide with ids inherited from earlier "
        "runs (same input re-run mints identical ids: idempotent)",
    )
    p.add_argument(
        "--cannot-links",
        default=None,
        help="optional table of clerical cannot-link pairs (rec ids in "
        "the first two columns): hard 'NOT the same entity' constraints "
        "enforced on the OUTPUT clustering (operators/constraints.py) — "
        "violated clusters are repaired by greedy constrained "
        "union-find; a cannot-link between two mentions that normalize "
        "to the IDENTICAL value tuple is unsatisfiable under the "
        "value-representative design and stays visible in the "
        "violations report",
    )
    p.add_argument(
        "--violations-output",
        default=None,
        help="optional destination for the pre-repair constraint-"
        "violation report (src, dst, cluster_id); requires "
        "--cannot-links",
    )
    p.add_argument(
        "--triplets-output",
        default=None,
        help="optional destination for matcher-training triplets "
        "(operators/triplets.py mine_triplets): per anchor VALUE "
        "representative its most-similar same-cluster candidate "
        "(positive) and most-similar cross-cluster candidate (hard "
        "negative), mined from a re-scored candidate pass at "
        "--triplet-floor so near-misses below the match threshold are "
        "visible",
    )
    p.add_argument(
        "--triplet-floor",
        type=float,
        default=None,
        help="score floor for the triplet-mining pass (default "
        "max(0, threshold - 0.2)); lower = deeper negatives, more "
        "kernel work",
    )
    p.add_argument(
        "--expect",
        help="JSON file with a list of expectation specs "
        "(operators/expectations.py Check kwargs) evaluated on the INPUT "
        "transcript table before any linkage stage; report written to "
        "<output>_expectations",
    )
    p.add_argument(
        "--expect-fail-hard", action="store_true",
        help="exit 3 when any expectation fails (orchestrator gate; "
        "no linkage compute is spent on a bad feed)",
    )
    return p


def main(argv=None, spark=None) -> dict:
    args = build_parser().parse_args(argv)

    if spark is None:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("postal-address-linkage")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .getOrCreate()
        )

    from postal_address_spark.plans.pipeline import LinkageConfig, run_linkage
    from postal_address_spark.sources.io import (
        input_snapshot_fingerprint,
        read_table,
        write_table,
    )

    transcripts = read_table(spark, args.input)

    # 0. declarative input expectations: catch a silently degraded feed
    # (dropped column, garbage codes, duplicated keys) BEFORE spending
    # blocking/scoring/closure compute on it.
    expect_results = None
    if args.expect:
        from postal_address_spark.operators.expectations import (
            run_expectation_gate,
        )

        expect_results = run_expectation_gate(
            spark, transcripts, args.expect,
            f"{args.output.rstrip('/')}_expectations",
            fail_hard=args.expect_fail_hard,
        )

    config = LinkageConfig(
        strict=args.strict,
        threshold=args.threshold,
        hot_threshold=args.hot_threshold,
        n_salt=args.n_salt,
        max_block_size=args.max_block_size,
        postal_prefix_len=args.postal_prefix_len,
        checkpoint_root=args.checkpoint,
        # content-addressed: same path + changed data -> new chain, full
        # recompute; stale stages can never be resumed.
        input_fingerprint=input_snapshot_fingerprint(spark, args.input),
    )
    result = run_linkage(spark, transcripts, config)

    clusters_out = result["clusters"]
    n_violations = n_violations_left = None
    if args.cannot_links:
        from pyspark.sql import functions as F

        from postal_address_spark.operators.constraints import (
            constrained_clusters,
            constraint_violations,
        )

        cl_pairs = read_table(spark, args.cannot_links)
        viol = constraint_violations(clusters_out, cl_pairs)
        if args.violations_output:
            write_table(viol, args.violations_output)
            n_violations = read_table(spark, args.violations_output).count()
        else:
            n_violations = viol.count()
        if n_violations:
            # repair at the VALUE level (rule 9: the graph the closure
            # actually ran on), then fan labels back to mentions
            blocked_ok = result["blocked"].where(
                F.col("block_key").isNotNull()
            )
            values = blocked_ok.where(F.col("rec_id") == F.col("val_id"))
            a, b = cl_pairs.columns[:2]
            v_map = blocked_ok.select("rec_id", "val_id")
            cl_vals = (
                cl_pairs.select(F.col(a).alias("_ra"), F.col(b).alias("_rb"))
                .join(
                    v_map.select(
                        F.col("rec_id").alias("_ra"),
                        F.col("val_id").alias("src"),
                    ),
                    "_ra",
                )
                .join(
                    v_map.select(
                        F.col("rec_id").alias("_rb"),
                        F.col("val_id").alias("dst"),
                    ),
                    "_rb",
                )
                .select("src", "dst")
            )
            val_asg = clusters_out.join(
                values.select("rec_id"), "rec_id"
            )
            repaired_vals = constrained_clusters(
                values.select("rec_id"),
                result["edges"].select(
                    F.col("rec_id_a").alias("src"),
                    F.col("rec_id_b").alias("dst"),
                    "score",
                ),
                cl_vals,
                assignments=val_asg,
                score="score",
            )
            clusters_out = v_map.join(
                repaired_vals.select(
                    F.col("rec_id").alias("val_id"),
                    F.col("cluster_id").alias("_c"),
                ),
                "val_id",
            ).select("rec_id", F.col("_c").alias("cluster_id"))
            # what remains violated is unsatisfiable (identical-value
            # pairs) or capped-out — honest in the summary
            n_violations_left = constraint_violations(
                clusters_out, cl_pairs
            ).count()

    write_table(clusters_out, args.output)

    n_golden = None
    if args.golden_output:
        from postal_address_spark.operators.survivorship import golden_records

        fields = ["line1", "line2", "postal_code", "city_name", "top_country"]
        records = clusters_out.join(
            result["blocked"].select("rec_id", *fields), "rec_id"
        )
        goldens = golden_records(records, fields=fields)
        write_table(goldens, args.golden_output)
        n_golden = read_table(spark, args.golden_output).count()

    entity_index_paths = None
    if args.entity_index_output:
        from postal_address_spark.operators.entity_index import (
            conversation_entities,
            entity_conversation_index,
        )

        mentions = result["mentions"]
        root = args.entity_index_output.rstrip("/")
        write_table(
            entity_conversation_index(mentions, clusters_out),
            f"{root}/by_entity",
        )
        write_table(
            conversation_entities(mentions, clusters_out),
            f"{root}/by_conv",
        )
        entity_index_paths = {
            "by_entity": f"{root}/by_entity",
            "by_conv": f"{root}/by_conv",
        }

    from pyspark.sql import functions as F

    entities_paths = None
    if args.entities_output:
        from postal_address_spark.operators.cluster import stable_entity_ids

        prefix = args.entity_prefix or f"e{config.input_fingerprint[:8]}:"
        if args.previous_entities:
            old = read_table(spark, args.previous_entities).select(
                "rec_id", "entity_id"
            )
        else:
            old = spark.createDataFrame(
                [], "rec_id string, entity_id string"
            )
        ents = stable_entity_ids(
            old, clusters_out, fresh_prefix=prefix
        )
        eroot = args.entities_output.rstrip("/")
        write_table(ents, f"{eroot}/entities")
        # the record-level assignment is what the NEXT run consumes
        by_record = clusters_out.join(
            read_table(spark, f"{eroot}/entities").select(
                "cluster_id", "entity_id"
            ),
            "cluster_id",
        ).select("rec_id", "entity_id")
        write_table(by_record, f"{eroot}/by_record")
        entities_paths = {
            "entities": f"{eroot}/entities",
            "by_record": f"{eroot}/by_record",
        }

    n_triplets = None
    if args.triplets_output:
        from postal_address_spark.operators.pairs import candidate_pairs
        from postal_address_spark.operators.scoring import score_pairs
        from postal_address_spark.operators.triplets import mine_triplets

        floor = (
            args.triplet_floor
            if args.triplet_floor is not None
            else max(0.0, args.threshold - 0.2)
        )
        # re-scored pass at the mining floor: the pipeline's edge stage
        # keeps only score >= threshold, but hard negatives are exactly
        # the pairs just UNDER it.  Candidate generation at the floor
        # keeps the (block, house-number) refinement recall-lossless at
        # that depth; anchors are value representatives (rule 9 — score
        # values, not mentions).
        values = result["blocked"].where(F.col("rec_id") == F.col("val_id"))
        cand = candidate_pairs(
            values,
            hot_threshold=args.hot_threshold,
            n_salt=args.n_salt,
            max_block_size=args.max_block_size,
            threshold=floor,
        )
        scored = score_pairs(cand, threshold=floor)
        triplets = mine_triplets(
            scored.select(
                "rec_id_a", "rec_id_b", (-F.col("score")).alias("dist")
            ),
            clusters_out,
        ).select(
            "rec_id",
            "cluster_id",
            "pos_id",
            (-F.col("pos_dist")).alias("pos_score"),
            "neg_id",
            (-F.col("neg_dist")).alias("neg_score"),
        )
        write_table(triplets, args.triplets_output)
        n_triplets = read_table(spark, args.triplets_output).count()

    # Summarize from the just-written output: a plain parquet scan, never a
    # recompute of the cluster stage (and correct on fully-resumed runs).
    agg = read_table(spark, args.output).agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.countDistinct("cluster_id").alias("n_clusters"),
    ).collect()[0]
    # Observed metrics only exist for stages whose action actually ran this
    # submission; a resumed stage's metrics are marked, not silently absent.
    metrics = {name: obs.get for name, obs in result["observations"].items()}
    for record in result["lineage"]:
        if record.get("resumed") and record["stage"] not in metrics:
            metrics[record["stage"]] = "resumed"
    summary = {
        "input": args.input,
        "input_fingerprint": config.input_fingerprint,
        "output": args.output,
        "n_mentions": int(agg["n_mentions"]),
        "n_clusters": int(agg["n_clusters"]),
        "stages": result["lineage"],
        "metrics": metrics,
    }
    if n_golden is not None:
        summary["golden_output"] = args.golden_output
        summary["n_golden"] = int(n_golden)
    if entity_index_paths is not None:
        summary["entity_index"] = entity_index_paths
    if entities_paths is not None:
        summary["entities"] = entities_paths
    if n_violations is not None:
        summary["n_cannot_link_violations"] = int(n_violations)
        if n_violations_left is not None:
            summary["n_violations_unresolvable"] = int(n_violations_left)
        if args.violations_output:
            summary["violations_output"] = args.violations_output
    if n_triplets is not None:
        summary["triplets_output"] = args.triplets_output
        summary["n_triplets"] = int(n_triplets)
    if expect_results is not None:
        summary["expectations"] = expect_results
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main(sys.argv[1:])
