"""Incremental linkage job — fold ONE new batch of transcripts into a
persistent linkage state (``spark-submit`` deploy surface).

Package the engine and submit per ingest batch::

    (cd /root/repo && zip -qr engine.zip postal_address_spark)
    spark-submit --py-files engine.zip jobs/link_incremental.py \
        --input <new-transcripts>  # parquet path or Iceberg table ref \
        --state <state-dir>        # persistent linkage state (see below) \
        [--output <clusters-out>]  # optionally materialize ALL labels \
        [--strict] [--threshold 0.82] [--hot-threshold 20000] \
        [--n-salt 16] [--postal-prefix-len N] [--n-pb 64]

    # GDPR unlink: remove mentions instead of folding a batch
    spark-submit --py-files engine.zip jobs/link_incremental.py \
        --retract <rec-ids-table> --state <state-dir> [--output ...]

The state dir holds four bucket-partitioned tables (``values``,
``clusters``, ``mention_map``, ``edges`` — plans/incremental.py); each submission
appends the batch's value nodes + mention map and dynamically overwrites
ONLY the ``pb`` partitions whose blocks the batch touched.  Labels after
every fold are identical to re-running ``jobs/link.py`` over the
concatenation of all batches (equivalence asserted in
tests/test_incremental.py).  ``--n-pb`` is pinned to the state dir by a
manifest written on the first fold; a later fold with a different value
is refused (it would prune to the wrong pb buckets and corrupt the state
silently).  State paths may be any Hadoop-FS URI (hdfs://, s3a://, local)
— all state metadata I/O goes through the cluster FileSystem.
"""
from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="postal-address-spark incremental linkage job"
    )
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--input", help="NEW batch of transcripts to fold in")
    g.add_argument(
        "--retract",
        help="instead of folding: parquet/Iceberg table of mention rec_ids "
        "to REMOVE (GDPR unlink) — labels afterwards equal a batch run "
        "over the survivors; requires a state whose folds logged edges",
    )
    p.add_argument("--state", required=True, help="persistent state dir")
    p.add_argument("--output", default=None,
                   help="optional: materialize all-batch mention labels here")
    p.add_argument("--strict", action="store_true")
    p.add_argument("--threshold", type=float, default=0.82)
    p.add_argument("--hot-threshold", type=int, default=20000)
    p.add_argument("--n-salt", type=int, default=16)
    p.add_argument("--postal-prefix-len", type=int, default=None)
    p.add_argument("--n-pb", type=int, default=64)
    p.add_argument(
        "--entities-state",
        default=None,
        help="optional durable entity-table dir (plans/incremental.py "
        "publish_entities): after the fold/retraction, carry the last "
        "published entity ids onto the new all-batch labels "
        "(stable_entity_ids; per-publish unique fresh prefix) and "
        "overwrite <dir>/entities + <dir>/by_record — the id surface "
        "downstream consumers key on across folds",
    )
    return p


def main(argv=None, spark=None) -> dict:
    args = build_parser().parse_args(argv)

    if spark is None:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("postal-address-linkage-incremental")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .getOrCreate()
        )

    from pyspark.sql import functions as F

    from postal_address_spark.plans.incremental import (
        IncrementalConfig,
        incremental_link,
        mention_clusters,
        retract_mentions,
    )
    from postal_address_spark.sources.io import read_table, write_table

    if args.retract:
        counts = retract_mentions(
            spark, read_table(spark, args.retract).select("rec_id"),
            args.state,
        )
        summary = {"retract": args.retract, "state": args.state, **counts}
    else:
        config = IncrementalConfig(
            strict=args.strict,
            threshold=args.threshold,
            hot_threshold=args.hot_threshold,
            n_salt=args.n_salt,
            postal_prefix_len=args.postal_prefix_len,
            n_pb=args.n_pb,
        )
        result = incremental_link(
            spark, read_table(spark, args.input), args.state, config
        )
        batch_agg = result["batch_labels"].agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("cluster_id").alias("k"),
        ).collect()[0]
        summary = {
            "input": args.input,
            "state": args.state,
            "batch_mentions": int(batch_agg["n"]),
            "batch_clusters": int(batch_agg["k"]),
            "touched_blocks": result["touched_blocks"].count(),
        }
    if args.entities_state:
        from postal_address_spark.plans.incremental import publish_entities

        summary["entities"] = publish_entities(
            spark, mention_clusters(spark, args.state), args.entities_state
        )
    if args.output:
        labels = mention_clusters(spark, args.state)
        write_table(labels, args.output)
        total = read_table(spark, args.output).agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("cluster_id").alias("k"),
        ).collect()[0]
        summary["output"] = args.output
        summary["total_mentions"] = int(total["n"])
        summary["total_clusters"] = int(total["k"])
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main(sys.argv[1:])
