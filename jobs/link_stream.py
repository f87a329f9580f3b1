"""Streaming linkage job — drain newly-landed transcript files into the
persistent linkage state (``spark-submit`` deploy surface for
``streaming/link_stream.py``).

Run once per schedule tick (or wrap in a service loop)::

    (cd /root/repo && zip -qr engine.zip postal_address_spark)
    spark-submit --py-files engine.zip jobs/link_stream.py \
        --input <transcripts-dir>   # parquet dir new files land in \
        --state <state-dir>         # persistent linkage state \
        --checkpoint <ckpt-dir>     # stream checkpoint (one per state) \
        [--mentions] [--threshold 0.82] [--n-pb 64] \
        [--max-files-per-trigger 1]

Each invocation processes exactly the files the stream checkpoint has not
seen (availableNow trigger), folding one micro-batch at a time through
the incremental pipeline; epoch markers make micro-batch replays
idempotent, and labels after any number of invocations equal
``jobs/link.py`` over everything ingested (tests/test_link_stream.py).
``--mentions`` switches the source schema from transcript rows to
pre-extracted mention rows.
"""
from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="postal-address-spark streaming linkage job"
    )
    p.add_argument("--input", required=True, help="transcript parquet dir")
    p.add_argument("--state", required=True, help="persistent state dir")
    p.add_argument("--checkpoint", required=True,
                   help="stream checkpoint dir (exactly one per state dir)")
    p.add_argument("--mentions", action="store_true",
                   help="input rows are mentions, not transcripts")
    p.add_argument("--strict", action="store_true")
    p.add_argument("--threshold", type=float, default=0.82)
    p.add_argument("--hot-threshold", type=int, default=20000)
    p.add_argument("--n-salt", type=int, default=16)
    p.add_argument("--n-pb", type=int, default=64)
    p.add_argument("--max-files-per-trigger", type=int, default=1)
    return p


def main(argv=None, spark=None) -> dict:
    args = build_parser().parse_args(argv)

    if spark is None:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("postal-address-linkage-stream")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .getOrCreate()
        )

    from pyspark.sql import functions as F

    from postal_address_spark.plans.incremental import (
        IncrementalConfig,
        mention_clusters,
    )
    from postal_address_spark.streaming.ingest import TRANSCRIPT_DDL
    from postal_address_spark.streaming.link_stream import (
        MENTION_DDL,
        run_available,
    )

    config = IncrementalConfig(
        strict=args.strict,
        threshold=args.threshold,
        hot_threshold=args.hot_threshold,
        n_salt=args.n_salt,
        n_pb=args.n_pb,
    )
    n_folded = run_available(
        spark,
        args.input,
        args.state,
        args.checkpoint,
        config,
        schema=MENTION_DDL if args.mentions else TRANSCRIPT_DDL,
        transcripts=not args.mentions,
        max_files_per_trigger=args.max_files_per_trigger,
    )
    totals = mention_clusters(spark, args.state).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("cluster_id").alias("k"),
    ).collect()[0]
    summary = {
        "input": args.input,
        "state": args.state,
        "micro_batches_folded": int(n_folded),
        "total_mentions": int(totals["n"]),
        "total_clusters": int(totals["k"]),
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main(sys.argv[1:])
