"""Transcript-ingest deploy job: drain turn arrival files into the
persistent per-conversation state (streaming/conv_stream.py), the
ingest front of the curation surface.

Designed to be invoked repeatedly (cron / daemon): each run drains
whatever files landed since the last one (availableNow trigger; the
stream checkpoint remembers which files are done, epoch markers make
micro-batch replays idempotent), merges them into the bucket-partitioned
conversation state, and prints a JSON summary.  Downstream, run
``jobs/curate_transcripts.py --input <state exploded>`` over
``state_to_turns`` output — or read the compacted fold directly with
``read_conversations`` — instead of re-folding the raw history.

    (zip -qr engine.zip postal_address_spark)
    spark-submit --py-files engine.zip jobs/ingest_transcripts.py \
        --input <arrival dir> --state <state dir> --checkpoint <dir> \
        --schema "conv_id long, turn_idx int, role string, text string" \
        [--conv-col conv_id] [--order-cols turn_idx] [--action-col role] \
        [--n-buckets 64] [--turns-output <dir>]

``--turns-output``: additionally materialize the compacted state as a
plain turn-row parquet (state_to_turns) for consumers that want a table,
not a state dir.
"""
from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="postal-address-spark transcript ingest (streaming fold)"
    )
    p.add_argument("--input", required=True, help="turn arrival directory")
    p.add_argument("--state", required=True, help="conversation state dir")
    p.add_argument("--checkpoint", required=True,
                   help="stream checkpoint dir (bound to the state dir on "
                   "first use; one checkpoint per state)")
    p.add_argument("--schema", required=True,
                   help="DDL of the arrival files, e.g. "
                   "'conv_id long, turn_idx int, role string'")
    p.add_argument("--conv-col", default="conv_id")
    p.add_argument("--order-cols", default="turn_idx",
                   help="comma-separated turn-order columns")
    p.add_argument("--action-col", default="role")
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--max-files-per-trigger", type=int, default=1)
    p.add_argument("--turns-output", default=None,
                   help="also write the compacted state as turn rows here")
    return p


def main(argv=None, spark=None) -> dict:
    args = build_parser().parse_args(argv)
    owns_session = spark is None
    if spark is None:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("postal-address-transcript-ingest")
            .config("spark.sql.adaptive.enabled", "true")
            .getOrCreate()
        )

    from pyspark.sql import functions as F

    from postal_address_spark.sources.io import write_table
    from postal_address_spark.streaming.conv_stream import (
        ConvStreamConfig,
        read_conversations,
        run_available,
        state_to_turns,
    )

    cfg = ConvStreamConfig(
        conv_col=args.conv_col,
        order_cols=tuple(
            c.strip() for c in args.order_cols.split(",") if c.strip()
        ),
        token_col=args.action_col,
        n_buckets=args.n_buckets,
    )
    n_epochs = run_available(
        spark, args.input, args.state, args.checkpoint, args.schema, cfg,
        max_files_per_trigger=args.max_files_per_trigger,
    )
    convs = read_conversations(spark, args.state, cfg)
    stats = convs.agg(
        F.count(F.lit(1)).alias("n_convs"),
        F.coalesce(F.sum("n_turns"), F.lit(0)).alias("n_turns"),
        F.coalesce(F.sum("n_total_turns"), F.lit(0)).alias("n_total_turns"),
    ).collect()[0]
    turns_path = None
    if args.turns_output:
        write_table(
            state_to_turns(spark, args.state, cfg), args.turns_output
        )
        turns_path = args.turns_output

    summary = {
        "input": args.input,
        "state": args.state,
        "n_epochs_folded": int(n_epochs),
        "n_convs": int(stats["n_convs"]),
        "n_tokenful_turns": int(stats["n_turns"]),
        "n_total_turns": int(stats["n_total_turns"]),
        "turns_output": turns_path,
    }
    print(json.dumps(summary))
    if owns_session:
        spark.stop()
    return summary


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
