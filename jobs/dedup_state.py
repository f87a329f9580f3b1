"""Dedup-index maintenance job: build / append / inspect the persisted
MinHash dedup state (operators/dedup_state.py) that
``jobs/curate.py --dedup-state`` probes.

    spark-submit --py-files engine.zip jobs/dedup_state.py \
        --state <index root> \
        (--build <corpus table> | --append <corpus table> | --status) \
        [--num-hashes 32] [--bands 8] [--shingle-n 3] [--seed 42]

``--build`` initializes (overwrites) the index from a reference dump;
``--append`` sketches another corpus with the index's PINNED parameters
and appends (the sketch flags are rejected here — parameters live with
the state so increments can never silently mix band spaces);
``--status`` prints the params plus per-table row counts.

The daily-crawl loop this enables::

    jobs/dedup_state.py --state s3://idx --build  <previous dump>
    jobs/curate.py      --dedup-state s3://idx --dedup-state-append ...
    jobs/curate.py      --dedup-state s3://idx --dedup-state-append ...
    ...

Each curate run drops near-copies of the dump AND of every earlier
increment, at O(increment) sketch cost.
"""
from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="postal-address-spark dedup-index maintenance job"
    )
    p.add_argument("--state", required=True, help="index root dir")
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--build", help="reference corpus (doc_id, text): "
                   "initialize the index (overwrites)")
    g.add_argument("--append", help="corpus (doc_id, text): sketch with "
                   "the index's pinned params and append")
    g.add_argument("--status", action="store_true",
                   help="print params + row counts")
    p.add_argument("--num-hashes", type=int, default=32)
    p.add_argument("--bands", type=int, default=8)
    p.add_argument("--shingle-n", type=int, default=3)
    p.add_argument("--seed", type=int, default=42)
    return p


def main(argv=None, spark=None) -> dict:
    args = build_parser().parse_args(argv)

    if spark is None:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("postal-address-dedup-state")
            .config("spark.sql.adaptive.enabled", "true")
            .getOrCreate()
        )

    from postal_address_spark.operators.dedup_state import (
        append_dedup_state,
        build_dedup_state,
        read_state_params,
    )
    from postal_address_spark.sources.io import read_table

    if args.build:
        ref = read_table(spark, args.build).select("doc_id", "text")
        params = build_dedup_state(
            ref, args.state,
            num_hashes=args.num_hashes, bands=args.bands,
            shingle_n=args.shingle_n, seed=args.seed,
        )
        summary = {
            "action": "build", "state": args.state, "source": args.build,
            "params": params, "n_docs": int(ref.count()),
        }
    elif args.append:
        inc = read_table(spark, args.append).select("doc_id", "text")
        params = append_dedup_state(inc, args.state)
        summary = {
            "action": "append", "state": args.state, "source": args.append,
            "params": params, "n_docs": int(inc.count()),
        }
    else:
        params = read_state_params(spark, args.state)
        root = args.state.rstrip("/")
        summary = {
            "action": "status", "state": args.state, "params": params,
            "n_band_rows": int(read_table(spark, f"{root}/bands").count()),
            "n_docs": int(
                read_table(spark, f"{root}/shingles")
                .select("doc_id").distinct().count()
            ),
        }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main(sys.argv[1:])
