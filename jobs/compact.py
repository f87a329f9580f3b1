"""Table-maintenance job: small-file compaction with optional
range-sorted layout — the OPTIMIZE / rewrite-data-files shape every
long-running table needs (Iceberg's rewriteDataFiles, Delta's OPTIMIZE
... ZORDER's little sibling).

Why it exists at 100 TB: streaming ingest (jobs/ingest_transcripts.py),
incremental linkage state and per-run report tables all accrete files
per micro-batch / per run; thousands of KB-scale files turn every scan
into a listing+open storm and defeat row-group pruning.  Compaction
rewrites a table to ~target-sized files, and ``--sort-by`` lays rows out
range-partitioned + sorted so per-file min/max statistics prune scans on
the sort key (verified by the disjoint-range pytest).

    spark-submit --py-files engine.zip jobs/compact.py \
        --input <table> --output <table> \
        [--target-file-mb 256] [--sort-by conv_id,turn_idx] \
        [--partition-by split]

The file-count target derives from the INPUT's real byte size (one
driver-side listing, no data IO — the fingerprint helper's listing), so
the job needs no cluster-size tuning; rows are bit-identical in/out
(count-verified in the summary).  Output goes to a NEW location —
in-place rewrites of a live table are an Iceberg-transaction concern,
not a parquet-path one (honest limitation, documented).
"""
from __future__ import annotations

import argparse
import json
import math
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="postal-address-spark table compaction job"
    )
    p.add_argument("--input", required=True,
                   help="source table (parquet path or iceberg ref)")
    p.add_argument("--output", required=True,
                   help="destination (must differ from --input)")
    p.add_argument("--target-file-mb", type=int, default=256,
                   help="target output file size in MiB (default 256)")
    p.add_argument("--sort-by", default=None,
                   help="comma-separated columns: range-partition + sort "
                   "within files so per-file min/max stats prune scans "
                   "on these columns")
    p.add_argument("--partition-by", default=None,
                   help="comma-separated partition columns for the "
                   "output layout")
    return p


def list_file_bytes(spark, path: str):
    """(n_files, total_bytes) from one driver-side metadata read — the
    same statistics Spark's scan planning uses, no data IO.

    Iceberg catalog refs read the table's own ``.files`` metadata table
    (file count + file_size_in_bytes); parquet paths do a recursive
    Hadoop filesystem listing."""
    from postal_address_spark.sources.io import _iceberg_catalog

    if _iceberg_catalog(spark, path):
        row = spark.sql(
            f"SELECT COUNT(*) AS n, "
            f"COALESCE(SUM(file_size_in_bytes), 0) AS total "
            f"FROM {path}.files"
        ).collect()[0]
        return int(row["n"]), int(row["total"])
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(hconf)
    n, total = 0, 0
    it = fs.listFiles(root, True)
    while it.hasNext():
        status = it.next()
        name = status.getPath().toString().rsplit("/", 1)[-1]
        if name.startswith("_") or name.startswith("."):
            continue
        n += 1
        total += status.getLen()
    return n, total


def main(argv=None, spark=None) -> dict:
    args = build_parser().parse_args(argv)
    if args.output.rstrip("/") == args.input.rstrip("/"):
        raise SystemExit("--output must differ from --input (no in-place "
                         "rewrite on parquet paths)")

    if spark is None:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("postal-address-compaction")
            .config("spark.sql.adaptive.enabled", "true")
            .getOrCreate()
        )

    from postal_address_spark.sources.io import read_table, write_table

    df = read_table(spark, args.input)
    n_rows_in = df.count()
    n_files_in, n_bytes = list_file_bytes(spark, args.input)
    target = max(
        1, math.ceil(n_bytes / (args.target_file_mb * 1024 * 1024))
    )

    sort_cols = [c.strip() for c in (args.sort_by or "").split(",")
                 if c.strip()]
    if sort_cols:
        # range partitioning gives files DISJOINT key ranges (up to
        # boundary sampling), so parquet footer min/max prunes whole
        # files for point/range predicates on the sort key
        out = df.repartitionByRange(target, *sort_cols)
        out = out.sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(target)

    part_cols = [c.strip() for c in (args.partition_by or "").split(",")
                 if c.strip()]
    write_table(out, args.output, partition_by=part_cols or None)

    n_rows_out = read_table(spark, args.output).count()
    n_files_out, n_bytes_out = list_file_bytes(spark, args.output)
    if n_rows_out != n_rows_in:
        raise SystemExit(
            f"row count changed during compaction: {n_rows_in} -> "
            f"{n_rows_out}"
        )
    summary = {
        "input": args.input,
        "output": args.output,
        "n_rows": int(n_rows_in),
        "files_in": int(n_files_in),
        "files_out": int(n_files_out),
        "bytes_in": int(n_bytes),
        "bytes_out": int(n_bytes_out),
        "target_files": int(target),
        "sort_by": sort_cols or None,
        "partition_by": part_cols or None,
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main(sys.argv[1:])
