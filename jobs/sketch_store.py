"""Corpus sketch-store job — the ``spark-submit`` deploy surface for the
mergeable-sketch operating model (operators/sketches.py, cms.py,
qsketch.py): reduce each ingest batch of a transcripts table to TINY
named sketch tables you store next to the data and FOLD later, instead
of re-scanning 100 TB every time someone asks "how many distinct
conversations so far", "which turn values are hot", or "what does the
length distribution look like".

Per run it writes, partitioned by ``--partition-col`` (one sketch per
partition value — the sketches' ``group_cols`` path, so it is still one
pass per sketch family):

* ``hll/``      — (part, register, max_rank): distinct-count sketch of
  ``--hll-col`` (default conv_id — distinct conversations per day);
* ``cms/``      — (part, d, bucket, cnt): frequency sketch of
  ``--cms-col`` (default role — the hot-key profile per day);
* ``len_sketch/`` — (part, bucket, cnt): quantile sketch of
  ``length(--len-col)`` (default text — the length distribution per day).

With ``--merge <root> [<root> ...]`` it ALSO folds the named prior
runs' sketch tables with this run's into ``merged/{hll,cms,len_sketch}``
— union + max/sum groupBys, associative and (for HLL) idempotent, so
daily sketch tables compose across files, days and retries without ever
touching the underlying corpora again.  The summary carries per-part and
merged HLL estimates plus merged length quantiles.

Package the engine and submit::

    (cd /root/repo && zip -qr engine.zip postal_address_spark)
    spark-submit --py-files engine.zip jobs/sketch_store.py \
        --input <transcripts> --output-root <dir> \
        [--partition-col day] [--hll-col conv_id] [--cms-col role] \
        [--len-col text] [--hll-p 12] [--cms-depth 4 --cms-width 2048] \
        [--len-s 5] [--merge <prior-root> ...]

Cost profile: three map-side-combinable aggregations over one scan
each; every shuffle is bounded by groups x sketch size (2^p registers /
depth*width cells / 63*2^s+1 buckets per partition value), never by the
corpus.  The merge stage reads only sketch tables.
"""
from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="postal-address-spark corpus sketch store"
    )
    p.add_argument("--input", required=True,
                   help="transcripts table (parquet path or iceberg ref)")
    p.add_argument("--output-root", required=True,
                   help="writes hll/ cms/ len_sketch/ [merged/*]")
    p.add_argument("--partition-col", default="day",
                   help="grouping column for per-partition sketches; "
                   "'day' (default) derives to_date(ts)")
    p.add_argument("--hll-col", default="conv_id")
    p.add_argument("--cms-col", default="role")
    p.add_argument("--len-col", default="text")
    p.add_argument("--hll-p", type=int, default=12)
    p.add_argument("--cms-depth", type=int, default=4)
    p.add_argument("--cms-width", type=int, default=2048)
    p.add_argument("--len-s", type=int, default=5)
    p.add_argument("--merge", nargs="*", default=None, metavar="ROOT",
                   help="prior sketch-store roots (same columns/params) "
                   "to fold with this run's tables into merged/")
    return p


def main(argv=None, spark=None) -> dict:
    args = build_parser().parse_args(argv)

    if spark is None:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("postal-address-sketch-store")
            .config("spark.sql.adaptive.enabled", "true")
            .getOrCreate()
        )

    from pyspark.sql import functions as F

    from postal_address_spark.operators.cms import cms_merge, cms_table
    from postal_address_spark.operators.qsketch import (
        qsketch,
        qsketch_merge,
        quantile_estimate,
    )
    from postal_address_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )
    from postal_address_spark.sources.io import read_table, write_table

    root = args.output_root.rstrip("/")
    part = args.partition_col
    base = read_table(spark, args.input)
    if part == "day" and "day" not in base.columns:
        base = base.withColumn("day", F.to_date("ts"))
    # one narrow projection per sketch family; parquet column pruning
    # keeps each scan at its own columns
    gcols = (part,)

    hll = hll_registers(
        base, args.hll_col, p=args.hll_p, group_cols=gcols
    )
    write_table(hll.orderBy(part, "register"), f"{root}/hll")

    cms = cms_table(
        base,
        args.cms_col,
        depth=args.cms_depth,
        width=args.cms_width,
        group_cols=gcols,
    )
    write_table(cms.orderBy(part, "d", "bucket"), f"{root}/cms")

    lens = base.select(
        part, F.length(args.len_col).alias("__len")
    )
    lsk = qsketch(lens, "__len", s=args.len_s, group_cols=gcols)
    write_table(lsk.orderBy(part, "bucket"), f"{root}/len_sketch")

    # per-partition HLL estimates from the written table
    by_part: dict = {}
    for r in spark.read.parquet(f"{root}/hll").collect():
        by_part.setdefault(str(r[part]), []).append(
            (r["register"], r["max_rank"])
        )
    estimates = {
        k: round(hll_estimate(v, p=args.hll_p), 1)
        for k, v in sorted(by_part.items())
    }

    merged_summary = None
    if args.merge is not None:
        roots = [r.rstrip("/") for r in args.merge] + [root]
        hlls = [spark.read.parquet(f"{r}/hll") for r in roots]
        cmss = [spark.read.parquet(f"{r}/cms") for r in roots]
        lsks = [spark.read.parquet(f"{r}/len_sketch") for r in roots]
        m_hll = hll_merge(*hlls, group_cols=gcols)
        m_cms = cms_merge(*cmss, group_cols=gcols)
        m_lsk = qsketch_merge(*lsks, group_cols=gcols)
        write_table(m_hll.orderBy(part, "register"), f"{root}/merged/hll")
        write_table(m_cms.orderBy(part, "d", "bucket"), f"{root}/merged/cms")
        write_table(
            m_lsk.orderBy(part, "bucket"), f"{root}/merged/len_sketch"
        )
        # global (all-partition) views: registers fold by max, buckets
        # by sum — the same algebra one more level up
        g_regs = [
            (r["register"], r["max_rank"])
            for r in m_hll.groupBy("register")
            .agg(F.max("max_rank").alias("max_rank"))
            .collect()
        ]
        g_buckets = [
            (r["bucket"], r["cnt"])
            for r in m_lsk.groupBy("bucket")
            .agg(F.sum("cnt").alias("cnt"))
            .collect()
        ]
        merged_summary = {
            "n_roots": len(roots),
            "global_hll_estimate": round(
                hll_estimate(g_regs, p=args.hll_p), 1
            ),
            # empty sketch (all-NULL length column) is a report outcome,
            # not a crash
            "global_len_quantiles": {
                f"p{int(q * 100)}": quantile_estimate(
                    g_buckets, q, args.len_s
                )
                for q in (0.5, 0.95, 0.99)
            }
            if g_buckets
            else None,
        }

    summary = {
        "input": args.input,
        "partition_col": part,
        "hll": {"col": args.hll_col, "p": args.hll_p,
                "estimates_by_part": estimates},
        "cms": {"col": args.cms_col, "depth": args.cms_depth,
                "width": args.cms_width},
        "len_sketch": {"col": args.len_col, "s": args.len_s},
        "merged": merged_summary,
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main(sys.argv[1:])
