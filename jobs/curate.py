"""Training-data curation job — the ``spark-submit`` deploy surface for
the corpus side of the engine, composing the document operators the same
way ``jobs/link.py`` composes the linkage ones:

    [input expectations (Deequ-style declarative checks, --expect)]
    -> exact dedup -> MinHash near-dedup -> quality gate
    -> [benchmark decontamination] -> [reference-corpus near-dedup:
        A x B MinHash vs the previous dump / eval set, --dedup-against]
    -> PII redaction -> deterministic split -> per-split parquet
    -> [token-budget sequence packing: per-split next-fit bin manifest
        for the training loader (operators/packing.py)]

Package the engine and submit::

    (cd /root/repo && zip -qr engine.zip postal_address_spark)
    spark-submit --py-files engine.zip jobs/curate.py \
        --input  <documents>      # parquet path or Iceberg table ref \
        --output-root <dir>       # writes <dir>/corpus + <dir>/rejected \
        [--near-dup-threshold 0.7] [--no-near-dup] [--no-redact] \
        [--min-tokens 5] [--max-tokens 5000] [--split-salt 2024] \
        [--decontaminate <benchmark table> [--contam-w 13] [--max-contam-pct 0]] \
        [--dedup-against <reference table> [--dedup-against-threshold 0.7]] \
        [--dedup-state <index root> [--dedup-state-append]] \
        [--expect <checks.json> [--expect-fail-hard]] \
        [--pack-budget <tokens> [--pack-shards 256]]

``--dedup-state`` is the incremental form of ``--dedup-against``: the
reference side is a persisted MinHash band index (init it once with
``jobs/dedup_state.py --build``), so each daily increment sketches only
itself, and ``--dedup-state-append`` folds the kept docs back into the
index for the next run — increment cost stays O(increment), never
O(reference corpus re-sketch).

No ``master`` is set — the cluster manager provides it.  The kept corpus
is written partitioned by ``split`` so downstream training readers prune
to their split at the parquet-listing level; rejected docs are written
WITH their firing rule names (reasons are data — the corpus report
aggregates them).

Every stage is the already-plan-audited operator: dedup shuffles a
128-bit content fingerprint (never the text), near-dup is banded LSH
(never all-pairs), the quality gate and redaction are pure codegen map
passes, and the split is a pure function of the id — so the job's cost
is a handful of linear passes plus two key-bounded shuffles at any
corpus size.
"""
from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="postal-address-spark corpus curation job")
    p.add_argument("--input", required=True, help="documents table (parquet path or iceberg ref)")
    p.add_argument("--output-root", required=True, help="destination dir: writes corpus/ + rejected/")
    p.add_argument("--near-dup-threshold", type=float, default=0.7)
    p.add_argument("--no-near-dup", action="store_true", help="skip MinHash near-dedup")
    p.add_argument("--no-redact", action="store_true", help="skip PII redaction")
    p.add_argument("--min-tokens", type=int, default=5)
    p.add_argument("--max-tokens", type=int, default=5000)
    p.add_argument("--split-salt", type=int, default=2024)
    p.add_argument("--pack-budget", type=int, default=0,
                   help="also write <output-root>/packed_manifest: the kept "
                   "docs packed next-fit into bins of at most this many "
                   "whitespace tokens, per split (operators/packing.py); "
                   "0 = off")
    p.add_argument("--pack-shards", type=int, default=256,
                   help="parallel packing shards (bins never span shards)")
    p.add_argument(
        "--decontaminate",
        help="benchmark/eval documents table: drop kept docs overlapping it "
        "at w-gram granularity (operators/spandup.py broadcast probe)",
    )
    p.add_argument(
        "--contam-w", type=int, default=13,
        help="span width in tokens for the decontamination probe "
        "(13 = the classic eval-overlap n-gram width)",
    )
    p.add_argument(
        "--max-contam-pct", type=int, default=0,
        help="drop a doc when contaminated-token cover exceeds this percent "
        "of its tokens; 0 (default) drops on ANY overlapping span",
    )
    p.add_argument(
        "--dedup-against",
        help="reference corpus table (doc_id, text): drop kept docs whose "
        "MinHash-verified Jaccard against ANY reference doc reaches the "
        "threshold (operators/dedup.cross_corpus_near_dups) — dedup a "
        "fresh crawl against the previous dump, or fuzzy decontamination "
        "where exact w-gram overlap misses edited copies",
    )
    p.add_argument(
        "--dedup-against-threshold", type=float, default=None,
        help="Jaccard threshold for --dedup-against / --dedup-state "
        "(default: --near-dup-threshold)",
    )
    p.add_argument(
        "--dedup-state",
        help="persisted MinHash dedup-index root "
        "(operators/dedup_state.py; init with jobs/dedup_state.py "
        "--build): like --dedup-against, but the reference side is the "
        "stored index — only THIS crawl increment is sketched, the "
        "reference corpus never re-reads.  Mutually exclusive with "
        "--dedup-against",
    )
    p.add_argument(
        "--dedup-state-append", action="store_true",
        help="after writing the kept corpus, append its documents to the "
        "--dedup-state index so the next increment dedups against the "
        "dump plus every prior increment (requires --dedup-state)",
    )
    p.add_argument(
        "--expect",
        help="JSON file with a list of expectation specs (Check kwargs: "
        "name/column/kind plus values/pattern/lo/hi/min_pass_num/"
        "min_pass_den) evaluated on the INPUT before any stage "
        "(operators/expectations.py); report written to "
        "<output-root>/expectations",
    )
    p.add_argument(
        "--expect-fail-hard", action="store_true",
        help="exit 3 when any expectation fails (orchestrator gate)",
    )
    return p


def main(argv=None, spark=None) -> dict:
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.dedup_against and args.dedup_state:
        parser.error("--dedup-against and --dedup-state are mutually "
                     "exclusive (the state root IS the reference)")
    if args.dedup_state_append and not args.dedup_state:
        parser.error("--dedup-state-append requires --dedup-state")

    if spark is None:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("postal-address-curation")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .getOrCreate()
        )

    from pyspark.sql import functions as F

    from postal_address_spark.operators.cluster import connected_components
    from postal_address_spark.operators.corpus import (
        quality_filter,
        with_dataset_split,
    )
    from postal_address_spark.operators.dedup import exact_dedup, minhash_dedup
    from postal_address_spark.operators.text_analysis import redact_pii
    from postal_address_spark.sources.io import read_table, write_table

    docs = read_table(spark, args.input)
    n_input = docs.count()

    # 0. declarative data-quality expectations on the raw input (Deequ
    # VerificationSuite shape): the report is written for the
    # orchestrator and, with --expect-fail-hard, a failing check aborts
    # the run BEFORE any compute is spent on a bad feed.
    expect_results = None
    if args.expect:
        from postal_address_spark.operators.expectations import (
            run_expectation_gate,
        )

        expect_results = run_expectation_gate(
            spark, docs, args.expect,
            f"{args.output_root.rstrip('/')}/expectations",
            fail_hard=args.expect_fail_hard,
        )

    # 1. exact dedup: one row per distinct text (min-id representative).
    reps = exact_dedup(docs).select(F.col("rep_id").alias("doc_id"))
    docs = docs.join(reps, "doc_id", "left_semi")

    # 2. near-dedup: verified MinHash pairs -> connected components ->
    #    keep each component's min id.  Pairs are banded-LSH candidates
    #    only, never all-pairs; the closure runs on the (tiny) dup graph.
    n_near_dropped = 0
    if not args.no_near_dup:
        pairs = minhash_dedup(docs, threshold=args.near_dup_threshold)
        # long ids go in as longs: the CC operator's greatest/least/min are
        # type-generic, and numeric order keeps "min id" meaning min id
        # (stringified ids would rank "10" < "9")
        edges = pairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        )
        comp = connected_components(edges)  # (rec_id, cluster_id)
        drop = comp.where(F.col("rec_id") != F.col("cluster_id")).select(
            F.col("rec_id").alias("doc_id")
        )
        n_near_dropped = drop.count()
        docs = docs.join(drop, "doc_id", "left_anti")

    # 3. quality gate: kept rows go on; rejected rows keep their reasons.
    # lang-aware: the corpus is multilingual, so the stopword rule judges
    # each row against its own language's markers (and abstains for
    # languages without a vendored list) instead of rejecting everything
    # non-English.
    gated = quality_filter(
        docs, min_tokens=args.min_tokens, max_tokens=args.max_tokens,
        lang_col="lang" if "lang" in docs.columns else None,
    )
    rejected = gated.where(~F.col("keep")).drop("keep")
    kept = gated.where(F.col("keep")).drop("keep", "reasons")

    # 3b. benchmark decontamination: drop kept docs whose w-gram overlap
    # with the eval set exceeds the threshold.  The benchmark side
    # broadcasts as a distinct gram-hash set, so this is one linear probe
    # of the kept corpus; the percent rule is an integer cross-multiplied
    # comparison (cover*100 > pct*n_tokens) — no float thresholds.
    n_contam_dropped = 0
    if args.decontaminate:
        from postal_address_spark.operators.spandup import contamination_stats

        bench = read_table(spark, args.decontaminate)
        stats = contamination_stats(kept, bench, w=args.contam_w)
        bad = stats.where(
            (F.col("n_tokens") > 0)
            & (
                F.col("contam_token_cover") * 100
                > F.lit(args.max_contam_pct) * F.col("n_tokens")
            )
        ).select("doc_id")
        contaminated = kept.join(bad, "doc_id", "left_semi").withColumn(
            "reasons", F.lit("benchmark_contamination")
        )
        n_contam_dropped = contaminated.count()
        rejected = rejected.unionByName(contaminated)
        kept = kept.join(bad, "doc_id", "left_anti")

    # 3c. reference-corpus near-dedup: drop kept docs that near-match the
    # previous dump / external reference (A x B MinHash banding + exact
    # Jaccard verify — never corpus x corpus here; ids only ride the LSH
    # and anti-join streams, the text never reshuffles).
    n_refdup_dropped = 0
    if args.dedup_against or args.dedup_state:
        thr = (
            args.dedup_against_threshold
            if args.dedup_against_threshold is not None
            else args.near_dup_threshold
        )
        if args.dedup_state:
            # incremental form: the reference side is the persisted band
            # index — only this increment sketches (dedup_state.py)
            from postal_address_spark.operators.dedup_state import (
                dedup_against_state,
            )

            pairs = dedup_against_state(kept, args.dedup_state, threshold=thr)
        else:
            from postal_address_spark.operators.dedup import (
                cross_corpus_near_dups,
            )

            ref = read_table(spark, args.dedup_against)
            pairs = cross_corpus_near_dups(kept, ref, threshold=thr)
        matched = pairs.select(F.col("id_a").alias("doc_id")).distinct()
        refdup = kept.join(matched, "doc_id", "left_semi").withColumn(
            "reasons", F.lit("reference_near_dup")
        )
        n_refdup_dropped = refdup.count()
        rejected = rejected.unionByName(refdup)
        kept = kept.join(matched, "doc_id", "left_anti")

    # 4. PII redaction (codegen regexp chain), in place on the text column.
    if not args.no_redact:
        kept = kept.withColumn("text", redact_pii(F.col("text")))

    # 5. deterministic split, then write partitioned by it.
    kept = with_dataset_split(kept, salt=args.split_salt)
    corpus_path = f"{args.output_root.rstrip('/')}/corpus"
    rejected_path = f"{args.output_root.rstrip('/')}/rejected"
    write_table(kept, corpus_path, partition_by=["split"])
    write_table(rejected, rejected_path)

    # 6. optional sequence packing of the kept corpus, split-pure (bins
    # can never mix splits — group_cols joins the shuffle key); manifest
    # carries ids + token counts only, text never enters the shuffle.
    pack_counts = None
    if args.pack_budget:
        from postal_address_spark.operators.packing import (
            bin_stats,
            pack_sequences,
        )

        tt = F.trim(F.coalesce(F.col("text"), F.lit("")))
        doc_tokens = kept.select(
            "doc_id",
            "split",
            F.when(tt == "", F.lit(0))
            .otherwise(F.size(F.split(tt, r"\s+")))
            .cast("long")
            .alias("n_tokens"),
        )
        packed = pack_sequences(
            doc_tokens,
            args.pack_budget,
            n_shards=args.pack_shards,
            seed=args.split_salt,
            group_cols=("split",),
        ).persist()
        pack_path = f"{args.output_root.rstrip('/')}/packed_manifest"
        write_table(packed, pack_path, partition_by=["split"])
        pack_counts = {
            "budget": args.pack_budget,
            "path": pack_path,
            "splits": {
                r["split"]: {
                    "n_bins": int(r["n_bins"]),
                    "n_docs": int(r["n_docs"]),
                    "total_tokens": int(r["total_tokens"]),
                    "n_oversize_bins": int(r["n_oversize_bins"]),
                    "utilization": (
                        round(float(r["utilization"]), 6)
                        if r["utilization"] is not None
                        else None
                    ),
                }
                for r in bin_stats(
                    packed, args.pack_budget, group_cols=("split",)
                ).collect()
            },
        }
        packed.unpersist()

    # 7. optional index append: make this increment part of the dedup
    # state so the NEXT crawl dedups against it too.  The payload is
    # RE-READ from the just-written corpus, never the lazy `kept` plan
    # (engine rule 10: the probe above reads the state dir lazily — an
    # append sourced from that plan would re-list the state mid-execution
    # and match every kept doc against itself).
    n_state_appended = None
    if args.dedup_state_append:
        from postal_address_spark.operators.dedup_state import (
            append_dedup_state,
        )

        written = spark.read.parquet(corpus_path).select("doc_id", "text")
        append_dedup_state(written, args.dedup_state)
        n_state_appended = written.count()

    out = spark.read.parquet(corpus_path)
    split_counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    reject_reasons = {
        r["reasons"]: r["n"]
        for r in spark.read.parquet(rejected_path)
        .groupBy("reasons").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    summary = {
        "input": args.input,
        "n_input": int(n_input),
        "n_near_dup_dropped": int(n_near_dropped),
        "n_contam_dropped": int(n_contam_dropped),
        "n_refdup_dropped": int(n_refdup_dropped),
        "n_kept": int(sum(split_counts.values())),
        "n_rejected": int(sum(reject_reasons.values())),
        "split_counts": split_counts,
        "reject_reasons": reject_reasons,
        "corpus": corpus_path,
        "rejected": rejected_path,
    }
    if pack_counts is not None:
        summary["packing"] = pack_counts
    if expect_results is not None:
        summary["expectations"] = expect_results
    if args.dedup_state:
        summary["dedup_state"] = {
            "root": args.dedup_state,
            "appended": (
                int(n_state_appended) if n_state_appended is not None else 0
            ),
        }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main(sys.argv[1:])
