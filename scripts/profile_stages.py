"""Per-stage wall-time profile of the ER pipeline at one parallelism level.

Usage: python scripts/profile_stages.py <cpus> [n_convs]
Prints a JSON line of stage -> seconds so the N-vs-4N serial component can
be located (scaling work, BENCH/BASELINE.md).
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 120000

    from bench import build_session
    from pyspark.sql import functions as F

    from postal_address_spark.operators.blocking import with_block_key
    from postal_address_spark.operators.cluster import assign_clusters
    from postal_address_spark.operators.extract import extract_mentions
    from postal_address_spark.operators.normalize_op import normalize_mentions
    from postal_address_spark.operators.pairs import candidate_pairs
    from postal_address_spark.operators.scoring import score_pairs
    from postal_address_spark.synth import synth_transcripts_spark

    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: spin up every python worker + codegen before measuring
    from bench import run_er_pipeline
    run_er_pipeline(spark, 200)

    transcripts = synth_transcripts_spark(
        spark, seed=42, n_convs=n_convs, n_entities=max(n_convs // 4, 50)
    ).persist()
    n_turns = transcripts.count()

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def stage(name: str, df, persist: bool = True):
        started = time.time()
        if persist:
            df = df.persist()
        counts[name] = df.count()
        timings[name] = round(time.time() - started, 2)
        return df

    mentions = stage("extract", extract_mentions(transcripts))
    normalized = stage("normalize", normalize_mentions(mentions))
    blocked = stage("block", with_block_key(normalized, None))
    pairs = stage(
        "pairs", candidate_pairs(blocked, hot_threshold=5000, n_salt=64)
    )
    edges = stage("score", score_pairs(pairs))
    t0 = time.time()
    clusters = assign_clusters(
        blocked.where(F.col("block_key").isNotNull()),
        edges.select(F.col("rec_id_a").alias("src"), F.col("rec_id_b").alias("dst")),
    )
    counts["cluster"] = clusters.count()
    timings["cluster"] = round(time.time() - t0, 2)

    print(json.dumps({
        "cpus": cpus, "n_turns": n_turns,
        "timings": timings, "counts": counts,
        "total": round(sum(timings.values()), 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
