"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set:
  * er_pipeline      — full record linkage (extract -> normalize -> block ->
                       salted pairs -> JW scoring -> large/small-star CC)
                       over a deterministic synthetic transcript table sized
                       to the sf tier (~10 turns/conv);
  * minhash_dedup    — MinHash+LSH near-dup over documents;
  * simhash_dedup    — SimHash near-dup over documents;
  * cosine_topk      — brute-force ANN baseline over embeddings;
  * lsh_ann          — LSH-bucketed ANN over embeddings;
  * text_analysis    — full text-analysis pass over documents;
  * q1 / nation_rev  — classic scan-agg and multi-join agg.

Also emits throughput fields for the ER pipeline (turns/sec, mentions/sec)
used by the N-vs-4N scaling report (scripts/scaling_bench.py).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SEED = 42

# conversations per sf so bench turns track the lineitem row count
_SF_CONVS = {"sf0.001": 700, "sf0.01": 7000, "sf0.1": 70000}


def _sf_tag() -> str:
    return os.path.basename(os.path.normpath(SF_DIR))


def build_session(cpus: int = CPUS):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("postal-address-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(2 * cpus, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "100000"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def run_er_pipeline(spark, n_convs: int, typo_prob: float = 0.15):
    """Returns (seconds, n_turns, n_mentions, n_clusters)."""
    from pyspark.sql import functions as F

    from postal_address_spark.plans.pipeline import LinkageConfig, run_linkage
    from postal_address_spark.synth import synth_transcripts_spark

    n_entities = max(n_convs // 4, 50)
    transcripts = synth_transcripts_spark(
        spark, seed=SEED, n_convs=n_convs, n_entities=n_entities,
        typo_prob=typo_prob,
    )
    # materialize input first so the measured window is pure pipeline work
    transcripts = transcripts.persist()
    n_turns = transcripts.count()
    started = time.time()
    # n_salt=64: the hot block's pair volume must fan out past 4N cores,
    # or the one hot key caps speedup at n_salt tasks.
    result = run_linkage(
        spark,
        transcripts,
        LinkageConfig(hot_threshold=5000, n_salt=64),
    )
    agg = result["clusters"].agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("cluster_id").alias("k"),
    ).collect()[0]
    seconds = time.time() - started
    transcripts.unpersist()
    # Drop every cached stage (run_linkage persists blocked/edges): the
    # CacheManager matches by canonicalized plan, so a repeat trial of the
    # identical pipeline would silently read run-1's cache and measure
    # nothing.  Each trial must pay the full pipeline.
    spark.catalog.clearCache()
    return seconds, n_turns, int(agg["n"]), int(agg["k"])


def main() -> None:
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod

    queries: dict[str, float] = {}
    extras: dict[str, float] = {}

    sf_tag = _sf_tag()
    n_convs = _SF_CONVS.get(sf_tag, 7000)

    # Warm-up: spin up the Arrow/pandas UDF worker pool + JIT the codegen
    # stages so the measured window reflects steady-state throughput, not
    # one-time process startup (scaling_bench.py does the same).
    run_er_pipeline(spark, 200)

    # Best-of-N everywhere: this box is a shared VM and tenant interference
    # is one-sided (it only ever slows a trial down), so the minimum over
    # repeats is the least-biased estimate of the engine's actual cost
    # (same estimator as BENCH/BASELINE.md's scaling trials).  Noise bursts
    # last tens of seconds and regularly swallow two back-to-back
    # measurements, so every query runs >= 3 trials and the PER-TRIAL
    # values ship in the JSON (`extras["<q>_trials"]`) so a reader can see
    # the spread, not just the minimum.
    reps = max(int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")), 1)
    er_trials = [run_er_pipeline(spark, n_convs) for _ in range(reps)]
    er_sec, n_turns, n_mentions, n_clusters = min(er_trials)
    queries["er_pipeline"] = round(er_sec, 3)
    extras["er_pipeline_trials"] = [round(t[0], 3) for t in er_trials]
    extras["er_turns"] = n_turns
    extras["er_mentions"] = n_mentions
    extras["er_clusters"] = n_clusters
    extras["er_turns_per_sec"] = round(n_turns / er_sec, 1)

    def timed(name: str, fn, n_reps: int = reps):
        trials, n = [], None
        for _ in range(n_reps):
            started = time.time()
            df = fn(spark, SF_DIR)
            n = df.count()
            trials.append(time.time() - started)
            # CacheManager matches by canonicalized plan: without this a
            # repeat trial of a query that persists anything internally
            # reads the previous trial's cache and measures nothing.
            spark.catalog.clearCache()
        queries[name] = round(min(trials), 3)
        extras[f"{name}_trials"] = [round(t, 3) for t in trials]
        extras[f"{name}_rows"] = n

    qmap = entrymod.queries()
    timed("minhash_dedup", qmap["minhash_near_dups"])
    timed("simhash_dedup", qmap["simhash_near_dups"])
    timed("cosine_topk", qmap["cosine_topk"])
    timed("lsh_ann", qmap["lsh_ann_topk"])
    timed("text_analysis", qmap["text_analysis"])
    timed("q1_pricing_summary", qmap["q1_pricing_summary"])
    timed("nation_revenue", qmap["nation_revenue"])

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf_tag,
                "cpus": CPUS,
                "trials_per_query": reps,
                "extras": extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
