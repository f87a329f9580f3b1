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


# This is a shared VM: tenant spikes (load ~20) inflate single trials
# 3-5x, and round 3's driver bench recorded 41.0 s for an engine that
# measures 18.5 s in a quiet window (VERDICT r3 "What's wrong" #2).
# Two defenses:
#   1. BEFORE any Spark work starts, wait (up to MAX_WAIT_SEC) for the
#      1-min loadavg to drop below MAX_START_LOAD — the r3 failure was
#      the driver launching the bench INTO a spike that outlasted the
#      whole best-of-3 window.  This is the only point where loadavg is
#      attributable: once trials run, the 1-min average is dominated by
#      our own local[32] bursts' decay tail, so waiting between trials
#      would mostly wait on ourselves.
#   2. EVERY trial stamps the loadavg it started under into extras
#      (`<q>_loadavg`), so a reader can discount loaded trials; best-of-N
#      then picks the quietest one.
MAX_START_LOAD = float(os.environ.get("SPARK_GRAFT_MAX_LOAD", "3.0"))
MAX_WAIT_SEC = float(os.environ.get("SPARK_GRAFT_LOAD_WAIT", "300"))


def _loadavg_1m() -> float:
    try:
        with open("/proc/loadavg") as fh:
            return float(fh.read().split()[0])
    except (OSError, ValueError):
        return -1.0


def _cpu_jiffies() -> tuple:
    """(steal, total) jiffies from /proc/stat — co-tenant CPU steal does
    NOT appear in loadavg (loadavg counts OUR runnable tasks), so a trial
    can read quiet while the hypervisor gives the VM a fraction of its
    cores; the per-trial steal share makes that poisoning diagnosable in
    the emitted JSON.  (-1, -1) when unreadable."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()[1:]
        vals = [int(x) for x in parts]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except (OSError, ValueError, IndexError):
        return -1, -1


class _StealMeter:
    """Steal share of total cpu time between start() and stop(), in %."""

    def start(self):
        self._s0, self._t0 = _cpu_jiffies()
        return self

    def stop(self) -> float:
        s1, t1 = _cpu_jiffies()
        if self._t0 < 0 or t1 <= self._t0:
            return -1.0
        return round(100.0 * (s1 - self._s0) / (t1 - self._t0), 2)


def _wait_for_quiet() -> float:
    """Blocks until the 1-min loadavg is below MAX_START_LOAD or the
    deadline passes; returns the loadavg the caller proceeds under."""
    load = _loadavg_1m()
    deadline = time.time() + MAX_WAIT_SEC
    while load > MAX_START_LOAD and time.time() < deadline:
        time.sleep(10)
        load = _loadavg_1m()
    return load


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
    start_load = _wait_for_quiet()
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod

    queries: dict[str, float] = {}
    extras: dict[str, float] = {}
    extras["start_loadavg_1m"] = round(start_load, 2)
    extras["max_start_load"] = MAX_START_LOAD

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
    # The headline query gets one extra trial: it runs FIRST (coldest JIT
    # tail) and carries most of the headline weight, and measured idle-VM
    # spread (8.8-11.7 s at sf0.1) is wide enough that best-of-3 can still
    # land ~30% above the engine's actual cost.
    er_trials, er_loads, er_steal = [], [], []
    for _ in range(reps + 1):
        er_loads.append(_loadavg_1m())
        meter = _StealMeter().start()
        er_trials.append(run_er_pipeline(spark, n_convs))
        er_steal.append(meter.stop())
    er_sec, n_turns, n_mentions, n_clusters = min(er_trials)
    queries["er_pipeline"] = round(er_sec, 3)
    extras["er_pipeline_trials"] = [round(t[0], 3) for t in er_trials]
    extras["er_pipeline_loadavg"] = [round(x, 2) for x in er_loads]
    extras["er_pipeline_steal_pct"] = er_steal
    extras["er_turns"] = n_turns
    extras["er_mentions"] = n_mentions
    extras["er_clusters"] = n_clusters
    extras["er_turns_per_sec"] = round(n_turns / er_sec, 1)

    def timed(name: str, fn, n_reps: int = reps):
        trials, loads, steals, n = [], [], [], None
        for _ in range(n_reps):
            loads.append(_loadavg_1m())
            meter = _StealMeter().start()
            started = time.time()
            df = fn(spark, SF_DIR)
            n = df.count()
            trials.append(time.time() - started)
            steals.append(meter.stop())
            # CacheManager matches by canonicalized plan: without this a
            # repeat trial of a query that persists anything internally
            # reads the previous trial's cache and measures nothing.
            spark.catalog.clearCache()
        queries[name] = round(min(trials), 3)
        extras[f"{name}_trials"] = [round(t, 3) for t in trials]
        extras[f"{name}_loadavg"] = [round(x, 2) for x in loads]
        extras[f"{name}_steal_pct"] = steals
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
