"""Scale evidence for the weighted-cosine AllPairs join — rewrites
BENCH/WCOS.md.

Claims under test (operators/wcos.py):

* **pruning**: the L2 prefix filter's candidate volume is a small
  fraction of the all-shared-token pair volume a brute-force inverted
  index would verify (sum over tokens of C(df, 2)) — and the PRUNED run
  still returns the identical pair set (counted + checksummed against
  the brute-force verify run, the recall-losslessness claim measured,
  not just proved);
* **scale**: growing the corpus 4x moves the prefix-filtered wall far
  less than the ~16x a quadratic candidate stage would cost.

Synthetic corpus: seeded two-zone docs — a Zipf-ish shared vocabulary
(stop tokens every doc shares) plus per-doc rare tokens, with 2% planted
near-duplicates so the threshold band is populated.  Deterministic; no
external data.

Usage: python scripts/wcos_probe.py   # ~5 min on a quiet VM
Shared-VM discipline (CLAUDE.md): loadavg-gated, best-of-2,
clearCache between trials.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/BENCH/WCOS.md"
N_SMALL = 10_000
N_BIG = 40_000
TAU = (8, 10)


def loadavg1() -> float:
    with open("/proc/loadavg") as fh:
        return float(fh.read().split()[0])


def wait_quiet(limit: float = 3.0, max_wait: int = 300) -> float:
    waited = 0
    while loadavg1() > limit and waited < max_wait:
        time.sleep(10)
        waited += 10
    return loadavg1()


def corpus(spark, n_docs: int):
    """Deterministic docs: 12 shared Zipf tokens + 8 rare tokens drawn
    from a pool of n_docs/2 (so rare tokens repeat ~16x), + 2% planted
    near-dups (same rare tokens as their source, one extra token)."""
    from pyspark.sql import functions as F

    base = spark.range(n_docs, numPartitions=32).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            # shared zone: token s{k} appears in ~1/(k+1) of docs
            *[
                F.when(F.pmod(F.col("id"), F.lit(k + 1)) == 0, f"s{k}")
                for k in range(12)
            ],
            # rare zone: 8 tokens from a pool of n/2
            *[
                F.concat(
                    F.lit(f"r{j}_"),
                    F.pmod(
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat(
                                        F.lit(str(j)),
                                        F.col("id").cast("string"),
                                    )
                                ),
                                1,
                                7,
                            ),
                            16,
                            10,
                        ).cast("long"),
                        F.lit(n_docs // 2),
                    ).cast("string"),
                )
                for j in range(8)
            ],
        ).alias("text"),
    )
    dups = (
        base.where(F.pmod("doc_id", F.lit(50)) == 0)
        .select(
            (F.col("doc_id") + n_docs).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra")).alias("text"),
        )
    )
    return base.unionByName(dups)


def main() -> None:
    from pyspark.sql import functions as F

    from bench import build_session
    from postal_address_spark.operators.wcos import (
        prefix_candidates,
        weighted_cosine_pairs,
        weighted_token_relation,
    )

    spark = build_session(32)
    spark.sparkContext.setLogLevel("ERROR")
    results: dict = {"tau": f"{TAU[0]}/{TAU[1]}"}

    def checksum(df):
        # xor-fold of row hashes: order-insensitive and overflow-free
        # (ANSI mode rejects a SUM that wraps)
        return df.select(
            F.xxhash64("doc_a", "doc_b", "dot").alias("rh")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(rh)").alias("h"),
        ).collect()[0]

    for label, n in (("small", N_SMALL), ("big", N_BIG)):
        docs = corpus(spark, n).persist()
        n_rows = docs.count()

        # candidate-volume accounting on the production token relation
        tw = weighted_token_relation(docs, "text", "doc_id")
        tw.count()
        brute_pairs = tw.groupBy("token").agg(
            F.count(F.lit(1)).alias("df")
        ).agg(
            F.sum(F.expr("df * (df - 1) div 2")).alias("p")
        ).collect()[0]["p"]
        cand, _ = prefix_candidates(tw, *TAU)
        n_cand = cand.count()

        best = None
        for _ in range(2):
            wait_quiet()
            spark.catalog.clearCache()
            t0 = time.monotonic()
            out = weighted_cosine_pairs(
                docs, "text", "doc_id", tau_num=TAU[0], tau_den=TAU[1]
            )
            cs = checksum(out)
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        results[label] = {
            "n_docs": n_rows,
            "wall_sec": round(best, 3),
            "pairs_out": int(cs["n"]),
            "checksum": int(cs["h"]) if cs["h"] is not None else 0,
            "all_shared_token_pairs": int(brute_pairs),
            "prefix_candidates": int(n_cand),
            "prune_factor": round(brute_pairs / max(n_cand, 1), 1),
            "loadavg": loadavg1(),
        }
        docs.unpersist()
        spark.catalog.clearCache()

    # recall check at the small size: verify EVERY shared-token pair
    # (no prefix filter) and compare count + checksum
    docs = corpus(spark, N_SMALL).persist()
    docs.count()
    wait_quiet()
    t0 = time.monotonic()
    tw = weighted_token_relation(docs, "text", "doc_id")
    a = tw.select(F.col("doc_id").alias("doc_a"), "token",
                  F.col("w").alias("wa"))
    b = tw.select(F.col("doc_id").alias("doc_b"), "token",
                  F.col("w").alias("wb"))
    dots = (
        a.join(b, "token")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    norms = tw.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("norm2"))
    na = norms.select(F.col("doc_id").alias("doc_a"),
                      F.col("norm2").alias("norm2_a"))
    nb = norms.select(F.col("doc_id").alias("doc_b"),
                      F.col("norm2").alias("norm2_b"))
    dec = "decimal(38,0)"
    brute = (
        dots.join(na, "doc_a").join(nb, "doc_b")
        .where(
            F.col("dot").cast(dec) * F.col("dot").cast(dec)
            * F.lit(TAU[1] * TAU[1]).cast(dec)
            >= F.col("norm2_a").cast(dec) * F.col("norm2_b").cast(dec)
            * F.lit(TAU[0] * TAU[0]).cast(dec)
        )
    )
    bcs = checksum(brute)
    brute_wall = time.monotonic() - t0
    results["brute_force_small"] = {
        "wall_sec": round(brute_wall, 3),
        "pairs_out": int(bcs["n"]),
        "checksum": int(bcs["h"]) if bcs["h"] is not None else 0,
    }
    s = results["small"]
    match = (
        s["pairs_out"] == results["brute_force_small"]["pairs_out"]
        and s["checksum"] == results["brute_force_small"]["checksum"]
    )
    results["recall_lossless_measured"] = bool(match)

    sm, bg = results["small"], results["big"]
    with open(OUT, "w", encoding="utf-8") as fh:
        fh.write(
            "# WCOS — measured pruning + scale of the weighted-cosine "
            "AllPairs join\n\n"
            "Generated by `python scripts/wcos_probe.py` (local[32], "
            f"tau = {TAU[0]}/{TAU[1]}, seeded two-zone corpus with 2% "
            "planted near-dups; best-of-2, loadavg-gated per "
            "CLAUDE.md).\n\n"
            "| corpus | wall sec | pairs out | shared-token pairs "
            "(brute candidates) | prefix candidates | prune factor |\n"
            "|---|---|---|---|---|---|\n"
        )
        for lab, r in (("small", sm), ("big", bg)):
            fh.write(
                f"| {r['n_docs']:,} docs | {r['wall_sec']} | "
                f"{r['pairs_out']:,} | {r['all_shared_token_pairs']:,} | "
                f"{r['prefix_candidates']:,} | {r['prune_factor']}x |\n"
            )
        ratio = bg["wall_sec"] / sm["wall_sec"]
        fh.write(
            f"\n4x docs moves wall {sm['wall_sec']}s -> {bg['wall_sec']}s "
            f"({ratio:.1f}x; a quadratic candidate stage would pay "
            f"{bg['all_shared_token_pairs'] / sm['all_shared_token_pairs']:.0f}x "
            "in candidate volume alone).\n\n"
            "**Recall-losslessness, measured**: verifying EVERY "
            "shared-token pair (no prefix filter) at the small size "
            f"returns {results['brute_force_small']['pairs_out']:,} pairs "
            f"in {results['brute_force_small']['wall_sec']}s — "
            f"{'IDENTICAL set (count + xxhash64 checksum match)' if match else 'MISMATCH (bug!)'} "
            f"vs the pruned run's {sm['pairs_out']:,} in "
            f"{sm['wall_sec']}s.\n\n"
            "```json\n" + json.dumps(results, indent=1) + "\n```\n"
        )
    print(f"wrote {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
