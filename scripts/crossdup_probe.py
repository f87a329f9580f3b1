"""Scale evidence for cross_corpus_near_dups — rewrites BENCH/CROSSDUP.md.

Design claim (operators/dedup.py): the A x B MinHash path is LINEAR in
corpus size — each side pays one signature aggregation and one banding
pass, and the (band_idx, band_hash) equi-join's candidate volume is
bounded by genuine near-dup collisions (no all-pairs anywhere).  The
failure mode that claim could hide is a band-bucket collision storm
making the verify join quadratic in disguise.  This probe measures:

* **input-size linearity**: 4x documents (both sides) -> ~4x wall;
* **detection at scale**: planted edited copies (reference doc + 3
  appended words -> word-trigram Jaccard 28/31 ~ 0.90) are found at
  the 8x4-banding theoretical recall — per-pair miss probability
  (1 - 0.903^4)^8 ~ 1.6e-4, so the probe asserts recall >= 0.999 and
  REPORTS the exact found/planted counts (deterministic at the fixed
  seed; the driver gate's exact-equality grade lives at fixture scale
  where planted Jaccard is ~0.96 and the miss mass is ~1e-7/pair).

Synthetic input: 30 deterministic hash-derived words per doc over a
5000-word vocabulary — word-trigram shingles are then effectively
unique per doc, so organic cross-corpus matches are negligible and the
planted count dominates.

Usage: python scripts/crossdup_probe.py   # ~5 min on a quiet VM
Shared-VM discipline (CLAUDE.md): loadavg-gated, best-of-2,
clearCache between trials.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/BENCH/CROSSDUP.md"
N_BASE = 150_000
WORDS = 30
PLANT_EVERY = 10  # every 10th reference doc gets an edited copy in the crawl


def loadavg1() -> float:
    with open("/proc/loadavg") as fh:
        return float(fh.read().split()[0])


def wait_quiet(limit: float = 3.0, max_wait: int = 300) -> float:
    waited = 0
    while loadavg1() > limit and waited < max_wait:
        time.sleep(10)
        waited += 10
    return loadavg1()


def _text(id_col, n_words, salt):
    from pyspark.sql import functions as F

    return F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.conv(
                F.pmod(F.xxhash64(id_col, i, F.lit(salt)), F.lit(5000)),
                10, 36,
            ),
        ),
        " ",
    )


def corpora(spark, n_docs):
    """(crawl, reference): n_docs each side + n_docs/PLANT_EVERY edited
    reference copies in the crawl."""
    from pyspark.sql import functions as F

    ids = spark.range(n_docs, numPartitions=32)
    reference = ids.select(
        F.col("id").alias("doc_id"), _text(F.col("id"), WORDS, 1).alias("text")
    )
    unrelated = ids.select(
        F.col("id").alias("doc_id"), _text(F.col("id"), WORDS, 2).alias("text")
    )
    edited = (
        ids.where(F.pmod("id", F.lit(PLANT_EVERY)) == 0)
        .select(
            (F.col("id") + 2 * n_docs).alias("doc_id"),
            F.concat(
                _text(F.col("id"), WORDS, 1),
                F.lit(" "),
                _text(F.col("id"), 3, 3),
            ).alias("text"),
        )
    )
    return unrelated.unionByName(edited), reference


def trial(spark, n_docs):
    from pyspark.sql import functions as F

    from postal_address_spark.operators.dedup import cross_corpus_near_dups

    spark.catalog.clearCache()
    crawl, reference = corpora(spark, n_docs)
    t0 = time.monotonic()
    agg = (
        cross_corpus_near_dups(crawl, reference, threshold=0.5)
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum((F.col("id_a") >= 2 * n_docs).cast("long")).alias(
                "n_planted_found"
            ),
        )
        .collect()[0]
    )
    dt = time.monotonic() - t0
    return dt, int(agg["n_pairs"]), int(agg["n_planted_found"] or 0)


def best_of(spark, n_docs, k=2):
    best = counts = None
    loads = []
    for _ in range(k):
        loads.append(wait_quiet())
        dt, np_, nf = trial(spark, n_docs)
        if counts is not None:
            assert counts == (np_, nf), "nondeterministic output"
        counts = (np_, nf)
        best = dt if best is None else min(best, dt)
    return best, counts, loads


def main() -> None:
    from bench import build_session

    spark = build_session(32)
    spark.sparkContext.setLogLevel("ERROR")
    trial(spark, 5_000)  # warm-up

    results = {}
    for n in (N_BASE, 4 * N_BASE):
        best, (n_pairs, n_found), loads = best_of(spark, n)
        planted = (n + PLANT_EVERY - 1) // PLANT_EVERY
        n_rows = 2 * n + planted
        results[n] = {
            "docs_per_side": n,
            "total_doc_rows": n_rows,
            "pairs_found": n_pairs,
            "planted": planted,
            "planted_found": n_found,
            "wall_sec": round(best, 3),
            "docs_per_sec": round(n_rows / best),
            "recall_permille": round(1000 * n_found / planted, 2),
            "loadavg": loads,
        }
        # banding is probabilistic: assert the theoretical floor (miss
        # ~1.6e-4/pair at J~0.903 under 8x4 banding), not perfection
        assert n_found * 1000 >= planted * 999, (n_found, planted)
    lin = results[4 * N_BASE]["wall_sec"] / max(
        results[N_BASE]["wall_sec"], 1e-9
    )

    with open(OUT, "w", encoding="utf-8") as fh:
        fh.write(
            "# CROSSDUP — measured scale evidence for "
            "cross_corpus_near_dups\n\n"
            "Generated by `python scripts/crossdup_probe.py` (local[32], "
            "deterministic 30-word synthetic docs over a 5000-word "
            "vocabulary, an edited copy of every 10th reference doc "
            "planted in the crawl; best-of-2, loadavg-gated per "
            "CLAUDE.md).\n\n"
            "| docs/side | doc rows | pairs found | planted found / "
            "planted | recall | wall sec | docs/sec |\n"
            "|---|---|---|---|---|---|---|\n"
        )
        for n in (N_BASE, 4 * N_BASE):
            r = results[n]
            fh.write(
                f"| {r['docs_per_side']} | {r['total_doc_rows']} "
                f"| {r['pairs_found']} "
                f"| {r['planted_found']} / {r['planted']} "
                f"| {r['recall_permille'] / 10:.2f}% "
                f"| {r['wall_sec']} | {r['docs_per_sec']} |\n"
            )
        fh.write(
            f"\n**4x input -> {lin:.2f}x wall** (linear-regime claim: the "
            "banded A x B join's candidate volume tracks genuine "
            "near-dups, never all-pairs; planted recall at the 8x4 "
            "banding theory line — miss ~1.6e-4/pair at J~0.903 — and "
            "pair counts identical across trials).\n\n"
            "Per-trial 1-min loadavg at trial start: "
            f"{results[N_BASE]['loadavg']} / "
            f"{results[4 * N_BASE]['loadavg']}.\n"
        )
    print(f"wrote {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
