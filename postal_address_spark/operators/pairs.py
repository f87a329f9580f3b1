"""Candidate-pair generation: blocked self-join with explicit hot-block
salting (the north rule's "salted-key skew mitigation on hot blocks").

Two routes, unioned:

* normal blocks -> plain equi self-join on ``block_key``;
* hot blocks (size > ``hot_threshold``, measured by an aggregation over the
  same DataFrame) -> the join key is widened to ``(block_key, salt)``:
  the left side gets ``salt = pmod(xxhash64(rec_id), n_salt)``, the right
  side is exploded over all ``n_salt`` salts, so each of the inherent
  n² within-block pairs is produced exactly once while the shuffle key
  fans out s-fold (per-task build side shrinks from n to n/s).

AQE's skew-join splitting stays on as a second line of defense
(spark.sql.adaptive.skewJoin.enabled); the explicit salt is the
deterministic guarantee for the one pathological key AQE statistics can
miss at plan time.

``rec_id_a < rec_id_b`` halves the pair space and removes self-pairs
(SURVEY §2.B "equi self-join").
"""
from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .scoring import W_CITY, W_LINE1, W_POSTAL

# Columns the scorer needs from each side — nothing more rides the pair
# shuffle (every surplus column is ~50 bytes x 2 sides x pair count of
# wasted shuffle IO).
PAIR_FIELDS = ["rec_id", "line1", "city_name", "postal_code"]

# A scoring threshold above this bound makes primary-number agreement a
# NECESSARY condition for a match edge (scoring.py weights: with
# s_housenum = 0, the maximum reachable score is W_POSTAL+W_LINE1+W_CITY),
# so joining on (block_key, primary_number) instead of block_key alone is
# exactly recall-preserving — the classic multi-pass-blocking move that
# turns one hot postal block of n mentions from n^2/2 pairs into ~n^2/(2k)
# over k distinct house numbers.
REFINE_SAFE_THRESHOLD = W_POSTAL + W_LINE1 + W_CITY


def _sided(df: DataFrame, side: str, extra: Optional[List[str]] = None) -> DataFrame:
    cols = [F.col("join_key")] + [
        F.col(c).alias(f"{c}_{side}") for c in PAIR_FIELDS + (extra or [])
    ]
    return df.select(*cols)


def candidate_pairs(
    blocked: DataFrame,
    hot_threshold: int = 20000,
    n_salt: int = 16,
    max_block_size: Optional[int] = None,
    threshold: float = 0.82,
) -> DataFrame:
    """blocked mentions (block_key non-null) -> candidate pair rows.

    Output: block_key, <field>_a, <field>_b for each PAIR_FIELDS entry.

    When ``threshold > REFINE_SAFE_THRESHOLD`` the self-join key is refined
    from ``block_key`` to ``(block_key, primary house number)`` — provably
    recall-lossless under the scoring weights (see REFINE_SAFE_THRESHOLD)
    and the difference between a quadratic hot block and linear work.  The
    hot-block histogram / salting machinery operates on the REFINED key, so
    it still guards keys that stay hot after refinement (many mentions of
    one building, or no house number at all).

    ``max_block_size`` is the production guardrail for degenerate keys
    (e.g. a junk postal shared by millions of rows): blocks above the cap
    are *excluded from pairing entirely* — within-block pair count is
    inherently quadratic, and an unlinkable junk key would otherwise own
    the job's runtime.  Dropped rows stay in the output of the blocking
    stage (they simply form singleton clusters); the drop is observable
    via the block histogram.
    """
    blocked = blocked.where(F.col("block_key").isNotNull())
    if threshold > REFINE_SAFE_THRESHOLD:
        # '' for no-number matches the scorer's both-missing-agree rule;
        # one-sided numbers can never pair above threshold anyway.
        join_key = F.concat_ws(
            "#", F.col("block_key"),
            F.coalesce(F.regexp_extract("line1", r"^(\d+)", 1), F.lit("")),
        )
    else:
        join_key = F.col("block_key")
    blocked = blocked.withColumn("join_key", join_key)

    histogram = blocked.groupBy("join_key").agg(
        F.count(F.lit(1)).alias("block_n")
    )
    if max_block_size is not None:
        oversized = histogram.where(F.col("block_n") > max_block_size).select(
            "join_key"
        )
        blocked = blocked.join(F.broadcast(oversized), "join_key", "left_anti")
        histogram = histogram.where(F.col("block_n") <= max_block_size)

    hot_keys = (
        histogram.where(F.col("block_n") > hot_threshold)
        .select("join_key")
        .withColumn("__hot", F.lit(True))
    )
    # block histogram is tiny after the aggregation -> broadcast the flag.
    flagged = blocked.join(F.broadcast(hot_keys), "join_key", "left")

    normal = flagged.where(F.col("__hot").isNull()).drop("__hot")
    hot = flagged.where(F.col("__hot").isNotNull()).drop("__hot")

    pairs_normal = (
        _sided(normal, "a", extra=["block_key"])
        .join(_sided(normal, "b"), on="join_key")
        .where(F.col("rec_id_a") < F.col("rec_id_b"))
    )

    left = _sided(hot, "a", extra=["block_key"]).withColumn(
        "salt", F.pmod(F.xxhash64("rec_id_a"), F.lit(n_salt))
    )
    right = (
        _sided(hot, "b")
        # explode_outer: constant non-empty sequence; plain explode would
        # add an inferred size>0 filter recomputing it (dedup.py rationale).
        .withColumn("salt", F.explode_outer(F.sequence(F.lit(0), F.lit(n_salt - 1))))
        .withColumn("salt", F.col("salt").cast("long"))
    )
    pairs_hot = (
        left.join(right, on=["join_key", "salt"])
        .where(F.col("rec_id_a") < F.col("rec_id_b"))
        .drop("salt")
    )

    return (
        pairs_normal.unionByName(pairs_hot)
        .withColumnRenamed("block_key_a", "block_key")
        .drop("join_key")
    )
