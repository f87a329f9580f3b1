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

# Columns the scorer needs from each side — nothing more rides the pair
# shuffle (52M pair rows at sf0.1; every surplus column is ~50 bytes x 2
# sides x pair count of wasted shuffle IO).
PAIR_FIELDS = ["rec_id", "line1", "city_name", "postal_code"]


def _sided(df: DataFrame, side: str, extra: Optional[List[str]] = None) -> DataFrame:
    cols = [F.col("block_key")] + [
        F.col(c).alias(f"{c}_{side}") for c in PAIR_FIELDS + (extra or [])
    ]
    return df.select(*cols)


def candidate_pairs(
    blocked: DataFrame,
    hot_threshold: int = 20000,
    n_salt: int = 16,
    max_block_size: Optional[int] = None,
) -> DataFrame:
    """blocked mentions (block_key non-null) -> candidate pair rows.

    Output: block_key, <field>_a, <field>_b for each PAIR_FIELDS entry.

    ``max_block_size`` is the production guardrail for degenerate keys
    (e.g. a junk postal shared by millions of rows): blocks above the cap
    are *excluded from pairing entirely* — within-block pair count is
    inherently quadratic, and an unlinkable junk key would otherwise own
    the job's runtime.  Dropped rows stay in the output of the blocking
    stage (they simply form singleton clusters); the drop is observable
    via the block histogram.
    """
    blocked = blocked.where(F.col("block_key").isNotNull())

    histogram = blocked.groupBy("block_key").agg(
        F.count(F.lit(1)).alias("block_n")
    )
    if max_block_size is not None:
        oversized = histogram.where(F.col("block_n") > max_block_size).select(
            "block_key"
        )
        blocked = blocked.join(F.broadcast(oversized), "block_key", "left_anti")
        histogram = histogram.where(F.col("block_n") <= max_block_size)

    hot_keys = (
        histogram.where(F.col("block_n") > hot_threshold)
        .select("block_key")
        .withColumn("__hot", F.lit(True))
    )
    # block histogram is tiny after the aggregation -> broadcast the flag.
    flagged = blocked.join(F.broadcast(hot_keys), "block_key", "left")

    normal = flagged.where(F.col("__hot").isNull()).drop("__hot")
    hot = flagged.where(F.col("__hot").isNotNull()).drop("__hot")

    pairs_normal = (
        _sided(normal, "a")
        .join(_sided(normal, "b"), on="block_key")
        .where(F.col("rec_id_a") < F.col("rec_id_b"))
    )

    left = _sided(hot, "a").withColumn(
        "salt", F.pmod(F.xxhash64("rec_id_a"), F.lit(n_salt))
    )
    right = (
        _sided(hot, "b")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
        .withColumn("salt", F.col("salt").cast("long"))
    )
    pairs_hot = (
        left.join(right, on=["block_key", "salt"])
        .where(F.col("rec_id_a") < F.col("rec_id_b"))
        .drop("salt")
    )

    return pairs_normal.unionByName(pairs_hot)
