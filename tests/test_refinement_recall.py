"""Join-key refinement is recall-lossless: the edge set produced with the
(block_key, primary-number) refined join at threshold tau must equal the
edge set from the unrefined block join filtered to the same tau
(pairs.py REFINE_SAFE_THRESHOLD rationale)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postal_address_spark.operators.blocking import with_block_key  # noqa: E402
from postal_address_spark.operators.extract import extract_mentions  # noqa: E402
from postal_address_spark.operators.normalize_op import normalize_mentions  # noqa: E402
from postal_address_spark.operators.pairs import (  # noqa: E402
    REFINE_SAFE_THRESHOLD,
    candidate_pairs,
)
from postal_address_spark.operators.scoring import score_pairs  # noqa: E402
from postal_address_spark.synth import synth_transcripts_spark  # noqa: E402

TAU = 0.82


def _edges(blocked, threshold):
    pairs = candidate_pairs(blocked, threshold=threshold)
    return {
        (r["rec_id_a"], r["rec_id_b"])
        for r in score_pairs(pairs, threshold=TAU)
        .where(F.col("score") >= TAU)
        .collect()
    }


def test_refined_join_is_recall_lossless(spark):
    assert TAU > REFINE_SAFE_THRESHOLD  # refinement active at TAU
    tr = synth_transcripts_spark(spark, seed=11, n_convs=250, n_entities=80,
                                 typo_prob=0.3)
    blocked = with_block_key(
        normalize_mentions(extract_mentions(tr))
    ).where(F.col("block_key").isNotNull()).persist()

    refined = _edges(blocked, threshold=TAU)           # refined join key
    unrefined = _edges(blocked, threshold=0.5)         # plain block key
    blocked.unpersist()
    assert refined == unrefined
    assert refined, "fixture produced no edges — test is vacuous"
