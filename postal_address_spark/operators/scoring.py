"""Pairwise similarity scoring (north rule: "batched Jaro-Winkler +
token-set Levenshtein over normalized text").

One Arrow-batched pandas UDF over the candidate-pair columns; the kernels
are the numpy batch implementations in core.similarity.  The combined
score is a weighted blend of:

* line1 similarity   (0.5 * JW + 0.5 * token-set Levenshtein)  x 0.35
* city JW                                                      x 0.15
* exact normalized-postal agreement                            x 0.25
* primary (house) number agreement                             x 0.25

The primary-number feature is the classic postal-linkage discriminator:
within a hot block (one popular exact postal), two different buildings on
the same street differ precisely in the leading number, which string
similarity alone under-weights.  Same-entity mentions never disagree on
it, so it buys precision at zero recall cost.  Weights + threshold are
validated on the labeled pairs ported from the reference test corpus
(tests/test_pipeline_e2e.py asserts pairwise F1 >= 0.99): same-entity
pairs score >= ~0.95, cross-entity pairs <= ~0.70.
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

W_LINE1 = 0.35
W_CITY = 0.15
W_POSTAL = 0.25
W_HOUSENUM = 0.25


def _leading_number(values: pd.Series) -> pd.Series:
    return values.astype("string").str.extract(r"^(\d+)", expand=False)


def score_batch(
    line1_a: np.ndarray,
    line1_b: np.ndarray,
    city_a: np.ndarray,
    city_b: np.ndarray,
    postal_a: np.ndarray,
    postal_b: np.ndarray,
    threshold: float = DEFAULT_THRESHOLD,
) -> np.ndarray:
    """Pure-numpy pair score in [0, 1] (also unit-tested without Spark).

    Cheap-feature cascade: exact features (postal, primary number, string
    equality) are computed first; the O(L²) Jaro-Winkler / Levenshtein
    kernels only run on pairs whose score UPPER BOUND (string sims assumed
    1.0) can still reach ``threshold``.  In a hot block, cross-entity pairs
    almost always disagree on the primary number, so the quadratic pair
    volume costs equality checks, not edit-distance — this is what keeps
    within-block scoring ~O(block) instead of O(block²·L²) in practice.
    Pairs short-circuited by the bound get their (sub-threshold) upper
    bound as the score, which downstream filtering discards either way.
    """
    pa = pd.Series(postal_a, dtype=object)
    pb = pd.Series(postal_b, dtype=object)
    s_postal = ((pa == pb) & pa.notna()).to_numpy(dtype=np.float64)
    la = pd.Series(line1_a, dtype=object)
    lb = pd.Series(line1_b, dtype=object)
    na, nb = _leading_number(la), _leading_number(lb)
    s_housenum = (
        ((na == nb) & na.notna()) | (na.isna() & nb.isna())
    ).to_numpy(dtype=np.float64)

    base = W_POSTAL * s_postal + W_HOUSENUM * s_housenum
    upper = base + W_LINE1 + W_CITY
    need = upper >= threshold

    line1_eq = ((la == lb) & la.notna()).to_numpy(dtype=bool)
    ca = pd.Series(city_a, dtype=object)
    cb = pd.Series(city_b, dtype=object)
    city_eq = (((ca == cb) & ca.notna()) | (ca.isna() & cb.isna())).to_numpy(
        dtype=bool
    )

    s_line1 = np.where(line1_eq, 1.0, 0.0)
    s_city = np.where(city_eq, 1.0, 0.0)

    need_line1 = need & ~line1_eq
    if need_line1.any():
        sub_a = line1_a[need_line1]
        sub_b = line1_b[need_line1]
        s_line1[need_line1] = 0.5 * jaro_winkler_batch(sub_a, sub_b) + \
            0.5 * token_set_levenshtein_batch(sub_a, sub_b)
    need_city = need & ~city_eq
    if need_city.any():
        s_city[need_city] = jaro_winkler_batch(
            city_a[need_city], city_b[need_city]
        )

    full = base + W_LINE1 * s_line1 + W_CITY * s_city
    # short-circuited pairs report their (sub-threshold) upper bound
    return np.where(need, full, upper)


def make_pair_score_udf(threshold: float = DEFAULT_THRESHOLD):
    """Build the scoring UDF with the cascade bound tied to ``threshold``
    (the short-circuit must never skip a pair the caller's filter keeps)."""

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
            threshold=threshold,
        )
        return pd.Series(scores)

    return pair_score_udf


def _sim_combo_udf():
    """One UDF for the weighted line1 + city similarity contribution —
    a single Arrow round-trip per pair batch instead of two (the transfer,
    not the kernels, is the scaling-relevant cost; see score_pairs)."""

    @pandas_udf(returnType=DoubleType())
    def sim_combo(
        l1a: pd.Series, l1b: pd.Series, ca: pd.Series, cb: pd.Series
    ) -> pd.Series:
        a = l1a.to_numpy(dtype=object)
        b = l1b.to_numpy(dtype=object)
        sim = W_LINE1 * (
            0.5 * jaro_winkler_batch(a, b)
            + 0.5 * token_set_levenshtein_batch(a, b)
        )
        sim = sim + W_CITY * jaro_winkler_batch(
            ca.to_numpy(dtype=object), cb.to_numpy(dtype=object)
        )
        return pd.Series(sim)

    # The kernel IS deterministic — the marker only disables the optimizer
    # rewrites (predicate pushdown past the project, projection-through-
    # union) that each DUPLICATE the Python eval node: measured plan held
    # 4 ArrowEvalPython copies of this UDF (filter + project, x2 union
    # branches), i.e. up to 4x the Arrow transfer + kernel work.
    return sim_combo.asNondeterministic()


def _explain_udf():
    """Struct-returning kernel pass for :func:`explain_pairs` — all three
    string similarities in ONE Arrow round trip (same single-boundary
    budget as ``_sim_combo_udf``; a struct column is one Arrow field)."""
    from pyspark.sql.types import StructField, StructType

    @pandas_udf(
        returnType=StructType(
            [
                StructField("jw_line1", DoubleType()),
                StructField("tsl_line1", DoubleType()),
                StructField("jw_city", DoubleType()),
            ]
        )
    )
    def explain_kernels(
        l1a: pd.Series, l1b: pd.Series, ca: pd.Series, cb: pd.Series
    ) -> pd.DataFrame:
        a = l1a.to_numpy(dtype=object)
        b = l1b.to_numpy(dtype=object)
        return pd.DataFrame(
            {
                "jw_line1": jaro_winkler_batch(a, b),
                "tsl_line1": token_set_levenshtein_batch(a, b),
                "jw_city": jaro_winkler_batch(
                    ca.to_numpy(dtype=object), cb.to_numpy(dtype=object)
                ),
            }
        )

    # same rationale as _sim_combo_udf: block the optimizer rewrites that
    # duplicate the Python eval node (4x Arrow transfer, measured there).
    return explain_kernels.asNondeterministic()


def explain_pairs(pairs: DataFrame) -> DataFrame:
    """Per-feature score breakdown for every candidate pair — the
    comparison vector a match-review queue ranks and audits on (the same
    surface Splink exposes as its comparison viewer).

    Unlike :func:`score_pairs` there is NO cascade short-circuit and no
    threshold filter: a reviewer adjudicating a borderline or rejected
    pair needs the TRUE sub-scores, not upper bounds — so every pair pays
    the kernels.  Use it on a review slice (one block, one cluster's
    candidates, a disputed sample), not the full pair stream; the
    production edge cut stays :func:`score_pairs`.

    Output per pair: the exact features (``s_postal``, ``s_housenum``),
    the kernel similarities (``jw_line1``, ``tsl_line1``, ``jw_city``),
    and the blended ``score`` — identical weighting to
    :func:`score_batch`, so ``score >= threshold`` reproduces the
    production edge decision for non-short-circuited pairs.
    """
    la, lb = F.col("line1_a"), F.col("line1_b")
    ca, cb = F.col("city_name_a"), F.col("city_name_b")
    pa, pb = F.col("postal_code_a"), F.col("postal_code_b")

    def leading_num(c):
        return F.nullif(
            F.regexp_extract(F.coalesce(c, F.lit("")), r"^(\d+)", 1), F.lit("")
        )

    s_postal = (pa.isNotNull() & (pa == pb)).cast("double")
    s_housenum = leading_num(la).eqNullSafe(leading_num(lb)).cast("double")

    featured = pairs.select(
        "rec_id_a", "rec_id_b", "block_key",
        s_postal.alias("s_postal"),
        s_housenum.alias("s_housenum"),
        _explain_udf()(la, lb, ca, cb).alias("_k"),
    )
    k = F.col("_k")
    s_line1 = 0.5 * k["jw_line1"] + 0.5 * k["tsl_line1"]
    return featured.select(
        "rec_id_a", "rec_id_b", "block_key", "s_postal", "s_housenum",
        k["jw_line1"].alias("jw_line1"),
        k["tsl_line1"].alias("tsl_line1"),
        k["jw_city"].alias("jw_city"),
        (
            F.lit(W_POSTAL) * F.col("s_postal")
            + F.lit(W_HOUSENUM) * F.col("s_housenum")
            + F.lit(W_LINE1) * s_line1
            + F.lit(W_CITY) * k["jw_city"]
        ).alias("score"),
    )


def score_pairs(pairs: DataFrame, threshold: float = DEFAULT_THRESHOLD) -> DataFrame:
    """candidate pairs -> above-threshold match edges.

    Output: rec_id_a, rec_id_b, block_key, score.

    The cheap-feature cascade runs as JVM whole-stage-codegen expressions
    (null-safe equality, leading-number extraction); only pairs that (a)
    can still reach ``threshold`` given the exact features AND (b) are not
    string-identical go through the Arrow boundary into the edit-distance
    kernels.  That keeps the Python path to the typo minority: shipping
    every pair's strings into pandas object arrays costs more memory
    bandwidth than the scoring itself and caps thread scaling (measured:
    a 32-thread all-pairs UDF pass ran at 1/3.5 the per-core rate of an
    8-thread one on this box; the filtered split restores linear scaling).

    Semantics are identical to :func:`score_batch` (the kernels return
    exactly 1.0 on identical inputs, so the equality short-cut changes no
    score), property-tested in tests/test_similarity.py.
    """
    la, lb = F.col("line1_a"), F.col("line1_b")
    ca, cb = F.col("city_name_a"), F.col("city_name_b")
    pa, pb = F.col("postal_code_a"), F.col("postal_code_b")

    def leading_num(c):
        return F.nullif(
            F.regexp_extract(F.coalesce(c, F.lit("")), r"^(\d+)", 1), F.lit("")
        )

    s_postal = (pa.isNotNull() & (pa == pb)).cast("double")
    s_housenum = leading_num(la).eqNullSafe(leading_num(lb)).cast("double")
    line1_eq = la.eqNullSafe(lb)
    city_eq = ca.eqNullSafe(cb)

    base = F.lit(W_POSTAL) * s_postal + F.lit(W_HOUSENUM) * s_housenum
    upper = base + F.lit(W_LINE1 + W_CITY)

    exact = line1_eq & city_eq
    reachable = upper >= F.lit(threshold)
    need_kernel = reachable & ~exact

    # Single pass: every pair flows through one plan, but the string
    # payload is nulled JVM-side for pairs that don't need the kernels, so
    # the Arrow transfer + object materialization cost is paid only for
    # the kernel minority.  (Spark evaluates pandas UDFs for every row of
    # the projection — there is no per-row lazy branch — so "skip" must be
    # encoded in the data, not the control flow.)
    gate = lambda c: F.when(need_kernel, c)  # noqa: E731
    featured = pairs.select(
        "rec_id_a", "rec_id_b", "block_key",
        base.alias("base"),
        exact.alias("exact"),
        reachable.alias("reachable"),
        gate(la).alias("k_l1a"), gate(lb).alias("k_l1b"),
        gate(ca).alias("k_ca"), gate(cb).alias("k_cb"),
    )

    kernel_score = F.col("base") + _sim_combo_udf()("k_l1a", "k_l1b", "k_ca", "k_cb")
    scored = featured.withColumn(
        "score",
        F.when(F.col("exact"), F.col("base") + F.lit(W_LINE1 + W_CITY))
        .when(~F.col("reachable"), F.lit(0.0))
        .otherwise(kernel_score),
    )
    return scored.where(F.col("score") >= threshold).select(
        "rec_id_a", "rec_id_b", "block_key", "score"
    )


def _monge_elkan_udf():
    """Struct-returning Monge-Elkan pass: both directions in ONE Arrow
    round trip (the _explain_udf single-boundary budget)."""
    from pyspark.sql.types import StructField, StructType

    from ..core.similarity import monge_elkan_batch

    @pandas_udf(
        returnType=StructType(
            [
                StructField("me_ab", DoubleType()),
                StructField("me_ba", DoubleType()),
            ]
        )
    )
    def me_kernels(l1a: pd.Series, l1b: pd.Series) -> pd.DataFrame:
        a = l1a.to_numpy(dtype=object)
        b = l1b.to_numpy(dtype=object)
        # nullable Float64: the kernel's NaN (NULL input side) must reach
        # Spark as NULL, not double-NaN (errors are data; the oracle's
        # NULL semantics match)
        return pd.DataFrame(
            {
                "me_ab": pd.array(monge_elkan_batch(a, b), dtype="Float64"),
                "me_ba": pd.array(monge_elkan_batch(b, a), dtype="Float64"),
            }
        )

    return me_kernels.asNondeterministic()


def monge_elkan_pairs(pairs: DataFrame) -> DataFrame:
    """Monge-Elkan hybrid similarity over candidate pairs — the classic
    multi-token comparator (mean best-token Jaro-Winkler, Monge & Elkan
    1996) the blended cascade does not include: robust where token COUNT
    differs ('12 MAIN ST APT 4' vs 'MAIN STREET 12'), which token-set
    Levenshtein penalizes and whole-string JW garbles.

    Output per pair: the two directed means (``me_ab``: over a's tokens;
    ``me_ba``: over b's) and the symmetric ``me_sym = max`` — a review
    surface / extra comparison level, evaluated in ONE Arrow node (both
    directions ride one struct column; rule-3 nondeterministic marker).
    NULL line1 on either side yields NULL scores (errors are data).
    """
    me = F.col("_me")
    return pairs.select(
        "rec_id_a", "rec_id_b",
        _monge_elkan_udf()(F.col("line1_a"), F.col("line1_b")).alias("_me"),
    ).select(
        "rec_id_a", "rec_id_b",
        me["me_ab"].alias("me_ab"),
        me["me_ba"].alias("me_ba"),
        F.greatest(me["me_ab"], me["me_ba"]).alias("me_sym"),
    )
