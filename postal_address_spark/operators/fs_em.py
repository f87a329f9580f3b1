"""Fellegi-Sunter match-weight estimation via unsupervised EM.

The probabilistic-linkage layer the reference never had (its scorer is a
fixed-weight blend, ``operators/scoring.py``): given candidate pairs and
their comparison vectors, learn per-comparison-level *m*-probabilities
(P(level | match)), *u*-probabilities (P(level | non-match)) and the match
prior lambda with expectation-maximisation, then score each pair with the
classic log2 Bayes-factor match weight.  This is the Fellegi-Sunter (1969)
model as popularised by Splink; the implementation is Spark-first:

* **Comparison vectors** are discretised JVM-side (``F.when`` chains over
  the round-6 similarity columns of :func:`scoring.explain_pairs`) —
  whole-stage codegen, no Python.
* **Sufficient statistics** are one map-side-combinable aggregation:
  ``groupBy(gamma columns).count()``.  EM never touches the pair stream —
  the entire E/M loop runs on the driver over this tiny pattern table
  (at most ``prod(levels) = 18`` rows regardless of data size), so the
  iterative part costs O(patterns x iterations) driver time and ZERO
  additional Spark jobs.  At 100 TB the only distributed work is the one
  aggregation, which partial-aggregates map-side down to <= 18 rows per
  task before its single shuffle.
* **Scoring** applies the learned weights back onto pairs as a literal
  ``when``-chain expression (the parameter table is model state, never a
  join) — same broadcast-literal discipline as the territory lookups.

Levels are deliberately coarse (3/3/2): FS gamma levels are agreement
grades, not similarities; coarse levels keep u-probabilities estimable
from modest pair counts and the pattern table tiny.

Determinism: fixed init, fixed iteration count, float64 throughout — the
same pattern counts always produce bit-identical parameters.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (comparison name, source column of explain_pairs, descending thresholds)
# gamma = number of thresholds the (round-6) similarity meets, so higher
# gamma = stronger agreement; len(thresholds)+1 levels per comparison.
COMPARISONS: List[Tuple[str, str, Tuple[float, ...]]] = [
    ("line1_jw", "jw_line1", (0.94, 0.88)),
    ("line1_tsl", "tsl_line1", (0.94, 0.80)),
    ("city_jw", "jw_city", (0.92,)),
]

EM_ITERATIONS = 60
_EPS = 1e-12  # probability floor: keeps log weights finite on empty levels


def _gamma_expr(col: str, thresholds: Sequence[float]) -> Column:
    """Discretise a round-6 similarity into its agreement level.

    Comparisons are made on the ALREADY-ROUNDED value (both the engine and
    the DuckDB mirror round to 6 decimals first), so the two sides agree
    on every gamma wherever their round-6 similarities agree — which
    tests/test_similarity.py::test_explain_features_match_duckdb guards.
    NULL similarity (kernel never ran) grades as total disagreement.
    """
    v = F.round(F.col(col), 6)
    expr = F.lit(0)
    for i, t in enumerate(reversed(thresholds)):  # ascending levels
        expr = F.when(v >= F.lit(t), F.lit(i + 1)).otherwise(expr)
    return F.coalesce(expr, F.lit(0))


def comparison_vectors(explained: DataFrame) -> DataFrame:
    """explain_pairs output -> (rec_id_a, rec_id_b, gamma_* ...) — codegen."""
    return explained.select(
        "rec_id_a",
        "rec_id_b",
        *[
            _gamma_expr(src, th).alias(f"gamma_{name}")
            for name, src, th in COMPARISONS
        ],
    )


def pair_sample(pairs: DataFrame, one_in: int) -> DataFrame:
    """Deterministic 1-in-``one_in`` candidate-pair sample for parameter
    estimation (Splink's estimation-sample idea): at 10^12-pair scale the
    EM sufficient statistics do not need every pair — m/u probabilities
    are population ratios, so a hash-sample of the PAIR key estimates
    them with standard-error ~1/sqrt(sample size) while cutting the
    kernel work ``one_in``-fold.  xxhash64 of both ids makes the sample a
    pure function of the data (reruns and the two engines agree), unlike
    ``DataFrame.sample``'s partition-seeded RNG.  ``one_in=1`` is the
    identity (the gate queries use it so the oracle stays exact)."""
    if one_in < 1:
        raise ValueError("one_in must be >= 1")
    if one_in == 1:
        return pairs
    return pairs.where(
        F.pmod(F.xxhash64("rec_id_a", "rec_id_b"), F.lit(one_in)) == 0
    )


def review_queue(vectors: DataFrame, one_in: int = 1) -> DataFrame:
    """Clerical-review queue: pairs whose comparison pattern is
    AMBIGUOUS — agreement on some comparisons, disagreement on others
    (neither the all-top nor the all-bottom pattern) — the
    Fellegi-Sunter "possible match" region a human review adjudicates
    (Splink's comparison-viewer workflow).

    The band is chosen STRUCTURALLY on the integer gamma levels
    (``0 < sum(gamma) < max_sum``), never on a float score threshold —
    so the selection is exact, engine-portable (the driver oracle
    replays it), and immune to the rounding-boundary flakiness a score
    band would reintroduce.  ``one_in`` thins the queue with the same
    deterministic xxhash64 pair sample the estimation path uses
    (``pair_sample``; 1 = keep everything, which the gate query uses so
    the oracle stays exact).
    """
    gammas = [f"gamma_{name}" for name, _, _ in COMPARISONS]
    gmax = sum(len(th) for _, _, th in COMPARISONS)
    gsum = None
    for g in gammas:
        gsum = F.col(g) if gsum is None else gsum + F.col(g)
    out = vectors.withColumn("gamma_sum", gsum.cast("int")).where(
        (F.col("gamma_sum") > 0) & (F.col("gamma_sum") < F.lit(gmax))
    )
    return pair_sample(out, one_in)


def labeling_sample(
    vectors: DataFrame,
    k_per_pattern: int,
    seed: int = 0,
    rank_method: str = "xxhash",
    n_salt: int = 64,
    persist: bool = True,
) -> DataFrame:
    """Stratified clerical-labeling sample: the ``k_per_pattern``
    deterministically pseudo-random candidate pairs from EVERY comparison
    pattern, with the stratum's total pair count attached.

    Why stratify by PATTERN rather than rank by score: validating learned
    m/u probabilities (and auditing the admission threshold) needs labels
    in every stratum — the confident all-agree and all-disagree patterns
    included — while :func:`review_queue` deliberately oversamples only
    the ambiguous band.  Allocating a fixed labeling budget per pattern is
    the standard audit design (each pattern's precision estimate gets the
    same standard error); ``n_pattern_pairs`` lets the consumer reweight
    to population rates (Splink's labeling workflow shape).

    Determinism/portability (the dataset_split dual-path precedent):
    the rank key is a pure function of (seed, rec_id_a, rec_id_b), so
    re-runs, backfills, and both engines pick the identical sample.
    ``rank_method='xxhash'`` (production) ranks by xxhash64 — engine rule
    4 keeps MessageDigest off hot paths.  ``rank_method='md5'`` (portable)
    ranks by the md5-prefix hash (``conv(substr(md5(..),1,8),16,10)`` ≡
    DuckDB ``CAST('0x'||substr(md5(..),1,8) AS BIGint)``, the
    doc_fingerprints precedent) so the driver oracle replays the exact
    sample; ties (32-bit prefix collisions) are broken by the pair ids,
    keeping the rank total either way.

    Scale: there are at most ``prod(levels)`` (= 18) patterns, so ONE
    window over the pattern key would funnel every candidate pair through
    <= 18 tasks — a parallelism collapse, not a skew problem AQE can fix.
    Top-k is decomposable, so phase 1 takes the local top-k inside
    (pattern, rank_key % n_salt) buckets (parallelism ~ patterns x
    n_salt) and phase 2 re-ranks only the <= k x n_salt survivors per
    pattern — provably the same rows as the naive single window
    (tests/test_fs_em.py asserts equality), with the second window's
    input bounded regardless of pair volume.  The stratum counts are one
    map-side-combinable aggregation joined back broadcast onto the
    <= 18 x k sampled rows.

    CACHING CONTRACT (the jaccard_set_join precedent): the projected
    (ids, gammas, rank key) base feeds BOTH the sample and the stratum
    counts, so with ``persist=True`` (default) it is persisted
    MEMORY_AND_DISK — without it the upstream comparison-vector chain
    (the Arrow kernel pass) would run twice.  The returned frame is lazy,
    so only the CALLER can release the cache (clearCache / materialize
    then clear); pass ``persist=False`` when the input is already cached
    or cheap.
    """
    if k_per_pattern < 1:
        raise ValueError("k_per_pattern must be >= 1")
    from pyspark.sql import Window

    gammas = [f"gamma_{name}" for name, _, _ in COMPARISONS]
    if rank_method == "xxhash":
        h = F.xxhash64("rec_id_a", "rec_id_b", F.lit(seed))
    elif rank_method == "md5":
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.lit(str(seed)), "rec_id_a", "rec_id_b"
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
    else:
        raise ValueError(f"rank_method must be 'xxhash' or 'md5', got {rank_method!r}")

    base = vectors.select("rec_id_a", "rec_id_b", *gammas).withColumn(
        "lbl_h", h
    )
    if persist:
        from pyspark import StorageLevel

        base = base.persist(StorageLevel.MEMORY_AND_DISK)
    order = [F.col("lbl_h"), F.col("rec_id_a"), F.col("rec_id_b")]
    local = Window.partitionBy(
        *gammas, F.pmod(F.col("lbl_h"), F.lit(n_salt))
    ).orderBy(*order)
    survivors = (
        base.withColumn("_r", F.row_number().over(local))
        .where(F.col("_r") <= k_per_pattern)
        .drop("_r")
    )
    final = Window.partitionBy(*gammas).orderBy(*order)
    sampled = (
        survivors.withColumn(
            "sample_rank", F.row_number().over(final).cast("long")
        )
        .where(F.col("sample_rank") <= k_per_pattern)
        .drop("lbl_h")
    )
    counts = base.groupBy(*gammas).agg(
        F.count(F.lit(1)).alias("n_pattern_pairs")
    )
    return sampled.join(F.broadcast(counts), on=gammas, how="inner").select(
        "rec_id_a", "rec_id_b", *gammas, "n_pattern_pairs", "sample_rank"
    )


def pattern_counts(vectors: DataFrame) -> DataFrame:
    """Comparison vectors -> pattern frequency table (the EM sufficient
    statistics).  One aggregation, <= prod(levels) rows out; Spark's
    partial HashAggregate combines map-side so the shuffle carries at most
    #patterns rows per task no matter the pair volume."""
    gammas = [f"gamma_{name}" for name, _, _ in COMPARISONS]
    return vectors.groupBy(*gammas).agg(F.count(F.lit(1)).alias("n_pairs"))


def pattern_truth_counts(
    vectors: DataFrame, truth_col: str = "truth_match"
) -> DataFrame:
    """Pattern frequency table WITH labeled-truth tallies: per comparison
    pattern, (n_pairs, n_true_pairs) — the Fellegi–Sunter-native
    threshold-selection evidence.

    Ranking patterns by their learned log2 Bayes factor (em_fit /
    FSParams) and admitting them in weight order, the cumulative
    sum(n_true_pairs) / sum(n_pairs) IS the expected precision and
    sum(n_true_pairs) / total-true the recall at every candidate
    threshold — the chart a practitioner picks the match threshold from.
    Binning the float blended SCORE would put bin boundaries exactly on
    attainable values (0.5 + exact weight sums), a cross-engine rounding
    trap; the pattern space is integer-exact by construction, so a
    DuckDB oracle replays this table bit-for-bit.

    ``truth_col`` is 0/1 per pair.  Same cost shape as pattern_counts:
    one map-side-combinable aggregation, ≤ prod(levels) rows out.
    """
    gammas = [f"gamma_{name}" for name, _, _ in COMPARISONS]
    return vectors.groupBy(*gammas).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col(truth_col).cast("long")).alias("n_true_pairs"),
    )


def threshold_curve(
    pattern_rows, params: "FSParams", beta: float = 1.0
) -> List[dict]:
    """Driver-side admission curve over the pattern_truth_counts table:
    patterns sorted by their learned Fellegi–Sunter match weight
    (prior log2-odds + sum of per-level log2 Bayes factors) and admitted
    best-first; each curve point carries the cumulative pair/true
    tallies and the precision / recall / F-beta a threshold AT that
    pattern's weight would achieve.

    Recall is against the candidate pairs' labeled matches — what
    blocking surfaced; blocking recall is its own report
    (blocking_rule_recall).  Pure function of a ≤ prod(levels)-row
    table: no Spark work, deterministic (weight ties break by smaller
    pair count, then pattern levels)."""
    pats = []
    for r in pattern_rows:
        w = params.prior_log2_odds + sum(
            params.log2_bf(name, r[f"gamma_{name}"])
            for name, _, _ in COMPARISONS
        )
        levels = tuple(r[f"gamma_{name}"] for name, _, _ in COMPARISONS)
        pats.append((w, int(r["n_pairs"]), int(r["n_true_pairs"]), levels))
    pats.sort(key=lambda t: (-t[0], t[1], t[3]))
    total_true = sum(t for _, _, t, _ in pats)
    b2 = beta * beta
    curve: List[dict] = []
    cum_pairs = cum_true = 0
    for w, n, t, levels in pats:
        cum_pairs += n
        cum_true += t
        prec = cum_true / cum_pairs
        rec = cum_true / total_true if total_true else 0.0
        f = (
            (1 + b2) * prec * rec / (b2 * prec + rec)
            if prec + rec > 0
            else 0.0
        )
        curve.append(
            {
                "weight": w,
                "pattern": levels,
                "n_pairs": n,
                "n_true": t,
                "cum_pairs": cum_pairs,
                "cum_true": cum_true,
                "precision": prec,
                "recall": rec,
                "f_beta": f,
            }
        )
    return curve


def select_threshold(
    pattern_rows, params: "FSParams", beta: float = 1.0
) -> dict:
    """The threshold_curve point maximizing F-beta (ties -> the HIGHER
    weight, i.e. the more conservative cut).  ``weight`` is the match
    weight of the last ADMITTED pattern: use ``score >= weight`` with
    fs_score_pairs / match_weight_expr."""
    curve = threshold_curve(pattern_rows, params, beta)
    if not curve:
        raise ValueError("empty pattern table")
    return max(curve, key=lambda c: (c["f_beta"], c["weight"]))


def mu_from_labels(
    labeled_vectors: DataFrame, label_col: str = "is_match"
) -> DataFrame:
    """Supervised m/u sufficient statistics from clerically LABELED pairs
    (Splink's ``estimate_m_from_pairwise_labels`` shape): per comparison
    and agreement level, how many labeled matches and labeled non-matches
    sit at that level — ``(comparison, gamma, n_match, n_nonmatch)``.

    This is the consumer of :func:`labeling_sample`'s output once the
    human labels come back: the level tallies ARE the m/u estimates up to
    the per-comparison normalisation (m = n_match / sum over levels), and
    comparing them against :func:`em_fit`'s unsupervised estimates is the
    standard audit that EM converged to the match/non-match split rather
    than some other latent dichotomy (:func:`labeled_params` +
    :func:`mu_audit` finish the job driver-side).

    Spark shape: the gamma columns are unpivoted with ONE ``stack``
    generator (rows × #comparisons, whole-stage codegen, no shuffle until
    the aggregate) and reduced by ONE map-side-combinable aggregation to
    at most sum(levels) (= 8) rows regardless of label volume.  Empty
    levels are absent from the output (both engines agree on that).
    All-integer, so a DuckDB oracle replays it bit-for-bit.
    """
    arms = ", ".join(f"'{name}', gamma_{name}" for name, _, _ in COMPARISONS)
    stacked = labeled_vectors.select(
        F.expr(f"stack({len(COMPARISONS)}, {arms}) AS (comparison, gamma)"),
        F.col(label_col).cast("long").alias("_lbl"),
    )
    return stacked.groupBy("comparison", "gamma").agg(
        F.sum("_lbl").alias("n_match"),
        F.sum(F.lit(1) - F.col("_lbl")).alias("n_nonmatch"),
    )


def labeled_params(
    labeled_sample_rows: Sequence, label_col: str = "is_match"
) -> FSParams:
    """Fit FS parameters DIRECTLY from a labeled stratified sample —
    the supervised counterpart of :func:`em_fit`, consuming the collected
    rows of :func:`labeling_sample`'s output with the clerical
    ``label_col`` filled in (≤ #patterns × k rows — model state, not
    data, the em_fit_df collect precedent).

    Because the sample is stratified BY PATTERN (every stratum gets k
    labels no matter how rare), raw tallies over it are biased toward
    rare patterns; each row is therefore Horvitz–Thompson weighted by
    ``n_pattern_pairs / n_sampled(stratum)`` — the pair count its stratum
    delegates to it — so m, u and lambda estimate the CANDIDATE-PAIR
    population.  Strata smaller than k are fully enumerated and get
    weight 1 exactly.  Returns :class:`FSParams`, so the learned weights
    plug straight into :func:`match_weight_expr` / :func:`fs_score_pairs`
    and compare field-for-field against the EM fit (:func:`mu_audit`).
    """
    gammas = [f"gamma_{name}" for name, _, _ in COMPARISONS]
    by_stratum: Dict[Tuple[int, ...], int] = {}
    for r in labeled_sample_rows:
        key = tuple(r[g] for g in gammas)
        by_stratum[key] = by_stratum.get(key, 0) + 1
    n_levels = _level_counts()
    wm = [np.zeros(k) for k in n_levels]
    wu = [np.zeros(k) for k in n_levels]
    w_match_total = 0.0
    w_total = 0.0
    for r in labeled_sample_rows:
        key = tuple(r[g] for g in gammas)
        w = float(r["n_pattern_pairs"]) / by_stratum[key]
        lbl = bool(r[label_col])
        w_total += w
        if lbl:
            w_match_total += w
        for c, key_level in enumerate(key):
            (wm if lbl else wu)[c][key_level] += w
    if w_total <= 0:
        raise ValueError("labeled sample is empty")
    names = [name for name, _, _ in COMPARISONS]
    return FSParams(
        lam=w_match_total / w_total,
        m={
            n: [float(x) for x in np.maximum(wm[c], _EPS) / max(wm[c].sum(), _EPS)]
            for c, n in enumerate(names)
        },
        u={
            n: [float(x) for x in np.maximum(wu[c], _EPS) / max(wu[c].sum(), _EPS)]
            for c, n in enumerate(names)
        },
    )


def mu_audit(labeled: "FSParams", em: "FSParams") -> List[Tuple]:
    """Per comparison level, the labeled vs EM parameter estimates and
    the log2-Bayes-factor delta — the table a practitioner reads to
    decide whether the unsupervised fit is trustworthy (large |delta| on
    a high-traffic level means EM latched onto the wrong dichotomy).
    Pure driver-side arithmetic over the two parameter sets
    (#levels ≤ 8 rows): (comparison, gamma, labeled_m, labeled_u, em_m,
    em_u, labeled_log2_bf, em_log2_bf, delta_log2_bf)."""
    out = []
    for name, _, th in COMPARISONS:
        for level in range(len(th) + 1):
            lb = labeled.log2_bf(name, level)
            eb = em.log2_bf(name, level)
            out.append(
                (
                    name,
                    level,
                    labeled.m[name][level],
                    labeled.u[name][level],
                    em.m[name][level],
                    em.u[name][level],
                    lb,
                    eb,
                    lb - eb,
                )
            )
    return out


@dataclass(frozen=True)
class FSParams:
    """Learned Fellegi-Sunter parameters.

    ``m[c][l]`` / ``u[c][l]``: P(gamma_c = l | match / non-match);
    ``lam``: the match prior P(match) over candidate pairs.
    """

    lam: float
    m: Dict[str, List[float]]
    u: Dict[str, List[float]]

    def log2_bf(self, comparison: str, level: int) -> float:
        return float(
            np.log2(
                max(self.m[comparison][level], _EPS)
                / max(self.u[comparison][level], _EPS)
            )
        )

    @property
    def prior_log2_odds(self) -> float:
        return float(np.log2(max(self.lam, _EPS) / max(1.0 - self.lam, _EPS)))


def _level_counts() -> List[int]:
    return [len(th) + 1 for _, _, th in COMPARISONS]


def em_fit(
    patterns: Sequence[Sequence[int]],
    counts: Sequence[int],
    n_iter: int = EM_ITERATIONS,
) -> FSParams:
    """Driver-side EM over the pattern table (pure numpy, deterministic).

    ``patterns[i]`` is the gamma vector of pattern i, ``counts[i]`` its
    pair frequency.  Standard FS EM: E-step computes each pattern's match
    responsibility from the current (lam, m, u); M-step re-estimates them
    from responsibility-weighted level frequencies.  Fixed iteration count
    and fixed monotone init (higher level => higher m, lower u) make the
    fit a pure function of the counts.
    """
    pat = np.asarray(patterns, dtype=np.int64)
    cnt = np.asarray(counts, dtype=np.float64)
    if pat.ndim != 2 or pat.shape[1] != len(COMPARISONS):
        raise ValueError(f"patterns must be Nx{len(COMPARISONS)} gamma vectors")
    if cnt.sum() <= 0:
        raise ValueError("pattern counts are empty")
    n_levels = _level_counts()

    # Monotone init, normalised per comparison.
    m = [np.array([1.0 + 3.0 * l for l in range(k)]) for k in n_levels]
    u = [np.array([3.0 * (k - l) for l in range(1, k + 1)]) + 1.0 for k in n_levels]
    m = [v / v.sum() for v in m]
    u = [v / v.sum() for v in u]
    lam = 0.1

    total = cnt.sum()
    for _ in range(n_iter):
        # E-step: P(match | gamma) per pattern.
        log_m = np.zeros(len(pat))
        log_u = np.zeros(len(pat))
        for c in range(len(COMPARISONS)):
            log_m += np.log(np.maximum(m[c][pat[:, c]], _EPS))
            log_u += np.log(np.maximum(u[c][pat[:, c]], _EPS))
        pm = lam * np.exp(log_m)
        pu = (1.0 - lam) * np.exp(log_u)
        resp = pm / np.maximum(pm + pu, _EPS)

        # M-step.
        w_match = resp * cnt
        w_non = (1.0 - resp) * cnt
        lam = float(w_match.sum() / total)
        for c, k in enumerate(n_levels):
            mc = np.array(
                [w_match[pat[:, c] == l].sum() for l in range(k)]
            )
            uc = np.array([w_non[pat[:, c] == l].sum() for l in range(k)])
            m[c] = np.maximum(mc, _EPS) / max(mc.sum(), _EPS)
            u[c] = np.maximum(uc, _EPS) / max(uc.sum(), _EPS)

    names = [name for name, _, _ in COMPARISONS]
    return FSParams(
        lam=lam,
        m={n: [float(x) for x in m[c]] for c, n in enumerate(names)},
        u={n: [float(x) for x in u[c]] for c, n in enumerate(names)},
    )


def em_fit_df(pattern_df: DataFrame, n_iter: int = EM_ITERATIONS) -> FSParams:
    """Fit from the Spark pattern table.  The collect is the <= 18-row
    sufficient-statistic table (model state, not data) — the one sanctioned
    driver-side materialisation shape (cf. cluster.py convergence row)."""
    gammas = [f"gamma_{name}" for name, _, _ in COMPARISONS]
    rows = pattern_df.select(*gammas, "n_pairs").collect()
    return em_fit(
        [[r[g] for g in gammas] for r in rows],
        [r["n_pairs"] for r in rows],
        n_iter=n_iter,
    )


def params_df(spark, params: FSParams) -> DataFrame:
    """Learned parameters as a small DataFrame (the model-inspection
    surface: one row per comparison level, Splink's charts shape)."""
    rows = []
    for c, (name, _, th) in enumerate(COMPARISONS):
        for level in range(len(th) + 1):
            rows.append(
                (
                    name,
                    level,
                    params.m[name][level],
                    params.u[name][level],
                    params.log2_bf(name, level),
                )
            )
    df = spark.createDataFrame(
        rows, "comparison string, gamma int, m double, u double, log2_bf double"
    )
    return df.select(
        "comparison",
        "gamma",
        F.round("m", 6).alias("m"),
        F.round("u", 6).alias("u"),
        F.round("log2_bf", 6).alias("log2_bf"),
    )


def params_to_json(params: FSParams) -> str:
    """Serialize learned parameters to JSON (Splink's
    save_model_to_json shape): deterministic key order, doubles via
    Python's repr-exact float serialization, so
    ``params_from_json(params_to_json(p))`` reproduces every m/u/lambda
    BIT-FOR-BIT and a model fitted once scores identically forever
    (pytest-pinned in tests/test_fs_em.py)."""
    import json

    return json.dumps(
        {
            "model": "fellegi_sunter",
            "comparisons": [name for name, _, _ in COMPARISONS],
            "lam": params.lam,
            "m": {c: list(map(float, v)) for c, v in sorted(params.m.items())},
            "u": {c: list(map(float, v)) for c, v in sorted(params.u.items())},
        },
        sort_keys=True,
        indent=2,
    )


def params_from_json(payload: str) -> FSParams:
    """Inverse of ``params_to_json``; validates the comparison names
    against this build's COMPARISONS spec so a model fitted on a
    different comparison schema fails loudly instead of mis-scoring."""
    import json

    d = json.loads(payload)
    expected = [name for name, _, _ in COMPARISONS]
    if d.get("comparisons") != expected:
        raise ValueError(
            f"model comparisons {d.get('comparisons')} do not match this "
            f"build's spec {expected}"
        )
    return FSParams(lam=float(d["lam"]), m=dict(d["m"]), u=dict(d["u"]))


def save_params(params: FSParams, path: str) -> None:
    """Write the JSON model to a driver-local path (deploys that need
    shared storage write the string through their own filesystem layer)."""
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(params_to_json(params))


def load_params(path: str) -> FSParams:
    with open(path, encoding="utf-8") as fh:
        return params_from_json(fh.read())


def match_weight_expr(params: FSParams) -> Column:
    """Learned log2 match weight as a literal ``when``-chain over the
    gamma columns — broadcast model state, zero joins, pure codegen."""
    expr: Column = F.lit(params.prior_log2_odds)
    for name, _, th in COMPARISONS:
        g = F.col(f"gamma_{name}")
        arm: Column = F.lit(params.log2_bf(name, 0))
        for level in range(1, len(th) + 1):
            arm = F.when(g == level, F.lit(params.log2_bf(name, level))).otherwise(
                arm
            )
        expr = expr + arm
    return expr


def fs_score_pairs(explained: DataFrame, params: FSParams) -> DataFrame:
    """Pairs + learned params -> match_weight and match_probability
    (sigmoid of the log2 odds: p = 2^w / (1 + 2^w))."""
    vec = comparison_vectors(explained)
    w = match_weight_expr(params)
    scored = vec.withColumn("match_weight", w)
    p = F.pow(F.lit(2.0), F.col("match_weight"))
    return scored.withColumn("match_probability", p / (F.lit(1.0) + p))


# ---------------------------------------------------------------------------
# term-frequency adjustment (Splink's tf_adjustment): value-level evidence
# ---------------------------------------------------------------------------


def term_frequency_table(records: DataFrame, value_col: str) -> DataFrame:
    """Per-value occurrence counts over the record corpus (non-null only):
    ``(value, n_value)``.  One map-side-combinable aggregation; cardinality
    is the number of DISTINCT values — a vocabulary-scale table even at
    100 TB, which is what makes the adjustment join broadcast-able."""
    return (
        records.where(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("value"))
        .agg(F.count(F.lit(1)).alias("n_value"))
    )


def tf_column_stats(tf: DataFrame) -> Tuple[int, int]:
    """(n_total, sum_sq) for a term-frequency table.  ``sum_sq / n_total^2``
    is EXACTLY P(two random records agree on the column) — the column-level
    u-probability the generic weight assumes, which the per-value
    adjustment replaces.  One-row aggregate collect (model state)."""
    row = tf.agg(
        F.sum("n_value").alias("n_total"),
        F.sum(F.col("n_value") * F.col("n_value")).alias("sum_sq"),
    ).collect()[0]
    return int(row["n_total"] or 0), int(row["sum_sq"] or 0)


def tf_adjustment_evidence(
    pairs: DataFrame, tf: DataFrame, value_col: str
) -> DataFrame:
    """Integer-exact TF evidence per candidate pair (the oracle-gradeable
    half of the adjustment): for pairs that agree EXACTLY on the value,
    the agreed value and its corpus count, plus the column totals.  The
    log2 arithmetic lives in :func:`with_tf_adjusted_weight` (floats are
    deliberately kept out of this surface so the gate hash is exact).

    The tf join is hinted broadcast: the build side is the value
    vocabulary, and a broadcast join also neutralises pair-stream skew on
    hot common values (a shuffled join would send every "SPRINGFIELD"
    pair to one task)."""
    n_total, sum_sq = tf_column_stats(tf)
    va, vb = F.col(f"{value_col}_a"), F.col(f"{value_col}_b")
    agreed = F.when(va.isNotNull() & (va == vb), va)
    evidenced = pairs.select(
        "rec_id_a", "rec_id_b", agreed.alias("agreed_value")
    ).join(
        F.broadcast(tf.withColumnRenamed("value", "agreed_value")),
        "agreed_value",
        "left",
    )
    return evidenced.select(
        "rec_id_a",
        "rec_id_b",
        "agreed_value",
        F.col("n_value").cast("long").alias("n_value"),
        F.lit(n_total).cast("long").alias("n_total"),
        F.lit(sum_sq).cast("long").alias("sum_sq"),
    )


def with_tf_adjusted_weight(
    scored: DataFrame,
    evidence: DataFrame,
    weight_col: str = "match_weight",
) -> DataFrame:
    """Apply the Splink-style TF adjustment to a match-weight column:
    agreeing on value v multiplies the Bayes factor by u_col / tf_v where
    tf_v = n_value / n_total and u_col = sum_sq / n_total^2, i.e. adds
    ``log2(sum_sq / (n_total * n_value))`` — negative for common values
    (weaker evidence), positive for rare ones.  Pairs without exact
    agreement are untouched."""
    adj = F.when(
        F.col("n_value").isNotNull(),
        F.log2(
            F.col("sum_sq").cast("double")
            / (F.col("n_total") * F.col("n_value")).cast("double")
        ),
    ).otherwise(F.lit(0.0))
    joined = scored.join(
        evidence.select("rec_id_a", "rec_id_b", "n_value", "n_total", "sum_sq"),
        ["rec_id_a", "rec_id_b"],
        "left",
    )
    return joined.withColumn(
        f"{weight_col}_tf", F.col(weight_col) + F.coalesce(adj, F.lit(0.0))
    ).drop("n_value", "n_total", "sum_sq")
