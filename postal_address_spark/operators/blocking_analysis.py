"""Blocking-rule coverage analysis (Splink's cumulative-comparisons chart).

Multi-pass blocking UNIONS candidate sets from several rules; before
running a linkage job at scale you need to know what each rule costs and
what it ADDS: per rule, the candidate-pair count, the count of pairs no
earlier rule produced, the cumulative distinct total — plus how many
records each rule leaves blocked-into-nothing (the unlinkable-by-blocking
population).

Scale shape: the whole analysis is ONE shuffle on the pair key.  Every
rule's pair stream is tagged with its rule index and unioned; a single
``groupBy(pair).min(rule_idx)`` assigns each distinct pair to the first
rule that found it (map-side partial aggregation collapses duplicates
before the shuffle), and the per-rule tallies then reduce over that
assignment.  Nothing is re-joined per rule pair-set (the naive k-way
anti-join chain would shuffle the candidate volume k times), and the
final k-row frame is driver-trivial.  All outputs are exact integers —
the DuckDB oracle replays the counts bit-for-bit.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def key_pairs(df: DataFrame, key_col: str, id_col: str) -> DataFrame:
    """Records -> within-key candidate pairs (id order normalised,
    ``id_a < id_b``), NULL keys abstaining.  Plain equi self-join — the
    analysis measures what a rule WOULD generate, so it deliberately
    mirrors the unguarded rule; hot keys show up as exactly the large
    counts the analysis exists to surface."""
    keyed = df.where(F.col(key_col).isNotNull()).select(
        F.col(key_col).alias("_k"), F.col(id_col).alias("_id")
    )
    a = keyed.select("_k", F.col("_id").alias("rec_id_a"))
    b = keyed.select("_k", F.col("_id").alias("rec_id_b"))
    return (
        a.join(b, "_k")
        .where(F.col("rec_id_a") < F.col("rec_id_b"))
        .select("rec_id_a", "rec_id_b")
    )


def blocking_rule_analysis(
    rules: Sequence[Tuple[str, DataFrame]],
) -> DataFrame:
    """[(rule_name, pair_df)] -> one row per rule:
    ``rule, rule_idx, n_pairs, n_new_pairs, n_cumulative``.

    ``n_new_pairs`` credits each distinct pair to the FIRST rule (list
    order) that produced it; ``n_cumulative`` is the distinct-pair total
    of rules 1..i.  Pair frames must carry rec_id_a < rec_id_b (as
    :func:`key_pairs` and `sorted_neighborhood_pairs` emit)."""
    if not rules:
        raise ValueError("at least one blocking rule required")
    tagged = None
    for i, (_, pairs) in enumerate(rules):
        t = pairs.select(
            "rec_id_a", "rec_id_b", F.lit(i).alias("rule_idx")
        )
        tagged = t if tagged is None else tagged.unionByName(t)

    firsts = tagged.groupBy("rec_id_a", "rec_id_b").agg(
        F.min("rule_idx").alias("first_rule")
    )
    news = firsts.groupBy("first_rule").agg(
        F.count(F.lit(1)).alias("n_new_pairs")
    )
    totals = tagged.groupBy("rule_idx").agg(F.count(F.lit(1)).alias("n_pairs"))

    spark = tagged.sparkSession
    names = spark.createDataFrame(
        [(i, name) for i, (name, _) in enumerate(rules)],
        "rule_idx int, rule string",
    )
    out = (
        names.join(totals, "rule_idx", "left")
        .join(
            news.withColumnRenamed("first_rule", "rule_idx"), "rule_idx", "left"
        )
        .select(
            "rule",
            "rule_idx",
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce("n_new_pairs", F.lit(0)).cast("long").alias("n_new_pairs"),
        )
    )
    # running cumulative over the k-row result — the window is over the
    # rule list (a handful of rows), not data.
    w = Window.orderBy("rule_idx").rowsBetween(Window.unboundedPreceding, 0)
    return out.withColumn(
        "n_cumulative", F.sum("n_new_pairs").over(w).cast("long")
    ).orderBy("rule_idx")


def standard_blocking_rules(
    norm: DataFrame,
    snm_window: int = 4,
    refine_house_number: bool = True,
    include_snm: bool = True,
) -> List[Tuple[str, DataFrame]]:
    """The engine's three production blocking-rule pair streams over a
    normalized+keyed mention frame (needs ``rec_id``, ``block_key``,
    ``phonetic_key``, ``top_country``, ``postal_code``, ``line1``) — the
    single source of truth for the rule definitions the coverage /
    unlinkables reports describe (used by both the driver queries and
    jobs/er_report.py; the DuckDB oracle replays these exact
    definitions).  ``refine_house_number`` must mirror the linkage run
    being de-risked: candidate_pairs refines only when its threshold
    exceeds REFINE_SAFE_THRESHOLD.

    ``include_snm=False`` skips the SNM pass entirely — it never abstains
    (every record gets rank neighbours), so the unlinkables report
    excludes it by definition, and building it costs an eager
    distributed-rank job (global_rank's offset collect) that must not be
    paid for a report that discards it.

    Pass a PERSISTED frame: every rule's pair stream references it
    (pipeline.py:186 precedent)."""
    from .sorted_neighborhood import sorted_neighborhood_pairs

    if refine_house_number:
        exact_key = F.when(
            F.col("block_key").isNotNull(),
            F.concat_ws(
                "#", F.col("block_key"),
                F.coalesce(F.regexp_extract("line1", r"^(\d+)", 1), F.lit("")),
            ),
        )
    else:
        exact_key = F.col("block_key")
    exact = norm.withColumn("_exact_key", exact_key)
    rules = [
        ("exact_postal_hn" if refine_house_number else "exact_postal",
         key_pairs(exact, "_exact_key", "rec_id")),
        ("phonetic_city", key_pairs(norm, "phonetic_key", "rec_id")),
    ]
    if include_snm:
        snm_keyed = norm.select(
            "rec_id",
            F.concat_ws(
                "|",
                F.coalesce(F.col("top_country"), F.lit("")),
                F.coalesce(F.col("postal_code"), F.lit("")),
                F.coalesce(F.col("line1"), F.lit("")),
            ).alias("snm_key"),
        )
        snm = sorted_neighborhood_pairs(
            snm_keyed, "snm_key", "rec_id", snm_window
        )
        rules.append(
            (
                f"snm_window{snm_window}",
                snm.select(
                    F.least("id_a", "id_b").alias("rec_id_a"),
                    F.greatest("id_a", "id_b").alias("rec_id_b"),
                ),
            )
        )
    return rules


def meta_blocking_prune(
    rules: Sequence[Tuple[str, DataFrame]],
) -> DataFrame:
    """Meta-blocking with CBS weights + weighted-edge pruning (Papadakis
    et al., "Meta-Blocking: Taking Entity Resolution to the Next Level",
    TKDE 2014): weight every candidate pair by HOW MANY rules produced it
    (common-block scheme), then keep only pairs whose weight reaches the
    global mean — redundancy across blocking passes is evidence, and
    pruning on it shrinks the comparison set before any scoring kernel
    runs.

    Returns (rec_id_a, rec_id_b, weight) for the retained pairs.

    Scale shape: same discipline as ``blocking_rule_analysis`` — the
    tagged union reduces in ONE ``groupBy(pair).count()`` (map-side
    combinable, duplicates collapse before the shuffle), the global
    threshold is a one-row aggregate broadcast back, and the mean test is
    the INTEGER cross-multiplication ``weight * n_pairs >= sum_weights``
    (never a float mean — exact, order-free, oracle-replayable).  Each
    rule's stream emits a pair at most once by construction (one key per
    record per rule; SNM's ghost-row join pairs each window slot once),
    so the count IS the number of agreeing rules.
    """
    ap = None
    for _, pair_df in rules:
        tagged = pair_df.select("rec_id_a", "rec_id_b")
        ap = tagged if ap is None else ap.unionByName(tagged)
    if ap is None:
        raise ValueError("meta_blocking_prune needs at least one rule")
    weighted = ap.groupBy("rec_id_a", "rec_id_b").agg(
        F.count(F.lit(1)).alias("weight")
    )
    tot = weighted.agg(
        F.sum("weight").alias("_sw"), F.count(F.lit(1)).alias("_np")
    )
    return (
        weighted.crossJoin(F.broadcast(tot))
        .where(F.col("weight") * F.col("_np") >= F.col("_sw"))
        .select("rec_id_a", "rec_id_b", "weight")
    )


def unblocked_records(
    records: DataFrame, id_col: str, rules: Sequence[Tuple[str, DataFrame]]
) -> DataFrame:
    """Records that NO rule pairs with anything — the population blocking
    alone leaves unlinkable (they can only ever be singleton clusters).
    One union + distinct + anti-join."""
    if not rules:
        raise ValueError("at least one blocking rule required")
    ids: List[DataFrame] = []
    for _, pairs in rules:
        ids.append(pairs.select(F.col("rec_id_a").alias("_id")))
        ids.append(pairs.select(F.col("rec_id_b").alias("_id")))
    covered = ids[0]
    for d in ids[1:]:
        covered = covered.unionByName(d)
    return records.select(F.col(id_col).alias("rec_id")).join(
        covered.distinct().withColumnRenamed("_id", "rec_id"),
        "rec_id",
        "left_anti",
    )


def unlinkable_records(
    records: DataFrame,
    scored_pairs: DataFrame,
    id_col: str = "rec_id",
    id_a: str = "rec_id_a",
    id_b: str = "rec_id_b",
    score_col: str = "score",
    threshold: float = 0.82,
    higher_is_better: bool = True,
) -> DataFrame:
    """Per-record linkability report (Splink's "unlinkables" analysis,
    one level deeper than :func:`unblocked_records`): for every record,
    how many candidate comparisons it participated in and the BEST score
    any of them reached — records whose best score can't clear the match
    threshold can never leave a singleton cluster no matter how the
    clustering is tuned, and their share is the ceiling on achievable
    recall.

    Output: ``rec_id, n_candidates, best_score, status`` with status in
    ``linked`` (best score clears ``threshold``), ``unlinkable``
    (compared but never above it), ``no_candidates`` (blocking produced
    nothing — best_score NULL, the absence kept as data, rule 5).

    ``higher_is_better=False`` flips the comparison for distance-style
    scores (e.g. an integer edit distance, where "best" is the MINIMUM
    and linked means ``best <= threshold``) — with an integer kernel the
    whole report is exact-integer and the driver hash-grades it
    (``er_unlinkables``).

    Scale shape: the pair relation explodes into its two (id, score)
    endpoints — 2 rows per existing pair, nothing quadratic beyond what
    pairing already materialized — then ONE id-keyed map-side-combinable
    aggregation and one join back to the record spine.
    """
    sides = scored_pairs.select(
        F.col(id_a).alias("_id"), F.col(score_col).alias("_s")
    ).unionAll(
        scored_pairs.select(
            F.col(id_b).alias("_id"), F.col(score_col).alias("_s")
        )
    )
    best_agg = F.max("_s") if higher_is_better else F.min("_s")
    best = sides.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        best_agg.alias("best_score"),
    )
    spine = records.select(F.col(id_col).alias("rec_id"))
    clears = (
        F.col("best_score") >= F.lit(threshold)
        if higher_is_better
        else F.col("best_score") <= F.lit(threshold)
    )
    return (
        spine.join(best.withColumnRenamed("_id", "rec_id"), "rec_id", "left")
        .select(
            "rec_id",
            F.coalesce("n_candidates", F.lit(0).cast("long")).alias(
                "n_candidates"
            ),
            "best_score",
            F.when(F.col("best_score").isNull(), F.lit("no_candidates"))
            .when(clears, F.lit("linked"))
            .otherwise(F.lit("unlinkable"))
            .alias("status"),
        )
        .orderBy("rec_id")
    )


def blocking_key_profile(
    records: DataFrame, key_cols, id_col: str = "rec_id"
) -> DataFrame:
    """Candidate blocking keys costed BEFORE any pair is generated —
    Splink's "count comparisons from blocking rule" tool: per candidate
    key expression, ``(rule, n_records, n_keyed, n_distinct_keys,
    n_pairs, max_block)`` where ``n_pairs = sum nv*(nv-1)/2`` is EXACTLY
    the equi-self-join output volume the key would cost and ``n_keyed``
    its coverage (NULL keys abstain).  The decision table for picking
    blocking rules: a key whose n_pairs explodes (max_block skew) or
    whose coverage collapses is rejected without ever running the join.

    ``key_cols`` maps rule name -> key Column (or a list of column
    names).  Cost shape: per rule ONE map-side-combinable value count
    (vocabulary-scale, like the TF table) reduced to a single row —
    never a pair is materialized; rows are unioned (len(key_cols) rows
    out).  All-integer except nothing: everything is a count, so a
    DuckDB oracle replays it bit-for-bit.
    """
    if not isinstance(key_cols, dict):
        key_cols = {c: F.col(c) for c in key_cols}
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    out = None
    for rule, key in key_cols.items():
        per_value = (
            records.select(key.alias("_k"))
            .where(F.col("_k").isNotNull())
            .groupBy("_k")
            .agg(F.count(F.lit(1)).alias("nv"))
        )
        # integer-exact pair count: sum nv*(nv-1) (always even) as LONG,
        # halve with a shift — never a float sum (engine oracle rule).
        row = per_value.agg(
            F.coalesce(F.sum("nv"), F.lit(0)).alias("n_keyed"),
            F.count(F.lit(1)).alias("n_distinct_keys"),
            F.coalesce(
                F.sum(F.col("nv") * (F.col("nv") - F.lit(1))), F.lit(0)
            ).alias("_sp"),
            F.coalesce(F.max("nv"), F.lit(0)).alias("max_block"),
        ).select(
            F.lit(rule).alias("rule"),
            "n_keyed",
            "n_distinct_keys",
            F.shiftright(F.col("_sp"), 1).alias("n_pairs"),
            "max_block",
        )
        out = row if out is None else out.unionByName(row)
    n_records = records.select(F.count(F.lit(1)).alias("n_records"))
    return out.crossJoin(F.broadcast(n_records)).select(
        "rule", "n_records", "n_keyed", "n_distinct_keys", "n_pairs",
        "max_block",
    )


def _normalized_truth(truth_pairs: DataFrame) -> DataFrame:
    """Labeled pairs -> id-ordered, deduplicated (rec_id_a, rec_id_b):
    the rule streams' orientation.  Duplicated labels would inflate
    both the denominator and (inconsistently, via the first-rule
    dedup) the per-rule tallies — normalize once, here."""
    a, b = F.col("rec_id_a"), F.col("rec_id_b")
    return truth_pairs.select(
        F.least(a, b).alias("rec_id_a"), F.greatest(a, b).alias("rec_id_b")
    ).distinct()


def blocking_rule_recall(
    rules: Sequence[Tuple[str, DataFrame]],
    truth_pairs: DataFrame,
    broadcast_truth: bool = True,
) -> DataFrame:
    """Labeled-match recall per blocking rule — the companion the
    cost-side analyses (:func:`blocking_rule_analysis` counts what each
    rule COSTS, :func:`blocking_key_profile` predicts it) have been
    missing: what fraction of KNOWN matches does each rule actually
    co-block?  This is the Splink workflow's "check your blocking rules
    capture ~all labeled matches before trusting the linkage" step — a
    rule set with 0.99 pairwise F1 on scored pairs is still silently
    capped by whatever recall blocking left on the floor.

    ``truth_pairs``: labeled TRUE match pairs ``(rec_id_a, rec_id_b)``.
    Orientation and duplicates are NORMALIZED here (least/greatest +
    distinct): clerical labels arrive in whatever order the labeler
    clicked, and a silently-unmatched orientation would read as 0%%
    recall — a footgun, not a semantics choice.  Labeled truth
    is a clerical sample — inherently small (thousands of pairs labeled
    by humans, never the 10^12-row corpus) — so with
    ``broadcast_truth=True`` (default) it ships to every executor and
    each rule's candidate stream is reduced to its labeled survivors
    MAP-SIDE, before any shuffle: the two aggregations below run over at
    most ``len(rules) * |truth|`` rows no matter how many candidate
    pairs the rules generate.  Rule pair streams must be generated over
    the FULL record population (restricting records to labeled ids first
    would change SNM's neighbor windows — co-blocking is only
    restriction-invariant for key-equality rules).

    Output, one row per rule in list order: ``rule, rule_idx,
    n_true_caught`` (labeled pairs this rule co-blocks),
    ``n_new_true`` (those no earlier rule caught — FIRST-rule credit,
    the :func:`blocking_rule_analysis` convention), ``n_cumulative_true``,
    ``total_truth_pairs``, ``recall_rule`` and ``recall_cumulative``
    (each a SINGLE int/int double division, NULL when no labels —
    bit-stable across engines, so the driver hash-grades the report).
    """
    if not rules:
        raise ValueError("at least one blocking rule required")
    truth = _normalized_truth(truth_pairs)
    probe = F.broadcast(truth) if broadcast_truth else truth

    tagged = None
    for i, (_, pairs) in enumerate(rules):
        t = pairs.select(
            "rec_id_a", "rec_id_b", F.lit(i).alias("rule_idx")
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    caught = tagged.join(probe, ["rec_id_a", "rec_id_b"])

    totals = caught.groupBy("rule_idx").agg(
        F.count(F.lit(1)).alias("n_true_caught")
    )
    firsts = caught.groupBy("rec_id_a", "rec_id_b").agg(
        F.min("rule_idx").alias("first_rule")
    )
    news = firsts.groupBy("first_rule").agg(
        F.count(F.lit(1)).alias("n_new_true")
    )
    tot = truth.agg(F.count(F.lit(1)).alias("total_truth_pairs"))

    spark = tagged.sparkSession
    names = spark.createDataFrame(
        [(i, name) for i, (name, _) in enumerate(rules)],
        "rule_idx int, rule string",
    )
    out = (
        names.join(totals, "rule_idx", "left")
        .join(
            news.withColumnRenamed("first_rule", "rule_idx"), "rule_idx",
            "left",
        )
        .select(
            "rule",
            "rule_idx",
            F.coalesce("n_true_caught", F.lit(0)).cast("long").alias(
                "n_true_caught"
            ),
            F.coalesce("n_new_true", F.lit(0)).cast("long").alias(
                "n_new_true"
            ),
        )
    )
    w = Window.orderBy("rule_idx").rowsBetween(Window.unboundedPreceding, 0)
    out = out.withColumn(
        "n_cumulative_true", F.sum("n_new_true").over(w).cast("long")
    ).crossJoin(F.broadcast(tot))
    denom = F.nullif(F.col("total_truth_pairs"), F.lit(0))
    return out.select(
        "rule",
        "rule_idx",
        "n_true_caught",
        "n_new_true",
        "n_cumulative_true",
        F.col("total_truth_pairs").cast("long").alias("total_truth_pairs"),
        (F.col("n_true_caught") / denom).alias("recall_rule"),
        (F.col("n_cumulative_true") / denom).alias("recall_cumulative"),
    ).orderBy("rule_idx")


def missed_truth_pairs(
    rules: Sequence[Tuple[str, DataFrame]],
    truth_pairs: DataFrame,
    broadcast_truth: bool = True,
) -> DataFrame:
    """The labeled match pairs NO blocking rule co-blocks — the concrete
    casualty list behind :func:`blocking_rule_recall`'s
    ``total - n_cumulative_true`` gap, for clerical inspection (each row
    is a real missed match a new rule should be designed around).

    Same scale discipline as the recall report: every rule stream is
    reduced to its labeled survivors against the broadcast truth set
    map-side (LEFT SEMI), so the dedup + anti-join run over at most
    ``len(rules) * |truth|`` rows — the candidate volume never shuffles.
    Truth orientation is normalized like the recall report's (the
    anti-join compares id-ordered keys); label metadata columns ride
    through on the missed rows, and duplicate labels each appear.
    """
    if not rules:
        raise ValueError("at least one blocking rule required")
    truth = _normalized_truth(truth_pairs)
    probe = F.broadcast(truth) if broadcast_truth else truth
    covered = None
    for _, pairs in rules:
        t = pairs.select("rec_id_a", "rec_id_b").join(
            probe, ["rec_id_a", "rec_id_b"], "left_semi"
        )
        covered = t if covered is None else covered.unionByName(t)
    a, b = F.col("rec_id_a"), F.col("rec_id_b")
    oriented = truth_pairs.withColumns(
        {"rec_id_a": F.least(a, b), "rec_id_b": F.greatest(a, b)}
    )
    return oriented.join(
        covered.distinct(), ["rec_id_a", "rec_id_b"], "left_anti"
    )


def edge_provenance(
    rules: Sequence[Tuple[str, DataFrame]], edges: DataFrame
) -> DataFrame:
    """Match-key provenance (Splink's ``match_key``): per admitted match
    edge, WHICH blocking rule first produced the candidate pair — the
    audit column that tells a practitioner what each rule actually
    contributes to the final graph (coverage says what rules cost;
    this says what they deliver).

    ``rules`` is the ordered ``[(rule_name, pair_df)]`` list
    (:func:`standard_blocking_rules` shape, ``rec_id_a < rec_id_b``);
    ``edges`` the admitted pairs (same orientation, any extra columns
    ride through).  Output: edges + ``(match_rule_idx, match_key)``,
    crediting each pair to the FIRST rule in list order (the
    :func:`blocking_rule_analysis` convention, so the two analyses
    agree).  Edges no rule produced — e.g. review-confirmed pairs
    injected by apply_review — get ``(-1, 'none')`` rather than
    disappearing.

    Cost shape: ONE union-tag + min-per-pair aggregation (map-side
    combined; identical to the coverage analysis' single shuffle) and
    ONE equi-join back onto the admitted edges on the pair key.  The
    rule-name mapping is a literal ``when`` chain over the handful of
    rule indices — model state, never a join.
    """
    if not rules:
        raise ValueError("at least one blocking rule required")
    tagged = None
    for i, (_, pairs) in enumerate(rules):
        t = pairs.select(
            "rec_id_a", "rec_id_b", F.lit(i).alias("_rule_idx")
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    firsts = tagged.groupBy("rec_id_a", "rec_id_b").agg(
        F.min("_rule_idx").alias("_first")
    )
    idx = F.coalesce(F.col("_first"), F.lit(-1))
    name = F.lit("none")
    for i, (rule_name, _) in reversed(list(enumerate(rules))):
        name = F.when(idx == i, F.lit(rule_name)).otherwise(name)
    return (
        edges.join(firsts, ["rec_id_a", "rec_id_b"], "left")
        .withColumn("match_rule_idx", idx.cast("int"))
        .withColumn("match_key", name)
        .drop("_first")
    )


def capture_recapture(
    matched_a: DataFrame,
    matched_b: DataFrame,
    system_a: str = "system_a",
    system_b: str = "system_b",
) -> DataFrame:
    """Dual-system (capture–recapture) estimate of the TOTAL matched-pair
    population — the label-free companion to :func:`blocking_rule_recall`:
    when no clerical truth exists, two INDEPENDENT capture systems (two
    blocking rules, each feeding the same match kernel) estimate how many
    matches both of them missed, the dual-system estimation used in
    census coverage evaluation since Sekar & Deming (JASA 1949).

    Chapman's bias-corrected estimator::

        N_hat = (n_a + 1)(n_b + 1) / (m + 1) - 1

    where ``n_a``/``n_b`` are the match pairs each system captured and
    ``m`` the pairs captured by both.  Algebraically
    ``N_hat = ((n_a+1)(n_b+1) - (m+1)) / (m+1)`` and
    ``est_missed = N_hat - |A ∪ B|
                 = ((n_a+1)(n_b+1) - (m+1) - |A∪B|(m+1)) / (m+1)`` —
    each a SINGLE integer/integer division (denominator ≥ 1, never
    NULL/div-zero), so the one-row report is hash-stable across engines.
    The integer numerator is exact while ``n_a, n_b < ~3.0e9`` (the
    int64 bound on the product); past that, sample the pair streams
    before estimating — at that volume the estimate is about the RATE,
    not the roster.

    THE CAVEAT THAT MATTERS: the estimator assumes capture independence.
    Blocking rules keyed on correlated evidence (postal code and city
    both missing on the same dirty records) violate it and bias N_hat
    DOWNWARD — treat ``est_missed`` as a lower bound on what blocking
    left on the floor, exactly how census dual-system estimates are
    read.  Inputs are match-PAIR frames ``(rec_id_a, rec_id_b)`` (id-
    ordered); each is deduped here, so callers may pass raw per-rule
    captures.  Everything aggregates map-side to three 1-row frames
    before the final cross join (evaluate.py's 1-row-frame precedent) —
    nothing pair-scale ever reaches the driver."""
    a = matched_a.select("rec_id_a", "rec_id_b").distinct()
    b = matched_b.select("rec_id_a", "rec_id_b").distinct()
    both = a.join(b, ["rec_id_a", "rec_id_b"])
    na = a.agg(F.count(F.lit(1)).alias("n_a"))
    nb = b.agg(F.count(F.lit(1)).alias("n_b"))
    nm = both.agg(F.count(F.lit(1)).alias("n_both"))
    out = na.crossJoin(nb).crossJoin(nm)
    num = (F.col("n_a") + 1) * (F.col("n_b") + 1) - (F.col("n_both") + 1)
    den = F.col("n_both") + 1
    n_union = F.col("n_a") + F.col("n_b") - F.col("n_both")
    return out.select(
        F.lit(system_a).alias("system_a"),
        F.lit(system_b).alias("system_b"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("n_both").cast("long").alias("n_both"),
        n_union.cast("long").alias("n_union"),
        (num / den).alias("est_total_matches"),
        ((num - n_union * den) / den).alias("est_missed"),
    )


def blocking_subset_costs(
    rules: Sequence[Tuple[str, DataFrame]],
    truth_pairs: DataFrame,
    broadcast_truth: bool = True,
    max_rules: int = 6,
) -> DataFrame:
    """Exhaustive rule-SUBSET decision table: for every non-empty subset
    of the rule list, the DISTINCT candidate-pair cost and the labeled
    recall — the question the per-rule charts cannot answer, because
    rules overlap (two rules' pair sets share mass, so per-rule costs
    don't add and per-rule recalls don't either).  "Which combination
    of rules should ship under this comparison budget?" needs the
    union-deduplicated numbers per subset, and the subset lattice is
    tiny (``2^k - 1`` rows) even though the pair volume is not.

    Scale shape: the candidate volume is touched ONCE — each rule's
    stream is tagged with its bit (``1 << idx``) and a single
    ``groupBy(pair).bit_or`` collapses it to a per-pair rule BITMASK
    (map-side combine, the same one shuffle
    :func:`blocking_rule_analysis` pays).  Distinct masks number at
    most ``2^k - 1``, so everything downstream — the subset × mask
    inclusion join (``mask & subset != 0``), the truth tallies, the
    Pareto scan — runs over constant-size frames.  The labeled truth
    reduces map-side against the broadcast probe exactly like
    :func:`blocking_rule_recall` (orientation/dup normalization
    included).

    Output, one row per subset (``subset_id`` = the bitmask over rule
    list positions)::

        subset_id, rules ('+'-joined names), n_rules,
        n_pairs            distinct candidate pairs the subset generates
        n_true_caught      labeled matches it co-blocks
        total_truth_pairs, recall, pairs_per_true   (single divisions)
        on_frontier        no other subset is >= on recall and <= on
                           cost with one strict (the Pareto set you
                           actually choose from)

    All counts integer, divisions single int/int — the driver gate
    hash-grades the table against a DuckDB replay
    (``blocking_subset_costs``).
    """
    if not rules:
        raise ValueError("at least one blocking rule required")
    if len(rules) > max_rules:
        raise ValueError(
            f"{len(rules)} rules -> {2 ** len(rules) - 1} subsets; "
            f"raise max_rules above {max_rules} explicitly if you mean it"
        )
    truth = _normalized_truth(truth_pairs)
    probe = F.broadcast(truth) if broadcast_truth else truth

    tagged = None
    for i, (_, pairs) in enumerate(rules):
        t = pairs.select(
            "rec_id_a", "rec_id_b", F.lit(1 << i).cast("long").alias("_bit")
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    masks = tagged.groupBy("rec_id_a", "rec_id_b").agg(
        F.bit_or("_bit").alias("_mask")
    )
    mask_counts = masks.groupBy("_mask").agg(F.count(F.lit(1)).alias("_n"))
    # truth tallies never touch the full mask relation: the tagged
    # streams reduce to their labeled survivors MAP-SIDE against the
    # broadcast probe (blocking_rule_recall's discipline), and truth
    # pairs NO rule co-blocks would carry mask 0 — which can never pass
    # the `mask & subset != 0` inclusion filter, so they are simply
    # absent (the recall denominator comes from `tot`).
    truth_counts = (
        tagged.join(probe, ["rec_id_a", "rec_id_b"])
        .groupBy("rec_id_a", "rec_id_b")
        .agg(F.bit_or("_bit").alias("_mask"))
        .groupBy("_mask")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    tot = truth.agg(F.count(F.lit(1)).alias("total_truth_pairs"))

    spark = tagged.sparkSession
    names = [name for name, _ in rules]
    subsets = spark.createDataFrame(
        [
            (
                s,
                "+".join(n for i, n in enumerate(names) if s & (1 << i)),
                bin(s).count("1"),
            )
            for s in range(1, 2 ** len(rules))
        ],
        "subset_id long, rules string, n_rules int",
    )

    def _inclusion_sum(counts: DataFrame, out_col: str) -> DataFrame:
        hit = F.col("_mask").bitwiseAND(F.col("subset_id")) != 0
        return (
            subsets.select("subset_id")
            .join(counts, hit, "left")
            .groupBy("subset_id")
            .agg(F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias(out_col))
        )

    agg = (
        subsets.join(_inclusion_sum(mask_counts, "n_pairs"), "subset_id")
        .join(_inclusion_sum(truth_counts, "n_true_caught"), "subset_id")
        .crossJoin(F.broadcast(tot))
    )
    # Pareto scan over the 2^k-1-row frame: dominated = some other
    # subset is no worse on both axes and strictly better on one.
    dom_probe = agg.select(
        F.col("subset_id").alias("_oid"),
        F.col("n_pairs").alias("_op"),
        F.col("n_true_caught").alias("_ot"),
    )
    dominated = agg.join(
        dom_probe,
        (F.col("_op") <= F.col("n_pairs"))
        & (F.col("_ot") >= F.col("n_true_caught"))
        & (
            (F.col("_op") < F.col("n_pairs"))
            | (F.col("_ot") > F.col("n_true_caught"))
        ),
        "left_semi",
    ).select(F.col("subset_id").alias("_did"), F.lit(True).alias("_dom"))
    denom = F.nullif(F.col("total_truth_pairs"), F.lit(0))
    return (
        agg.join(dominated, agg["subset_id"] == dominated["_did"], "left")
        .select(
            F.col("subset_id").cast("int").alias("subset_id"),
            "rules",
            "n_rules",
            "n_pairs",
            "n_true_caught",
            F.col("total_truth_pairs").cast("long").alias(
                "total_truth_pairs"
            ),
            (F.col("n_true_caught") / denom).alias("recall"),
            (
                F.col("n_pairs") / F.nullif(F.col("n_true_caught"), F.lit(0))
            ).alias("pairs_per_true"),
            F.col("_dom").isNull().alias("on_frontier"),
        )
        .orderBy("subset_id")
    )


def blocking_rule_tradeoff(
    rules: Sequence[Tuple[str, DataFrame]],
    truth_pairs: DataFrame,
    broadcast_truth: bool = True,
) -> DataFrame:
    """Cost-per-recall decision table — the join the two separate charts
    make the practitioner do in their head: per rule the candidate-pair
    COST (:func:`blocking_rule_analysis`: total + first-rule-credited
    new pairs) against the labeled-match BENEFIT
    (:func:`blocking_rule_recall`: total + first-rule-credited new true
    matches), plus the two price columns that actually decide whether a
    rule stays in the cascade::

        pairs_per_true      = n_pairs     / n_true_caught
        new_pairs_per_new_true = n_new_pairs / n_new_true

    (each a SINGLE int/int division, NULL via ``nullif`` when the rule
    caught nothing — a rule with ``new_pairs_per_new_true`` orders of
    magnitude above its peers buys marginal recall at a price the
    scoring kernel pays downstream).  Same scale discipline as the two
    inputs: the pair-volume side is one union-tag shuffle, the truth
    side reduces map-side against the broadcast labeled sample."""
    cost = blocking_rule_analysis(rules).select(
        "rule_idx", "n_pairs", "n_new_pairs"
    )
    recall = blocking_rule_recall(
        rules, truth_pairs, broadcast_truth=broadcast_truth
    ).select(
        "rule",
        "rule_idx",
        "n_true_caught",
        "n_new_true",
        "total_truth_pairs",
    )
    out = recall.join(cost, "rule_idx")
    return out.select(
        "rule",
        "rule_idx",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("n_new_pairs").cast("long").alias("n_new_pairs"),
        "n_true_caught",
        "n_new_true",
        "total_truth_pairs",
        (
            F.col("n_pairs") / F.nullif(F.col("n_true_caught"), F.lit(0))
        ).alias("pairs_per_true"),
        (
            F.col("n_new_pairs") / F.nullif(F.col("n_new_true"), F.lit(0))
        ).alias("new_pairs_per_new_true"),
    ).orderBy("rule_idx")
