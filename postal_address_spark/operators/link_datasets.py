"""Two-dataset record linkage ("link only" mode).

Link a mention source A against a second source B — the Splink
``link_only`` job shape (match a messy feed against a reference catalog,
or two feeds against each other) as opposed to the deduplication pipeline
(`plans/pipeline.py`), whose self-join pairs records within ONE source.

Semantics: candidate pairs are the CROSS-dataset equi-join on the refined
blocking key — never A x A, never B x B — scored by the exact same
production cascade (`scoring.score_pairs`), so a (a, b) pair's score here
is bit-identical to what the dedup pipeline would give the same two
records.  `best_links` then keeps each A record's single best B match
(deterministic argmax: max score, ties broken by min rec_id_b — the same
min(struct) one-aggregation idiom as survivorship, no window sort).

Callers should pass MATERIALIZED blocked inputs (persist / checkpoint —
pipeline.py:186 precedent): each side is referenced by the value
collapse, the hot-key histogram and both join branches, and an
unmaterialized normalize-UDF chain would recompute per reference.

Scale shape (engine rule 9 — score VALUES, not mentions): each side is
first collapsed to one representative per distinct normalized
(block_key, line1, city_name, postal_code) tuple; candidate generation
and kernel scoring run over value pairs only, and mention-level edges
are recovered by fanning each value edge back through the two sides'
``val_id`` maps (the pair score is a pure function of the tuple, so the
fan-out is exactly score-preserving).  An address mentioned k times in A
and j times in B costs ONE kernel evaluation, not k*j.  The remaining
join is one shuffled equi-join on (block_key, house number) with an
explicit hot-key defense measured on BOTH sides' value counts — per-key
pair volume is count_A(k) * count_B(k), so a key hot on EITHER side is
salted (A's build rows split s-fold, B fans out s ways) with AQE
skew-join as the statistical backstop.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .pairs import PAIR_FIELDS, REFINE_SAFE_THRESHOLD
from .scoring import DEFAULT_THRESHOLD, score_pairs


def _keyed(blocked: DataFrame, threshold: float) -> DataFrame:
    keyed = blocked.where(F.col("block_key").isNotNull())
    if threshold > REFINE_SAFE_THRESHOLD:
        join_key = F.concat_ws(
            "#", F.col("block_key"),
            F.coalesce(F.regexp_extract("line1", r"^(\d+)", 1), F.lit("")),
        )
    else:
        join_key = F.col("block_key")
    return keyed.withColumn("join_key", join_key)


def _with_value_id(df: DataFrame) -> DataFrame:
    """val_id = min rec_id over the exact scoring tuple (pipeline.py's
    "score values, not mentions" collapse); NULLs group together,
    matching the scorer's null-safe equality."""
    w = Window.partitionBy("block_key", "line1", "city_name", "postal_code")
    return df.withColumn("val_id", F.min("rec_id").over(w))


def cross_candidate_pairs(
    a_blocked: DataFrame,
    b_blocked: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
    hot_threshold: int = 20000,
    n_salt: int = 16,
) -> DataFrame:
    """Blocked frames A, B -> cross-dataset candidate pairs
    (block_key, <field>_a, <field>_b).  Only A x B pairs exist by
    construction; no ``<`` dedup predicate is needed (the sides are
    disjoint datasets, so (a, b) is already unique)."""
    a = _keyed(a_blocked, threshold)
    b = _keyed(b_blocked, threshold)

    # Hot keys measured on BOTH sides: per-key pair volume is nA * nB, so
    # a key exceeding the threshold on EITHER side routes through the
    # salted branch (the A build splits s-fold whichever side is large).
    # Inner join: keys present on one side only produce no pairs.
    ha = a.groupBy("join_key").agg(F.count(F.lit(1)).alias("_na"))
    hb = b.groupBy("join_key").agg(F.count(F.lit(1)).alias("_nb"))
    hot_keys = (
        ha.join(hb, "join_key")
        .where(F.greatest("_na", "_nb") > hot_threshold)
        .select("join_key")
        .withColumn("__hot", F.lit(True))
    )

    def sided(df: DataFrame, side: str, extra=()) -> DataFrame:
        return df.select(
            "join_key", "__hot",
            *[F.col(c).alias(f"{c}_{side}") for c in PAIR_FIELDS + list(extra)],
        )

    a_f = sided(a.join(F.broadcast(hot_keys), "join_key", "left"), "a",
                extra=["block_key"])
    b_f = sided(b.join(F.broadcast(hot_keys), "join_key", "left"), "b")

    normal = (
        a_f.where(F.col("__hot").isNull()).drop("__hot")
        .join(b_f.where(F.col("__hot").isNull()).drop("__hot"), "join_key")
    )
    hot_a = a_f.where(F.col("__hot").isNotNull()).drop("__hot").withColumn(
        "salt", F.pmod(F.xxhash64("rec_id_a"), F.lit(n_salt))
    )
    hot_b = (
        b_f.where(F.col("__hot").isNotNull()).drop("__hot")
        # explode_outer: constant non-empty sequence (pairs.py rationale)
        .withColumn(
            "salt", F.explode_outer(F.sequence(F.lit(0), F.lit(n_salt - 1)))
        )
        .withColumn("salt", F.col("salt").cast("long"))
    )
    hot = hot_a.join(hot_b, ["join_key", "salt"]).drop("salt")

    return (
        normal.unionByName(hot)
        .withColumnRenamed("block_key_a", "block_key")
        .drop("join_key")
    )


def link_datasets(
    a_blocked: DataFrame,
    b_blocked: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
    hot_threshold: int = 20000,
    n_salt: int = 16,
) -> DataFrame:
    """A x B match edges: rec_id_a, rec_id_b, block_key, score.

    Kernel work runs over distinct-value representatives only (module
    docstring); mention edges are recovered by the val_id fan-out, score
    unchanged (the score is a pure function of the collapsed tuple)."""
    av_all = _with_value_id(a_blocked.where(F.col("block_key").isNotNull()))
    bv_all = _with_value_id(b_blocked.where(F.col("block_key").isNotNull()))
    values_a = av_all.where(F.col("rec_id") == F.col("val_id"))
    values_b = bv_all.where(F.col("rec_id") == F.col("val_id"))

    value_edges = score_pairs(
        cross_candidate_pairs(
            values_a, values_b, threshold, hot_threshold, n_salt
        ),
        threshold,
    )
    ma = av_all.select(
        F.col("val_id").alias("rec_id_a"), F.col("rec_id").alias("_ma")
    )
    mb = bv_all.select(
        F.col("val_id").alias("rec_id_b"), F.col("rec_id").alias("_mb")
    )
    return (
        value_edges.join(ma, "rec_id_a")
        .join(mb, "rec_id_b")
        .select(
            F.col("_ma").alias("rec_id_a"),
            F.col("_mb").alias("rec_id_b"),
            "block_key",
            "score",
        )
    )


def best_links(edges: DataFrame) -> DataFrame:
    """One best B match per A record: max score, ties -> min rec_id_b.
    A single map-side-combinable min(struct(-score, rec_id_b)) aggregation
    (negated score turns the max into the struct ordering's min) — no
    global window, no per-key sort."""
    pick = F.min(F.struct((-F.col("score")).alias("ns"), "rec_id_b")).alias("p")
    return (
        edges.groupBy("rec_id_a")
        .agg(pick)
        .select(
            "rec_id_a",
            F.col("p.rec_id_b").alias("rec_id_b"),
            (-F.col("p.ns")).alias("score"),
        )
    )


def mutual_best_links(edges: DataFrame) -> DataFrame:
    """ONE-TO-ONE match set via reciprocal best match: keep (a, b) iff b
    is a's best match AND a is b's best match.

    ``best_links`` answers "what is each A record's best candidate", but a
    catalog record may be the best match of MANY feed records — fine for
    enrichment, wrong when the link is supposed to be an assignment (two
    snapshots of one customer base, invoice<->payment reconciliation).
    The reciprocal-best rule is the standard distributed one-to-one
    approximation (bioinformatics' reciprocal best hit; a 1/2-approximate
    maximum-weight matching on each surviving edge's neighborhood): each
    side's argmax is one map-side-combinable min(struct) aggregation (no
    window, no iteration — unlike greedy global matching, which is
    inherently sequential), and the intersection is one-to-one BY
    CONSTRUCTION — a given a appears in at most its own best pair, a
    given b likewise.

    Determinism: ties on score break to the MIN partner rec_id on both
    sides (the best_links convention), so the surviving set is a pure
    function of the edge multiset.  Note mutual-best is deliberately NOT
    maximum-weight matching: a chain a1-b1 (0.9), a2-b1 (0.95), a2-b2
    (0.9) keeps only (a2, b1) — a1 stays unmatched rather than being
    handed a partner that preferred someone else (precision over
    coverage; the unmatched remainder is visible as
    ``best_links(edges)`` minus this result).
    """
    best_a = best_links(edges)
    pick_a = F.min(F.struct((-F.col("score")).alias("ns"), "rec_id_a")).alias("p")
    best_b = (
        edges.groupBy("rec_id_b")
        .agg(pick_a)
        .select(F.col("p.rec_id_a").alias("rec_id_a"), "rec_id_b")
    )
    return best_a.join(best_b, ["rec_id_a", "rec_id_b"])
