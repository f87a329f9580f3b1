"""Degenerate-input robustness: empty tables, all-identical content, a
junk hot key hitting the max_block_size guardrail, unicode payloads.

At 10^12 rows every pathological shape WILL occur in some partition; each
operator must degrade to empty/bounded output, never to an error or a
quadratic blowup.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

MENTION_DDL = (
    "rec_id string, line1 string, line2 string, postal_code string, "
    "city_name string, country_code string, subdivision_code string"
)


def _empty_mentions(spark):
    return spark.createDataFrame([], MENTION_DDL)


def test_empty_input_through_linkage_operators(spark):
    from postal_address_spark.operators.blocking import with_block_key
    from postal_address_spark.operators.cluster import assign_clusters_blocked
    from postal_address_spark.operators.normalize_op import normalize_mentions
    from postal_address_spark.operators.pairs import candidate_pairs
    from postal_address_spark.operators.scoring import score_pairs

    blocked = with_block_key(normalize_mentions(_empty_mentions(spark)))
    assert blocked.count() == 0
    pairs = candidate_pairs(blocked)
    assert pairs.count() == 0
    edges = score_pairs(pairs)
    assert edges.count() == 0
    clusters = assign_clusters_blocked(
        blocked.select("rec_id"),
        edges.select(
            F.col("rec_id_a").alias("src"),
            F.col("rec_id_b").alias("dst"),
            "block_key",
        ),
    )
    assert clusters.count() == 0


def test_empty_documents_through_dedup(spark):
    from postal_address_spark.operators.dedup import (
        exact_dedup,
        minhash_dedup,
        simhash_dedup,
    )

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup(docs).count() == 0
    assert minhash_dedup(docs).count() == 0
    assert simhash_dedup(docs).count() == 0


def test_all_identical_documents(spark):
    """One giant exact-dup group: minhash buckets collapse to one cell;
    output must be the full pair set of the group, not an error."""
    from postal_address_spark.operators.dedup import exact_dedup, minhash_dedup

    docs = spark.createDataFrame(
        [(i, "the same exact text again and again forever") for i in range(40)],
        "doc_id long, text string",
    )
    groups = exact_dedup(docs).collect()
    assert len(groups) == 1 and groups[0]["dup_count"] == 40
    pairs = minhash_dedup(docs, threshold=0.9).count()
    assert pairs == 40 * 39 // 2


def test_max_block_size_guardrail(spark):
    """A junk key shared by every row is EXCLUDED from pairing when it
    exceeds max_block_size — pair volume stays bounded, rows survive to
    cluster as singletons."""
    from postal_address_spark.operators.pairs import candidate_pairs

    n = 300
    rows = [
        (f"r{i:04d}", f"{i} Main Street", None, "99999", "Nowhere", "FR", None)
        for i in range(n)
    ]
    blocked = spark.createDataFrame(rows, MENTION_DDL).withColumn(
        "block_key", F.lit("junk")
    )
    capped = candidate_pairs(blocked, max_block_size=100, threshold=0.5)
    assert capped.count() == 0
    uncapped = candidate_pairs(blocked, threshold=0.5)
    assert uncapped.count() == n * (n - 1) // 2


def test_unicode_text_through_text_ops(spark):
    from postal_address_spark.operators.dedup import exact_dedup
    from postal_address_spark.operators.text_analysis import analyze_documents

    docs = spark.createDataFrame(
        [
            (1, "héllo wörld — ça va? 東京 🚀  nbsp"),
            (2, "Ça va très bien, merci — naïve façade"),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in analyze_documents(docs).collect()}
    assert got[1]["n_tokens"] > 0
    assert got[3]["n_tokens"] == 0
    assert exact_dedup(docs).count() == 4  # no crash, 4 distinct contents


def test_asof_empty_right_side(spark):
    import datetime as dt

    from postal_address_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("u1", "p1", dt.datetime(2024, 1, 1))],
        "user_id string, pid string, ts timestamp",
    )
    right = spark.createDataFrame([], "user_id string, ts timestamp")
    rows = asof_join(left, right, on=["user_id"]).collect()
    assert len(rows) == 1 and rows[0]["ts_asof"] is None


def test_edjoin_degenerate_inputs(spark):
    from postal_address_spark.operators.edjoin import edit_distance_pairs

    empty = spark.createDataFrame([], "rec_id int, s string")
    assert edit_distance_pairs(empty, "rec_id", "s", k=2).count() == 0
    nulls = spark.createDataFrame(
        [(1, None), (2, None)], "rec_id int, s string"
    )
    assert edit_distance_pairs(nulls, "rec_id", "s", k=2).count() == 0


def test_spandup_degenerate_inputs(spark):
    from postal_address_spark.operators.spandup import (
        contamination_stats,
        span_dup_stats,
    )

    empty = spark.createDataFrame([], "doc_id int, text string")
    assert span_dup_stats(empty, w=8).count() == 0
    blanks = spark.createDataFrame(
        [(1, ""), (2, None), (3, "   ")], "doc_id int, text string"
    )
    rows = span_dup_stats(blanks, w=8).collect()
    assert len(rows) == 3
    assert all(
        (r.n_tokens, r.n_dup_grams, r.dup_token_cover) == (0, 0, 0)
        for r in rows
    )
    # empty benchmark: every corpus doc reports zero contamination
    docs = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten")],
        "doc_id int, text string",
    )
    out = contamination_stats(docs, empty, w=8).collect()
    assert len(out) == 1 and out[0].n_contam_grams == 0


def test_profile_all_null_column(spark):
    from postal_address_spark.operators.profiling import profile_columns

    df = spark.createDataFrame(
        [(None, "x"), (None, "x")], "a string, b string"
    )
    rows = profile_columns(df, ["a", "b"], top_k=3).collect()
    # the all-NULL column MUST still appear (100%-null is the most
    # important profiling finding): one row, NULL rank/value
    by_col = {}
    for r in rows:
        by_col.setdefault(r.col_name, []).append(r)
    assert set(by_col) == {"a", "b"}
    [a] = by_col["a"]
    assert (a.n_rows, a.n_null, a.n_distinct) == (2, 2, 0)
    assert a.rank is None and a.value is None
    [b] = by_col["b"]
    assert (b.n_null, b.n_distinct, b.value) == (0, 1, "x")


def test_meta_blocking_empty_pair_streams(spark):
    from postal_address_spark.operators.blocking_analysis import (
        meta_blocking_prune,
    )

    empty = spark.createDataFrame([], "rec_id_a string, rec_id_b string")
    assert meta_blocking_prune([("r1", empty), ("r2", empty)]).count() == 0


# ---- round-4 session operators: degenerate inputs ----

def test_cluster_at_thresholds_empty_edges(spark):
    from postal_address_spark.operators.cluster import cluster_at_thresholds

    verts = spark.createDataFrame([("a",), ("b",)], "rec_id string")
    edges = spark.createDataFrame([], "src string, dst string, score int")
    out = cluster_at_thresholds(verts, edges, [1, 2]).collect()
    # every vertex is its own singleton at every threshold
    assert {(r.rec_id, r.threshold, r.cluster_id) for r in out} == {
        ("a", 1, "a"), ("b", 1, "b"), ("a", 2, "a"), ("b", 2, "b"),
    }


def test_membership_history_empty(spark):
    from postal_address_spark.operators.cluster import membership_history

    asg = spark.createDataFrame(
        [], "version int, rec_id string, cluster_id string"
    )
    assert membership_history(asg).count() == 0


def test_pack_sequences_empty_and_zero_tokens(spark):
    from postal_address_spark.operators.packing import (
        bin_stats,
        pack_sequences,
    )

    empty = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert pack_sequences(empty, 64).count() == 0
    # zero-token docs pack (infinitely many fit); stats stay defined
    zeros = spark.createDataFrame(
        [(i, 0) for i in range(5)], "doc_id long, n_tokens long"
    )
    packed = pack_sequences(zeros, 64, n_shards=1)
    rows = packed.collect()
    assert len(rows) == 5
    assert all(not r.oversize and r.start_offset == 0 for r in rows)
    stat = bin_stats(packed, 64).collect()[0]
    assert stat.n_bins == 1 and stat.total_tokens == 0


def test_conversation_windows_empty_and_all_null_actions(spark):
    from postal_address_spark.operators.conversations import (
        conversation_windows,
    )

    empty = spark.createDataFrame(
        [], "conv_id long, turn_idx int, action string"
    )
    assert conversation_windows(empty).count() == 0
    # all-NULL actions: conversation absent (the documented fold rule)
    nulls = spark.createDataFrame(
        [(1, 0, None), (1, 1, None)],
        "conv_id long, turn_idx int, action string",
    )
    assert conversation_windows(nulls).count() == 0


def test_mu_from_labels_empty(spark):
    from postal_address_spark.operators import fs_em

    empty = spark.createDataFrame(
        [],
        "rec_id_a string, rec_id_b string, gamma_line1_jw int,"
        " gamma_line1_tsl int, gamma_city_jw int, is_match boolean",
    )
    assert fs_em.mu_from_labels(empty).count() == 0


def test_labeling_sample_empty(spark):
    from postal_address_spark.operators import fs_em

    empty = spark.createDataFrame(
        [],
        "rec_id_a string, rec_id_b string, gamma_line1_jw int,"
        " gamma_line1_tsl int, gamma_city_jw int",
    )
    assert fs_em.labeling_sample(empty, 5).count() == 0


def test_edge_provenance_empty_edges(spark):
    from postal_address_spark.operators.blocking_analysis import (
        edge_provenance,
    )

    pairs = spark.createDataFrame(
        [("a", "b")], "rec_id_a string, rec_id_b string"
    )
    empty = spark.createDataFrame([], "rec_id_a string, rec_id_b string")
    assert edge_provenance([("r0", pairs)], empty).count() == 0
