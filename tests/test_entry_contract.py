"""Driver-contract surface tests: every queries() entry runs and returns
rows with a stable schema at sf0.001; render/validate queries agree with
the scalar core on spot rows.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

EXPECTED_QUERIES = {
    # relational / dataflow
    "q1_pricing_summary", "top_revenue_orders", "nation_revenue",
    "window_events_top3", "events_daily", "rollup_revenue", "cube_orders",
    "grouping_sets_customers", "events_running",
    "customers_without_orders", "customers_with_orders", "event_setops",
    "events_asof_join", "events_range_join", "streaming_events_daily",
    "streaming_sessions", "streaming_dedup_events", "streaming_interval_join",
    "json_props_agg",
    # reference scalar semantics (SURVEY §2.A)
    "postal_canon", "ws_normalize", "territory_normalize",
    "er_normalize_mentions", "render_addresses", "validate_mentions",
    "territory_expand",
    # ER dataflow (SURVEY §2.B)
    "blocking_stats", "phonetic_blocking_stats", "candidate_pair_counts",
    "cc_clusters",
    "er_link_mentions", "er_link_closure", "er_threshold_sweep",
    "er_membership_history", "blocking_key_profile", "er_edge_provenance",
    "er_entity_split", "er_distance_histogram",
    "er_eval_metrics",
    "er_golden_records", "er_cluster_cohesion", "er_cluster_graph",
    "er_cluster_diff", "er_stable_ids", "er_training_triplets",
    "er_bridge_edges", "er_bridge_chain", "er_bcubed_stats",
    "er_merge_distance", "er_incremental_link", "er_retract_link",
    "er_explain_pairs", "er_streaming_link", "er_apply_review",
    "fs_pattern_truth", "link_and_dedupe",
    # training-data ops
    "exact_dedup_documents", "conv_transitions", "conv_windows",
    "conv_prefix_dups", "conv_boilerplate", "streaming_conv_fold",
    "conv_alternation", "conv_near_dups",
    "conv_dup_clusters", "conv_quality_stats", "conv_split_summary",
    "rare_token_pairs", "edit_distance_pairs",
    "span_dup_stats", "benchmark_contamination", "ngram_jaccard_neighbors",
    "cosine_topk",
    "text_analysis", "pii_redaction", "doc_repetition",
    "quality_filter_stats", "dataset_split", "corpus_mixture", "vocab_topk",
    "length_dispersion",
    "doc_fingerprints", "minhash_near_dups",
    "minhash_dup_clusters", "simhash_near_dups",
    "lsh_ann_topk", "ivf_ann_topk", "embedding_near_dups", "multimodal_features",
    "udtf_doc_chunks", "sft_pairs", "conv_semantic_dups",
    "fs_pattern_counts", "fs_em_weights", "er_review_queue",
    "er_labeling_sample", "fs_labeled_mu", "sequence_packing", "snm_pairs",
    "tf_city_evidence",
    "link_two_datasets", "blocking_rule_coverage", "blocking_recall",
    "blocking_tradeoff", "blocking_subset_costs", "er_dup_estimate",
    "meta_blocking_pairs",
    "unblocked_mentions", "er_unlinkables", "profile_customer",
    "link_best_matches", "streaming_link_datasets",
    # round-4 additions: constraints, sketches, drift
    "er_constraint_violations", "er_constrained_clusters",
    "hll_distinct_sketch", "hll_group_sketch", "kmv_vocab_overlap",
    "drift_report", "cms_heavy_hitters", "len_quantile_sketch",
    "tfidf_cosine_pairs", "streaming_hll_sketch",
    # round-4 session additions: assignment linkage, data-quality suite,
    # cross-corpus dedup, rarity curation stats
    "link_mutual_best", "data_expectations", "cross_corpus_dups",
    "dedup_state_dups",
    "doc_rarity", "er_monge_elkan",
}


def _entrymod():
    import __spark_entry__ as entrymod

    return entrymod


def test_query_inventory_complete():
    # EQUALITY, not subset: a new queries() entry must be listed here (and
    # either smoke-run or explicitly excluded below) — a subset assert let
    # new queries silently skip the contract suite.
    entrymod = _entrymod()
    assert EXPECTED_QUERIES == set(entrymod.queries())


def test_oracles_reference_registered_queries():
    entrymod = _entrymod()
    qs = set(entrymod.queries())
    extra = set(entrymod.oracle_sql()) - qs
    assert not extra, f"oracle_sql keys without queries(): {extra}"


@pytest.mark.parametrize(
    "name",
    sorted(
        EXPECTED_QUERIES
        # heavyweight entries covered by their own e2e tests / bench
        # (er_streaming_link drives a full availableNow stream + state
        # fold — tests/test_link_stream.py owns it)
        - {"er_link_mentions", "cc_clusters", "simhash_near_dups",
           "er_incremental_link", "er_streaming_link",
           # two folds + a retraction over scratch state —
           # tests/test_retract.py owns it
           "er_retract_link"}
    ),
)
def test_query_runs_nonempty(spark, name):
    entrymod = _entrymod()
    df = entrymod.queries()[name](spark, SF)
    # anti-join may legitimately be near-empty; everything else must produce rows
    rows = df.limit(5).collect()
    if name != "customers_without_orders":
        assert rows, f"{name} returned no rows at sf0.001"
    assert df.columns == list(dict.fromkeys(df.columns)), "duplicate columns"


def test_render_matches_scalar_core(spark):
    entrymod = _entrymod()
    from postal_address_spark.core.normalize import AddressRecord

    df = entrymod.queries()["render_addresses"](spark, SF)
    rows = {r["mention_id"]: r["render"] for r in df.collect()}
    src = {
        r["mention_id"]: r
        for r in entrymod._mentions_df(spark, SF).collect()
    }
    checked = 0
    for mid, row in sorted(src.items())[:40]:
        rec = AddressRecord(
            strict=False,
            line1=row["line1"],
            line2=row["line2"],
            postal_code=row["postal_code"],
            city_name=row["city_name"],
            country_code=row["country_code"],
            subdivision_code=row["subdivision_code"],
        )
        assert rows[mid] == rec.render(), f"mention {mid}"
        checked += 1
    assert checked == 40


def test_validate_flags_conflicts(spark):
    entrymod = _entrymod()
    df = entrymod.queries()["validate_mentions"](spark, SF)
    rows = df.collect()
    # strict mode over the alias-coded variants must produce a mix
    assert any(r["is_valid"] for r in rows)
    assert any(not r["is_valid"] for r in rows)
    assert any(r["inconsistent_summary"] for r in rows)
    assert any(r["missing_required"] for r in rows)
