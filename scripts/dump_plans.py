"""Regenerate PLANS.md: annotated physical plans for the headline
operators — the ``.explain("formatted")`` audit trail showing that each
plan has the shape the scale design requires (pushdown, pruning,
broadcast selection, salted union, single Arrow boundary, no HOF
re-inlining).  tests/test_plans.py asserts the same properties; this file
is the human-readable evidence.

Usage: python scripts/dump_plans.py   # writes /root/repo/PLANS.md
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"
OUT = "/root/repo/PLANS.md"


def formatted(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().strip()


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("plan-dump")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em
    from postal_address_spark.operators.dedup import (
        minhash_signatures,
        simhash_fingerprints,
    )
    from postal_address_spark.operators.pairs import candidate_pairs
    from postal_address_spark.operators.scoring import score_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    blocked_like = (
        em._mentions_df(spark, SF)
        .select(
            F.col("mention_id").cast("string").alias("rec_id"),
            "line1", "city_name", "postal_code",
        )
        .withColumn("block_key", F.lit("k"))
    )

    sections = [
        (
            "q1_pricing_summary — pushdown + pruning",
            "Look for: `PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(...)]` "
            "reaching the parquet scan, and a ReadSchema restricted to the six "
            "referenced columns (no l_comment/l_partkey).",
            em.queries()["q1_pricing_summary"](spark, SF),
        ),
        (
            "nation_revenue — broadcast join selection",
            "Look for: `BroadcastHashJoin` on the nation/region dims, no "
            "CartesianProduct anywhere.",
            em.queries()["nation_revenue"](spark, SF),
        ),
        (
            "candidate_pairs — salted self-join union",
            "Look for: the two-branch Union (normal equi-join + salted hot "
            "route), broadcast of the tiny hot-key histogram, and no "
            "BroadcastNestedLoopJoin / CartesianProduct.",
            candidate_pairs(blocked_like, hot_threshold=5000, n_salt=16),
        ),
        (
            "score_pairs — single Arrow boundary",
            "Look for: exactly ONE ArrowEvalPython node (the fused JW + "
            "token-set-Levenshtein kernel); the cheap-feature cascade "
            "(null-safe equality, leading-number regex) lives in the "
            "surrounding JVM Project.",
            score_pairs(candidate_pairs(blocked_like, hot_threshold=5000, n_salt=16)),
        ),
        (
            "minhash_signatures — materialized HOF intermediates",
            "Look for: the token regex `split(` appearing ONCE (the token-hash "
            "array is a real projected column; explode_outer blocks the "
            "inferred size>0 filter that would re-inline it).",
            minhash_signatures(docs),
        ),
        (
            "simhash_fingerprints — codegen bit-count aggregate",
            "Look for: HashAggregate with 64 bit-sum buffers and NO zip_with "
            "(the interpreted per-token lambda variant costs ~10x).",
            simhash_fingerprints(docs),
        ),
        (
            "events_asof_join — union + window-last (no range explosion)",
            "Look for: one Exchange on the join key feeding a Window with "
            "`last(_rpay, true)` — an as-of join with zero candidate-pair "
            "materialization.",
            em.queries()["events_asof_join"](spark, SF),
        ),
        (
            "events_range_join — bucketed interval containment",
            "Look for: an equi-join keyed on (user_id, _bucket) with the "
            "containment predicate as a post-join Filter — never a "
            "BroadcastNestedLoopJoin/CartesianProduct over the range "
            "predicate.",
            em.queries()["events_range_join"](spark, SF),
        ),
        (
            "lsh_ann_topk — id-only bucket explosion",
            "Look for: Generate posexplode nodes whose output is "
            "(id, table_idx, bucket) WITHOUT the embedding column — vectors "
            "join back once after candidate-id dedup instead of riding the "
            "xn_tables shuffle.",
            em.queries()["lsh_ann_topk"](spark, SF),
        ),
        (
            "rare_token_pairs — frequency-filtered inverted-index join",
            "Look for: the token self-join keyed on `token` with NO text "
            "column in any Exchange (ids + integer weight only), the df "
            "cap applied BEFORE the join (the filter on the aggregated "
            "counts), and no CartesianProduct/BroadcastNestedLoopJoin.",
            em.queries()["rare_token_pairs"](spark, SF),
        ),
        (
            "er_golden_records — aggregation argmax, no window sort",
            "Look for: the per-(cluster, field) winner computed by "
            "HashAggregate over min(struct(-cnt, value)) — no Window node "
            "(a window would sort every partition for the same answer); "
            "the unpivot melt is a Generate/Expand, not a join per field.",
            em.queries()["er_golden_records"](spark, SF),
        ),
        (
            "er_eval_metrics — cell-based pair tallies",
            "Look for: ONE scan of the labeled input feeding the "
            "(pred, truth) cell aggregate; marginals re-aggregate the tiny "
            "cells frame; the final row is a chain of driver-trivial "
            "one-row joins.  No pair materialization anywhere.",
            em.queries()["er_eval_metrics"](spark, SF),
        ),
        (
            "er_cluster_graph — degrees from the doubled edge relation",
            "Look for: the edge relation unioned with itself (endpoint "
            "explode) feeding ONE id-keyed partial+final HashAggregate, "
            "per-cluster rollups keyed on cluster_id, and NO join wider "
            "than the existing edge set — nothing quadratic, no window.",
            em.queries()["er_cluster_graph"](spark, SF),
        ),
        (
            "er_cluster_diff — contingency cells over two closures",
            "Look for: one rec_id-keyed join of the two assignment "
            "relations feeding the (old, new) cell aggregate; fragment "
            "stats re-aggregate the tiny cells frame; the argmax is a "
            "min(struct(-n, id)) aggregate, not a window sort over "
            "records.",
            em.queries()["er_cluster_diff"](spark, SF),
        ),
        (
            "quality_filter_stats — codegen keep/drop gate",
            "Look for: zero Python eval nodes — token/bigram arrays and "
            "every integer cross-multiplied rule inside WholeStageCodegen; "
            "a single map pass over the scan (no Exchange before the "
            "final presentation sort).",
            em.queries()["quality_filter_stats"](spark, SF),
        ),
        (
            "vocab_topk — one token-keyed aggregate + TakeOrdered",
            "Look for: Generate (explode) inside the scan stage, partial "
            "HashAggregate before the single token Exchange, and "
            "TakeOrderedAndProject for the top-k (never a global Sort).",
            em.queries()["vocab_topk"](spark, SF),
        ),
        (
            "length_dispersion — single grouped-agg pandas node",
            "Look for: exactly ONE ArrowAggregatePython node computing all "
            "three GROUPED_AGG pandas UDAFs over one group-key Exchange.",
            em.queries()["length_dispersion"](spark, SF),
        ),
        (
            "fs_pattern_counts — codegen gammas + map-side partial agg",
            "Look for: the gamma discretisation as CASE WHEN expressions "
            "inside WholeStageCodegen (after the single explain-kernel "
            "Arrow node), then partial + final HashAggregate around one "
            "Exchange — the EM sufficient statistics reduce to <= 18 rows "
            "per task before the shuffle.",
            em.queries()["fs_pattern_counts"](spark, SF),
        ),
        (
            "snm_pairs — distributed rank + bucketed window join",
            "Look for: every Window node partitioned by the range-partition "
            "id (`windowspecdefinition(_pid, ...)` — never an empty "
            "partition spec, which would sort the corpus in ONE task), the "
            "RangePartitioning Exchange feeding it, and the w-window pair "
            "join as a plain equi-join on the rank bucket (no "
            "CartesianProduct/BNLJ).",
            em.queries()["snm_pairs"](spark, SF),
        ),
        (
            "link_two_datasets — value-collapsed cross join, cached sides",
            "Look for: the value collapse (Window min(rec_id) per exact "
            "tuple, then the rec_id = val_id filter) feeding the "
            "two-branch Union (normal cross equi-join + salted hot "
            "route); exactly THREE ArrowEvalPython nodes — one normalize "
            "chain per side, each computed ONCE into a persisted frame "
            "(InMemoryTableScan at every other reference), plus ONE "
            "scoring kernel over value pairs only; the val_id fan-out "
            "joins recover mention edges without re-scoring.",
            em.queries()["link_two_datasets"](spark, SF),
        ),
        (
            "tf_city_evidence — broadcast vocabulary join",
            "Look for: BroadcastHashJoin on the agreed value (the "
            "term-frequency table is vocabulary-scale, and broadcasting "
            "also absorbs hot-value pair skew that a shuffled join would "
            "send to one task).",
            em.queries()["tf_city_evidence"](spark, SF),
        ),
        (
            "er_stable_ids — carryover argmaxes as aggregations",
            "Look for: the (cluster, entity) contingency cells from ONE "
            "rec_id equi-join; candidate and winner selection as "
            "min(struct(-n, id)) HashAggregates — no Window node (a "
            "window would sort the cells for the same answer); every "
            "downstream join runs over cluster-count-size frames.",
            em.queries()["er_stable_ids"](spark, SF),
        ),
        (
            "er_training_triplets — argmin aggregation over doubled pairs",
            "Look for: the candidate relation unioned with itself "
            "(anchor on each side) feeding two filtered min(struct(lev, "
            "id)) HashAggregates (positive / hard negative) — no Window, "
            "no CartesianProduct; cluster tags join on rec_id only.",
            em.queries()["er_training_triplets"](spark, SF),
        ),
        (
            "blocking_subset_costs — one bitmask fold, constant lattice",
            "Look for: the unioned rule streams collapsing through ONE "
            "groupBy(pair) bit_or Exchange (map-side partial combine); "
            "the labeled truth on the BUILD side of a BroadcastHashJoin "
            "before any truth aggregation; the subsets x masks inclusion "
            "join as a BroadcastNestedLoopJoin over frames of at most "
            "2^k rows — the one place a BNLJ is the right plan.",
            em.queries()["blocking_subset_costs"](spark, SF),
        ),
        (
            "blocking_recall — broadcast labeled-truth probe",
            "Look for: the clerical truth set on the BUILD side of a "
            "BroadcastHashJoin against the unioned candidate streams (no "
            "Exchange of any rule's pair volume on the pair key before "
            "the join) — each rule reduces to its labeled survivors "
            "map-side, so the two tallies aggregate at most rules*|truth| "
            "rows no matter how many pairs the rules generate.",
            em.queries()["blocking_recall"](spark, SF),
        ),
        (
            "phonetic_blocking_stats — pure-codegen soundex key",
            "Look for: zero ArrowEvalPython/BatchEvalPython nodes — "
            "soundex + regexp_extract are JVM expressions inside "
            "WholeStageCodegen.",
            em.queries()["phonetic_blocking_stats"](spark, SF),
        ),
        (
            "edit_distance_pairs — id-only gram prefix join",
            "Look for: the prefix-gram Generate emitting (vid, gram) only "
            "(no string/padded/grams payload in the explode output or the "
            "gram-keyed Exchange), the ONLY nested-loop join being the "
            "BROADCAST short-string side path, and the banded levenshtein "
            "verification as a post-join Filter inside codegen.",
            em.queries()["edit_distance_pairs"](spark, SF),
        ),
        (
            "span_dup_stats — semi-join span probe + aggregate sweep",
            "Look for: the gram relation carrying (doc_id, pos, xxhash64) "
            "only, duplicated occurrences kept by a LeftSemi join (no "
            "fan-out multiplication on corpus-wide boilerplate grams), and "
            "the interval union as one aggregate() HOF over the per-doc "
            "sorted position array — no Python nodes anywhere.",
            em.queries()["span_dup_stats"](spark, SF),
        ),
        (
            "benchmark_contamination — broadcast decontamination probe",
            "Look for: EVERY LeftSemi join broadcast (the benchmark gram "
            "set is vocabulary-sized by construction) — the corpus gram "
            "relation is probed in place with NO Exchange on ghash.",
            em.queries()["benchmark_contamination"](spark, SF),
        ),
        (
            "meta_blocking_pairs — one pair shuffle + broadcast threshold",
            "Look for: the rules' tagged Union reducing through ONE "
            "HashAggregate pair count (partial before the Exchange), the "
            "one-row global-threshold aggregate coming back as a "
            "BroadcastNestedLoopJoin over a single row, and the integer "
            "cross-multiplied mean test as a plain Filter.",
            em.queries()["meta_blocking_pairs"](spark, SF),
        ),
        (
            "conv_near_dups — exact prefix-filtered Jaccard self-join",
            "Look for: the probing-prefix Generate emitting (sid, sz, h) "
            "only (no shingle ARRAY in the explode output or the h-keyed "
            "candidate join), the shingled base cached once "
            "(InMemoryTableScan at every consumer), the integer length "
            "filters riding the candidate join condition, and the "
            "integer cross-multiplied Jaccard decision as a post-join "
            "Filter — no CartesianProduct/BNLJ anywhere.",
            em.queries()["conv_near_dups"](spark, SF),
        ),
        (
            "conv_quality_stats — islands without a window",
            "Look for: NO Window node (the longest identical-action run "
            "is one aggregate() HOF sweep over the folded token array, "
            "inside the same projection as the other stats) and no "
            "Python eval nodes — the whole gate is one groupBy(conv) "
            "shuffle plus codegen.",
            em.queries()["conv_quality_stats"](spark, SF),
        ),
        (
            "profile_customer — single melt, single cells shuffle",
            "Look for: ONE Generate (the stack melt) feeding ONE "
            "(col_name, value) HashAggregate with partial combine before "
            "its Exchange; tallies and top-k both re-read the cells "
            "frame (ReusedExchange/InMemoryTableScan or a second cheap "
            "agg), and no Expand node (no countDistinct).",
            em.queries()["profile_customer"](spark, SF),
        ),
        (
            "conv_semantic_dups — id-only sign-LSH + integer cosine verify",
            "Look for: the bucket Generate posexplode emitting "
            "(id, table_idx, bucket) WITHOUT the integer embedding array "
            "(vectors join back after the candidate dedup), zero Python "
            "eval nodes (hashed-gram embedding, hyperplane dots and the "
            "cross-multiplied cosine are all codegen), and no "
            "CartesianProduct/BNLJ.",
            em.queries()["conv_semantic_dups"](spark, SF),
        ),
        (
            "sft_pairs — one fold shuffle + one dedup window",
            "Look for: exactly two hashpartitioning Exchanges (the "
            "groupBy(conv) fold and the pair-hash dedup window), the "
            "context slice projected as a real column before the render "
            "lambda (HOF rule 1), posexplode_outer (rule 2), and zero "
            "Python eval nodes.",
            em.queries()["sft_pairs"](spark, SF),
        ),
        (
            "er_labeling_sample — salted two-phase stratified top-k",
            "Look for: TWO Window nodes (the salted local top-k over "
            "(gammas, hash % n_salt), then the final re-rank over the "
            "<= k x n_salt survivors — a single pattern-keyed window "
            "would collapse parallelism to <= 18 tasks), and the stratum "
            "counts joining back as a BroadcastHashJoin (never a "
            "SortMergeJoin on the tiny sampled side).",
            em.queries()["er_labeling_sample"](spark, SF),
        ),
        (
            "fs_labeled_mu — one stack unpivot + one aggregate",
            "Look for: ONE Generate (the stack unpivot of the gamma "
            "columns) feeding ONE HashAggregate with partial map-side "
            "combine before a single Exchange; no Join, no Window — the "
            "labeled tallies reduce to <= 8 rows regardless of label "
            "volume.",
            em.queries()["fs_labeled_mu"](spark, SF),
        ),
        (
            "conv_windows — one fold shuffle + one generator",
            "Look for: ONE Exchange (the conversation fold), ONE Generate "
            "(posexplode_outer of the never-empty window-index sequence — "
            "plain explode would add an inferred size>0 filter that "
            "re-inlines it), and no Join: window slicing runs on the "
            "projected token array.",
            em.queries()["conv_windows"](spark, SF),
        ),
        (
            "conv_prefix_dups — integer-signature candidate join, arrays "
            "join back",
            "Look for: the prefix signature stream (posexplode -> "
            "pmod(xxhash64) -> one conv-partitioned cumulative-sum "
            "Window reusing the fold's Exchange) joined on "
            "(length, checksum, last-hash) INTEGERS only — no toks#/tok# "
            "payload on the candidate join — with the token arrays "
            "joining back solely for the slice-equality verification of "
            "the bounded candidate set; no CartesianProduct/BNLJ "
            "anywhere.",
            em.queries()["conv_prefix_dups"](spark, SF),
        ),
        (
            "er_dup_estimate — one kernel pass, three 1-row aggregates",
            "Look for: the two rule pair streams unioned + distinct "
            "before ONE levenshtein kernel evaluation (never one kernel "
            "pass per rule), per-system matches recovered as LeftSemi "
            "joins, and the Chapman algebra over a cross join of three "
            "single-row aggregates — nothing pair-scale reaches the "
            "driver.",
            em.queries()["er_dup_estimate"](spark, SF),
        ),
        (
            "sequence_packing — one shard shuffle, text never moves",
            "Look for: exactly ONE Exchange (hashpartitioning on shard) "
            "feeding FlatMapGroupsInPandas, with the Project below it "
            "carrying only (id, n_tokens, hash, shard) — the text column "
            "is pruned before the shuffle; per-shard next-fit is the one "
            "linear pandas pass.",
            em.queries()["sequence_packing"](spark, SF),
        ),
        (
            "er_constrained_clusters — broadcast constraints, one repair boundary",
            "Look for: the cannot-link table on the BUILD side of every "
            "BroadcastHashJoin probe (violations, edge anti-join, repair "
            "fan-in) — the edge/assignment volume never shuffles on a "
            "constraint key; exactly ONE FlatMapGroupsInPandas (the "
            "per-violated-cluster greedy repair), its input projected to "
            "(cluster_id, kind, src, dst, score) — no payload columns; "
            "no CartesianProduct.",
            em.queries()["er_constrained_clusters"](spark, SF),
        ),
        (
            "hll_distinct_sketch — one partial-agg shuffle, codegen only",
            "Look for: ONE Exchange fed by partial_max (the map side "
            "reduces to <= 2^p register rows per task before any "
            "shuffle), the md5/rank arithmetic inside WholeStageCodegen, "
            "no Expand/Window/Python nodes.",
            em.queries()["hll_distinct_sketch"](spark, SF),
        ),
        (
            "kmv_vocab_overlap — TakeOrdered sketches, no global sort",
            "Look for: TakeOrderedAndProject for every bottom-k (map-side "
            "partial top-k — a global Sort would materialize the full "
            "distinct hash set), and the final overlap probe joining "
            "k-row frames only.",
            em.queries()["kmv_vocab_overlap"](spark, SF),
        ),
        (
            "drift_report — counts reduce before the cap window",
            "Look for: partial_count before each Exchange (the corpus "
            "reduces map-side to (field, bin) cells), the full-outer "
            "join of two already-tiny count tables, and exactly ONE "
            "Window (the deterministic top-N cap) running over the "
            "reduced table — never over raw rows.",
            em.queries()["drift_report"](spark, SF),
        ),
        (
            "cms_heavy_hitters — sketch filter pushed at the scan",
            "Look for: NO join anywhere (the collected CMS rides as one "
            "constant-folded `map(keys: ...)` literal); the least/"
            "element_at candidate filter sitting in the scan's "
            "DataFilters — BELOW the partial HashAggregate — so the "
            "exact count only ever aggregates the heavy-hitter "
            "candidate superset, never the full key population.",
            em.queries()["cms_heavy_hitters"](spark, SF),
        ),
        (
            "len_quantile_sketch — generated integer CASE, one shuffle",
            "Look for: the 63-arm bucket CASE chain inside "
            "WholeStageCodegen (integer comparisons and `div` only — no "
            "log/pow floats), partial_count before the single Exchange "
            "(<= 63*2^s + 1 bucket rows per task), no Expand, no "
            "Python/Arrow nodes.",
            em.queries()["len_quantile_sketch"](spark, SF),
        ),
        (
            "tfidf_cosine_pairs — id-only prefix join, decimal verify",
            "Look for: the prefix window (tail2/norm2 sums) partitioned "
            "by doc_id over the cached token relation "
            "(InMemoryTableScan at every reuse); the candidate "
            "self-join keyed on `token` carrying doc ids only (no text, "
            "no arrays in any Exchange); the verify joins keyed on the "
            "DEDUPED candidate ids; the threshold comparison in "
            "decimal(38,0) casts; no CartesianProduct/BNLJ anywhere.",
            em.queries()["tfidf_cosine_pairs"](spark, SF),
        ),
        (
            "data_expectations — one scan + one shared melt, no Python",
            "Look for: the row-level checks as conditional sums inside "
            "ONE HashAggregate pair over the scan (1-row result exploded "
            "to report rows by Generate inline — no driver collect); "
            "exactly ONE `Generate stack` feeding the (check, value) "
            "partial_count for ALL uniqueness checks together; the tiny "
            "meta join broadcast; no Expand, no Python/Arrow nodes.",
            em.queries()["data_expectations"](spark, SF),
        ),
        (
            "cross_corpus_dups — id-only A x B banding, verify joins back",
            "Look for: both sides' MinHash signature aggregations "
            "(partial_min before each id-keyed Exchange), the "
            "(band_idx, band_hash) equi-join whose exchanges carry ids "
            "and band keys ONLY (no text, no shingle arrays), the "
            "shingle sets joining back on the DEDUPED candidate ids for "
            "the exact-Jaccard verify, and no CartesianProduct/BNLJ.",
            em.queries()["cross_corpus_dups"](spark, SF),
        ),
        (
            "dedup_state_dups — increment-only sketching against the "
            "stored index",
            "Look for: exactly ONE MinHash signature aggregation (the "
            "corpus increment — the reference side arrives as the "
            "already-banded state frames, so no second shingle/minhash "
            "chain exists anywhere in the plan), the (band_idx, "
            "band_hash) equi-join carrying ids only, and the verify "
            "joining the state shingle table back on deduped candidate "
            "ids; no CartesianProduct/BNLJ.",
            em.queries()["dedup_state_dups"](spark, SF),
        ),
        (
            "doc_rarity — id-hash token stream, Expand-free df",
            "Look for: the (doc, token-hash) stream carrying 8-byte "
            "hashes (never token strings) into both aggregations; "
            "document frequency via the (hash, doc) collapse + "
            "vocabulary roll-up (no Expand node — the countDistinct "
            "trap); the df table joining back on the hash; partial "
            "aggregation before every Exchange.",
            em.queries()["doc_rarity"](spark, SF),
        ),
        (
            "er_monge_elkan — one Arrow node for both directions",
            "Look for: exactly ONE ArrowEvalPython node (both directed "
            "means ride one struct column; the rule-3 nondeterministic "
            "marker stops projection rewrites from duplicating it), the "
            "refined candidate equi-join with no Cartesian, and the "
            "symmetric max as plain JVM greatest over the struct fields.",
            em.queries()["er_monge_elkan"](spark, SF),
        ),
        (
            "link_mutual_best — two window-free argmaxes",
            "Look for: both direction argmaxes as min(struct(-score, id)) "
            "HashAggregates with partial_min map-side combine (never a "
            "Window sort of the edge set), and the surviving one-to-one "
            "pair set produced by a plain equi-join of the two "
            "already-reduced best tables.",
            em.queries()["link_mutual_best"](spark, SF),
        ),
    ]

    with open(OUT, "w", encoding="utf-8") as fh:
        fh.write(
            "# PLANS — physical-plan audit of the headline operators\n\n"
            "Generated by `python scripts/dump_plans.py` at sf0.001 "
            "(plan *shape* is scale-invariant; AQE re-plans sizes at "
            "runtime).  The same properties are asserted as regression "
            "tests in `tests/test_plans.py`.\n"
        )
        for title, note, df in sections:
            fh.write(f"\n## {title}\n\n{note}\n\n```\n{formatted(df)}\n```\n")
    print(f"wrote {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
