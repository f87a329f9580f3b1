"""Physical/optimized-plan assertions: the scale properties the engine
relies on (pushdown, pruning, broadcast selection, no cartesian products,
no HOF re-inlining) must be visible in the plan, not assumed.

These are regression guards for plan-shape bugs that stay invisible at
test scale and only hurt at 100x data (e.g. a filter that silently stops
reaching the parquet scan, or Catalyst re-inlining an array expression
into every lambda call site — measured 40x on shingling).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_pruning(spark):
    import __spark_entry__ as em

    df = em.queries()["q1_pricing_summary"](spark, SF)
    plan = physical(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan must not read columns the query never uses
    assert "l_comment" not in plan and "l_partkey" not in plan


def test_nation_revenue_broadcasts_dims(spark):
    import __spark_entry__ as em

    df = em.queries()["nation_revenue"](spark, SF)
    plan = physical(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_no_cartesian_in_pair_generation(spark):
    from pyspark.sql import functions as F

    import __spark_entry__ as em
    from postal_address_spark.operators.blocking import with_block_key
    from postal_address_spark.operators.normalize_op import normalize_mentions
    from postal_address_spark.operators.pairs import candidate_pairs

    m = em._mentions_df(spark, SF).withColumnRenamed("mention_id", "rec_id")
    blocked = with_block_key(normalize_mentions(m)).where(
        F.col("block_key").isNotNull()
    )
    plan = physical(candidate_pairs(blocked))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_no_hof_reinlining(spark):
    """The token-split must appear exactly once in the optimized plan: a
    second occurrence means Catalyst re-expanded the token-hash array into
    the gram lambda or an explode-inferred filter (dedup.py rationale)."""
    from postal_address_spark.operators.dedup import minhash_signatures

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    plan = optimized(minhash_signatures(docs))
    assert plan.count("split(") == 1, plan[:2000]


def test_explain_pairs_single_arrow_node(spark):
    """explain_pairs evaluates its struct kernel UDF in exactly ONE
    ArrowEvalPython node: the struct is referenced once per field in a
    later projection, and without the nondeterministic marker the
    optimizer would re-inline the UDF per field access (engine rule 3 —
    one Arrow transfer per field instead of one total)."""
    import __spark_entry__ as em

    plan = physical(em.queries()["er_explain_pairs"](spark, SF))
    assert plan.count("explain_kernels") == 1, plan[:2000]


def test_ngram_jaccard_no_hof_reinlining(spark):
    """The neighbor-jaccard query projects the shingle array per side via
    with_word_shingles: exactly one token split per side (a, b) in the
    optimized plan — more means the split chain re-inlined into the gram
    lambda (quadratic per doc, the corpus.py 200x shape)."""
    import __spark_entry__ as em

    plan = optimized(em.queries()["ngram_jaccard_neighbors"](spark, SF))
    assert plan.count("split(") == 2, plan[:2000]


def test_fingerprint_no_hof_reinlining(spark):
    from postal_address_spark.operators.text_analysis import with_doc_fingerprint

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    plan = optimized(with_doc_fingerprint(docs))
    assert plan.count("split(") == 1, plan[:2000]


def test_simhash_stays_in_codegen(spark):
    """Fingerprints must be sums in a hash aggregate, not interpreted
    per-token zip_with lambdas."""
    from postal_address_spark.operators.dedup import simhash_fingerprints

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    plan = physical(simhash_fingerprints(docs))
    assert "zip_with" not in plan
    assert "HashAggregate" in plan


def test_lsh_explode_carries_no_vectors(spark):
    """The xn_tables bucket explosion must carry only (id, table, bucket):
    a Generate node whose output includes the embedding column means the
    vectors ride the multiplied shuffle (round-1 verdict perf-weak item —
    at 100 TB that multiplier is the difference between viable and not)."""
    from pyspark.sql import functions as F

    from postal_address_spark.operators.similarity_search import (
        embedding_near_dup,
        lsh_topk,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = emb.where(F.col("vec_id") < 4)
    for df in (
        lsh_topk(emb, queries, dim=64, k=3, n_tables=4, bits=4),
        embedding_near_dup(emb, dim=64, n_tables=4, bits=4),
    ):
        plan = physical(df)
        for line in plan.splitlines():
            if "Generate posexplode" in line:
                assert "embedding" not in line, line


def test_lsh_bucket_udf_evaluated_once_per_side(spark):
    """Plain posexplode infers a size>0 filter that pushes below the
    repartition Exchange and DUPLICATES the ArrowEvalPython bucket-UDF
    node (observed: 4 evals instead of 2).  posexplode_outer admits no
    such inference; each side pays the numpy matmul exactly once."""
    from pyspark.sql import functions as F

    from postal_address_spark.operators.similarity_search import lsh_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = emb.where(F.col("vec_id") < 4)
    plan = physical(lsh_topk(emb, queries, dim=64, k=3, n_tables=4, bits=4))
    assert plan.count("ArrowEvalPython") == 2, plan[:3000]


def test_range_join_no_cartesian(spark):
    """The bucketed range join must plan as an equi-join on
    (key, bucket) — never a nested-loop over the range predicate."""
    import __spark_entry__ as em

    df = em.queries()["events_range_join"](spark, SF)
    plan = physical(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scoring_single_arrow_boundary(spark):
    """Scoring ships the pair stream through Arrow ONCE (one fused
    python-eval stage), with the cheap-feature cascade staying JVM-side.
    A blocked-shaped frame without the normalize UDF isolates the count."""
    from pyspark.sql import functions as F

    import __spark_entry__ as em
    from postal_address_spark.operators.pairs import candidate_pairs
    from postal_address_spark.operators.scoring import score_pairs

    blocked = (
        em._mentions_df(spark, SF)
        .select(
            F.col("mention_id").cast("string").alias("rec_id"),
            "line1", "city_name", "postal_code",
        )
        .withColumn("block_key", F.lit("k"))
    )
    plan = physical(score_pairs(candidate_pairs(blocked)))
    assert plan.count("ArrowEvalPython") == 1, plan[:2000]


def test_udtf_single_eval_node(spark):
    """The LATERAL chunking UDTF must plan as exactly ONE Python-UDTF eval
    node over the scan — a duplicated eval (the HOF-re-inlining analogue
    for table functions) would pay the Python boundary twice per row."""
    from postal_address_spark.operators.chunking import chunk_documents

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = physical(chunk_documents(spark, docs))
    assert plan.count("PythonUDTF") == 1, plan[:2000]


def test_rare_token_index_carries_no_text(spark):
    """The inverted-index self-join must carry (token, doc_id, w) ONLY —
    text payloads riding the token shuffle would multiply shuffle bytes
    by average document length (rule 7's LSH discipline applied here)."""
    from postal_address_spark.operators.token_join import rare_token_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # n_docs passed: plan composition stays lazy (no count job just to
    # print a plan)
    plan = physical(rare_token_pairs(docs, max_df=5, n_docs=1000))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the raw text column must be pruned before any exchange
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line


def test_phonetic_key_stays_in_codegen(spark):
    """soundex + regexp_extract are JVM expressions: the phonetic key must
    add zero Python eval nodes and keep the scan's column pruning."""
    from pyspark.sql import functions as F

    from postal_address_spark.operators.blocking import with_phonetic_block_key

    df = spark.createDataFrame(
        [("US", "Paris")], "top_country string, city_name string"
    )
    plan = physical(with_phonetic_block_key(df).select("phonetic_key"))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_golden_records_no_window_sort(spark):
    """The per-(cluster, field) argmax must plan as aggregation
    (min(struct)) — a Window would add a full sort inside every
    partition for the same answer."""
    from postal_address_spark.operators.survivorship import golden_records

    df = spark.createDataFrame(
        [("r1", "c1", "x", "y")],
        "rec_id string, cluster_id string, f1 string, f2 string",
    )
    plan = physical(golden_records(df, ["f1", "f2"]))
    assert "Window" not in plan, plan[:2000]


def test_link_two_datasets_plan_shape(spark):
    """Cross-dataset linkage: one normalize Arrow chain per (persisted)
    side plus ONE scoring kernel — recomputation would show as extra
    ArrowEvalPython nodes; the candidate join must never be a
    cartesian/BNLJ."""
    import re

    import __spark_entry__ as em

    df = em.queries()["link_two_datasets"](spark, SF)
    plan = physical(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    arrow_nodes = set(re.findall(r"\((\d+)\) ArrowEvalPython", plan))
    assert len(arrow_nodes) <= 3, sorted(arrow_nodes)


def test_tf_evidence_broadcasts_vocabulary(spark):
    """The term-frequency join must broadcast the vocabulary-scale tf
    table (a shuffled join would send every hot common value's pairs to
    one task)."""
    import __spark_entry__ as em

    df = em.queries()["tf_city_evidence"](spark, SF)
    plan = physical(df)
    assert "BroadcastHashJoin" in plan


def test_edjoin_gram_explode_carries_no_strings(spark):
    """edit_distance_pairs (operators/edjoin.py): the prefix-gram
    explosion must carry (vid, gram) only — a Generate whose output
    includes the string column (or the intermediate padded/gram arrays)
    means payloads ride the multiplied shuffle (rule 7).  The only
    nested-loop join allowed is the BROADCAST short-string side path;
    a plain CartesianProduct anywhere is the all-pairs shape this
    operator exists to avoid."""
    import re

    from pyspark.sql import functions as F

    from postal_address_spark.operators.edjoin import edit_distance_pairs

    df = (
        spark.read.parquet(f"{SF}/part.parquet")
        .select(
            F.col("p_partkey").alias("rec_id"),
            F.lower(F.col("p_name")).alias("s"),
        )
    )
    plan = physical(edit_distance_pairs(df, "rec_id", "s", k=2, q=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the bounded short path
    for line in plan.splitlines():
        if "Generate explode" in line:
            assert not re.search(r"[^a-zA-Z_]s#\d", line), line
            assert "padded#" not in line, line
            assert "grams#" not in line, line


def test_contamination_probe_is_broadcast(spark):
    """contamination_stats (operators/spandup.py): the benchmark gram set
    must BROADCAST into a left-semi probe of the corpus grams — an
    Exchange hashpartitioning on ghash feeding the semi join means the
    whole corpus gram relation shuffles for a vocabulary-sized probe
    side."""
    from pyspark.sql import functions as F

    from postal_address_spark.operators.spandup import contamination_stats

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    bench = docs.where(F.col("doc_id") < 5)
    plan = physical(contamination_stats(docs, bench, w=8))
    semi = [l for l in plan.splitlines() if "LeftSemi" in l]
    assert semi and all("Broadcast" in l for l in semi), semi or plan[:2000]


def test_profile_columns_single_melt(spark):
    """profile_columns (operators/profiling.py): the cells frame feeds
    both the tallies and the top-k window — it must be cached so the
    table is scanned and melted once (InMemoryTableScan in both
    branches), and there must be no Expand (no countDistinct)."""
    from postal_address_spark.operators.profiling import profile_columns

    df = spark.read.parquet(f"{SF}/customer.parquet")
    plan = physical(profile_columns(df, ["c_mktsegment", "c_nationkey"]))
    assert "InMemoryTableScan" in plan
    assert "Expand" not in plan


def test_conv_jaccard_join_id_only_shuffles(spark):
    """jaccard_set_join (operators/conversations.py): the probing-prefix
    explode must retain only (sid, sz) — a shingle ARRAY column in the
    Generate output means the sets ride the candidate-join shuffle
    (rule 7, same property as the LSH explosion guard above).  Also: no
    cartesian/BNLJ anywhere, and the shingled base must be cached so the
    conversation fold + shingling runs once, not four times."""
    from pyspark.sql import functions as F

    from postal_address_spark.operators.conversations import (
        conversation_near_dups,
    )

    turns = (
        spark.read.parquet(f"{SF}/events.parquet")
        .where(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .select(
            F.col("user_id").alias("conv_id"),
            "ts",
            "event_id",
            F.lower(F.col("event_type")).alias("action"),
        )
    )
    df = conversation_near_dups(turns, "conv_id", ("ts", "event_id"), "action")
    plan = physical(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "InMemoryTableScan" in plan
    prefix_gens = [
        l for l in plan.splitlines() if "Generate explode(prefix" in l
    ]
    assert prefix_gens, plan[:2000]
    for line in prefix_gens:
        assert "sh#" not in line and "sh_sorted" not in line, line
    spark.catalog.clearCache()


def test_conv_stats_islands_without_window(spark):
    """conversation_stats (operators/conversations.py): the longest-run
    statistic must come from the codegen aggregate() sweep over the
    folded token array — a Window node means the gaps-and-islands took a
    second sort+shuffle per conversation for the same answer."""
    from pyspark.sql import functions as F

    from postal_address_spark.operators.conversations import (
        conversation_stats,
    )

    turns = (
        spark.read.parquet(f"{SF}/events.parquet")
        .where(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .select(
            F.col("user_id").alias("conv_id"),
            "ts",
            "event_id",
            F.lower(F.col("event_type")).alias("action"),
        )
    )
    plan = physical(conversation_stats(turns, "conv_id", ("ts", "event_id"), "action"))
    assert "Window" not in plan, plan[:2000]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_semantic_lsh_explode_carries_no_embeddings(spark):
    """semantic_near_dups (operators/semantic.py): the per-table bucket
    explosion must carry only (id, table_idx, bucket) — the integer
    embedding array joining back only AFTER the candidate distinct
    (rule 7, the similarity_search LSH guard's sibling).  Everything is
    codegen: no Python eval nodes, no cartesian."""
    from postal_address_spark.operators.semantic import (
        hashed_gram_embedding,
        semantic_near_dups,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    embs = hashed_gram_embedding(docs, dim=8, vocab=64, seed=42)
    plan = physical(semantic_near_dups(embs, "doc_id", dim=8))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    gens = [l for l in plan.splitlines() if "Generate posexplode" in l]
    assert gens, plan[:2000]
    for line in gens:
        assert "emb#" not in line and " v#" not in line, line


def test_sft_single_fold_shuffle_no_python(spark):
    """sft_pairs: one groupBy(conv) Exchange for the fold + the dedup
    window's hash-partitioned Exchange — and zero Python nodes; the
    context render, gate and hash are all whole-stage codegen."""
    from postal_address_spark.operators.sft import sft_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    from pyspark.sql import functions as F

    turns = docs.select(
        F.pmod("doc_id", F.lit(50)).alias("conv_id"),
        F.col("doc_id").alias("turn_idx"),
        F.when(F.pmod("doc_id", F.lit(2)) == 0, F.lit("user"))
        .otherwise(F.lit("assistant")).alias("role"),
        "text",
    )
    plan = physical(sft_pairs(turns, max_context_turns=4))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    n_exchanges = sum(
        1 for l in plan.splitlines() if "Exchange hashpartitioning" in l
    )
    assert n_exchanges <= 2, plan[:3000]


def test_blocking_recall_truth_probe_is_broadcast(spark):
    """blocking_rule_recall (operators/blocking_analysis.py): the clerical
    truth set must BROADCAST into the unioned candidate streams — a
    SortMergeJoin on the pair key would shuffle every rule's full
    candidate volume to intersect it with a few thousand labeled pairs.
    Same discipline for missed_truth_pairs' LeftSemi probes."""
    from pyspark.sql import functions as F

    from postal_address_spark.operators.blocking_analysis import (
        blocking_rule_recall,
        missed_truth_pairs,
    )

    cust = spark.read.parquet(f"{SF}/customer.parquet").select(
        F.col("c_custkey").cast("string").alias("rec_id"),
        F.col("c_nationkey").alias("k"),
    )
    pairs = (
        cust.alias("a")
        .join(cust.alias("b"), "k")
        .where(F.col("a.rec_id") < F.col("b.rec_id"))
        .select(
            F.col("a.rec_id").alias("rec_id_a"),
            F.col("b.rec_id").alias("rec_id_b"),
        )
    )
    truth = spark.createDataFrame(
        [("1", "2"), ("3", "4")], "rec_id_a string, rec_id_b string"
    )
    plan = physical(blocking_rule_recall([("r1", pairs)], truth))
    # the candidate->truth intersection never sorts/shuffles on the pair
    # key; the only SMJ allowed is the rule's own equi-join on k.
    for line in plan.splitlines():
        if "SortMergeJoin" in line or "ShuffledHashJoin" in line:
            assert "rec_id_a" not in line, line
    assert "BroadcastHashJoin" in plan, plan[:2000]

    mplan = physical(missed_truth_pairs([("r1", pairs)], truth))
    semi = [l for l in mplan.splitlines() if "LeftSemi" in l]
    assert semi and all("Broadcast" in l for l in semi), semi or mplan[:2000]


def test_prefix_dups_signature_join_carries_no_tokens(spark):
    """prefix_containment_dups (operators/conversations.py): the
    candidate equi-join runs on integer signatures only — any Exchange
    or sort for the (length, checksum, last-hash) join key that also
    carries the token array (toks#) or token strings (tok#) would ship
    the corpus text through the candidate shuffle; arrays may join back
    only for the slice verification."""
    from pyspark.sql import functions as F

    from postal_address_spark.operators.conversations import (
        prefix_containment_dups,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    turns = docs.select(
        F.pmod("doc_id", F.lit(40)).alias("conv_id"),
        F.col("doc_id").alias("turn_idx"),
        F.substring("text", 1, 8).alias("action"),
    )
    plan = physical(prefix_containment_dups(turns))
    sig_joins = [
        l for l in plan.splitlines() if "Join" in l and "cum#" in l
    ]
    assert sig_joins, plan[:2000]  # the signature join must exist
    for line in sig_joins:
        assert "toks#" not in line and "tok#" not in line, line
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_boilerplate_profile_no_expand(spark):
    """boilerplate_turns (operators/conversations.py): conv-distinctness
    must come from the two-phase (token, conv) collapse + roll-up — a
    countDistinct would put an Expand node (doubling the shuffled rows)
    into a query that runs over every turn of the corpus."""
    from pyspark.sql import functions as F

    from postal_address_spark.operators.conversations import (
        boilerplate_turns,
    )

    events = spark.read.parquet(f"{SF}/events.parquet").select(
        F.col("user_id").alias("conv_id"),
        F.lower("event_type").alias("action"),
    )
    plan = physical(boilerplate_turns(events, "conv_id", "action"))
    assert "Expand" not in plan, plan[:2000]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_stable_ids_argmaxes_without_window(spark):
    """stable_entity_ids (operators/cluster.py): candidate and winner
    selection must plan as min(struct) HashAggregates — a Window would
    sort the contingency cells for the same answer — and nothing may go
    cartesian."""
    from postal_address_spark.operators.cluster import stable_entity_ids

    old = spark.createDataFrame(
        [("a", "E1"), ("b", "E1")], "rec_id string, entity_id string"
    )
    new = spark.createDataFrame(
        [("a", "C1"), ("b", "C2")], "rec_id string, cluster_id string"
    )
    plan = physical(stable_entity_ids(old, new))
    assert "Window" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan


def test_triplets_argmins_without_window(spark):
    """mine_triplets (operators/triplets.py): the per-anchor positive /
    hard-negative picks must be min(struct) aggregations over the
    doubled pair relation — no Window sort, no cartesian."""
    from postal_address_spark.operators.triplets import mine_triplets

    pairs = spark.createDataFrame(
        [("a", "b", 1), ("a", "c", 2)],
        "rec_id_a string, rec_id_b string, dist int",
    )
    asg = spark.createDataFrame(
        [("a", "X"), ("b", "X"), ("c", "Y")],
        "rec_id string, cluster_id string",
    )
    plan = physical(mine_triplets(pairs, asg))
    assert "Window" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan


def test_subset_costs_truth_probe_is_broadcast(spark):
    """blocking_subset_costs (operators/blocking_analysis.py): the
    labeled-truth reduction must BROADCAST into the tagged candidate
    streams (blocking_rule_recall's discipline) — the only aggregation
    that touches the full volume is the one bit_or mask fold."""
    from pyspark.sql import functions as F

    from postal_address_spark.operators.blocking_analysis import (
        blocking_subset_costs,
    )

    cust = spark.read.parquet(f"{SF}/customer.parquet").select(
        F.col("c_custkey").cast("string").alias("rec_id"),
        F.col("c_nationkey").alias("k"),
    )
    pairs = (
        cust.alias("a")
        .join(cust.alias("b"), "k")
        .where(F.col("a.rec_id") < F.col("b.rec_id"))
        .select(
            F.col("a.rec_id").alias("rec_id_a"),
            F.col("b.rec_id").alias("rec_id_b"),
        )
    )
    truth = spark.createDataFrame(
        [("1", "2"), ("3", "4")], "rec_id_a string, rec_id_b string"
    )
    plan = physical(blocking_subset_costs([("r1", pairs)], truth))
    # the truth intersection never sorts/shuffles on the pair key; the
    # only SMJ allowed is the rule's own equi-join on k (the
    # subsets x masks inclusion join is a BNLJ over constant frames —
    # that one is intended).
    for line in plan.splitlines():
        if "SortMergeJoin" in line or "ShuffledHashJoin" in line:
            assert "rec_id_a" not in line, line
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_constraint_probe_is_broadcast_and_repair_id_only(spark):
    """constrained_clusters (operators/constraints.py): the (tiny,
    human-produced) cannot-link table must BROADCAST into the violation
    probe and the repair fan-in — the assignment/edge volume never
    shuffles on a constraint key — and nothing may go cartesian.  The
    repair group rows carry ids + one double only (no payload columns)."""
    from pyspark.sql import functions as F

    from postal_address_spark.operators.constraints import (
        constrained_clusters,
        constraint_violations,
    )

    cust = spark.read.parquet(f"{SF}/customer.parquet")
    rid = F.concat(F.lit("n"), F.lpad(F.col("c_custkey").cast("string"), 6, "0"))
    vertices = cust.select(rid.alias("rec_id"))
    edges = cust.where(F.pmod("c_custkey", F.lit(50)) != 0).select(
        rid.alias("src"),
        F.concat(
            F.lit("n"),
            F.lpad((F.col("c_custkey") - 1).cast("string"), 6, "0"),
        ).alias("dst"),
    )
    cannot = cust.where(F.pmod("c_custkey", F.lit(50)) == 10).select(
        rid.alias("src"),
        F.concat(
            F.lit("n"),
            F.lpad((F.col("c_custkey") + 20).cast("string"), 6, "0"),
        ).alias("dst"),
    )
    from postal_address_spark.operators.cluster import assign_clusters

    asg = assign_clusters(vertices, edges)
    viol_plan = physical(constraint_violations(asg, cannot))
    assert "BroadcastHashJoin" in viol_plan
    assert "CartesianProduct" not in viol_plan

    out_plan = physical(constrained_clusters(vertices, edges, cannot))
    assert "CartesianProduct" not in out_plan
    # the Arrow repair boundary exists exactly once
    assert out_plan.count("FlatMapGroupsInPandas") == 1, out_plan[:3000]


def test_hll_registers_single_partial_agg_shuffle(spark):
    """hll_registers (operators/sketches.py): ONE hash aggregation with a
    map-side partial (the shuffle carries <= 2^p register rows per task,
    never the input), no Expand, no Window, pure codegen (no Python)."""
    from pyspark.sql import functions as F

    from postal_address_spark.operators.sketches import hll_registers

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = physical(hll_registers(docs, "doc_id", p=10))
    assert plan.count("Exchange") == 1, plan[:3000]
    assert "partial_max" in plan  # map-side combine before the shuffle
    assert "Expand" not in plan and "Window" not in plan
    assert "Python" not in plan and "Arrow" not in plan


def test_kmv_bottomk_is_take_ordered(spark):
    """kmv_bottomk (operators/sketches.py): orderBy+limit must compile to
    TakeOrderedAndProject (map-side partial top-k) — a global Sort would
    materialize the full distinct hash set."""
    from postal_address_spark.operators.sketches import kmv_bottomk

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = physical(kmv_bottomk(docs, "text", 64))
    assert "TakeOrderedAndProject" in plan, plan[:3000]


def test_drift_window_runs_on_reduced_counts(spark):
    """snapshot_drift (operators/drift.py): the top-N cap's Window must
    consume the already-aggregated (field, bin) count table — partial
    aggregation happens map-side BEFORE any exchange, and the unpivot
    never multiplies the corpus through a join."""
    from pyspark.sql import functions as F

    from postal_address_spark.operators.drift import snapshot_drift

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    prev = docs.where(F.pmod("doc_id", F.lit(2)) == 0)
    curr = docs.where(F.pmod("doc_id", F.lit(2)) == 1)
    plan = physical(
        snapshot_drift(prev, curr, [("lang", "cat"), ("text", "len")])
    )
    assert "partial_count" in plan, plan[:3000]
    assert "CartesianProduct" not in plan
    # exactly one Window (the cap), fed by the joined count table
    assert plan.count("Window") == 1, plan[:3000]
    # ONE scan per snapshot (the unpivot explodes (field, bin) structs —
    # a per-field union would re-read the corpus once per field)
    assert plan.count("Scan parquet") == 2, plan[:3000]


def test_cms_table_single_partial_agg_shuffle(spark):
    """cms_table (operators/cms.py): like hll_registers — ONE hash
    aggregation with a map-side partial (the shuffle carries
    <= depth*width cells per task), no Window, pure codegen."""
    from postal_address_spark.operators.cms import cms_table

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = physical(cms_table(docs, "doc_id", depth=4, width=256))
    assert plan.count("Exchange") == 1, plan[:3000]
    assert "partial_count" in plan
    assert "Window" not in plan
    assert "Python" not in plan and "Arrow" not in plan


def test_heavy_hitters_filter_before_exact_agg(spark):
    """heavy_hitters (operators/cms.py): the second pass must FILTER on
    the literal-map CMS estimate BEFORE the exact aggregation — the
    full-cardinality groupBy never happens — and the CMS table must ride
    as one str_to_map literal (rule 6), not a join."""
    from postal_address_spark.operators.cms import heavy_hitters

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = physical(heavy_hitters(docs, "doc_id", 10, depth=2, width=512))
    # no join anywhere: the sketch rides as ONE folded map literal
    # (rule 6's str_to_map is constant-folded before the physical plan,
    # so the observable shape is `map(keys: ...)` with zero joins)
    assert "Join" not in plan, plan[:3000]
    assert "map(keys:" in plan, plan[:3000]
    # the candidate filter (a least/element_at lookup) sits BELOW the
    # partial aggregate — pushed at the scan, so the full-cardinality
    # shuffle never happens
    partial_pos = plan.find("partial_count")
    assert partial_pos != -1, plan[:3000]
    assert plan.find("element_at", partial_pos) != -1, plan[:5000]


def test_qsketch_single_partial_agg_shuffle(spark):
    """qsketch (operators/qsketch.py): one map-side-combinable count on
    the generated integer CASE bucket — no Expand, no Python."""
    from pyspark.sql import functions as F

    from postal_address_spark.operators.qsketch import qsketch

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    lens = docs.select(F.length("text").alias("text_len"))
    plan = physical(qsketch(lens, "text_len", s=5))
    assert plan.count("Exchange") == 1, plan[:3000]
    assert "partial_count" in plan
    assert "Expand" not in plan
    assert "Python" not in plan and "Arrow" not in plan


def test_wcos_candidates_carry_ids_only(spark):
    """weighted_cosine_pairs (operators/wcos.py): rule-7 discipline — the
    prefix self-join carries (token, doc_id) only; text and token arrays
    never ride the candidate shuffle, and nothing is a cartesian."""
    from postal_address_spark.operators.wcos import weighted_cosine_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = weighted_cosine_pairs(
        docs, "text", "doc_id", tau_num=19, tau_den=20, n_docs=500
    )
    plan = physical(out)
    assert "CartesianProduct" not in plan, plan[:3000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:3000]
    # the join keys are tokens; the exploded text column itself must be
    # projected away before any exchange (no `text` attribute survives
    # past the tokenizer's generate node into a shuffle write)
    for frag in plan.split("Exchange")[1:]:
        head = frag[:200]
        assert "text#" not in head, head
    spark.catalog.clearCache()


def test_expectations_row_checks_no_shuffle_of_rows(spark):
    """expect (operators/expectations.py): every row-level check rides
    ONE conditional-aggregation pass — map-side partial before a single
    1-row exchange, no Expand, no Window, no Python — and the uniqueness
    melt adds exactly one more partial-agg shuffle for ALL unique checks
    together (never one job per column)."""
    from postal_address_spark.operators.expectations import Check, expect

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    row_only = expect(docs, [
        Check("a", "text", "not_null"),
        Check("b", "lang", "in_set", values=("en", "de")),
        Check("c", "n_chars", "between", lo=0.0, hi=1e9),
    ])
    plan = physical(row_only)
    assert "partial_count" in plan, plan[:3000]
    assert "Expand" not in plan and "Window" not in plan
    assert "Python" not in plan and "Arrow" not in plan

    with_unique = expect(docs, [
        Check("a", "text", "not_null"),
        Check("u1", "doc_id", "unique"),
        Check("u2", "text", "unique"),
    ])
    uplan = physical(with_unique)
    # melt -> (check, value) partial agg -> per-check agg -> tiny meta
    # join; the two unique checks share the SAME melt (one stack
    # generator, not one scan per column; the other Generate is the
    # 1-row inline exploding the row-level report)
    assert uplan.count("Generate stack") == 1, uplan[:3000]
    assert "partial_count" in uplan
    assert "Python" not in uplan and "Arrow" not in uplan


def test_cross_corpus_candidates_carry_ids_only(spark):
    """cross_corpus_near_dups (operators/dedup.py): the banded A x B
    equi-join must carry (id, band_idx, band_hash) ONLY — shingle arrays
    and text join back on the deduped candidate ids afterwards (rule 7),
    and no cartesian appears anywhere."""
    from pyspark.sql import functions as F

    from postal_address_spark.operators.dedup import (
        _banded,
        minhash_signatures,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    ref = docs.where(F.col("doc_id") < 200)
    crawl = docs.where(F.col("doc_id") >= 200)
    band_a = _banded(
        minhash_signatures(crawl), "doc_id", 8, 4
    ).select(F.col("doc_id").alias("id_a"), "band_idx", "band_hash")
    band_b = _banded(
        minhash_signatures(ref), "doc_id", 8, 4
    ).select(F.col("doc_id").alias("id_b"), "band_idx", "band_hash")
    cands = band_a.join(band_b, ["band_idx", "band_hash"]).select(
        "id_a", "id_b"
    )
    plan = physical(cands)
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    # text and shingle arrays must be pruned before every exchange: only
    # ids and band keys ride the shuffles (the scan reads text to build
    # signatures, but nothing wider than (id, band) ever moves)
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line and "shingles" not in line, line


def test_dedup_state_probe_sketches_increment_only(spark, tmp_path):
    """dedup_against_state (operators/dedup_state.py): the stored index
    arrives as plain parquet scans, so the probe plan must contain the
    CORPUS increment's shingle/minhash work only — the reference text is
    never read, never shingled, never re-minhashed.  Measured by
    counting shingle-tokenizer sites in the physical plan: the
    from-scratch two-corpus plan carries both sides' (banding + verify)
    shingle builds, the state-backed plan exactly half of them."""
    from pyspark.sql import functions as F

    from postal_address_spark.operators.dedup import cross_corpus_near_dups
    from postal_address_spark.operators.dedup_state import (
        build_dedup_state,
        dedup_against_state,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    ref = docs.where(F.col("doc_id") < 200)
    crawl = docs.where(F.col("doc_id") >= 200)
    root = str(tmp_path / "idx")
    build_dedup_state(ref, root)

    # formatted explain: the plain toString() truncates wide expression
    # trees (maxToStringFields), silently dropping the tokenizer sites
    # this test counts
    def formatted(df) -> str:
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    state_plan = formatted(dedup_against_state(crawl, root))
    scratch_plan = formatted(cross_corpus_near_dups(crawl, ref))
    assert "Cartesian" not in state_plan
    assert "BroadcastNestedLoop" not in state_plan
    # tokenizer sites: 'split(' marks each shingle build in the plan
    n_state = state_plan.count("split(")
    n_scratch = scratch_plan.count("split(")
    assert n_state > 0 and n_scratch == 2 * n_state, (n_state, n_scratch)
    # (the candidate-join ids-only exchange property is asserted on the
    # shared banding path by test_cross_corpus_candidates_carry_ids_only;
    # the verify join legitimately moves the stored shingle sets once)


def test_mutual_best_argmaxes_without_window(spark):
    """mutual_best_links (operators/link_datasets.py): both direction
    argmaxes are min(struct) aggregations with map-side partials — no
    Window (a per-key sort of the full edge set), no Cartesian."""
    from postal_address_spark.operators.link_datasets import (
        mutual_best_links,
    )

    edges = spark.createDataFrame(
        [("a1", "b1", 0.9), ("a2", "b1", 0.95)],
        "rec_id_a string, rec_id_b string, score double",
    )
    plan = physical(mutual_best_links(edges))
    assert "Window" not in plan, plan[:3000]
    assert "partial_min" in plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_doc_rarity_no_expand_and_hash_only_shuffles(spark):
    """doc_rarity_stats (operators/rarity.py): document frequency without
    a countDistinct Expand (the (hash, doc) collapse + roll-up), token
    STRINGS projected to 64-bit hashes before every exchange, pure
    codegen (no Python)."""
    from postal_address_spark.operators.rarity import doc_rarity_stats

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = physical(doc_rarity_stats(docs))
    assert "Expand" not in plan, plan[:3000]
    assert "Python" not in plan and "Arrow" not in plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "__tok" not in line and "text" not in line, line


def test_monge_elkan_single_arrow_node(spark):
    """monge_elkan_pairs evaluates both directed means in exactly ONE
    me_kernels ArrowEvalPython node (struct column + rule-3
    nondeterministic marker — without it the per-field projections
    re-inline the UDF), and the gate query's persisted blocked frame
    keeps the normalize UDF out of the pair-join branches (every
    reference reads the cache)."""
    import __spark_entry__ as em

    plan = physical(em.queries()["er_monge_elkan"](spark, SF))
    assert plan.count("me_kernels") == 1, plan[:3000]
    # the cached blocked frame serves every pair-join reference (the
    # InMemoryRelation's stored definition still PRINTS the norm_udf
    # subtree, but execution reads the cache)
    assert "InMemoryTableScan" in plan
