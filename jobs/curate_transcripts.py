"""Transcript-corpus curation job — the ``spark-submit`` deploy surface
for multi-turn conversation data, composing the conversation operators
the way ``jobs/curate.py`` composes the document ones:

    [boilerplate masking: cross-conversation repeated turn values leave
     the dedup identity (written turns untouched)]
    -> conversation quality gate -> exact dedup (content signature)
    -> [prefix-containment dedup: incremental-logging snapshots — strict
        prefixes of a longer conversation — dropped for their container]
    -> [near-dup dedup (exact prefix-filtered Jaccard) -> keep-one]
    -> [semantic dedup (hashed-gram cosine) -> keep-one]
    -> [tfidf dedup (idf-weighted token cosine, order-free) -> keep-one]
    -> [PII redaction of the written text (dedup saw raw content)]
    -> leakage-safe split -> per-split parquet of the KEPT TURNS
    -> [SFT (context, response) pair extraction with pair-level
        gate + dedup flags]
    -> [token-budget sequence packing: per-split next-fit bin manifest
        for the training loader (operators/packing.py) — bins never
        straddle a split, so a loader reading whole bins cannot leak]

Package the engine and submit::

    (cd /root/repo && zip -qr engine.zip postal_address_spark)
    spark-submit --py-files engine.zip jobs/curate_transcripts.py \
        --input  <turns table>    # parquet path or Iceberg table ref \
        --output-root <dir>       # writes <dir>/turns + <dir>/rejected_convs \
        [--conv-col conv_id] [--order-cols turn_idx] [--action-col role] \
        [--min-turns 3] [--min-distinct 2] [--max-run 6] \
        [--tau-num 7 --tau-den 10] [--no-near-dup] [--prefix-dedup] \
        [--split-salt 2024] \
        [--semantic-dedup [--sem-tau-num 19 --sem-tau-den 20]] \
        [--tfidf-dedup [--tfidf-tau-num 9 --tfidf-tau-den 10]] \
        [--sft-output <dir> [--sft-role assistant] [--sft-max-context 8] \
         [--sft-min-response-chars 1]] \
        [--pack-budget <tokens> [--pack-shards 256]]

Differences from the document job that matter at transcript scale:

* The unit of curation is the CONVERSATION, but the payload written is
  the TURNS table — every decision (quality, dedup survivor, split) is
  made once per conversation and applied to its turns with semi/anti
  joins on conv_col, so no turn of a kept conversation is ever lost and
  no conversation straddles a split (the split is a pure function of
  conv_col — see operators/conversations.py:with_conversation_split).
* Dedup identity is the per-turn TEXT when the table carries it
  (--text-col, coalesced with the action for text-less turns), else the
  action sequence.  Deduping on roles alone is a chat-corpus trap: every
  same-length user/assistant alternation has the identical role
  sequence, and role-trigram Jaccard is 1.0 corpus-wide.
* Near-dup is the EXACT threshold-Jaccard join over trigrams of the
  dedup tokens (recall-lossless at any tau) — moderate-tau territory
  where MinHash banding recall decays.
* Exact dedup hashes the ordered token ARRAY (no separator to inject)
  plus the turn count: one fold, one tiny groupBy, min-id survivor —
  the conversation analogue of document exact_dedup.

Rejected conversations are written WITH their firing rule names
(reasons are data, like every error surface in this engine).  The gate's
``n_turns`` counts NON-NULL-action turns (the sequence statistics'
domain); the rejected output also carries ``n_total_turns`` so a
partial-NULL conversation (many turns, few actions) is distinguishable
from a genuinely short one — only fully-NULL conversations get the
separate ``no_actions`` reject.
"""
from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="postal-address-spark transcript curation job"
    )
    p.add_argument("--input", required=True,
                   help="turns table (parquet path or iceberg ref)")
    p.add_argument("--output-root", required=True,
                   help="destination dir: writes turns/ + rejected_convs/")
    p.add_argument("--conv-col", default="conv_id")
    p.add_argument("--order-cols", default="turn_idx",
                   help="comma-separated turn-order columns")
    p.add_argument("--action-col", default="role",
                   help="token column for the quality gate's sequence stats")
    p.add_argument("--text-col", default="text",
                   help="per-turn text column: when present it becomes the "
                   "dedup identity (coalesced with --action-col for "
                   "text-less turns); pass a non-existent name to dedup on "
                   "the action sequence alone")
    p.add_argument("--min-turns", type=int, default=3)
    p.add_argument("--min-distinct", type=int, default=2)
    p.add_argument("--max-run", type=int, default=6)
    p.add_argument("--tau-num", type=int, default=7)
    p.add_argument("--tau-den", type=int, default=10)
    p.add_argument("--no-near-dup", action="store_true",
                   help="skip the near-dup conversation dedup")
    p.add_argument("--redact-pii", action="store_true",
                   help="redact emails/SSNs/IPv4s/phone-shaped runs from "
                   "the WRITTEN --text-col (and the SFT pairs extracted "
                   "from it) with typed placeholders; dedup identity "
                   "still compares the raw content (redaction runs after "
                   "every dedup stage). No-op without --text-col")
    p.add_argument("--boilerplate-min-convs", type=int, default=0,
                   metavar="K",
                   help="mask turn values appearing in >= K distinct "
                   "conversations OUT of the dedup identity (system "
                   "prompts / canned turns dominate content dedup "
                   "otherwise; conversations that are ALL boilerplate "
                   "keep their raw identity — operator docstring). Also "
                   "writes boilerplate/ (the thresholded profile). 0 = off")
    p.add_argument("--prefix-dedup", action="store_true",
                   help="additionally drop conversations whose full token "
                   "sequence is a STRICT PREFIX of a longer surviving one "
                   "(incremental-logging snapshots; "
                   "operators/conversations.py prefix_containment_dups)")
    p.add_argument("--semantic-dedup", action="store_true",
                   help="additionally drop PARAPHRASE duplicates: "
                   "hashed-gram embedding + sign-LSH + exact integer "
                   "cosine at --sem-tau (operators/semantic.py) — catches "
                   "near-dups whose token-set Jaccard sits below --tau")
    p.add_argument("--sem-tau-num", type=int, default=19)
    p.add_argument("--sem-tau-den", type=int, default=20)
    p.add_argument("--tfidf-dedup", action="store_true",
                   help="additionally drop RARE-TOKEN paraphrases: "
                   "conversations whose rendered dedup identity clears "
                   "idf-weighted token cosine --tfidf-tau "
                   "(operators/wcos.py, recall-lossless L2 prefix "
                   "filter).  Complements --semantic-dedup: the "
                   "hashed-gram path is order-sensitive and weights all "
                   "grams equally; this path ignores order and weights "
                   "by corpus rarity, catching template-heavy near-dups "
                   "that differ only in common filler")
    p.add_argument("--tfidf-tau-num", type=int, default=9)
    p.add_argument("--tfidf-tau-den", type=int, default=10)
    p.add_argument("--decontaminate", default=None,
                   help="optional benchmark/eval table: conversations "
                   "whose rendered text shares w-gram spans with it "
                   "beyond --max-contam-pct are dropped (GPT-3-style "
                   "n-gram decontamination at CONVERSATION granularity; "
                   "operators/spandup.py contamination_stats — the "
                   "benchmark reduces to a broadcast gram-hash set, the "
                   "corpus side never shuffles).  Probes the RAW turn "
                   "text, never the boilerplate-masked dedup identity")
    p.add_argument("--contam-text-col", default="text",
                   help="text column of the --decontaminate table")
    p.add_argument("--contam-w", type=int, default=8,
                   help="span width in word tokens for the probe")
    p.add_argument("--max-contam-pct", type=int, default=0,
                   help="max contaminated token cover as integer percent "
                   "of the conversation's tokens (cross-multiplied, no "
                   "float threshold); 0 = drop on any overlap")
    p.add_argument("--sft-output", default=None,
                   help="also extract (context, response) SFT pairs from "
                   "the kept turns (operators/sft.py) and write them here, "
                   "split-partitioned, with pair-level gate + dedup flags")
    p.add_argument("--sft-role", default="assistant",
                   help="role whose turns become responses")
    p.add_argument("--sft-chat-output", default=None,
                   help="also write the KEPT SFT pairs as chat-format "
                   "JSONL (one object per line: conv_id, position, split, "
                   "messages=[{role, content}...] ending in the assistant "
                   "response) — the structured form training loaders "
                   "ingest directly; requires --sft-output")
    p.add_argument("--sft-max-context", type=int, default=8)
    p.add_argument("--sft-min-response-chars", type=int, default=1)
    p.add_argument("--pack-budget", type=int, default=0,
                   help="also write <output-root>/packed_manifest: packed "
                   "next-fit into bins of at most this many whitespace "
                   "tokens, per split (operators/packing.py); with "
                   "--sft-output the packed items are the kept SFT pairs "
                   "counted at their chat-template rendering (what the "
                   "trainer tokenizes), otherwise whole kept "
                   "conversations; 0 = off")
    p.add_argument("--pack-shards", type=int, default=256,
                   help="parallel packing shards (bins never span shards)")
    p.add_argument("--split-salt", type=int, default=2024)
    p.add_argument("--expect", default=None,
                   help="JSON expectation specs (operators/expectations.py "
                   "Check kwargs) evaluated on the raw TURN table before "
                   "any stage; report written to <output-root>/expectations")
    p.add_argument("--expect-fail-hard", action="store_true",
                   help="exit 3 when any expectation fails")
    return p


def main(argv=None, spark=None) -> dict:
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.sft_chat_output and not args.sft_output:
        # the chat JSONL is derived from the SFT pair table — without
        # --sft-output it would be silently skipped; fail loud instead
        parser.error("--sft-chat-output requires --sft-output")
    order_cols = tuple(c.strip() for c in args.order_cols.split(",") if c.strip())

    owns_session = spark is None
    if spark is None:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("postal-address-transcript-curation")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .getOrCreate()
        )

    from pyspark.sql import functions as F

    from postal_address_spark.operators.cluster import connected_components
    from postal_address_spark.operators.conversations import (
        conversation_near_dups,
        conversation_signatures,
        conversation_quality,
        with_conversation_split,
    )
    from postal_address_spark.sources.io import read_table, write_table

    conv, act = args.conv_col, args.action_col
    turns_raw = read_table(spark, args.input)

    # 0. declarative input expectations (shared gate with curate.py /
    # link.py): refuse a degraded turn feed before any curation compute.
    expect_results = None
    if args.expect:
        from postal_address_spark.operators.expectations import (
            run_expectation_gate,
        )

        expect_results = run_expectation_gate(
            spark, turns_raw, args.expect,
            f"{args.output_root.rstrip('/')}/expectations",
            fail_hard=args.expect_fail_hard,
        )
    # NULL conversation ids can neither be gated, deduped, nor split
    # (every join/groupBy key misses them) — count and exclude them
    # explicitly rather than letting them double-count or vanish.
    n_null_conv = turns_raw.where(F.col(conv).isNull()).count()
    # the turns table feeds the gate fold, both dedup folds, three
    # semi/anti joins and the final write — cache it once (er_report.py's
    # norm.persist() precedent).
    turns_cached = turns_raw.where(F.col(conv).isNotNull()).persist()
    turns = turns_cached
    n_turns_in = turns.count()

    # dedup identity: per-turn TEXT when the table carries it (falling
    # back to the action token for text-less turns), else the action
    # sequence alone.  Deduping on --action-col by itself is a trap for
    # chat corpora — every same-length user/assistant alternation has the
    # IDENTICAL role sequence, and role-trigram Jaccard is 1.0 across the
    # whole corpus; text makes the signature content-bearing.
    text_col = args.text_col if args.text_col in turns.columns else None
    dedup_tok = "_dedup_tok"
    turns = turns.withColumn(
        dedup_tok,
        F.coalesce(F.col(text_col), F.col(act)) if text_col else F.col(act),
    )

    # 0b. optional boilerplate masking: turn values repeated across >= K
    # conversations (system prompts, canned greetings, tool banners)
    # leave the DEDUP IDENTITY — NULL identity tokens drop from every
    # fold, so stages 2/2b/3/3b compare conversations by content, not by
    # shared templates.  The turns WRITTEN are untouched; only the
    # identity column is masked.  All-boilerplate conversations keep
    # their raw identity (mask_boilerplate_identity's fallback).
    n_boiler_values = 0
    if args.boilerplate_min_convs > 0:
        from postal_address_spark.operators.conversations import (
            boilerplate_turns,
            mask_boilerplate_identity,
        )

        boiler = boilerplate_turns(turns, conv, dedup_tok).where(
            F.col("n_convs") >= args.boilerplate_min_convs
        )
        write_table(boiler, f"{args.output_root.rstrip('/')}/boilerplate")
        boiler_read = spark.read.parquet(
            f"{args.output_root.rstrip('/')}/boilerplate"
        )
        n_boiler_values = boiler_read.count()
        turns = mask_boilerplate_identity(
            turns, boiler_read, conv, dedup_tok
        )

    # 1. quality gate at conversation granularity.  The gate output is
    # conversation-sized (one row per conv) — tiny next to the turns.
    gated = conversation_quality(
        turns, conv, order_cols, act,
        min_turns=args.min_turns, min_distinct=args.min_distinct,
        max_run=args.max_run,
    ).persist()
    rejected = gated.where(~F.col("keep")).drop("keep")
    # conversations whose EVERY action is NULL never reach the stats fold
    # (NULL tokens carry no sequence) — surface them as rejects instead of
    # letting them vanish from both outputs.
    no_actions = (
        turns.select(conv).distinct()
        .join(gated.select(conv), conv, "left_anti")
        .withColumn("reasons", F.lit("no_actions"))
    )
    rejected = rejected.unionByName(no_actions, allowMissingColumns=True)
    kept_convs = gated.where(F.col("keep")).select(conv)
    n_convs_in = gated.count() + no_actions.count()
    turns = turns.join(kept_convs, conv, "left_semi")

    # 2. exact dedup: identical (n_turns, ordered dedup-token array)
    # keeps the min-id conversation — the signature hashes the ARRAY
    # (conversation_signatures), so multi-word texts cannot collide via
    # separator injection.  One fold + one tiny groupBy on the hash.
    sigs = conversation_signatures(turns, conv, order_cols, dedup_tok)
    exact_reps = (
        sigs.groupBy("sig").agg(F.min(conv).alias(conv)).select(conv)
    )
    n_exact_dropped = n_convs_in - rejected.count() - exact_reps.count()
    turns = turns.join(exact_reps, conv, "left_semi")

    # 2b. optional PREFIX-containment dedup: incremental-logging
    # snapshots — conversations whose full sequence is a strict prefix
    # of a longer surviving one — drop in favor of their container
    # (operators/conversations.py prefix_containment_dups; prefix-of-a-
    # prefix is a prefix, so keep/drop needs no closure).  Same dedup
    # identity as stages 2/3; runs AFTER exact dedup so equal-length
    # copies are already gone.
    n_prefix_dropped = 0
    if args.prefix_dedup:
        from postal_address_spark.operators.conversations import (
            prefix_containment_dups,
        )

        pdec = prefix_containment_dups(turns, conv, order_cols, dedup_tok)
        pdrop = pdec.where(F.col("status") == "prefix_dup").select(conv)
        n_prefix_dropped = pdrop.count()
        turns = turns.join(pdrop, conv, "left_anti")

    # 3. near-dup dedup: exact prefix-filtered Jaccard pairs over the
    # surviving conversations -> connected components -> keep min id.
    # Shingles come from the dedup tokens too: with text present this is
    # word-trigram overlap of the conversation content; without it, the
    # structural action-sequence overlap.
    n_near_dropped = 0
    if not args.no_near_dup:
        pairs = conversation_near_dups(
            turns, conv, order_cols, dedup_tok,
            tau_num=args.tau_num, tau_den=args.tau_den,
        )
        edges = pairs.select(
            F.col("conv_a").alias("src"), F.col("conv_b").alias("dst")
        )
        comp = connected_components(edges)  # (rec_id, cluster_id)
        drop = comp.where(F.col("rec_id") != F.col("cluster_id")).select(
            F.col("rec_id").alias(conv)
        )
        n_near_dropped = drop.count()
        turns = turns.join(drop, conv, "left_anti")

    # 3b. optional SEMANTIC dedup: paraphrase conversations whose token-set
    # Jaccard sits below --tau but whose hashed-gram cosine clears
    # --sem-tau (operators/semantic.py; xxhash gram path — the md5
    # portable hash is for oracle fixtures only).  Same closure + min-id
    # survivor shape as stage 3.
    n_sem_dropped = 0
    if args.semantic_dedup:
        from postal_address_spark.operators.semantic import (
            conversation_semantic_dups,
        )

        sem_pairs = conversation_semantic_dups(
            turns, conv, order_cols, dedup_tok,
            tau_num=args.sem_tau_num, tau_den=args.sem_tau_den,
        )
        sem_edges = sem_pairs.select(
            F.col("conv_a").alias("src"), F.col("conv_b").alias("dst")
        )
        sem_comp = connected_components(sem_edges)
        sem_drop = sem_comp.where(
            F.col("rec_id") != F.col("cluster_id")
        ).select(F.col("rec_id").alias(conv))
        n_sem_dropped = sem_drop.count()
        turns = turns.join(sem_drop, conv, "left_anti")

    # 3c. optional TF-IDF paraphrase dedup: render each surviving
    # conversation's dedup identity to one doc and run the weighted-
    # cosine AllPairs join (operators/wcos.py) — order-free and
    # rarity-weighted, the complement of the hashed-gram path above.
    # Same closure + min-id survivor shape as stages 3/3b.
    n_tfidf_dropped = 0
    if args.tfidf_dedup:
        from postal_address_spark.operators.conversations import (
            conversation_docs,
        )
        from postal_address_spark.operators.wcos import (
            weighted_cosine_pairs,
            weighted_token_relation,
        )

        tfidf_docs = conversation_docs(turns, conv, order_cols, dedup_tok)
        # own the token-relation cache so it can be released after the
        # stage's one action (the jaccard_set_join caching contract)
        tfidf_tw = weighted_token_relation(tfidf_docs, "seq", conv)
        tfidf_pairs = weighted_cosine_pairs(
            tfidf_docs,
            text_col="seq",
            id_col=conv,
            tau_num=args.tfidf_tau_num,
            tau_den=args.tfidf_tau_den,
            tw=tfidf_tw,
        )
        tfidf_edges = tfidf_pairs.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        )
        tfidf_comp = connected_components(tfidf_edges)
        tfidf_drop = tfidf_comp.where(
            F.col("rec_id") != F.col("cluster_id")
        ).select(F.col("rec_id").alias(conv))
        # materialize the drop set before releasing the token cache the
        # lazy plan depends on (engine rule 10's eager-before-release)
        tfidf_drop = tfidf_drop.localCheckpoint()
        n_tfidf_dropped = tfidf_drop.count()
        tfidf_tw.unpersist()
        turns = turns.join(tfidf_drop, conv, "left_anti")

    # 3d. optional benchmark decontamination at CONVERSATION granularity:
    # fold the survivors' RAW text (coalesce(text, action) — never the
    # boilerplate-masked dedup identity, a masked turn is still
    # contamination) into one rendered doc per conversation, probe it
    # against the benchmark's broadcast w-gram set, and drop
    # conversations whose contaminated token cover exceeds the integer
    # percent threshold (cover*100 > pct*n_tokens, cross-multiplied).
    n_contam_dropped = 0
    if args.decontaminate:
        from postal_address_spark.operators.conversations import (
            conversation_docs,
        )
        from postal_address_spark.operators.spandup import (
            contamination_stats,
        )

        raw_tok = "_contam_tok"
        conv_docs = conversation_docs(
            turns.withColumn(
                raw_tok,
                F.coalesce(F.col(text_col), F.col(act))
                if text_col
                else F.col(act),
            ),
            conv,
            order_cols,
            raw_tok,
        )
        bench = read_table(spark, args.decontaminate).select(
            # the benchmark side reduces to DISTINCT gram hashes, so the
            # id column only has to exist (grams are extracted per row)
            F.lit(0).cast("long").alias("doc_id"),
            F.col(args.contam_text_col).alias("text"),
        )
        stats = contamination_stats(
            conv_docs.select(F.col(conv).alias("doc_id"),
                             F.col("seq").alias("text")),
            bench,
            w=args.contam_w,
        )
        contam = stats.where(
            (F.col("n_tokens") > 0)
            & (
                F.col("contam_token_cover") * 100
                > F.lit(args.max_contam_pct) * F.col("n_tokens")
            )
        ).select(F.col("doc_id").alias(conv))
        n_contam_dropped = contam.count()
        rejected = rejected.unionByName(
            contam.withColumn("reasons", F.lit("benchmark_contamination")),
            allowMissingColumns=True,
        )
        turns = turns.join(contam, conv, "left_anti")

    # 4. leakage-safe split (pure function of conv id), write the turns
    # partitioned by split; rejected conversations with their reasons.
    kept_turns = with_conversation_split(
        turns.drop(dedup_tok), conv, salt=args.split_salt
    )
    # 3c. optional PII redaction of the WRITTEN text (and everything
    # downstream of it: the SFT pairs extract from kept_turns, so
    # contexts and responses inherit the redaction).  Runs AFTER every
    # dedup stage on purpose — dedup identity compares the raw content
    # (two conversations differing only in redacted spans are genuinely
    # different documents), the training corpus ships placeholders.
    n_turns_redacted = 0
    if args.redact_pii and text_col:
        from postal_address_spark.operators.text_analysis import redact_pii

        red = redact_pii(F.col(text_col))
        n_turns_redacted = int(
            kept_turns.where(
                F.col(text_col).isNotNull() & (red != F.col(text_col))
            ).count()
        )
        kept_turns = kept_turns.withColumn(text_col, red)
    turns_path = f"{args.output_root.rstrip('/')}/turns"
    rejected_path = f"{args.output_root.rstrip('/')}/rejected_convs"
    write_table(kept_turns, turns_path, partition_by=["split"])
    write_table(rejected, rejected_path)

    # 5. optional SFT extraction: (context, response) pairs from the KEPT
    # turns with the pair-level gate and exact keep-one dedup
    # (operators/sft.py).  The split rides along as the same pure
    # function of the conversation id, so no pair's context can leak
    # across splits.  ALL pairs are written (gate reasons + is_kept are
    # data — consumers filter is_kept for the training set and keep the
    # rest as the audit trail).
    sft_counts = None
    if args.sft_output:
        from postal_address_spark.operators.sft import sft_pairs

        pairs = sft_pairs(
            kept_turns,
            conv_col=conv,
            order_cols=order_cols,
            role_col=act,
            text_col=text_col or act,
            assistant_role=args.sft_role,
            max_context_turns=args.sft_max_context,
            min_response_chars=args.sft_min_response_chars,
            include_messages=bool(args.sft_chat_output),
        )
        pairs = with_conversation_split(pairs, "conv", salt=args.split_salt)
        n_pairs_total = pairs.count()
        n_pairs_kept = pairs.where(F.col("is_kept")).count()
        n_pairs_dup_dropped = (
            pairs.where(F.col("keep") & ~F.col("is_kept")).count()
        )
        if args.sft_chat_output:
            # chat-format JSONL of the kept pairs only — the loader-ready
            # artifact; the parquet table below stays the audit surface
            # (schema unchanged: messages is dropped from it)
            (
                pairs.where(F.col("is_kept"))
                .select(
                    F.col("conv").alias("conv_id"), "position", "split",
                    "messages",
                )
                .write.mode("overwrite")
                .partitionBy("split")
                .json(args.sft_chat_output)
            )
            pairs = pairs.drop("messages")
        write_table(pairs, args.sft_output, partition_by=["split"])
        sft_counts = {
            "n_pairs_total": int(n_pairs_total),
            "n_pairs_kept": int(n_pairs_kept),
            "n_pairs_dup_dropped": int(n_pairs_dup_dropped),
            "n_pairs_gated": int(
                n_pairs_total - n_pairs_kept - n_pairs_dup_dropped
            ),
            "path": args.sft_output,
        }
        if args.sft_chat_output:
            sft_counts["chat_path"] = args.sft_chat_output

    # 6. optional sequence packing into --pack-budget bins PER SPLIT —
    # split joins the shuffle key (operators/packing.py group_cols), so
    # no bin can mix train and validation content; the loader joins text
    # back by id — text never enters the packing shuffle.
    #
    # WHAT gets packed follows what the trainer will tokenize (VERDICT
    # r4 next-round #8): with --sft-output active, the packed items are
    # the KEPT SFT PAIRS and the token count is the chat-template
    # rendering of each pair (context lines + "<role>: <response>" — the
    # exact string the messages form flattens to), so loader bins
    # reflect real sample lengths.  Without SFT extraction the items are
    # whole kept conversations (token count = whitespace tokens of the
    # text identity, falling back to the action).
    pack_counts = None
    if args.pack_budget:
        from postal_address_spark.operators.packing import (
            bin_stats,
            pack_sequences,
        )

        if args.sft_output:
            # chat-template sample: context already renders "role: text"
            # lines; the response joins as a final assistant line.
            sample = F.concat_ws(
                "\n",
                F.col("context"),
                F.concat_ws(
                    ": ", F.lit(args.sft_role),
                    F.coalesce(F.col("response"), F.lit("")),
                ),
            )
            st = F.trim(sample)
            items = pairs.where(F.col("is_kept")).select(
                F.concat_ws(
                    "#", F.col("conv").cast("string"), F.col("position")
                ).alias("pair_id"),
                "split",
                F.when(st == "", F.lit(0))
                .otherwise(F.size(F.split(st, r"\s+")))
                .cast("long")
                .alias("n_tokens"),
            )
            id_col, count_key = "pair_id", "n_pairs"
        else:
            tcol = F.col(text_col) if text_col else F.col(act)
            tt = F.trim(
                F.coalesce(
                    tcol.cast("string"), F.col(act).cast("string"), F.lit("")
                )
            )
            items = (
                kept_turns.select(
                    conv,
                    "split",
                    F.when(tt == "", F.lit(0))
                    .otherwise(F.size(F.split(tt, r"\s+")))
                    .cast("long")
                    .alias("_t"),
                )
                .groupBy(conv, "split")
                .agg(F.sum("_t").alias("n_tokens"))
            )
            id_col, count_key = conv, "n_convs"
        packed = pack_sequences(
            items,
            args.pack_budget,
            id_col=id_col,
            n_shards=args.pack_shards,
            seed=args.split_salt,
            group_cols=("split",),
        ).persist()
        pack_path = f"{args.output_root.rstrip('/')}/packed_manifest"
        write_table(packed, pack_path, partition_by=["split"])
        pack_counts = {
            "budget": args.pack_budget,
            "path": pack_path,
            "basis": "sft_pairs" if args.sft_output else "conversations",
            "splits": {
                r["split"]: {
                    "n_bins": int(r["n_bins"]),
                    count_key: int(r["n_docs"]),
                    "total_tokens": int(r["total_tokens"]),
                    "n_oversize_bins": int(r["n_oversize_bins"]),
                    "utilization": (
                        round(float(r["utilization"]), 6)
                        if r["utilization"] is not None
                        else None
                    ),
                }
                for r in bin_stats(
                    packed, args.pack_budget, group_cols=("split",)
                ).collect()
            },
        }
        packed.unpersist()

    # an all-rejected corpus is a legitimate outcome, not a crash: a
    # partitioned empty write leaves no part files, so read the summary
    # from the (already computed) kept frame when the output is empty.
    has_kept = kept_turns.limit(1).count() > 0
    out = spark.read.parquet(turns_path) if has_kept else kept_turns
    split_counts = {
        r["split"]: {"n_convs": r["n_convs"], "n_turns": r["n_turns"]}
        for r in out.groupBy("split")
        .agg(
            F.countDistinct(conv).alias("n_convs"),
            F.count(F.lit(1)).alias("n_turns"),
        )
        .collect()
    }
    reject_reasons = {
        r["reasons"]: r["n"]
        for r in spark.read.parquet(rejected_path)
        .groupBy("reasons").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # every output is materialized (writes + collected summaries above):
    # release the job-owned caches, and — when this job owns the session
    # (spark-submit) — the internal jaccard_set_join base cache too (its
    # documented caller obligation; a passed-in session may hold caches
    # that aren't ours to clear).
    turns_cached.unpersist()
    gated.unpersist()
    if owns_session:
        spark.catalog.clearCache()
    summary = {
        "input": args.input,
        "n_turns_in": int(n_turns_in),
        "n_null_conv_turns": int(n_null_conv),
        "n_convs_in": int(n_convs_in),
        "n_boilerplate_values": int(n_boiler_values),
        "n_exact_dropped": int(n_exact_dropped),
        "n_prefix_dropped": int(n_prefix_dropped),
        "n_near_dup_dropped": int(n_near_dropped),
        "n_semantic_dropped": int(n_sem_dropped),
        "n_tfidf_dropped": int(n_tfidf_dropped),
        "n_contam_dropped": int(n_contam_dropped),
        "n_turns_redacted": int(n_turns_redacted),
        "n_convs_kept": int(sum(v["n_convs"] for v in split_counts.values())),
        "n_turns_kept": int(sum(v["n_turns"] for v in split_counts.values())),
        "n_convs_rejected": int(sum(reject_reasons.values())),
        "split_counts": split_counts,
        "reject_reasons": reject_reasons,
        "turns": turns_path,
        "rejected_convs": rejected_path,
    }
    if sft_counts is not None:
        summary["sft"] = sft_counts
    if pack_counts is not None:
        summary["packing"] = pack_counts
    if expect_results is not None:
        summary["expectations"] = expect_results
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main(sys.argv[1:])
