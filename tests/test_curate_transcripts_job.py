"""jobs/curate_transcripts.py end-to-end: conversation quality rejection
with reasons, exact-sequence dedup, near-dup keep-one, leakage-safe split
layout over the kept TURNS."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"
    ),
)


def _conv(cid, actions):
    return [(cid, i, a) for i, a in enumerate(actions)]


def test_curate_transcripts_end_to_end(spark, tmp_path):
    import curate_transcripts

    seq_a = ["user", "assistant", "tool", "assistant", "user", "assistant",
             "tool", "tool", "assistant", "user"]
    rows = (
        _conv(1, seq_a)
        + _conv(9, seq_a)                       # exact dup of 1 -> dropped (min id kept)
        + _conv(2, seq_a[:-1] + ["tool"])       # near dup of 1 -> dropped
        + _conv(3, ["user"])                    # too_short (+low_diversity)
        + _conv(4, ["tool"] * 8)                # stuck_loop + low_diversity
        + _conv(5, ["user", "assistant"] * 6)   # clean, far from seq_a
        + _conv(6, [None, None, None])          # every action NULL -> no_actions
    )
    inp = str(tmp_path / "turns")
    out_root = str(tmp_path / "curated")
    spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string"
    ).write.parquet(inp)

    summary = curate_transcripts.main(
        ["--input", inp, "--output-root", out_root,
         "--max-run", "6", "--tau-num", "7", "--tau-den", "10"],
        spark=spark,
    )
    assert summary["n_turns_in"] == 54
    assert summary["n_convs_in"] == 7
    assert summary["reject_reasons"] == {
        "too_short,low_diversity": 1,
        "low_diversity,stuck_loop": 1,
        "no_actions": 1,
    }
    assert summary["n_exact_dropped"] == 1     # conv 9
    assert summary["n_near_dup_dropped"] == 1  # conv 2
    assert summary["n_convs_kept"] == 2

    kept = spark.read.parquet(summary["turns"])
    kept_ids = {r["conv_id"] for r in kept.select("conv_id").collect()}
    assert kept_ids == {1, 5}
    # all turns of the kept conversations survive intact
    assert kept.where("conv_id = 1").count() == len(seq_a)
    # split materialized as partition dirs; no conversation straddles
    assert any(d.startswith("split=") for d in os.listdir(summary["turns"]))
    from pyspark.sql import functions as F

    straddle = (
        kept.groupBy("conv_id")
        .agg(F.countDistinct("split").alias("k"))
        .where("k > 1")
        .count()
    )
    assert straddle == 0

    rejected = spark.read.parquet(summary["rejected_convs"])
    assert {r["conv_id"] for r in rejected.collect()} == {3, 4, 6}


def test_curate_transcripts_no_near_dup_flag(spark, tmp_path):
    import curate_transcripts

    rows = _conv(1, ["user", "assistant", "tool"] * 3) + _conv(
        2, ["user", "assistant", "tool"] * 3 + ["user"]
    )
    inp = str(tmp_path / "turns2")
    spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string"
    ).write.parquet(inp)
    summary = curate_transcripts.main(
        ["--input", inp, "--output-root", str(tmp_path / "out2"),
         "--no-near-dup"],
        spark=spark,
    )
    assert summary["n_near_dup_dropped"] == 0
    assert summary["n_convs_kept"] == 2


def test_curate_transcripts_semantic_dedup_and_sft(spark, tmp_path):
    """--semantic-dedup drops a paraphrase conversation that near-dup
    Jaccard at the configured tau would also see but that we isolate with
    --no-near-dup; --sft-output writes split-partitioned (context,
    response) pairs with gate + dedup flags, and the pair dedup fires
    across the two kept conversations that share an exchange."""
    import random

    import curate_transcripts
    from pyspark.sql import functions as F

    rng = random.Random(11)
    roles = ["user", "assistant"]
    # conv 1: 30 turns with text; conv 2 = paraphrase (last text changed)
    texts = [f"payload token {rng.randrange(1000)} number {i}" for i in range(30)]
    c1 = [(1, i, roles[i % 2], texts[i]) for i in range(30)]
    c2 = [(2, i, roles[i % 2], texts[i]) for i in range(29)] + [
        (2, 29, roles[29 % 2], "a completely different closing line")
    ]
    # conv 3: unrelated content, shares ONE exact exchange with conv 1
    c3 = [(3, i, roles[i % 2], f"other stuff {i} {rng.randrange(1000)}")
          for i in range(10)]
    c3[4] = (3, 4, c1[4][2], c1[4][3])
    c3[5] = (3, 5, c1[5][2], c1[5][3])
    inp = str(tmp_path / "turns_sem")
    spark.createDataFrame(
        c1 + c2 + c3, "conv_id long, turn_idx int, role string, text string"
    ).write.parquet(inp)

    sft_out = str(tmp_path / "sft_pairs")
    chat_out = str(tmp_path / "sft_chat")
    summary = curate_transcripts.main(
        ["--input", inp, "--output-root", str(tmp_path / "out_sem"),
         "--no-near-dup", "--semantic-dedup",
         "--sft-output", sft_out, "--sft-max-context", "1",
         "--sft-chat-output", chat_out,
         "--max-run", "6"],
        spark=spark,
    )
    # paraphrase conv 2 dropped semantically, nothing else
    assert summary["n_semantic_dropped"] == 1
    kept = spark.read.parquet(summary["turns"])
    assert {r["conv_id"] for r in kept.select("conv_id").collect()} == {1, 3}

    sft = summary["sft"]
    pairs = spark.read.parquet(sft_out)
    # one pair per assistant turn of each kept conversation
    assert sft["n_pairs_total"] == pairs.count() == 15 + 5
    # the shared exchange: context turn 4 + response turn 5 are identical
    # across convs 1 and 3 at max_context 1 -> exactly one survives
    assert sft["n_pairs_dup_dropped"] == 1
    dup = pairs.where(F.col("keep") & ~F.col("is_kept")).collect()
    assert len(dup) == 1 and dup[0]["conv"] == 3
    # split column rides the pairs and never straddles a conversation
    assert (
        pairs.groupBy("conv").agg(F.countDistinct("split").alias("k"))
        .where("k > 1").count() == 0
    )
    assert sft["n_pairs_kept"] + sft["n_pairs_dup_dropped"] + sft[
        "n_pairs_gated"
    ] == sft["n_pairs_total"]

    # --sft-chat-output: loader-ready JSONL of KEPT pairs only — one
    # messages array per line ending in the assistant response; the
    # parquet audit table's schema is unchanged (no messages column)
    assert sft["chat_path"] == chat_out
    chat = spark.read.json(chat_out)
    assert chat.count() == sft["n_pairs_kept"]
    row = chat.where("conv_id = 1 AND position = 2").collect()[0]
    msgs = [(m["role"], m["content"]) for m in row["messages"]]
    assert msgs[-1][0] == "assistant" and len(msgs) == 2
    assert "messages" not in pairs.columns


def test_curate_transcripts_text_identity_and_empty_output(spark, tmp_path):
    """With a text column present: identical role sequences with DIFFERENT
    texts are NOT dups; identical texts are.  NULL conv_id turns are
    counted and excluded.  An all-rejected corpus returns a summary
    instead of crashing on the empty partitioned read-back."""
    rows = [
        # three convs, identical role alternation (the chat-corpus trap)
        (1, 0, "user", "how do i sort a list"), (1, 1, "assistant", "use sorted()"),
        (1, 2, "user", "thanks"), (1, 3, "assistant", "welcome"),
        (2, 0, "user", "what is a monad"), (2, 1, "assistant", "a monoid in..."),
        (2, 2, "user", "huh"), (2, 3, "assistant", "let me rephrase"),
        # exact text copy of conv 1 -> dropped
        (9, 0, "user", "how do i sort a list"), (9, 1, "assistant", "use sorted()"),
        (9, 2, "user", "thanks"), (9, 3, "assistant", "welcome"),
        # NULL conv_id turn: counted, excluded
        (None, 0, "user", "orphan"),
    ]
    inp = str(tmp_path / "turns_text")
    spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string, text string"
    ).write.parquet(inp)

    import curate_transcripts

    summary = curate_transcripts.main(
        ["--input", inp, "--output-root", str(tmp_path / "out_text"),
         "--min-turns", "3", "--max-run", "4"],
        spark=spark,
    )
    assert summary["n_null_conv_turns"] == 1
    assert summary["n_turns_in"] == 12
    # conv 2 survives despite sharing conv 1's exact role sequence
    kept = spark.read.parquet(summary["turns"])
    assert {r["conv_id"] for r in kept.select("conv_id").collect()} == {1, 2}
    assert summary["n_exact_dropped"] == 1  # conv 9 (text copy)

    # all-rejected corpus: min-turns above every conversation length
    summary2 = curate_transcripts.main(
        ["--input", inp, "--output-root", str(tmp_path / "out_empty"),
         "--min-turns", "99"],
        spark=spark,
    )
    assert summary2["n_convs_kept"] == 0
    assert summary2["split_counts"] == {}
    assert summary2["n_convs_rejected"] == 3


def test_curate_transcripts_pack_budget(spark, tmp_path):
    """--pack-budget writes a per-split next-fit bin manifest over the
    kept conversations: every kept conv appears exactly once, its split
    matches the turns table, bins never straddle splits, and capped bins
    respect the budget."""
    rows = []
    for cid in range(1, 13):
        for i in range(4):
            role = "user" if i % 2 == 0 else "assistant"
            rows.append((cid, i, role, f"c{cid} turn {i} some words here"))
    inp = str(tmp_path / "turns_pack")
    out_root = str(tmp_path / "out_pack")
    spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string, text string"
    ).write.parquet(inp)

    import curate_transcripts

    summary = curate_transcripts.main(
        ["--input", inp, "--output-root", out_root,
         "--min-turns", "3", "--no-near-dup",
         "--pack-budget", "50", "--pack-shards", "2"],
        spark=spark,
    )
    pk = summary["packing"]
    assert pk["budget"] == 50
    manifest = spark.read.parquet(pk["path"])
    kept = spark.read.parquet(summary["turns"])
    conv_split = {
        (r.conv_id, r.split)
        for r in kept.select("conv_id", "split").distinct().collect()
    }
    man_rows = manifest.collect()
    assert {(r.conv_id, r.split) for r in man_rows} == conv_split
    assert len(man_rows) == len(conv_split)  # once each
    # every turn contributes 6 whitespace tokens -> 24 per conv, < 50:
    # nothing oversize, at most two convs per bin
    assert all(not r.oversize for r in man_rows)
    bins = {}
    for r in man_rows:
        bins.setdefault((r.split, r.shard, r.bin_in_shard), []).append(r)
    for key, rs in bins.items():
        assert sum(x.n_tokens for x in rs) <= 50, key
        assert len({x.split for x in rs}) == 1, key
    assert all(r.n_tokens == 24 for r in man_rows)
    splits = pk["splits"]
    assert sum(v["n_convs"] for v in splits.values()) == 12
    for v in splits.values():
        assert v["n_oversize_bins"] == 0
        assert v["utilization"] is not None and 0 < v["utilization"] <= 1


def test_curate_transcripts_sft_pack_budget(spark, tmp_path):
    """--pack-budget + --sft-output packs the KEPT SFT PAIRS at their
    chat-template token counts (context lines + final assistant line —
    what the trainer actually tokenizes), not whole conversations: the
    manifest keys on pair_id = conv#position, covers exactly the is_kept
    pairs, and every pair's n_tokens equals the whitespace token count
    of its rendered sample."""
    rows = []
    for cid in range(1, 9):
        for i in range(4):
            role = "user" if i % 2 == 0 else "assistant"
            rows.append((cid, i, role, f"c{cid} turn {i} some words here"))
    inp = str(tmp_path / "turns_sftpack")
    out_root = str(tmp_path / "out_sftpack")
    spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string, text string"
    ).write.parquet(inp)

    import curate_transcripts

    summary = curate_transcripts.main(
        ["--input", inp, "--output-root", out_root,
         "--min-turns", "3", "--no-near-dup",
         "--sft-output", str(tmp_path / "sft"),
         "--pack-budget", "40", "--pack-shards", "2"],
        spark=spark,
    )
    pk = summary["packing"]
    assert pk["basis"] == "sft_pairs"
    manifest = spark.read.parquet(pk["path"])
    pairs = spark.read.parquet(str(tmp_path / "sft"))
    kept_pairs = pairs.where("is_kept").collect()
    want_tokens = {}
    for r in kept_pairs:
        sample = f"{r['context']}\nassistant: {r['response']}"
        want_tokens[f"{r['conv']}#{r['position']}"] = len(sample.split())
    got = {r["pair_id"]: r["n_tokens"] for r in manifest.collect()}
    assert got == want_tokens and len(got) == len(kept_pairs)
    # split purity + budget still hold at pair granularity
    man_rows = manifest.collect()
    bins = {}
    for r in man_rows:
        bins.setdefault((r.split, r.shard, r.bin_in_shard), []).append(r)
    for key, rs in bins.items():
        assert len({x.split for x in rs}) == 1, key
        if len(rs) > 1:  # an oversize item always sits alone in its bin
            assert sum(x.n_tokens for x in rs) <= 40, key
    assert sum(v["n_pairs"] for v in pk["splits"].values()) == len(kept_pairs)


def test_curate_transcripts_prefix_dedup_stage(spark, tmp_path):
    """--prefix-dedup drops incremental-logging snapshots (strict
    prefixes of a longer survivor) and ONLY those: an infix overlap and
    a distinct conversation survive; without the flag nothing drops.
    Texts differ per turn so near-dup Jaccard stays below tau and the
    prefix stage is the only thing that can catch the snapshots."""
    import curate_transcripts

    texts = [f"step {i} payload{i}{i}" for i in range(10)]

    def tconv(cid, toks):
        return [
            (cid, i, "user" if i % 2 == 0 else "assistant", t)
            for i, t in enumerate(toks)
        ]

    rows = (
        tconv(1, texts)            # full conversation
        + tconv(2, texts[:4])      # snapshot after 4 turns -> prefix_dup
        + tconv(3, texts[:7])      # snapshot after 7 turns -> prefix_dup
        + tconv(4, texts[3:7])     # INFIX of 1 -> kept
        + tconv(5, [f"other {i}" for i in range(6)])  # unrelated -> kept
    )
    inp = str(tmp_path / "turns_prefix")
    spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string, text string"
    ).write.parquet(inp)

    summary = curate_transcripts.main(
        ["--input", inp, "--output-root", str(tmp_path / "out_prefix"),
         "--prefix-dedup", "--tau-num", "99", "--tau-den", "100"],
        spark=spark,
    )
    assert summary["n_prefix_dropped"] == 2
    kept = spark.read.parquet(summary["turns"])
    assert {r["conv_id"] for r in kept.select("conv_id").collect()} \
        == {1, 4, 5}

    summary2 = curate_transcripts.main(
        ["--input", inp, "--output-root", str(tmp_path / "out_noprefix"),
         "--tau-num", "99", "--tau-den", "100"],
        spark=spark,
    )
    assert summary2["n_prefix_dropped"] == 0
    assert summary2["n_convs_kept"] == 5


def test_curate_transcripts_boilerplate_masking_stage(spark, tmp_path):
    """--boilerplate-min-convs masks the shared system prompt out of the
    dedup identity, so two conversations identical except for prompt
    repetition count exact-dedup; all-boilerplate conversations still
    dedup against each other via the raw-identity fallback."""
    import curate_transcripts

    def tconv(cid, toks):
        return [
            (cid, i, "user" if i % 2 == 0 else "assistant", t)
            for i, t in enumerate(toks)
        ]

    content = ["ask one", "answer one", "ask two", "answer two"]
    rows = (
        tconv(1, ["SYS PROMPT"] + content)
        + tconv(2, ["SYS PROMPT", "SYS PROMPT"] + content)  # dup after mask
        + tconv(3, ["SYS PROMPT"] * 4)                      # all-boiler
        + tconv(4, ["SYS PROMPT"] * 4)                      # dup of 3 (raw)
        + tconv(5, ["SYS PROMPT"] + ["different " + str(i) for i in range(4)])
    )
    inp = str(tmp_path / "turns_boiler")
    spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string, text string"
    ).write.parquet(inp)

    out1 = str(tmp_path / "out_boiler")
    summary = curate_transcripts.main(
        ["--input", inp, "--output-root", out1,
         "--boilerplate-min-convs", "5", "--no-near-dup",
         "--min-turns", "2", "--min-distinct", "1", "--max-run", "99"],
        spark=spark,
    )
    assert summary["n_boilerplate_values"] == 1   # just SYS PROMPT
    # conv 2 dups conv 1 (masked identity), conv 4 dups conv 3 (fallback)
    assert summary["n_exact_dropped"] == 2
    kept = spark.read.parquet(summary["turns"])
    assert {r["conv_id"] for r in kept.select("conv_id").collect()} \
        == {1, 3, 5}
    # written turns untouched: conv 1 keeps its prompt turn
    assert kept.where("conv_id = 1").count() == 5
    boiler = spark.read.parquet(f"{out1}/boilerplate").collect()
    assert [(r["token"], r["n_convs"]) for r in boiler] == [("SYS PROMPT", 5)]

    # without masking nothing exact-dedups except the all-boiler twins
    summary2 = curate_transcripts.main(
        ["--input", inp, "--output-root", str(tmp_path / "out_noboiler"),
         "--no-near-dup",
         "--min-turns", "2", "--min-distinct", "1", "--max-run", "99"],
        spark=spark,
    )
    assert summary2["n_boilerplate_values"] == 0
    assert summary2["n_exact_dropped"] == 1       # conv 4 == conv 3 only


def test_curate_transcripts_redact_pii_stage(spark, tmp_path):
    """--redact-pii: written text (and SFT pairs) carry placeholders,
    dedup identity still sees the raw content, counts reported."""
    import curate_transcripts

    rows = [
        (1, 0, "user", "my email is bob@example.com please write"),
        (1, 1, "assistant", "noted, reaching 10.1.2.3 now"),
        (1, 2, "user", "thanks a lot friend"),
        (2, 0, "user", "clean conversation one two"),
        (2, 1, "assistant", "indeed quite clean here"),
        (2, 2, "user", "goodbye now then"),
    ]
    inp = str(tmp_path / "turns_pii")
    spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string, text string"
    ).write.parquet(inp)

    sft_out = str(tmp_path / "sft_pii")
    summary = curate_transcripts.main(
        ["--input", inp, "--output-root", str(tmp_path / "out_pii"),
         "--redact-pii", "--no-near-dup", "--sft-output", sft_out,
         "--min-turns", "2", "--min-distinct", "1", "--max-run", "99"],
        spark=spark,
    )
    assert summary["n_turns_redacted"] == 2
    kept = spark.read.parquet(summary["turns"])
    texts = {r["text"] for r in kept.collect()}
    assert not any("bob@example.com" in t or "10.1.2.3" in t for t in texts)
    assert any("<EMAIL>" in t or "EMAIL" in t for t in texts)
    # SFT pairs extracted downstream inherit the redaction
    pairs = spark.read.parquet(sft_out).collect()
    blob = " ".join(
        (r["context"] or "") + " " + (r["response"] or "") for r in pairs
    )
    assert "bob@example.com" not in blob and "10.1.2.3" not in blob


def test_curate_transcripts_decontaminate_stage(spark, tmp_path):
    """--decontaminate: a conversation sharing a w-gram span with the
    benchmark drops with reason benchmark_contamination; clean
    conversations survive; --max-contam-pct loosens the rule; the probe
    reads RAW text (a boilerplate-masked turn still contaminates)."""
    import curate_transcripts

    roles = ["user", "assistant"]
    leak = ("the quick brown fox jumps over the lazy dog while "
            "seventeen bright violins hummed").split()
    # conv 1: clean; conv 2: one turn contains the benchmark span verbatim
    c1 = [(1, i, roles[i % 2], f"clean payload number {i} alpha beta {i}")
          for i in range(8)]
    c2 = [(2, i, roles[i % 2], f"noise words here {i} gamma delta {i}")
          for i in range(8)]
    c2[3] = (2, 3, roles[1], " ".join(leak))
    inp = str(tmp_path / "turns_dc")
    spark.createDataFrame(
        c1 + c2, "conv_id long, turn_idx int, role string, text string"
    ).write.parquet(inp)
    bench = str(tmp_path / "bench")
    spark.createDataFrame(
        [(1, "essay question: " + " ".join(leak) + " explain why")],
        "qid long, text string",
    ).write.parquet(bench)

    summary = curate_transcripts.main(
        ["--input", inp, "--output-root", str(tmp_path / "out_dc"),
         "--no-near-dup", "--decontaminate", bench, "--contam-w", "8"],
        spark=spark,
    )
    assert summary["n_contam_dropped"] == 1
    kept = spark.read.parquet(summary["turns"])
    assert {r["conv_id"] for r in kept.select("conv_id").collect()} == {1}
    rej = spark.read.parquet(summary["rejected_convs"])
    reasons = {r["conv_id"]: r["reasons"] for r in rej.collect()}
    assert reasons[2] == "benchmark_contamination"
    assert summary["reject_reasons"].get("benchmark_contamination") == 1

    # with a permissive threshold the overlap share is under the cap
    summary2 = curate_transcripts.main(
        ["--input", inp, "--output-root", str(tmp_path / "out_dc2"),
         "--no-near-dup", "--decontaminate", bench, "--contam-w", "8",
         "--max-contam-pct", "60"],
        spark=spark,
    )
    assert summary2["n_contam_dropped"] == 0


def test_curate_transcripts_tfidf_dedup_stage(spark, tmp_path):
    """--tfidf-dedup drops the rare-token paraphrase the other stages
    miss: two conversations sharing all their RARE payload tokens but
    reordered and diluted with different common filler (token-set
    Jaccard and order-sensitive gram cosine both sit below threshold;
    idf-weighted cosine clears it), while an unrelated conversation
    survives."""
    import curate_transcripts

    roles = ["user", "assistant"]
    rare = [f"uniquepayload{i}" for i in range(12)]
    filler_a = ["the", "a", "of", "ok", "yes", "fine"]
    filler_b = ["well", "so", "then", "right", "sure", "done"]
    # conv 1: rare tokens in order with filler_a between
    c1 = [
        (1, i, roles[i % 2], f"{rare[i % 12]} {filler_a[i % 6]}")
        for i in range(24)
    ]
    # conv 2: same rare tokens REVERSED with filler_b — same rare SET,
    # different order, different common filler
    c2 = [
        (2, i, roles[i % 2], f"{rare[11 - (i % 12)]} {filler_b[i % 6]}")
        for i in range(24)
    ]
    # convs 3..14: background corpus — per-conv unique payloads plus BOTH
    # filler vocabularies, so idf makes filler weight ~1 and the shared
    # rare tokens dominate the c1/c2 cosine (a 3-doc corpus would
    # quantize N div df into uselessness)
    bg = [
        (c, i, roles[i % 2],
         f"bg{c}payload{i} {filler_a[i % 6]} {filler_b[i % 6]}")
        for c in range(3, 15)
        for i in range(24)
    ]
    inp = str(tmp_path / "turns_tfidf")
    spark.createDataFrame(
        c1 + c2 + bg, "conv_id long, turn_idx int, role string, text string"
    ).write.parquet(inp)

    out = str(tmp_path / "out_tfidf")
    summary = curate_transcripts.main(
        ["--input", inp, "--output-root", out,
         "--no-near-dup", "--tfidf-dedup",
         "--tfidf-tau-num", "8", "--tfidf-tau-den", "10",
         "--max-run", "6"],
        spark=spark,
    )
    assert summary["n_tfidf_dropped"] == 1
    kept = spark.read.parquet(summary["turns"])
    kept_ids = {r["conv_id"] for r in kept.select("conv_id").collect()}
    assert kept_ids == {1} | set(range(3, 15))  # conv 2 dropped, min-id kept

    # without the flag everything survives (the paraphrase IS invisible
    # to the default stages — the stage adds real recall, not overlap)
    summary2 = curate_transcripts.main(
        ["--input", inp, "--output-root", str(tmp_path / "out_nodedup"),
         "--no-near-dup", "--max-run", "6"],
        spark=spark,
    )
    kept2 = spark.read.parquet(summary2["turns"])
    ids2 = {r["conv_id"] for r in kept2.select("conv_id").collect()}
    assert ids2 == set(range(1, 15))


def test_curate_transcripts_expectation_gate(spark, tmp_path):
    """--expect on the transcript curation job: report in summary +
    written table; --expect-fail-hard aborts with exit 3."""
    import json as _json

    import pytest as _pytest

    import curate_transcripts as ct

    rows = [
        ("c1", 0, "user", "hello there"),
        ("c1", 1, "assistant", "hi"),
        ("c1", 2, "user", "bye"),
        ("c2", 0, "user", None),
    ]
    inp = str(tmp_path / "turns_ex")
    spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    ).write.parquet(inp)
    spec = [
        {"name": "conv_set", "column": "conv_id", "kind": "not_null"},
        {"name": "text_set", "column": "text", "kind": "not_null"},
    ]
    spec_path = str(tmp_path / "checks.json")
    with open(spec_path, "w") as fh:
        _json.dump(spec, fh)

    out_root = str(tmp_path / "cur_ex")
    summary = ct.main(
        ["--input", inp, "--output-root", out_root,
         "--min-turns", "1", "--min-distinct", "1",
         "--expect", spec_path],
        spark=spark,
    )
    assert summary["expectations"]["conv_set"]["passed"] is True
    assert summary["expectations"]["text_set"] == {
        "passed": False, "n_rows": 4, "n_violations": 1
    }
    assert os.path.isdir(os.path.join(out_root, "expectations"))

    with _pytest.raises(SystemExit) as ei:
        ct.main(
            ["--input", inp, "--output-root", str(tmp_path / "cur_ex2"),
             "--expect", spec_path, "--expect-fail-hard"],
            spark=spark,
        )
    assert ei.value.code == 3
