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
