"""sft_pairs: conversation -> (context, response) supervised pairs with
pair-granularity quality gate and exact keep-one dedup (operators/sft.py).

Ground truth is hand-derived on tiny fixtures; the driver query's DuckDB
oracle replays the same semantics over the documents-table fixture with
the STRINGS as the dedup identity (deliberately non-mirrored: a 64-bit
xxhash collision in the engine would surface as an oracle mismatch, not
be reproduced by it).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postal_address_spark.operators.sft import sft_pairs  # noqa: E402

SCHEMA = "conv_id long, turn_idx long, role string, text string"


def _rows(df):
    return {
        (r["conv"], r["position"]): r
        for r in df.collect()
    }


def test_basic_pairs_full_context(spark):
    turns = spark.createDataFrame(
        [
            (1, 10, "user", "u1"),
            (1, 20, "assistant", "a1"),
            (1, 30, "user", "u2"),
            (1, 40, "assistant", "a2"),
        ],
        SCHEMA,
    )
    got = _rows(sft_pairs(turns, min_response_chars=1))
    assert set(got) == {(1, 2), (1, 4)}
    first = got[(1, 2)]
    assert first["response"] == "a1"
    assert first["context"] == "user: u1"
    assert first["n_context_turns"] == 1
    assert first["reasons"] == "" and first["keep"] and first["is_kept"]
    second = got[(1, 4)]
    assert second["context"] == "user: u1\nassistant: a1\nuser: u2"
    assert second["n_context_turns"] == 3


def test_context_truncation_keeps_most_recent_turns(spark):
    turns = spark.createDataFrame(
        [(1, i, "user" if i % 2 else "assistant", f"t{i}") for i in range(6)],
        SCHEMA,
    )
    # assistant turns at idx 0,2,4 -> positions 1,3,5
    got = _rows(sft_pairs(turns, max_context_turns=2))
    assert got[(1, 5)]["context"] == "assistant: t2\nuser: t3"
    assert got[(1, 5)]["n_context_turns"] == 2
    # shorter history than the cap: everything available is kept
    assert got[(1, 3)]["context"] == "assistant: t0\nuser: t1"
    assert got[(1, 1)]["context"] == "" and got[(1, 1)]["n_context_turns"] == 0


def test_quality_gate_flags(spark):
    turns = spark.createDataFrame(
        [
            # conv 1: assistant speaks first -> no_context; response long
            (1, 1, "assistant", "x" * 30),
            # conv 2: gated short response (and context present)
            (2, 1, "user", "hello"),
            (2, 2, "assistant", "ok"),
            # conv 3: both flags at once, comma-joined in declaration order
            (3, 1, "assistant", "y"),
        ],
        SCHEMA,
    )
    got = _rows(sft_pairs(turns, min_response_chars=10))
    assert got[(1, 1)]["reasons"] == "no_context"
    assert got[(2, 2)]["reasons"] == "short_response"
    assert got[(3, 1)]["reasons"] == "no_context,short_response"
    assert not any(r["keep"] or r["is_kept"] for r in got.values())


def test_null_response_and_null_context_text(spark):
    turns = spark.createDataFrame(
        [
            (1, 1, "user", None),
            (1, 2, "assistant", "fine answer"),
            (2, 1, "user", "q"),
            (2, 2, "assistant", None),
        ],
        SCHEMA,
    )
    got = _rows(sft_pairs(turns, min_response_chars=3))
    # NULL context text renders as 'role: ' (errors-are-data, no crash)
    assert got[(1, 2)]["context"] == "user: "
    assert got[(1, 2)]["keep"]
    # NULL response gates as short_response via the coalesce(length, 0)
    assert got[(2, 2)]["reasons"] == "short_response"


def test_exact_pair_dedup_keeps_min_conv_position(spark):
    base = [
        (1, 1, "user", "question"),
        (1, 2, "assistant", "answer text"),
    ]
    copy = [(9, t, r, x) for (_, t, r, x) in base]
    other = [(5, 1, "user", "question"), (5, 2, "assistant", "different")]
    turns = spark.createDataFrame(base + copy + other, SCHEMA)
    got = _rows(sft_pairs(turns, min_response_chars=1))
    assert got[(1, 2)]["is_kept"] is True
    assert got[(9, 2)]["is_kept"] is False and got[(9, 2)]["keep"] is True
    # same context, different response -> distinct identity, kept
    assert got[(5, 2)]["is_kept"] is True


def test_gated_duplicates_never_marked_kept(spark):
    # identical (context, response) where BOTH copies fail the gate:
    # neither may surface as kept
    turns = spark.createDataFrame(
        [(1, 1, "assistant", "solo"), (2, 1, "assistant", "solo")],
        SCHEMA,
    )
    got = _rows(sft_pairs(turns, min_response_chars=1, min_context_turns=1))
    assert all(r["reasons"] == "no_context" for r in got.values())
    assert not any(r["is_kept"] for r in got.values())


def test_empty_input(spark):
    empty = spark.createDataFrame([], SCHEMA)
    assert sft_pairs(empty).count() == 0


def test_no_assistant_turns(spark):
    turns = spark.createDataFrame(
        [(1, 1, "user", "a"), (1, 2, "system", "b")], SCHEMA
    )
    assert sft_pairs(turns).count() == 0


def test_custom_role_and_columns(spark):
    turns = spark.createDataFrame(
        [(1, 1, "human", "hi"), (1, 2, "bot", "hello there")],
        "cid long, idx long, speaker string, utterance string",
    )
    got = _rows(
        sft_pairs(
            turns,
            conv_col="cid",
            order_cols=("idx",),
            role_col="speaker",
            text_col="utterance",
            assistant_role="bot",
        )
    )
    assert got[(1, 2)]["context"] == "human: hi"


def test_max_context_turns_validation(spark):
    turns = spark.createDataFrame([(1, 1, "assistant", "x")], SCHEMA)
    import pytest

    with pytest.raises(ValueError):
        sft_pairs(turns, max_context_turns=0)


def test_include_messages_structured_form(spark):
    """include_messages: the structured chat-template column — context
    turns as (role, content) structs followed by the response as a final
    assistant message — alongside the unchanged rendered columns."""
    turns = spark.createDataFrame(
        [
            (1, 10, "user", "u1"),
            (1, 20, "assistant", "a1"),
            (1, 30, "user", "u2"),
            (1, 40, "assistant", "a2"),
        ],
        SCHEMA,
    )
    got = _rows(sft_pairs(turns, min_response_chars=1, include_messages=True))
    first = got[(1, 2)]
    assert [(m["role"], m["content"]) for m in first["messages"]] == [
        ("user", "u1"), ("assistant", "a1"),
    ]
    # rendered identity unchanged by the flag
    assert first["context"] == "user: u1" and first["response"] == "a1"
    second = got[(1, 4)]
    assert [(m["role"], m["content"]) for m in second["messages"]] == [
        ("user", "u1"), ("assistant", "a1"), ("user", "u2"),
        ("assistant", "a2"),
    ]
    # default: no messages column
    assert "messages" not in sft_pairs(turns).columns
