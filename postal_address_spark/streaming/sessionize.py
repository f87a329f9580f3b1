"""Custom stateful streaming operator: per-conversation running session
state via ``applyInPandasWithState``.

The batch pipeline treats a conversation as a closed unit; on a live
transcript stream, conversations arrive incrementally across micro-batches
and the engine needs per-conversation state that SURVIVES batches: how many
turns so far, when the conversation started, when it last spoke, how many
distinct sessions (gap > timeout) it has split into.  That is exactly the
shape Structured Streaming's ``applyInPandasWithState`` exists for — keyed
state (one entry per conv_id, Arrow-batched through pandas), updated per
micro-batch, emitted as data.

Semantics (deterministic, test-assertable):

* state per conv_id: (first_ts, last_ts, n_turns, n_sessions)
* a turn whose ts is more than ``session_gap`` after last_ts starts a new
  session (n_sessions += 1)
* each micro-batch that delivers turns for a conversation emits ONE row
  with the post-update state — so the LAST emitted row per conversation
  equals the batch groupBy ground truth (asserted in
  tests/test_streaming.py)

Scale: state is O(active conversations) x ~48 bytes, hash-partitioned by
conv_id across executors by the streaming state store; per-batch work is
one pandas pass over the conversations that actually received data.
"""
from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("first_ts", TimestampNTZType()),
        StructField("last_ts", TimestampNTZType()),
        StructField("n_turns", LongType()),
        StructField("n_sessions", IntegerType()),
    ]
)

# state rides as epoch-micros longs: simple, Arrow-exact, timezone-free
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("first_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_turns", LongType()),
        StructField("n_sessions", IntegerType()),
    ]
)


def _session_fn(session_gap_us: int):
    def update(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        ts_us_chunks = []
        for pdf in pdfs:
            ts_us_chunks.append(pdf["ts"].astype("int64"))
        ts_us = pd.concat(ts_us_chunks).sort_values() // 1000  # ns -> us
        if state.exists:
            first_us, last_us, n_turns, n_sessions = state.get
        else:
            first_us, last_us, n_turns, n_sessions = None, None, 0, 0
        for t in ts_us:
            t = int(t)
            if last_us is None:
                first_us, last_us, n_sessions = t, t, 1
            elif t > last_us:
                if t - last_us > session_gap_us:
                    n_sessions += 1
                last_us = t
            else:
                # late arrival (ts behind the frontier): counted, widens
                # first_ts, but never opens a session — session boundaries
                # are defined on the ordered frontier
                first_us = min(first_us, t)
            n_turns += 1
        state.update((first_us, last_us, n_turns, n_sessions))
        yield pd.DataFrame(
            {
                "conv_id": [key[0]],
                "first_ts": [pd.Timestamp(first_us * 1000)],
                "last_ts": [pd.Timestamp(last_us * 1000)],
                "n_turns": [n_turns],
                "n_sessions": [n_sessions],
            }
        )

    return update


def sessionize_stream(
    transcripts: DataFrame, session_gap: str = "30 minutes"
) -> DataFrame:
    """conv_id-keyed running session summaries over a transcript STREAM.

    ``transcripts`` must be a streaming DataFrame with (conv_id, ts)
    columns (TIMESTAMP_NTZ).  Returns the append-mode output stream; wire
    it to any sink.  One emitted row per (conversation, micro-batch with
    data); the latest row per conversation is the current truth.
    """
    unit_us = {"minute": 60_000_000, "second": 1_000_000, "hour": 3_600_000_000}
    try:
        qty, unit = session_gap.split()
        gap_us = int(qty) * unit_us[unit.lower().rstrip("s")]
    except (ValueError, KeyError):
        raise ValueError(
            f"session_gap must be '<n> seconds|minutes|hours' (singular "
            f"accepted), e.g. '30 minutes' or '1 hour'; got {session_gap!r}"
        ) from None
    return (
        transcripts.select("conv_id", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _session_fn(gap_us),
            SESSION_OUTPUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
