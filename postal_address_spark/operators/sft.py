"""SFT / instruction-pair extraction from multi-turn transcripts.

A training-data pipeline's last mile: fold a turns table
(BASELINE.json input_hint shape — (conv_id, turn_idx, role, text, ...))
into (context, response) supervised-fine-tuning pairs, one per assistant
turn, with the quality gate and the exact-dedup keep-one decision applied
at PAIR granularity (VERDICT r3 "Next round" #3).

Semantics
---------
Turns are ordered within each conversation by ``order_cols`` (which must
be a total order per conversation — true for (conv_id, turn_idx) per the
input_hint's stable-ordering invariant).  For every turn whose role is
``assistant_role``:

* ``response``        — that turn's text.
* ``context``         — the previous ``max_context_turns`` turns (all
  prior turns when None), each rendered ``role: text`` and joined with
  newlines — the standard chat-template flattening.
* pair quality gate (errors-as-data, reasons comma-joined like
  corpus.quality_filter):
    - ``no_context``     — fewer than ``min_context_turns`` prior turns;
    - ``short_response`` — response NULL or shorter than
      ``min_response_chars``.
* exact pair dedup among gate-passing pairs: pairs with identical
  (context, response) keep ONE representative — the minimum
  (conv, position) — and ``is_kept`` marks it.  Identity is a 64-bit
  ``xxhash64(context, response)`` (engine rule 4: xxhash, never
  MessageDigest, on hot paths); collisions are ~pairs²/2^65, the same
  adjudication as dedup.with_shingle_hashes.

Scale design
------------
One groupBy(conv) shuffle folds the turns (per-group state bounded by
conversation length, like conversations._ordered_token_arrays); the
posexplode emits one row per turn carrying its truncated context slice
only — with ``max_context_turns`` = K the payload is O(K · turn_bytes)
per pair, not O(conv²).  The dedup decision is ONE window over the
64-bit pair hash (no self-join, no second pass over the strings).  All
expressions are JVM codegen — no Python anywhere.

HOF discipline (engine rules 1-2): the folded turn array and the context
slice are projected as real columns before any lambda references them,
and the explode is ``posexplode_outer`` (the fold output is never empty).
"""
from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sft_pairs(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_cols: Sequence[str] = ("turn_idx",),
    role_col: str = "role",
    text_col: str = "text",
    assistant_role: str = "assistant",
    max_context_turns: Optional[int] = None,
    min_context_turns: int = 1,
    min_response_chars: int = 1,
    include_messages: bool = False,
) -> DataFrame:
    """(conv, position, n_context_turns, context, response, reasons, keep,
    is_kept) — one row per assistant turn; see module docstring.

    ``position`` is the 1-based rank of the response turn within its
    conversation under ``order_cols`` order.

    ``include_messages`` additionally emits a ``messages``
    ``array<struct<role, content>>`` column — the context turns followed
    by the response as a final ``assistant_role`` message: the structured
    chat-template form training loaders ingest directly (the rendered
    ``context`` string stays the dedup/gate identity either way, so the
    flag changes the OUTPUT SHAPE only, never a decision).
    """
    if max_context_turns is not None and max_context_turns < 1:
        raise ValueError("max_context_turns must be >= 1 (or None)")
    keyed = turns.select(
        F.col(conv_col).alias("conv"),
        F.struct(
            *[F.col(c).alias(f"k{i}") for i, c in enumerate(order_cols)],
            F.col(role_col).alias("role"),
            F.col(text_col).alias("text"),
        ).alias("kt"),
    )
    folded = keyed.groupBy("conv").agg(
        F.array_sort(F.collect_list("kt")).alias("kts")
    )
    # pos is 0-based: pos == number of prior turns.
    exploded = folded.select(
        "conv", "kts", F.posexplode_outer("kts").alias("pos", "t")
    ).where(F.col("t")["role"] == F.lit(assistant_role))
    if max_context_turns is None:
        start, length = F.lit(1), F.col("pos")
    else:
        start = F.greatest(
            F.col("pos") - F.lit(max_context_turns) + 1, F.lit(1)
        )
        length = F.least(F.col("pos"), F.lit(max_context_turns))
    # context slice projected as a real column BEFORE the render lambda
    # (rule 1), then kts dropped so the full conversation array never
    # rides past this projection.
    sliced = exploded.select(
        "conv",
        (F.col("pos") + F.lit(1)).alias("position"),
        F.col("t")["text"].alias("response"),
        F.slice("kts", start, length).alias("_ctx"),
    )
    message_cols = []
    if include_messages:
        message_cols.append(
            F.concat(
                F.transform(
                    "_ctx",
                    lambda s: F.struct(
                        s["role"].alias("role"), s["text"].alias("content")
                    ),
                ),
                F.array(
                    F.struct(
                        F.lit(assistant_role).alias("role"),
                        F.col("response").alias("content"),
                    )
                ),
            ).alias("messages")
        )
    rendered = sliced.select(
        "conv",
        "position",
        "response",
        F.size("_ctx").alias("n_context_turns"),
        F.array_join(
            F.transform(
                "_ctx",
                lambda s: F.concat_ws(
                    ": ", F.coalesce(s["role"], F.lit("")),
                    F.coalesce(s["text"], F.lit("")),
                ),
            ),
            "\n",
        ).alias("context"),
        *message_cols,
    )
    flags = F.array(
        F.when(
            F.col("n_context_turns") < min_context_turns, F.lit("no_context")
        ),
        F.when(
            F.coalesce(F.length("response"), F.lit(0)) < min_response_chars,
            F.lit("short_response"),
        ),
    )
    gated = rendered.withColumn(
        "reasons", F.array_join(F.filter(flags, lambda x: x.isNotNull()), ",")
    ).withColumn("keep", F.col("reasons") == "")
    # Exact pair dedup among keep rows: one window keyed on the 64-bit
    # pair hash (+ keep, so dropped pairs never shadow a kept one);
    # representative = minimum (conv, position).
    w = Window.partitionBy(F.xxhash64("context", "response"), "keep").orderBy(
        "conv", "position"
    )
    return gated.withColumn(
        "is_kept", F.col("keep") & (F.row_number().over(w) == 1)
    )
