"""Entity ↔ conversation index — the consumer-facing join of transcript
entity resolution: which conversations mention which resolved entity,
and how entity-dense each conversation is.

This is the artifact a transcript-analytics user actually queries after
a linkage run ("all conversations touching entity X", "conversations
mentioning more than k distinct entities"), derived from the pipeline's
own outputs: the mention table (rec_id, conv_id, ...) and the cluster
assignment (rec_id, cluster_id).

Scale shape: ONE equi-join on rec_id (both sides are linkage outputs —
co-partitioned for free when they come out of the same run), then
map-side-combinable aggregations.  Distinct-conversation counts go
through an explicit (key, conv) pre-aggregation instead of
``countDistinct`` — no Expand node, both shuffles carry pre-combined
rows (same discipline as operators/profiling.py).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _joined(
    mentions: DataFrame,
    clusters: DataFrame,
    rec_col: str,
    conv_col: str,
) -> DataFrame:
    return mentions.select(rec_col, conv_col).join(
        clusters.select(rec_col, "cluster_id"), rec_col
    )


def entity_conversation_index(
    mentions: DataFrame,
    clusters: DataFrame,
    rec_col: str = "rec_id",
    conv_col: str = "conv_id",
) -> DataFrame:
    """Per resolved entity: (cluster_id, n_mentions, n_convs) — the
    entity's conversation footprint, sorted-by-nothing (consumers order
    as needed)."""
    per_conv = (
        _joined(mentions, clusters, rec_col, conv_col)
        .groupBy("cluster_id", conv_col)
        .agg(F.count(F.lit(1)).alias("n_mentions_conv"))
    )
    return per_conv.groupBy("cluster_id").agg(
        F.sum("n_mentions_conv").alias("n_mentions"),
        F.count(F.lit(1)).alias("n_convs"),
    )


def conversation_entities(
    mentions: DataFrame,
    clusters: DataFrame,
    rec_col: str = "rec_id",
    conv_col: str = "conv_id",
) -> DataFrame:
    """Per conversation: (conv, n_linked_mentions, n_entities) — the
    inverse index; conversations with no linked mention don't appear
    (left-join against the turns table to zero-fill if needed)."""
    per_entity = (
        _joined(mentions, clusters, rec_col, conv_col)
        .groupBy(conv_col, "cluster_id")
        .agg(F.count(F.lit(1)).alias("n_mentions_entity"))
    )
    return per_entity.groupBy(conv_col).agg(
        F.sum("n_mentions_entity").alias("n_linked_mentions"),
        F.count(F.lit(1)).alias("n_entities"),
    )
