"""Survivorship / golden-record election: collapse each linked cluster
to one canonical record, as pure DataFrame aggregations.

The reference stops at per-record normalization (postal-address
address.py renders ONE record at a time); once a linkage engine groups
mentions into entities, the consumer needs the entity's canonical
attributes — the "survivorship" step every production MDM / linkage
stack ships.  Field rule implemented here: MODAL non-null value per
(cluster, field), deterministic tie-break = code-point-smallest value
(both Spark and DuckDB compare strings as binary UTF-8, which is what
lets the driver hash-grade the output).

Scale design:

* One melt (``unpivot`` — a narrow Generate, no shuffle) turns k fields
  into rows, so the whole election is ONE aggregation pipeline instead
  of k self-joins: groupBy (cluster, field, value) count — map-side
  combinable, the only full-width shuffle — then an argmax per
  (cluster, field) over the already-collapsed counts, then a k-way
  conditional-aggregation pivot back to one row per cluster.
* The argmax is ``min(struct(-count, value))``: struct comparison gives
  (count DESC, value ASC) without a window (a window over
  (cluster, field) would sort inside partitions for the same answer).
* NULLs never vote: a cluster whose every mention lacks a field gets
  NULL for that field (left join from the cluster roster), not a NULL
  "winner" by count.
* Representative id = MIN(rec_id) — same convention as the closure's
  cluster labels, so goldens are stable across runs and batches.
"""
from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def golden_records(
    records: DataFrame,
    fields: Sequence[str],
    cluster_col: str = "cluster_id",
    id_col: str = "rec_id",
) -> DataFrame:
    """One row per cluster: cluster_id, n_records, rep_rec_id (min id),
    and for every name in ``fields`` the elected canonical value.

    ``records``: one row per record, already carrying its cluster label
    (join ``assign_clusters`` output back to the source frame) plus the
    string fields to elect over.
    """
    if not fields:
        raise ValueError("golden_records: fields must be non-empty")
    cl = F.col(cluster_col)

    roster = records.groupBy(cl.alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_records"),
        F.min(id_col).alias("rep_rec_id"),
    )

    melted = records.unpivot(
        [cl.alias("cluster_id")],
        [F.col(f).cast("string").alias(f) for f in fields],
        "field",
        "value",
    ).where(F.col("value").isNotNull())

    counts = melted.groupBy("cluster_id", "field", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    winners = counts.groupBy("cluster_id", "field").agg(
        F.min(
            F.struct((-F.col("cnt")).alias("neg_cnt"), F.col("value").alias("v"))
        )["v"].alias("winner")
    )
    pivoted = winners.groupBy("cluster_id").agg(
        *[
            F.max(F.when(F.col("field") == f, F.col("winner"))).alias(f)
            for f in fields
        ]
    )
    return roster.join(pivoted, "cluster_id", "left").select(
        "cluster_id", "n_records", "rep_rec_id", *fields
    )
