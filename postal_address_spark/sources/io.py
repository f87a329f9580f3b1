"""Table IO: Iceberg when a catalog is configured, parquet otherwise.

The north rule targets Iceberg tables of transcripts.  This sandbox has no
Iceberg runtime jars and no network, so the adapter probes the session
config: paths like ``catalog.db.table`` with ``spark.sql.catalog.<name>``
set route through ``format("iceberg")``; plain paths fall back to parquet
(same DataFrame semantics — the pipeline never sees the difference).

Writes are atomic-by-marker: Spark's ``_SUCCESS`` file is the completion
marker the checkpoint resume logic keys on.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _iceberg_catalog(spark: SparkSession, ref: str) -> bool:
    head = ref.split(".", 1)[0]
    return (
        "/" not in ref
        and spark.conf.get(f"spark.sql.catalog.{head}", None) is not None
    )


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    if _iceberg_catalog(spark, ref):
        return spark.read.format("iceberg").load(ref)
    return spark.read.parquet(ref)


def write_table(
    df: DataFrame, ref: str, mode: str = "overwrite", partition_by=None
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if _iceberg_catalog(df.sparkSession, ref):
        writer.format("iceberg").saveAsTable(ref)
    else:
        writer.parquet(ref)


def write_transcripts_stable(df: DataFrame, ref: str, partitions: int = None) -> None:
    """Sink transcripts with the stable-ordering invariant: repartition by
    conv_id, sort within partitions by (conv_id, turn_idx) — per-turn text
    equality under stable ordering is asserted by the e2e tests
    (BASELINE.json input_hint)."""
    out = df.repartition(*( [partitions] if partitions else [] ), "conv_id")
    out = out.sortWithinPartitions("conv_id", "turn_idx")
    write_table(out, ref)
