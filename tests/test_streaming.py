"""Structured Streaming ingest tests: the stateless stage chain produces
identical results through readStream as through batch, and the streaming
sink is resumable via its checkpoint."""
import pandas as pd
from pyspark.sql import functions as F

from postal_address_spark.operators.blocking import with_block_key
from postal_address_spark.operators.extract import extract_mentions
from postal_address_spark.operators.normalize_op import normalize_mentions
from postal_address_spark.streaming.ingest import run_ingest_to_parquet
from postal_address_spark.synth import synth_transcripts_pandas


def test_stream_matches_batch(spark, tmp_path):
    transcripts_pd, _ = synth_transcripts_pandas(7, 60, 30)
    src = str(tmp_path / "src")
    batch_df = spark.createDataFrame(transcripts_pd).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    )
    # two source files to exercise multi-trigger ingestion
    batch_df.where(F.col("conv_id") < "c0000000030").write.parquet(
        src + "/part1.parquet"
    )
    batch_df.where(F.col("conv_id") >= "c0000000030").write.parquet(
        src + "/part2.parquet"
    )

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = run_ingest_to_parquet(spark, src + "/*", sink, ckpt)
    q.awaitTermination(120)

    got = (
        spark.read.parquet(sink)
        .select("rec_id", "country_code", "subdivision_code", "block_key")
        .toPandas()
        .sort_values("rec_id")
        .reset_index(drop=True)
    )
    want = (
        with_block_key(
            normalize_mentions(extract_mentions(spark.read.parquet(src + "/*")))
        )
        .select("rec_id", "country_code", "subdivision_code", "block_key")
        .toPandas()
        .sort_values("rec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0


def test_stream_resume_no_duplicates(spark, tmp_path):
    transcripts_pd, _ = synth_transcripts_pandas(9, 40, 20)
    src = str(tmp_path / "src")
    spark.createDataFrame(transcripts_pd).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    ).write.parquet(src)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q1 = run_ingest_to_parquet(spark, src, sink, ckpt)
    q1.awaitTermination(120)
    n1 = spark.read.parquet(sink).count()
    # re-run with the same checkpoint: nothing new -> no duplicate rows
    q2 = run_ingest_to_parquet(spark, src, sink, ckpt)
    q2.awaitTermination(120)
    n2 = spark.read.parquet(sink).count()
    assert n1 == n2 > 0
