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


def test_sessionize_stateful_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer: state survives micro-batches
    (maxFilesPerTrigger=1 over two source files), and the LAST emitted row
    per conversation equals the batch ground truth — including session
    counts split by the gap rule."""
    import datetime as dt

    from postal_address_spark.streaming.sessionize import sessionize_stream

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        # conv A: 3 turns in one session, then a 2-hour gap -> session 2
        ("a", 0, base),
        ("a", 1, base + dt.timedelta(minutes=5)),
        ("a", 2, base + dt.timedelta(minutes=10)),
        ("a", 3, base + dt.timedelta(hours=2, minutes=10)),
        # conv B: single session
        ("b", 0, base + dt.timedelta(minutes=1)),
        ("b", 1, base + dt.timedelta(minutes=2)),
    ]
    rows2 = [
        # second file: conv A continues its second session; conv C appears
        ("a", 4, base + dt.timedelta(hours=2, minutes=15)),
        # conv C: two turns, 31-minute gap at the 30-minute threshold -> 2 sessions
        ("c", 0, base),
        ("c", 1, base + dt.timedelta(minutes=31)),
    ]
    schema = "conv_id string, turn_idx int, ts timestamp_ntz"
    src = str(tmp_path / "src")
    # coalesce(1): exactly one part file per directory, so
    # maxFilesPerTrigger=1 delivers f1's rows then f2's rows as two
    # ordered micro-batches (source processes files oldest-first)
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src + "/f1.parquet")
    import time as _time

    _time.sleep(1.1)  # distinct mtimes -> deterministic file order
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(src + "/f2.parquet")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    name = "sessionize_test_sink"
    for active in spark.streams.active:
        if active.name == name:
            active.stop()
    q = (
        sessionize_stream(stream, session_gap="30 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    out = spark.table(name).toPandas()
    # latest emitted row per conversation = highest n_turns
    last = out.sort_values("n_turns").groupby("conv_id").tail(1).set_index("conv_id")
    assert int(last.loc["a", "n_turns"]) == 5
    assert int(last.loc["a", "n_sessions"]) == 2
    assert int(last.loc["b", "n_turns"]) == 2
    assert int(last.loc["b", "n_sessions"]) == 1
    assert int(last.loc["c", "n_turns"]) == 2
    assert int(last.loc["c", "n_sessions"]) == 2
    assert last.loc["a", "first_ts"] == base
    assert last.loc["a", "last_ts"] == base + dt.timedelta(hours=2, minutes=15)
    # conv A received data in both micro-batches -> two emitted rows
    assert len(out[out["conv_id"] == "a"]) == 2


def test_sessionize_out_of_order_files_match_lag_oracle(spark, tmp_path):
    """The round-4 interval-merge state: THREE source files whose mtime
    order diverges from ts order (late file carries the EARLIEST
    timestamps, including one that fuses two already-separate sessions),
    drained one file per micro-batch — final state per conversation must
    equal the batch LAG ground truth exactly."""
    import datetime as dt
    import time as _time

    from pyspark.sql import functions as F

    from postal_address_spark.streaming.sessionize import sessionize_stream

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    m = lambda minutes: base + dt.timedelta(minutes=minutes)  # noqa: E731
    # conv A's true timeline: 0, 20, 40, 120 -> sessions {0,20,40}, {120}
    # but the 20-minute turn (which FUSES 0 and 40 into one session)
    # arrives LAST.  conv B: a turn 100 minutes EARLIER than anything the
    # first two batches saw arrives last -> opens a PRIOR session and
    # widens first_ts backward.
    f1 = [("a", m(0)), ("a", m(40)), ("b", m(0))]
    f2 = [("a", m(120)), ("b", m(10))]
    f3 = [("a", m(20)), ("b", m(-100))]  # the late, frontier-behind file
    schema = "conv_id string, ts timestamp_ntz"
    src = str(tmp_path / "ooo_src")
    for i, rows in enumerate((f1, f2, f3)):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{src}/f{i}.parquet"
        )
        _time.sleep(1.1)  # distinct mtimes -> deterministic file order

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    name = "sessionize_ooo_sink"
    for active in spark.streams.active:
        if active.name == name:
            active.stop()
    q = (
        sessionize_stream(stream, session_gap="30 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    out = spark.table(name).toPandas()
    last = out.sort_values("n_turns").groupby("conv_id").tail(1).set_index("conv_id")

    # LAG ground truth over the union of all three files
    allrows = spark.createDataFrame(f1 + f2 + f3, schema)
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("ts")
    truth = (
        allrows.withColumn(
            "brk",
            (
                F.col("ts") - F.lag("ts").over(w)
                > F.expr("INTERVAL 30 MINUTES")
            ).cast("int"),
        )
        .groupBy("conv_id")
        .agg(
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("n_turns"),
            (F.lit(1) + F.coalesce(F.sum("brk"), F.lit(0))).alias("n_sessions"),
        )
        .toPandas()
        .set_index("conv_id")
    )
    for conv in ("a", "b"):
        for col in ("first_ts", "last_ts", "n_turns", "n_sessions"):
            assert last.loc[conv, col] == truth.loc[conv, col], (conv, col)
    # and the scenario really exercised both late-arrival paths:
    assert int(last.loc["a", "n_sessions"]) == 2  # 20' fused {0},{40}
    assert int(last.loc["b", "n_sessions"]) == 2  # -100' opened a prior one
    assert last.loc["b", "first_ts"] == m(-100)


def test_streaming_dedup_matches_batch_distinct(spark):
    """Watermark-bounded dropDuplicatesWithinWatermark drained over the
    events table == batch SELECT DISTINCT on the same key (the memory-sink
    result carries key columns only, so order-of-arrival can't leak in)."""
    from pyspark.sql import functions as F

    from postal_address_spark.streaming.ingest import streaming_dedup_event_keys

    got = streaming_dedup_event_keys(
        spark, "/root/testdata/sf0.001/events.parquet"
    ).collect()
    want = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select(
            "user_id", "event_type", F.date_trunc("day", "ts").alias("day")
        )
        .distinct()
        .collect()
    )
    assert len(got) == len(want)
    assert {tuple(r) for r in got} == {tuple(r) for r in want}


def test_session_gap_parsing_accepts_singular_and_rejects_garbage():
    import pytest

    from postal_address_spark.streaming.sessionize import sessionize_stream

    # parsing happens before any DataFrame work -> a None df suffices for
    # the rejection path; singular/plural acceptance is checked via error
    # absence up to the attribute access on the fake frame.
    class _Boom:
        def select(self, *a, **k):
            raise RuntimeError("parsed ok")

    for gap in ("1 minute", "2 hours", "45 seconds", "1 Hour"):
        with pytest.raises(RuntimeError, match="parsed ok"):
            sessionize_stream(_Boom(), session_gap=gap)
    for gap in ("30m", "minutes 30", "soon", "30"):
        with pytest.raises(ValueError, match="session_gap"):
            sessionize_stream(_Boom(), session_gap=gap)


def test_streaming_hll_sketch_matches_batch_any_file_order(spark, tmp_path):
    """streaming_hll_sketch: the drained COMPLETE-mode register table
    must equal the batch hll_registers over the same rows even when the
    stream arrives as MANY micro-batches in shuffled file order — max is
    commutative/associative/idempotent, so unlike the sessionizer there
    is no single-micro-batch caveat to document."""
    import os

    from pyspark.sql import functions as F

    from postal_address_spark.operators.sketches import hll_registers
    from postal_address_spark.streaming.ingest import (
        EVENTS_DDL,
        streaming_hll_sketch,
    )

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # split into 5 files written in value-descending order (mtime order
    # diverges from event order), then force one file per micro-batch
    events_dir = str(tmp_path / "events.parquet")
    os.makedirs(events_dir, exist_ok=True)
    import time as _t

    for i in (4, 2, 0, 3, 1):
        part = src.where(F.pmod("event_id", F.lit(5)) == i)
        part.coalesce(1).write.mode("append").parquet(events_dir)
        _t.sleep(0.05)

    name = "hll_multi_batch_sink"
    for active in spark.streams.active:
        if active.name == name:
            active.stop()
    from postal_address_spark.operators.sketches import (
        _hash32_pair,
        _rank_expr,
    )

    h1, h2 = _hash32_pair(F.col("user_id"), "md5")
    regs = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
        .where(F.col("user_id").isNotNull())
        .select(
            F.shiftrightunsigned(h1, 32 - 10).alias("register"),
            _rank_expr(h2).alias("rank"),
        )
        .groupBy("register")
        .agg(F.max("rank").alias("max_rank"))
    )
    q = (
        regs.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.table(name).collect()))
    # several micro-batches actually ran (one per file)
    assert q.lastProgress is not None

    want = sorted(
        map(
            tuple,
            hll_registers(src, "user_id", p=10, hash_method="md5").collect(),
        )
    )
    assert got == want

    # and the packaged helper over the canonical single-file layout
    # equals the batch sketch too
    helper = sorted(
        map(
            tuple,
            streaming_hll_sketch(
                spark, "/root/testdata/sf0.001/events.parquet", p=10
            ).collect(),
        )
    )
    assert helper == want
