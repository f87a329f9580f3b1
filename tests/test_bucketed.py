"""Bucketed mention store: the self-join on the bucket column must plan
with ZERO Exchange (the shuffle was paid once at write time)."""
import os
import sys
import uuid

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postal_address_spark.sources.bucketed import (  # noqa: E402
    read_bucketed,
    write_bucketed,
)


@pytest.fixture
def bucketed_table(spark):
    name = f"blocked_mentions_{uuid.uuid4().hex[:8]}"
    rows = [
        (f"r{i:03d}", f"FR|7500{i % 4}", f"{i} Rue X", "Paris")
        for i in range(64)
    ]
    df = spark.createDataFrame(
        rows, "rec_id string, block_key string, line1 string, city_name string"
    )
    write_bucketed(df, name, buckets=8, by=("block_key",))
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_self_join_has_no_exchange(spark, bucketed_table):
    # disable auto-broadcast: at test size the planner would broadcast the
    # tiny table, hiding the shuffle-free bucketed sort-merge path that is
    # the point at production size
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t = read_bucketed(spark, bucketed_table)
        a = t.select(F.col("block_key"), F.col("rec_id").alias("rec_id_a"))
        b = t.select(F.col("block_key"), F.col("rec_id").alias("rec_id_b"))
        joined = a.join(b, "block_key").where(
            F.col("rec_id_a") < F.col("rec_id_b")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:1500]
        assert "SortMergeJoin" in plan, plan[:1500]
        # and it still computes the right pair count: 4 blocks x C(16,2)
        assert joined.count() == 4 * (16 * 15 // 2)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_table):
    t = read_bucketed(spark, bucketed_table)
    hist = t.groupBy("block_key").agg(F.count(F.lit(1)).alias("n"))
    plan = hist._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan[:1500]
    assert hist.count() == 4
