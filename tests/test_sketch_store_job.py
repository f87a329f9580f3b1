"""jobs/sketch_store.py — per-partition mergeable sketch tables plus the
fold-later merge stage: merged tables must EXACTLY equal sketches
computed directly over the unioned corpora (the algebra the operating
model depends on), and estimates must track exact counts."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_sketch_store_build_and_merge(spark, tmp_path):
    from pyspark.sql import functions as F

    from postal_address_spark.operators.cms import cms_table
    from postal_address_spark.operators.qsketch import qsketch
    from postal_address_spark.operators.sketches import hll_registers
    from postal_address_spark.synth import synth_transcripts_spark

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    import sketch_store

    full = synth_transcripts_spark(
        spark, seed=21, n_convs=150, n_entities=40
    ).withColumn("day", F.to_date("ts"))
    a_path = str(tmp_path / "batch_a")
    b_path = str(tmp_path / "batch_b")
    half_a = full.where(F.xxhash64("conv_id") % 2 == 0)
    half_b = full.where(F.xxhash64("conv_id") % 2 != 0)
    half_a.write.parquet(a_path)
    half_b.write.parquet(b_path)

    root_a = str(tmp_path / "sk_a")
    root_b = str(tmp_path / "sk_b")
    s_a = sketch_store.main(
        ["--input", a_path, "--output-root", root_a], spark=spark
    )
    s_b = sketch_store.main(
        ["--input", b_path, "--output-root", root_b,
         "--merge", root_a],
        spark=spark,
    )

    # per-part tables exist and are bounded by the sketch sizes
    hll_b = spark.read.parquet(f"{root_b}/hll")
    n_parts = hll_b.select("day").distinct().count()
    assert hll_b.count() <= n_parts * (1 << 12)
    assert (
        spark.read.parquet(f"{root_b}/cms").count() <= n_parts * 4 * 2048
    )

    # THE claim: merged tables == sketches of the unioned corpus, exactly
    union = spark.read.parquet(a_path).unionByName(
        spark.read.parquet(b_path)
    )
    want_hll = sorted(map(tuple, hll_registers(
        union, "conv_id", p=12, group_cols=("day",)).collect()))
    got_hll = sorted(map(tuple, spark.read.parquet(
        f"{root_b}/merged/hll").collect()))
    assert got_hll == want_hll

    want_cms = sorted(map(tuple, cms_table(
        union, "role", depth=4, width=2048, group_cols=("day",)).collect()))
    got_cms = sorted(map(tuple, spark.read.parquet(
        f"{root_b}/merged/cms").collect()))
    assert got_cms == want_cms

    want_q = sorted(map(tuple, qsketch(
        union.select("day", F.length("text").alias("__len")),
        "__len", s=5, group_cols=("day",)).collect()))
    got_q = sorted(map(tuple, spark.read.parquet(
        f"{root_b}/merged/len_sketch").collect()))
    assert got_q == want_q

    # global HLL estimate tracks the exact distinct-conversation count
    exact = union.select("conv_id").distinct().count()
    est = s_b["merged"]["global_hll_estimate"]
    assert abs(est - exact) / exact < 0.10, (est, exact)
    # per-part estimates exist for every day and are positive
    assert len(s_a["hll"]["estimates_by_part"]) >= 1
    assert all(v > 0 for v in s_b["hll"]["estimates_by_part"].values())
    # quantiles are sane for the synthesized text lengths
    q = s_b["merged"]["global_len_quantiles"]
    assert 0 < q["p50"] <= q["p95"] <= q["p99"]
