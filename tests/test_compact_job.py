"""jobs/compact.py: file-count reduction, row preservation, and the
pruning-relevant property — range-sorted output files carry DISJOINT
sort-key ranges (what parquet footer min/max pruning keys on)."""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"
    ),
)


def _fragmented_input(spark, path, n_rows=4000, n_fragments=40):
    from pyspark.sql import functions as F

    df = spark.range(n_rows).select(
        F.col("id"),
        (F.col("id") % 7).alias("grp"),
        F.concat(F.lit("row"), F.col("id")).alias("payload"),
    )
    # 40 tiny files: the accreted-micro-batch shape compaction fixes
    df.repartition(n_fragments).write.parquet(path)


def test_compact_reduces_files_and_preserves_rows(spark, tmp_path):
    import compact

    inp = str(tmp_path / "frag")
    out = str(tmp_path / "compacted")
    _fragmented_input(spark, inp)

    summary = compact.main(
        ["--input", inp, "--output", out, "--target-file-mb", "256"],
        spark=spark,
    )
    assert summary["files_in"] == 40
    assert summary["files_out"] == 1  # tiny table fits one target file
    assert summary["n_rows"] == 4000
    got = {r["id"] for r in spark.read.parquet(out).collect()}
    assert got == set(range(4000))


def test_compact_sorted_files_have_disjoint_ranges(spark, tmp_path):
    from pyspark.sql import functions as F

    import compact

    inp = str(tmp_path / "frag2")
    out = str(tmp_path / "sorted")
    # incompressible-ish payload so the table spans several 1-MiB
    # target files (md5 hex does not dictionary-encode away)
    spark.range(60_000).select(
        F.col("id"),
        F.concat(
            F.md5(F.col("id").cast("string")),
            F.md5((F.col("id") + 1).cast("string")),
            F.md5((F.col("id") + 2).cast("string")),
        ).alias("payload"),
    ).repartition(60).write.parquet(inp)

    # tiny target so several output files exist even for this small table
    summary = compact.main(
        ["--input", inp, "--output", out, "--target-file-mb", "1",
         "--sort-by", "id"],
        spark=spark,
    )
    assert summary["files_out"] >= 2
    # per-file min/max on the sort key must be non-overlapping (range
    # partitioning), i.e. file-level stats can prune point lookups
    ranges = sorted(
        (r["lo"], r["hi"])
        for r in spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
        .collect()
    )
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, ranges
    # rows preserved
    assert spark.read.parquet(out).count() == 60_000


def test_compact_partitioned_output(spark, tmp_path):
    import compact

    inp = str(tmp_path / "frag3")
    out = str(tmp_path / "parted")
    _fragmented_input(spark, inp)
    compact.main(
        ["--input", inp, "--output", out, "--partition-by", "grp"],
        spark=spark,
    )
    assert any(d.startswith("grp=") for d in os.listdir(out))
    assert spark.read.parquet(out).count() == 4000


def test_compact_refuses_in_place(spark, tmp_path):
    import compact

    inp = str(tmp_path / "frag4")
    _fragmented_input(spark, inp)
    with pytest.raises(SystemExit):
        compact.main(["--input", inp, "--output", inp], spark=spark)
