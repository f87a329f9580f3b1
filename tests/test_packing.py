"""Token-budget sequence packing (operators/packing.py) ground truth:
python next-fit replay, packing invariants, partitioning-independence,
and plan shape (one shuffle, no text movement)."""
import hashlib
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postal_address_spark.operators import packing  # noqa: E402

COLS = (
    "doc_id", "shard", "bin_in_shard", "pos_in_bin", "start_offset",
    "n_tokens", "oversize",
)


def _docs(spark, n=400, seed=3):
    """Deterministic uneven token lengths incl. oversize outliers."""
    rows = []
    for i in range(n):
        t = (i * 37 + seed) % 97 + 3          # 3..99
        if i % 53 == 0:
            t = 300 + i                        # oversize vs budget<=256
        rows.append((i, t, f"w{i} " * 3))
    return spark.createDataFrame(rows, "doc_id long, n_tokens long, text string")


def _md5h(seed, doc_id):
    return int(hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()[:8], 16)


def _brute_pack(items, budget, n_shards, hash_fn):
    """Python oracle: shard by hash % n_shards, order by (hash, id),
    next-fit."""
    shards = {}
    for doc_id, t in items:
        h = hash_fn(doc_id)
        shards.setdefault(h % n_shards, []).append((h, doc_id, t))
    out = set()
    for shard, docs in shards.items():
        docs.sort()
        b, p, fill = 0, 0, 0
        for h, doc_id, t in docs:
            if p > 0 and fill + t > budget:
                b, p, fill = b + 1, 0, 0
            out.add((doc_id, shard, b, p + 1, fill, t, t > budget))
            p += 1
            fill += t
    return out


def test_pack_matches_python_oracle_md5(spark):
    docs = _docs(spark)
    got = {tuple(r) for r in packing.pack_sequences(
        docs, 128, n_shards=16, seed=7, rank_method="md5").collect()}
    items = [(r.doc_id, r.n_tokens) for r in docs.collect()]
    assert got == _brute_pack(items, 128, 16, lambda d: _md5h(7, d))


def test_pack_matches_python_oracle_xxhash(spark):
    """Production path: hashes read back from Spark, packing replayed in
    python — pins shard assignment, order, and state threading."""
    from pyspark.sql import functions as F

    docs = _docs(spark)
    got = {tuple(r) for r in packing.pack_sequences(
        docs, 128, n_shards=16, seed=11, rank_method="xxhash").collect()}
    hmap = {
        r.doc_id: r.h
        for r in docs.select(
            "doc_id",
            F.xxhash64(F.col("doc_id").cast("string"), F.lit(11)).alias("h"),
        ).collect()
    }
    items = [(r.doc_id, r.n_tokens) for r in docs.collect()]
    assert got == _brute_pack(items, 128, 16, lambda d: hmap[d])


def test_pack_invariants(spark):
    """Every capped bin fits the budget; offsets are the running fill;
    positions are contiguous from 1; oversize docs sit alone."""
    out = packing.pack_sequences(
        _docs(spark), 128, n_shards=8, seed=7, rank_method="md5"
    ).collect()
    bins = {}
    for r in out:
        bins.setdefault((r.shard, r.bin_in_shard), []).append(r)
    assert sum(len(v) for v in bins.values()) == 400
    for key, rs in bins.items():
        rs.sort(key=lambda r: r.pos_in_bin)
        assert [r.pos_in_bin for r in rs] == list(range(1, len(rs) + 1)), key
        fill = 0
        for r in rs:
            assert r.start_offset == fill, key
            fill += r.n_tokens
        if any(r.oversize for r in rs):
            assert len(rs) == 1, key
        else:
            assert fill <= 128, key


def test_pack_independent_of_input_partitioning(spark):
    docs = _docs(spark)
    a = {tuple(r) for r in packing.pack_sequences(
        docs.repartition(1), 128, n_shards=8, seed=7).collect()}
    b = {tuple(r) for r in packing.pack_sequences(
        docs.repartition(13, "n_tokens"), 128, n_shards=8, seed=7).collect()}
    assert a == b


def test_pack_budget_boundary_exact_fit(spark):
    """Docs of exactly budget tokens fill a bin alone, not oversize."""
    docs = spark.createDataFrame(
        [(i, 64) for i in range(10)], "doc_id long, n_tokens long"
    )
    out = packing.pack_sequences(docs, 64, n_shards=2, seed=0).collect()
    assert all(not r.oversize for r in out)
    assert all(r.pos_in_bin == 1 and r.start_offset == 0 for r in out)
    assert len({(r.shard, r.bin_in_shard) for r in out}) == 10


def test_pack_plan_single_shuffle_no_text(spark):
    """One Exchange (the shard groupBy) and the shuffled relation carries
    only id/tokens/hash/shard — the text column is pruned before it."""
    df = packing.pack_sequences(_docs(spark), 128, n_shards=8, seed=7)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan[:3000]
    assert "FlatMapGroupsInPandas" in plan, plan[:3000]
    import re
    # Everything ABOVE the source scan (the scan itself legitimately
    # lists the text column; the Project below the Exchange must prune it
    # so text bytes never shuffle).
    above_scan = plan[: plan.index("Scan")]
    assert not re.search(r"\btext\b", above_scan), above_scan[:1500]


def test_pack_rejects_bad_args(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError):
        packing.pack_sequences(docs, 0)
    with pytest.raises(ValueError):
        packing.pack_sequences(docs, 64, n_shards=0)
    with pytest.raises(ValueError):
        packing.pack_sequences(docs, 64, rank_method="sha2")


def test_bin_stats_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, 40), (2, 40), (3, 40), (4, 500)], "doc_id long, n_tokens long"
    )
    packed = packing.pack_sequences(docs, 100, n_shards=1, seed=0)
    row = packing.bin_stats(packed, 100).collect()[0]
    # shard 0, order by hash: bins are next-fit over 4 docs; the 500-token
    # doc is alone+oversize, the three 40s split 2/1 or 1/2 around it.
    assert row.n_docs == 4
    assert row.n_oversize_bins == 1
    capped_tokens = 120  # three 40-token docs in capped bins
    n_capped = row.n_bins - 1
    assert row.total_tokens == 620
    assert row.utilization == pytest.approx(capped_tokens / (n_capped * 100))


def test_pack_group_cols_equals_independent_per_group_packs(spark):
    """group_cols packing == packing each group separately (bins can
    never straddle a group, and group membership changes nothing else)."""
    from pyspark.sql import functions as F

    docs = _docs(spark).withColumn(
        "grp", F.when(F.col("doc_id") % 2 == 0, "even").otherwise("odd")
    )
    joint = {tuple(r) for r in packing.pack_sequences(
        docs, 128, n_shards=8, seed=7, rank_method="md5",
        group_cols=("grp",)).collect()}
    separate = set()
    for g in ("even", "odd"):
        for r in packing.pack_sequences(
            docs.where(F.col("grp") == g), 128, n_shards=8, seed=7,
            rank_method="md5",
        ).collect():
            separate.add((r.doc_id, g) + tuple(r)[1:])
    assert joint == separate


def test_bin_stats_group_cols(spark):
    from pyspark.sql import functions as F

    docs = _docs(spark).withColumn(
        "grp", F.when(F.col("doc_id") % 2 == 0, "even").otherwise("odd")
    )
    packed = packing.pack_sequences(
        docs, 128, n_shards=8, seed=7, group_cols=("grp",)
    )
    rows = {r.grp: r for r in packing.bin_stats(
        packed, 128, group_cols=("grp",)).collect()}
    assert set(rows) == {"even", "odd"}
    assert rows["even"].n_docs == 200 and rows["odd"].n_docs == 200
