"""Persisted incremental MinHash dedup index (operators/dedup_state.py,
jobs/dedup_state.py, jobs/curate.py --dedup-state): the state-backed
probe must equal the from-scratch two-corpus operator exactly, appends
must behave as if the reference were the concatenation of everything
ever folded in, and the pinned parameters must refuse mixed band
spaces."""
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

BASE = (
    "the quick brown fox jumps over a lazy dog while the rain keeps "
    "falling on the quiet town and a small cat watches from the window "
    "as the morning light slowly fills the empty street with warm color"
)
OTHER = (
    "a completely different note about the harvest season and the long "
    "road that winds between the hills and the river toward the old "
    "stone bridge near the market square where the vendors gather early"
)
THIRD = (
    "deep in the archive the librarian catalogs every letter by hand "
    "and files the brittle pages under glass so the scholars of the "
    "next century can still read the faded ink without touching it"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df):
    return {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in df.collect()
    }


def test_state_probe_equals_from_scratch(spark, tmp_path):
    from postal_address_spark.operators.dedup import cross_corpus_near_dups
    from postal_address_spark.operators.dedup_state import (
        build_dedup_state,
        dedup_against_state,
        read_state_params,
    )

    ref = _docs(spark, [(1, BASE), (2, OTHER), (3, THIRD)])
    corpus = _docs(
        spark,
        [
            (101, BASE.replace("fox", "wolf")),   # near-dup of ref 1
            (102, OTHER + " indeed"),             # near-dup of ref 2
            (103, "an unrelated short note about tax season paperwork "
                  "and the forms that pile up on the kitchen table"),
        ],
    )
    root = str(tmp_path / "idx")
    params = build_dedup_state(ref, root)
    assert read_state_params(spark, root) == params

    got = _pairs(dedup_against_state(corpus, root, threshold=0.5))
    want = _pairs(cross_corpus_near_dups(corpus, ref, threshold=0.5))
    assert got == want and len(got) >= 2
    assert {g[0] for g in got} >= {101, 102}


def test_append_equals_concatenated_reference(spark, tmp_path):
    from postal_address_spark.operators.dedup import cross_corpus_near_dups
    from postal_address_spark.operators.dedup_state import (
        append_dedup_state,
        build_dedup_state,
        dedup_against_state,
    )

    ref = _docs(spark, [(1, BASE)])
    inc1 = _docs(spark, [(50, OTHER)])
    inc2 = _docs(
        spark,
        [
            (200, BASE + " again"),               # matches the dump
            (201, OTHER.replace("river", "canal")),  # matches increment 1
            (202, THIRD),                          # matches nothing
        ],
    )
    root = str(tmp_path / "idx")
    build_dedup_state(ref, root)
    append_dedup_state(inc1, root)

    got = _pairs(dedup_against_state(inc2, root, threshold=0.5))
    want = _pairs(
        cross_corpus_near_dups(inc2, ref.unionByName(inc1), threshold=0.5)
    )
    assert got == want
    assert {g[:2] for g in got} == {(200, 1), (201, 50)}


def test_params_pinned(spark, tmp_path):
    from postal_address_spark.operators.dedup_state import (
        build_dedup_state,
        check_params,
        read_state_params,
    )

    root = str(tmp_path / "idx")
    build_dedup_state(_docs(spark, [(1, BASE)]), root, bands=4, num_hashes=16)
    params = read_state_params(spark, root)
    assert params["bands"] == 4 and params["num_hashes"] == 16
    check_params(params, bands=4)  # matching: no raise
    with pytest.raises(ValueError):
        check_params(params, bands=8)


def test_dedup_state_job(spark, tmp_path):
    import dedup_state as job

    ref_path = str(tmp_path / "ref")
    inc_path = str(tmp_path / "inc")
    _docs(spark, [(1, BASE), (2, OTHER)]).write.parquet(ref_path)
    _docs(spark, [(50, THIRD)]).write.parquet(inc_path)
    root = str(tmp_path / "idx")

    s1 = job.main(["--state", root, "--build", ref_path], spark=spark)
    assert s1["action"] == "build" and s1["n_docs"] == 2
    s2 = job.main(["--state", root, "--append", inc_path], spark=spark)
    assert s2["params"] == s1["params"]
    s3 = job.main(["--state", root, "--status"], spark=spark)
    assert s3["n_docs"] == 3
    # bands rows = docs x bands
    assert s3["n_band_rows"] == 3 * s1["params"]["bands"]


def test_curate_dedup_state_incremental_loop(spark, tmp_path):
    """The daily-crawl loop: run 1 drops near-copies of the dump and
    appends its kept docs; run 2 then drops a near-copy of a RUN-1 doc
    that was never in the original dump — the whole point of the
    incremental index."""
    import curate
    import dedup_state as job

    dump = str(tmp_path / "dump")
    _docs(spark, [(1, BASE)]).write.parquet(dump)
    root = str(tmp_path / "idx")
    job.main(["--state", root, "--build", dump], spark=spark)

    day1 = str(tmp_path / "day1")
    _docs(
        spark,
        [
            (100, BASE.replace("fox", "wolf")),  # near-copy of the dump
            (101, OTHER),                         # new -> kept + appended
        ],
    ).write.parquet(day1)
    s1 = curate.main(
        ["--input", day1, "--output-root", str(tmp_path / "out1"),
         "--dedup-state", root, "--dedup-state-append",
         "--dedup-against-threshold", "0.5"],
        spark=spark,
    )
    assert s1["n_refdup_dropped"] == 1
    assert s1["dedup_state"]["appended"] == 1
    kept1 = {
        r["doc_id"]
        for r in spark.read.parquet(s1["corpus"]).select("doc_id").collect()
    }
    assert kept1 == {101}

    day2 = str(tmp_path / "day2")
    _docs(
        spark,
        [
            (200, OTHER.replace("river", "canal")),  # near-copy of doc 101
            (201, THIRD),                             # new -> kept
        ],
    ).write.parquet(day2)
    s2 = curate.main(
        ["--input", day2, "--output-root", str(tmp_path / "out2"),
         "--dedup-state", root, "--dedup-state-append",
         "--dedup-against-threshold", "0.5"],
        spark=spark,
    )
    assert s2["n_refdup_dropped"] == 1
    kept2 = {
        r["doc_id"]
        for r in spark.read.parquet(s2["corpus"]).select("doc_id").collect()
    }
    assert kept2 == {201}
    # index now holds dump + both increments' kept docs
    s3 = job.main(["--state", root, "--status"], spark=spark)
    assert s3["n_docs"] == 3
