"""jobs/curate.py end-to-end: exact dedup, MinHash near-dedup with min-id
survivors, quality rejection with reasons, PII redaction, split layout."""
import os
import sys

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


def test_curate_job_end_to_end(spark, tmp_path):
    import curate

    rows = [
        (1, BASE),
        (9, BASE),                                    # exact dup of 1 -> dropped
        (2, BASE.replace("fox", "wolf")),             # near dup of 1 -> dropped
        (3, "zz"),                                    # too short, no stopwords
        (4, "the contact is user4@example.com for a billing question "
            "about the invoice from the last week of the quarter"),
        (5, "a completely different note about the harvest season and "
            "the long road that winds between the hills and the river "
            "toward the old stone bridge near the market square"),
    ]
    inp = str(tmp_path / "docs")
    out_root = str(tmp_path / "curated")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(inp)

    summary = curate.main(
        ["--input", inp, "--output-root", out_root], spark=spark
    )
    assert summary["n_input"] == 6
    # doc 9 (exact) never reaches near-dup; doc 2 drops there (min id 1 kept)
    assert summary["n_near_dup_dropped"] == 1
    assert summary["n_kept"] == 3 and summary["n_rejected"] == 1
    assert summary["reject_reasons"] == {"no_stopwords,too_short": 1}

    corpus = spark.read.parquet(summary["corpus"])
    kept_ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    assert kept_ids == {1, 4, 5}
    # split column materialized as a partition dir
    assert any(
        d.startswith("split=") for d in os.listdir(summary["corpus"])
    )
    # PII redacted in place
    t4 = corpus.where("doc_id = 4").collect()[0]["text"]
    assert "<EMAIL>" in t4 and "user4@example.com" not in t4

    rejected = spark.read.parquet(summary["rejected"])
    assert rejected.collect()[0]["doc_id"] == 3


def test_curate_job_flags(spark, tmp_path):
    import curate

    rows = [
        (1, BASE),
        (2, BASE.replace("fox", "wolf")),             # near dup, kept w/ flag
    ]
    inp = str(tmp_path / "docs2")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(inp)
    summary = curate.main(
        [
            "--input", inp,
            "--output-root", str(tmp_path / "curated2"),
            "--no-near-dup", "--no-redact",
        ],
        spark=spark,
    )
    assert summary["n_near_dup_dropped"] == 0
    assert summary["n_kept"] == 2


def test_curate_job_decontaminate(spark, tmp_path):
    import curate

    other = (
        "a completely different note about the harvest season and the "
        "long road that winds between the hills and the river toward "
        "the old stone bridge near the market square"
    )
    rows = [(1, BASE), (2, other)]
    inp = str(tmp_path / "docs3")
    bench = str(tmp_path / "bench3")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(inp)
    # benchmark shares a verbatim 13-token span with doc 1 only
    spark.createDataFrame(
        [(100, "eval question: " + " ".join(BASE.split()[5:25]))],
        "doc_id long, text string",
    ).write.parquet(bench)

    summary = curate.main(
        [
            "--input", inp,
            "--output-root", str(tmp_path / "curated3"),
            "--no-near-dup", "--no-redact",
            "--decontaminate", bench,
        ],
        spark=spark,
    )
    assert summary["n_contam_dropped"] == 1
    kept_ids = {
        r["doc_id"]
        for r in spark.read.parquet(summary["corpus"]).select("doc_id").collect()
    }
    assert kept_ids == {2}
    reasons = spark.read.parquet(summary["rejected"]).collect()
    assert {r["doc_id"]: r["reasons"] for r in reasons} == {
        1: "benchmark_contamination"
    }


def test_curate_job_pack_budget(spark, tmp_path):
    """--pack-budget writes a per-split manifest over the kept docs:
    every kept doc exactly once, split-pure bins, budget respected."""
    rows = [
        (i, "some real sentence with enough words to pass the gate "
            f"plus marker {i}", "en", "web")
        for i in range(30)
    ]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.parquet(inp)

    import curate

    summary = curate.main(
        ["--input", inp, "--output-root", str(tmp_path / "out"),
         "--no-near-dup", "--no-redact",
         "--pack-budget", "40", "--pack-shards", "2"],
        spark=spark,
    )
    pk = summary["packing"]
    manifest = spark.read.parquet(pk["path"])
    kept = spark.read.parquet(summary["corpus"])
    assert manifest.count() == kept.count()
    kept_splits = {
        (r.doc_id, r.split)
        for r in kept.select("doc_id", "split").collect()
    }
    assert {(r.doc_id, r.split) for r in manifest.collect()} == kept_splits
    from collections import defaultdict

    bins = defaultdict(list)
    for r in manifest.collect():
        bins[(r.split, r.shard, r.bin_in_shard)].append(r)
    for key, rs in bins.items():
        if not any(x.oversize for x in rs):
            assert sum(x.n_tokens for x in rs) <= 40, key
        assert len({x.split for x in rs}) == 1
    assert sum(v["n_docs"] for v in pk["splits"].values()) == kept.count()


def test_curate_job_dedup_against(spark, tmp_path):
    """--dedup-against: kept docs near-matching the reference corpus drop
    with reason reference_near_dup; unrelated docs survive."""
    import curate

    ref_rows = [(100, BASE)]
    rows = [
        (1, BASE.replace("fox", "wolf")),             # near dup of ref 100
        (5, "a completely different note about the harvest season and "
            "the long road that winds between the hills and the river "
            "toward the old stone bridge near the market square"),
    ]
    inp = str(tmp_path / "docs_da")
    ref = str(tmp_path / "ref_da")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(inp)
    spark.createDataFrame(
        ref_rows, "doc_id long, text string"
    ).write.parquet(ref)

    summary = curate.main(
        [
            "--input", inp,
            "--output-root", str(tmp_path / "curated_da"),
            "--dedup-against", ref,
            "--dedup-against-threshold", "0.5",
            "--no-redact",
        ],
        spark=spark,
    )
    assert summary["n_refdup_dropped"] == 1
    kept = {
        r["doc_id"]
        for r in spark.read.parquet(summary["corpus"]).collect()
    }
    assert kept == {5}
    reasons = {
        r["doc_id"]: r["reasons"]
        for r in spark.read.parquet(summary["rejected"]).collect()
    }
    assert reasons[1] == "reference_near_dup"


def test_curate_job_expectations_gate(spark, tmp_path):
    """--expect: the report lands under output-root and in the summary;
    --expect-fail-hard aborts with exit code 3 on a failing check."""
    import json as _json

    import pytest as _pytest

    import curate

    rows = [(1, BASE), (1, BASE + " again"), (3, None)]
    inp = str(tmp_path / "docs_ex")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(inp)
    spec = [
        {"name": "id_unique", "column": "doc_id", "kind": "unique"},
        {"name": "text_set", "column": "text", "kind": "not_null",
         "min_pass_num": 1, "min_pass_den": 2},
    ]
    spec_path = str(tmp_path / "checks.json")
    with open(spec_path, "w") as fh:
        _json.dump(spec, fh)

    out_root = str(tmp_path / "curated_ex")
    summary = curate.main(
        ["--input", inp, "--output-root", out_root, "--expect", spec_path,
         "--no-redact"],
        spark=spark,
    )
    exp = summary["expectations"]
    assert exp["id_unique"] == {
        "passed": False, "n_rows": 3, "n_violations": 2
    }
    assert exp["text_set"]["passed"] is True
    assert os.path.isdir(os.path.join(out_root, "expectations"))

    # fail-hard: id_unique fails -> SystemExit(3) before any output stage
    with _pytest.raises(SystemExit) as ei:
        curate.main(
            ["--input", inp, "--output-root", str(tmp_path / "curated_ex2"),
             "--expect", spec_path, "--expect-fail-hard"],
            spark=spark,
        )
    assert ei.value.code == 3
