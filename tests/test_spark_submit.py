"""Real ``spark-submit --py-files`` deploy smoke (north rule: "run via
spark-submit --py-files on a multi-executor cluster").

Builds the engine archive with scripts/make_pyfiles.py, then launches
jobs/link.py through the ACTUAL spark-submit binary from a scratch cwd
where ``postal_address_spark`` is not otherwise importable — proving the
zip alone carries the engine (including the vendored refdata JSON, read
zip-safely via importlib.resources: refdata/iso3166_2.py), that the job's
stdout JSON contract survives the real deploy path, and that the deployed
run produces the identical cluster assignment to the in-process library
path (the pipeline is deterministic by design)."""
import json
import os
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.join(REPO_ROOT, "jobs"))


def _spark_submit_bin() -> str:
    # pyspark ships its own spark-submit; using it pins the deploy test to
    # the same Spark build the library tests run on.
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_make_pyfiles_deterministic(tmp_path):
    from scripts.make_pyfiles import build_zip

    a = build_zip(str(tmp_path / "a.zip"))
    b = build_zip(str(tmp_path / "b.zip"))
    ba, bb = open(a, "rb").read(), open(b, "rb").read()
    assert ba == bb and len(ba) > 10_000
    # the vendored refdata JSON must ride along or territory resolution
    # dies at import time inside the archive
    import zipfile

    names = zipfile.ZipFile(a).namelist()
    assert "postal_address_spark/refdata/data/iso_3166-2.json" in names
    assert "postal_address_spark/plans/pipeline.py" in names


def test_spark_submit_py_files_deploy(spark, tmp_path):
    from postal_address_spark.synth import synth_transcripts_spark
    from scripts.make_pyfiles import build_zip

    import link

    engine_zip = build_zip(str(tmp_path / "engine.zip"))
    inp = str(tmp_path / "transcripts")
    out = str(tmp_path / "clusters_submitted")
    synth_transcripts_spark(
        spark, seed=7, n_convs=40, n_entities=20
    ).write.parquet(inp)

    env = dict(os.environ)
    # the subprocess must see the engine ONLY through --py-files
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    cmd = [
        _spark_submit_bin(),
        "--master", "local[4]",
        "--driver-memory", "2g",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--py-files", engine_zip,
        os.path.join(REPO_ROOT, "jobs", "link.py"),
        "--input", inp,
        "--output", out,
    ]
    proc = subprocess.run(
        cmd,
        cwd=str(tmp_path),  # scratch cwd: package not importable from here
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary_lines = [
        line for line in proc.stdout.splitlines() if line.startswith("{")
    ]
    assert summary_lines, proc.stdout[-2000:]
    summary = json.loads(summary_lines[-1])
    assert summary["n_mentions"] > 0
    assert 0 < summary["n_clusters"] <= summary["n_mentions"]

    # deployed run == in-process library run, bit-for-bit on the labels
    lib_out = str(tmp_path / "clusters_lib")
    link.main(["--input", inp, "--output", lib_out], spark=spark)
    submitted = {
        (r.rec_id, r.cluster_id) for r in spark.read.parquet(out).collect()
    }
    library = {
        (r.rec_id, r.cluster_id) for r in spark.read.parquet(lib_out).collect()
    }
    assert submitted == library
    assert len(submitted) == summary["n_mentions"]
