"""Persisted, incrementally-appendable MinHash dedup index.

``jobs/curate.py --dedup-against`` re-reads and re-sketches the whole
reference dump on EVERY run — fine for a one-shot decontamination pass,
wrong for the daily-crawl shape a 100-TB pipeline actually runs: day N's
increment must dedup against the dump PLUS days 1..N-1, and the
reference side's cost must not grow with every re-run.  This module
applies the ``jobs/sketch_store.py`` mergeable-state model to the
MinHash band index (``dedup.minhash_state_frames``): sketch every
document exactly once, persist the index, and let each increment (a)
join against the stored index and (b) append its own rows.

Disk layout under one state root::

    <root>/params     1 row: (num_hashes, bands, shingle_n, seed)
    <root>/bands      (doc_id, band_idx, band_hash)  — LSH join side
    <root>/shingles   (doc_id, shingles array<long>) — exact-verify side

Both data tables are MERGEABLE by plain append (each row is a pure
function of one document), so "add an increment" is one append per
table — no read-modify-write, no compaction requirement (run
``jobs/compact.py`` when small files accrete).  ``params`` pins the
sketch family: an append or probe whose parameters differ from the
stored ones raises instead of silently mixing incompatible band spaces.

Scale shape: a probe sketches ONLY the increment; the stored index is
read as two columnar scans (ids + 8-byte band hashes; ids + gram-hash
arrays — never the reference text), and both joins are id-keyed.  So
increment cost is O(increment sketch) + O(index scan), vs the
from-scratch path's O(full reference re-shingle + re-minhash) every run
(measured: BENCH/CROSSDUP.md incremental-state section).

Doc-id discipline: ids must be unique ACROSS increments (they label
index rows forever); the standard practice is globally-unique crawl ids.
Appending the same id twice yields duplicate index rows — harmless for
match/drop decisions (candidates dedup on id), wasteful on disk.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import read_table, write_table
from .dedup import cross_dups_against_state_frames, minhash_state_frames

PARAM_FIELDS = ("num_hashes", "bands", "shingle_n", "seed")
_PARAMS_SCHEMA = "num_hashes int, bands int, shingle_n int, seed int"


def _paths(root: str) -> dict:
    r = root.rstrip("/")
    return {
        "params": f"{r}/params",
        "bands": f"{r}/bands",
        "shingles": f"{r}/shingles",
    }


def read_state_params(spark: SparkSession, root: str) -> dict:
    rows = read_table(spark, _paths(root)["params"]).collect()
    if len(rows) != 1:
        raise ValueError(
            f"dedup state at {root!r} has {len(rows)} params rows, expected 1"
        )
    return {k: int(rows[0][k]) for k in PARAM_FIELDS}


def build_dedup_state(
    reference: DataFrame,
    root: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    seed: int = 42,
) -> dict:
    """Initialize the state root from a reference corpus (overwrites any
    existing state).  Returns the params dict."""
    p = _paths(root)
    params = {
        "num_hashes": num_hashes, "bands": bands,
        "shingle_n": shingle_n, "seed": seed,
    }
    bands_df, shingles_df = minhash_state_frames(
        reference, text_col, id_col, num_hashes, bands, shingle_n, seed
    )
    write_table(
        bands_df.withColumnRenamed(id_col, "doc_id"), p["bands"]
    )
    write_table(
        shingles_df.withColumnRenamed(id_col, "doc_id"), p["shingles"]
    )
    spark = reference.sparkSession
    write_table(
        spark.createDataFrame([tuple(params[k] for k in PARAM_FIELDS)],
                              _PARAMS_SCHEMA),
        p["params"],
    )
    return params


def append_dedup_state(
    increment: DataFrame,
    root: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Sketch ``increment`` with the state's pinned parameters and append
    its rows to both index tables.  O(increment), never O(index).

    CAUTION (engine rule 10): the increment frame must not itself read
    from this state root lazily — callers that both probe and append in
    one job must materialize (or re-read from their own written output)
    before appending, or the append's execution would re-list the state
    dir mid-plan.  ``jobs/curate.py --dedup-state-append`` re-reads its
    written corpus for exactly this reason."""
    spark = increment.sparkSession
    params = read_state_params(spark, root)
    p = _paths(root)
    bands_df, shingles_df = minhash_state_frames(
        increment, text_col, id_col,
        params["num_hashes"], params["bands"], params["shingle_n"],
        params["seed"],
    )
    write_table(
        bands_df.withColumnRenamed(id_col, "doc_id"), p["bands"],
        mode="append",
    )
    write_table(
        shingles_df.withColumnRenamed(id_col, "doc_id"), p["shingles"],
        mode="append",
    )
    return params


def dedup_against_state(
    corpus: DataFrame,
    root: str,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs of ``corpus`` against the persisted index:
    (id_a in corpus, id_b in index, jaccard >= threshold).  Sketches only
    the corpus; exactly equal to ``cross_corpus_near_dups`` against the
    concatenation of every corpus ever built/appended into the state
    (pytest-pinned)."""
    spark = corpus.sparkSession
    params = read_state_params(spark, root)
    p = _paths(root)
    state_bands = read_table(spark, p["bands"])
    state_shingles = read_table(spark, p["shingles"])
    if id_col != "doc_id":
        state_bands = state_bands.withColumnRenamed("doc_id", id_col)
        state_shingles = state_shingles.withColumnRenamed("doc_id", id_col)
    return cross_dups_against_state_frames(
        corpus, state_bands, state_shingles, text_col, id_col,
        params["num_hashes"], params["bands"], params["shingle_n"],
        threshold, params["seed"],
    )


def check_params(root_params: dict, **expected) -> None:
    """Raise when a caller's expected sketch parameters differ from the
    state's pinned ones (mixing band spaces silently loses recall)."""
    bad = {
        k: (root_params[k], v)
        for k, v in expected.items()
        if k in root_params and root_params[k] != v
    }
    if bad:
        raise ValueError(
            "dedup state parameter mismatch (stored, requested): " + repr(bad)
        )
