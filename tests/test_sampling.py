"""Mixture sampling: exact integer replica, determinism, plan shape."""
from __future__ import annotations

from pyspark.sql import functions as F

from postal_address_spark.operators.sampling import (
    BASIS,
    mixture_sample,
    n_copies_col,
)

WEIGHTS = {"en": 25_000, "fr": 5_000, "zh": 0}  # 2.5x / 0.5x / drop
DEFAULT = 1_250  # 1/8 for everything else
SALT = 2024


def _fixture(spark, n=1200):
    langs = ["en", "fr", "zh", "de", "es"]
    return spark.createDataFrame(
        [(i, langs[i % len(langs)]) for i in range(n)],
        "doc_id long, lang string",
    )


def _replica(n):
    """Pure-python replay of the lcg decision — the oracle's arithmetic."""
    langs = ["en", "fr", "zh", "de", "es"]
    out = {}
    for i in range(n):
        w = WEIGHTS.get(langs[i % len(langs)], DEFAULT)
        bucket = (i * 40503 + SALT) % BASIS
        out[i] = w // BASIS + (1 if bucket < w % BASIS else 0)
    return out


def test_lcg_matches_python_replica_exactly(spark):
    n = 1200
    got = {
        (r["doc_id"], r["copy_idx"])
        for r in mixture_sample(
            _fixture(spark, n), WEIGHTS, stratum_col="lang",
            default_bp=DEFAULT, method="lcg",
        ).collect()
    }
    expected = {
        (i, c) for i, k in _replica(n).items() for c in range(k)
    }
    assert got == expected
    # the fixture genuinely exercises both regimes
    assert any(c >= 2 for _, c in got)          # upsampled copies exist
    assert {i for i, _ in got} != set(range(n))  # and some docs dropped


def test_dropped_stratum_and_default(spark):
    rows = mixture_sample(
        _fixture(spark), WEIGHTS, stratum_col="lang",
        default_bp=DEFAULT, method="lcg",
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in rows.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert "zh" not in by_lang                    # weight 0 drops everything
    assert by_lang["de"] > 0 and by_lang["es"] > 0  # default applies
    # 2.5 epochs: every kept en doc has 2 or 3 copies, never fewer
    en = rows.where(F.col("lang") == "en").groupBy("doc_id").count()
    counts = {r["count"] for r in en.collect()}
    assert counts == {2, 3}


def test_xxhash_rate_and_determinism(spark):
    df = _fixture(spark, 2000)
    s1 = mixture_sample(df, {"en": 2_500}, stratum_col="lang",
                        default_bp=0, method="xxhash")
    s2 = mixture_sample(df, {"en": 2_500}, stratum_col="lang",
                        default_bp=0, method="xxhash")
    r1 = {(r["doc_id"], r["copy_idx"]) for r in s1.collect()}
    assert r1 == {(r["doc_id"], r["copy_idx"]) for r in s2.collect()}
    # 400 en docs at p=0.25: binomial mean 100, sd ~8.7 — 4 sigma gate
    n_en = 2000 // 5
    kept = len(r1)
    assert abs(kept - n_en * 0.25) < 4 * (n_en * 0.25 * 0.75) ** 0.5


def test_negative_weight_rejected(spark):
    import pytest

    with pytest.raises(ValueError, match="negative"):
        n_copies_col(F.col("doc_id"), F.col("lang"), {"en": -1})


def test_sampling_is_shuffle_free(spark):
    sampled = mixture_sample(
        _fixture(spark), WEIGHTS, stratum_col="lang", default_bp=DEFAULT,
    )
    plan = sampled._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
