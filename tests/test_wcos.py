"""weighted_cosine_pairs vs an independent brute-force oracle.

The engine's prefix filter must be RECALL-LOSSLESS (Cauchy–Schwarz
argument in operators/wcos.py): on every seeded corpus and threshold the
returned pair set and every integer evidence column must equal an
all-pairs recomputation that never sees the prefix logic.
"""
from __future__ import annotations

import math
import random
import re

import pytest
from pyspark.sql import functions as F

from postal_address_spark.operators.wcos import weighted_cosine_pairs

TOKEN_RE = re.compile(r"[^a-z0-9]+")


def brute_force(rows, tau_num, tau_den):
    """All-pairs weighted cosine in pure Python, integer-exact."""
    toks = {
        rid: set(t for t in TOKEN_RE.split(text.lower()) if t)
        for rid, text in rows
    }
    toks = {rid: ts for rid, ts in toks.items() if ts}
    n = len(rows)
    df: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            df[t] = df.get(t, 0) + 1
    w = {t: n // d for t, d in df.items()}
    norm2 = {rid: sum(w[t] * w[t] for t in ts) for rid, ts in toks.items()}
    out = {}
    ids = sorted(toks)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            dot = sum(w[t] * w[t] for t in toks[a] & toks[b])
            if (
                dot * dot * tau_den * tau_den
                >= tau_num * tau_num * norm2[a] * norm2[b]
            ):
                out[(a, b)] = (dot, norm2[a], norm2[b])
    return out


def corpus(seed, n_docs, vocab, doc_len):
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    rows = []
    for i in range(n_docs):
        body = " ".join(rng.choices(words, k=doc_len))
        rows.append((f"d{i:04d}", body))
    # plant exact and near duplicates so the high-threshold grid rows
    # are non-empty
    rows.append(("dup_a", rows[0][1]))
    rows.append(("dup_b", rows[1][1] + " extraword"))
    return rows


def run_engine(spark, rows, tau_num, tau_den):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = weighted_cosine_pairs(
        df, "text", "doc_id", tau_num=tau_num, tau_den=tau_den
    ).collect()
    spark.catalog.clearCache()
    return {
        (r["doc_a"], r["doc_b"]): (r["dot"], r["norm2_a"], r["norm2_b"])
        for r in got
    }


@pytest.mark.parametrize(
    "seed,n_docs,vocab,doc_len,tau_num,tau_den",
    [
        (1, 40, 30, 12, 7, 10),
        (2, 40, 30, 12, 3, 10),   # low threshold: many pairs
        (3, 40, 30, 12, 10, 10),  # tau = 1: exact duplicates only
        (4, 60, 200, 8, 5, 10),   # sparse vocab: rare-token dominated
        (5, 25, 8, 20, 8, 10),    # tiny vocab: heavy token sharing
    ],
)
def test_matches_brute_force(spark, seed, n_docs, vocab, doc_len, tau_num, tau_den):
    rows = corpus(seed, n_docs, vocab, doc_len)
    want = brute_force(rows, tau_num, tau_den)
    got = run_engine(spark, rows, tau_num, tau_den)
    assert got == want
    if tau_num == tau_den:
        # the planted exact duplicate must survive tau = 1
        assert ("d0000", "dup_a") in got


def test_cosine_value_sane(spark):
    rows = corpus(7, 30, 20, 10)
    got = run_engine(spark, rows, 6, 10)
    assert got
    for (a, b), (dot, na2, nb2) in got.items():
        cos = dot / math.sqrt(na2 * nb2)
        assert 0.6 <= cos <= 1.0 + 1e-12, (a, b, cos)


def test_empty_and_degenerate(spark):
    # empty corpus and all-empty texts -> zero rows, no error
    empty = spark.createDataFrame([], "doc_id string, text string")
    assert weighted_cosine_pairs(empty, n_docs=0).count() == 0
    blank = spark.createDataFrame(
        [("a", ""), ("b", "   "), ("c", "!!!")], ["doc_id", "text"]
    )
    assert weighted_cosine_pairs(blank).count() == 0
    spark.catalog.clearCache()


def test_bad_threshold_rejected(spark):
    df = spark.createDataFrame([("a", "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        weighted_cosine_pairs(df, tau_num=0)
    with pytest.raises(ValueError):
        weighted_cosine_pairs(df, tau_num=11, tau_den=10)
