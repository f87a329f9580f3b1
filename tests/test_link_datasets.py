"""Two-dataset linkage (operators/link_datasets.py).

The driver grades link_two_datasets against the mirrored DuckDB kernels
(hash match at sf0.01); this file pins the machinery: cross-only pair
generation, salting equivalence, the best-match argmax, and the
threshold-margin guard the mirrored oracle's membership grade relies on.
"""
import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postal_address_spark.operators.link_datasets import (  # noqa: E402
    best_links,
    cross_candidate_pairs,
    link_datasets,
)


def _blocked(spark, rows):
    # minimal blocked-mention shape: rec_id, line1, city_name,
    # postal_code, block_key
    return spark.createDataFrame(
        rows, "rec_id string, line1 string, city_name string,"
        " postal_code string, block_key string"
    )


A_ROWS = [
    ("a1", "10 MAIN ST", "PARIS", "75008", "FR|75008"),
    ("a2", "10 MAIN STREET", "PARIS", "75008", "FR|75008"),
    ("a3", "22 OAK AVE", "BERLIN", "10115", "DE|10115"),
    ("a4", None, "NOKEY", "X", None),
]
B_ROWS = [
    ("b1", "10 MAIN ST", "PARIS", "75008", "FR|75008"),
    ("b2", "99 ELM RD", "PARIS", "75008", "FR|75008"),
    ("b3", "22 OAK AVENUE", "BERLIN", "10115", "DE|10115"),
]


def test_cross_pairs_are_cross_only(spark):
    a, b = _blocked(spark, A_ROWS), _blocked(spark, B_ROWS)
    pairs = cross_candidate_pairs(a, b).collect()
    ids_a = {r["rec_id_a"] for r in pairs}
    ids_b = {r["rec_id_b"] for r in pairs}
    assert ids_a <= {"a1", "a2", "a3"} and ids_b <= {"b1", "b2", "b3"}
    # same (block, house number) only: a1/a2 (hn=10) never meet b2 (hn=99)
    got = {(r["rec_id_a"], r["rec_id_b"]) for r in pairs}
    assert got == {("a1", "b1"), ("a2", "b1"), ("a3", "b3")}


def test_salting_is_pair_set_preserving(spark):
    a, b = _blocked(spark, A_ROWS), _blocked(spark, B_ROWS)
    plain = {
        (r["rec_id_a"], r["rec_id_b"])
        for r in cross_candidate_pairs(a, b, hot_threshold=10_000).collect()
    }
    salted = {
        (r["rec_id_a"], r["rec_id_b"])
        for r in cross_candidate_pairs(a, b, hot_threshold=1, n_salt=4).collect()
    }
    assert plain == salted and plain


def test_b_side_hot_key_salts_and_preserves_pairs(spark):
    """Hot detection measures BOTH sides: a key below threshold on A but
    hot on B must route through the salted branch (per-key pair volume is
    nA*nB — the one-sided-hot catalog case), with the pair set unchanged."""
    a = _blocked(
        spark,
        [(f"a{i}", "10 MAIN ST", "PARIS", "75008", "FR|75008") for i in range(3)],
    )
    b = _blocked(
        spark,
        [(f"b{i:02d}", "10 MAIN ST", "PARIS", "75008", "FR|75008") for i in range(30)],
    )
    plain = {
        (r["rec_id_a"], r["rec_id_b"])
        for r in cross_candidate_pairs(a, b, hot_threshold=10_000).collect()
    }
    # hot_threshold=10: nA=3 stays under it, nB=30 exceeds it -> salted
    salted_df = cross_candidate_pairs(a, b, hot_threshold=10, n_salt=4)
    salted = {(r["rec_id_a"], r["rec_id_b"]) for r in salted_df.collect()}
    assert salted == plain and len(plain) == 90
    # the salted branch actually engaged: the plan carries the salt union
    plan = salted_df._jdf.queryExecution().executedPlan().toString()
    assert "Union" in plan and "xxhash64" in plan


def test_link_and_best_links(spark):
    a, b = _blocked(spark, A_ROWS), _blocked(spark, B_ROWS)
    edges = link_datasets(a, b, threshold=0.82)
    got = {(r["rec_id_a"], r["rec_id_b"]): r["score"] for r in edges.collect()}
    assert ("a1", "b1") in got and got[("a1", "b1")] == 1.0
    assert all(s >= 0.82 for s in got.values())
    best = {r["rec_id_a"]: (r["rec_id_b"], r["score"]) for r in best_links(edges).collect()}
    assert len(best) == len({k[0] for k in got})
    for ra, (rb, s) in best.items():
        assert got[(ra, rb)] == s
        assert s == max(v for (xa, _), v in got.items() if xa == ra)


def test_best_links_tie_breaks_min_rec_id(spark):
    edges = spark.createDataFrame(
        [("a1", "b9", 0.9), ("a1", "b2", 0.9), ("a1", "b5", 0.85)],
        "rec_id_a string, rec_id_b string, score double",
    )
    got = best_links(edges).collect()
    assert [(r["rec_id_a"], r["rec_id_b"], r["score"]) for r in got] == [
        ("a1", "b2", 0.9)
    ]


def test_value_collapse_fans_out_all_mention_pairs(spark):
    """Duplicate value tuples on both sides: kernel scoring runs once per
    value pair, but every k*j mention pair must come back with the SAME
    score (rule 9: the fan-out is exactly score-preserving)."""
    a = _blocked(spark, A_ROWS + [("a5", "10 MAIN ST", "PARIS", "75008", "FR|75008")])
    b = _blocked(spark, B_ROWS + [("b4", "10 MAIN ST", "PARIS", "75008", "FR|75008")])
    got = {
        (r["rec_id_a"], r["rec_id_b"]): r["score"]
        for r in link_datasets(a, b, threshold=0.82).collect()
    }
    # a1 and a5 share a tuple; b1 and b4 share a tuple -> all 4 pairs, score 1.0
    for pa in ("a1", "a5"):
        for pb in ("b1", "b4"):
            assert got[(pa, pb)] == 1.0
    # a2 (distinct tuple) still matches both b-side duplicates equally
    assert got[("a2", "b1")] == got[("a2", "b4")]


def test_collapse_equals_direct_mention_scoring(spark):
    """The rule-9 rewrite's correctness contract: value-collapsed linkage
    must produce EXACTLY the edge set (ids and scores) of scoring every
    raw mention pair directly, on randomized frames with heavy tuple
    duplication and NULL fields."""
    import random

    from postal_address_spark.operators.scoring import score_pairs

    rng = random.Random(31)
    lines = ["10 MAIN ST", "10 MAIN STREET", "22 OAK AVE", "99 ELM RD", None]
    cities = ["PARIS", "BERLIN", None]
    postals = ["75008", "10115"]

    def mk(tag, n):
        rows = []
        for i in range(n):
            postal = rng.choice(postals)
            rows.append(
                (
                    f"{tag}{i:03d}",
                    rng.choice(lines),
                    rng.choice(cities),
                    postal,
                    f"FR|{postal}",
                )
            )
        return _blocked(spark, rows)

    a, b = mk("a", 60), mk("b", 40)
    collapsed = {
        (r["rec_id_a"], r["rec_id_b"], r["score"])
        for r in link_datasets(a, b, threshold=0.82).collect()
    }
    direct = {
        (r["rec_id_a"], r["rec_id_b"], r["score"])
        for r in score_pairs(
            cross_candidate_pairs(a, b, threshold=0.82), 0.82
        ).collect()
    }
    assert collapsed == direct and collapsed


def test_best_match_margins(spark):
    """Guards the link_best_matches oracle's two float assumptions at
    both gate scales: (1) every raw cross-pair score is far from a
    round-6 rounding boundary (so 1-ulp kernel disagreement can't flip
    the rounded value), and (2) within each A record's above-threshold
    candidate set, the top-2 DISTINCT round-6 scores are well separated
    (equal round-6 scores fall to the shared rec_id_b tie-break)."""
    import __spark_entry__ as em
    from postal_address_spark.operators.blocking import with_block_key
    from postal_address_spark.operators.link_datasets import (
        cross_candidate_pairs as ccp,
    )
    from postal_address_spark.operators.normalize_op import normalize_mentions
    from postal_address_spark.operators.scoring import score_batch

    for sf in ("sf0.001", "sf0.01"):
        def side(table, key, tag):
            m = em._mentions_df(spark, f"/root/testdata/{sf}", table, key).select(
                F.concat(
                    F.lit(tag),
                    F.lpad(F.col("mention_id").cast("string"), 8, "0"),
                ).alias("rec_id"),
                "line1", "line2", "postal_code", "city_name",
                "country_code", "subdivision_code",
            )
            return with_block_key(normalize_mentions(m))

        pairs = ccp(
            side("customer", "c_custkey", "m"), side("supplier", "s_suppkey", "s")
        ).toPandas()
        scores = score_batch(
            pairs["line1_a"].to_numpy(dtype=object),
            pairs["line1_b"].to_numpy(dtype=object),
            pairs["city_name_a"].to_numpy(dtype=object),
            pairs["city_name_b"].to_numpy(dtype=object),
            pairs["postal_code_a"].to_numpy(dtype=object),
            pairs["postal_code_b"].to_numpy(dtype=object),
            threshold=0.0,
        )
        # (1) rounding-boundary margin: distance of score*1e6 to the
        # nearest .5 (the round-half boundary) must dwarf 1-ulp noise
        frac = np.abs((scores * 1e6) % 1.0 - 0.5)
        assert frac.min() > 1e-3, (sf, frac.min())
        # (2) per-A-record top-2 separation of distinct round-6 scores
        import pandas as pd

        df = pd.DataFrame(
            {"a": pairs["rec_id_a"], "s": np.round(scores, 6)}
        )
        df = df[df["s"] >= 0.82]
        for _, grp in df.groupby("a"):
            tops = sorted(set(grp["s"]), reverse=True)
            if len(tops) >= 2:
                assert tops[0] - tops[1] > 1e-5, (sf, tops[:2])
        # (3) per-B-record top-2 separation: the link_mutual_best oracle
        # argmaxes in BOTH directions, so the b-side groups need the same
        # distinct-round-6-score separation guard
        df_b = pd.DataFrame(
            {"b": pairs["rec_id_b"], "s": np.round(scores, 6)}
        )
        df_b = df_b[df_b["s"] >= 0.82]
        for _, grp in df_b.groupby("b"):
            tops = sorted(set(grp["s"]), reverse=True)
            if len(tops) >= 2:
                assert tops[0] - tops[1] > 1e-5, (sf, tops[:2])


def test_cross_scores_clear_of_threshold(spark):
    """Margin guard for the mirrored link_two_datasets oracle: every
    cross-dataset candidate pair's FULL score must clear the 0.82
    membership boundary by far more than the ~1-ulp cross-engine kernel
    disagreement, at both gate scales (so a testdata regen can't
    introduce a one-sided edge)."""
    import __spark_entry__ as em
    from postal_address_spark.operators.blocking import with_block_key
    from postal_address_spark.operators.link_datasets import (
        cross_candidate_pairs as ccp,
    )
    from postal_address_spark.operators.normalize_op import normalize_mentions
    from postal_address_spark.operators.scoring import score_batch

    for sf in ("sf0.001", "sf0.01"):
        def side(table, key, tag):
            m = em._mentions_df(spark, f"/root/testdata/{sf}", table, key).select(
                F.concat(
                    F.lit(tag),
                    F.lpad(F.col("mention_id").cast("string"), 8, "0"),
                ).alias("rec_id"),
                "line1", "line2", "postal_code", "city_name",
                "country_code", "subdivision_code",
            )
            return with_block_key(normalize_mentions(m))

        pairs = ccp(
            side("customer", "c_custkey", "m"), side("supplier", "s_suppkey", "s")
        ).toPandas()
        scores = score_batch(
            pairs["line1_a"].to_numpy(dtype=object),
            pairs["line1_b"].to_numpy(dtype=object),
            pairs["city_name_a"].to_numpy(dtype=object),
            pairs["city_name_b"].to_numpy(dtype=object),
            pairs["postal_code_a"].to_numpy(dtype=object),
            pairs["postal_code_b"].to_numpy(dtype=object),
            threshold=0.0,
        )
        margin = np.abs(scores - 0.82).min()
        assert margin > 1e-6, (sf, margin)


def test_mutual_best_links_reciprocal_chain(spark):
    """The docstring chain: a1-b1 (0.9), a2-b1 (0.95), a2-b2 (0.9).
    a1's best is b1, but b1's best is a2 -> only (a2, b1) survives; a1
    and b2 stay unmatched (precision over coverage)."""
    from postal_address_spark.operators.link_datasets import mutual_best_links

    edges = spark.createDataFrame(
        [("a1", "b1", 0.9), ("a2", "b1", 0.95), ("a2", "b2", 0.9)],
        "rec_id_a string, rec_id_b string, score double",
    )
    got = [
        (r["rec_id_a"], r["rec_id_b"], r["score"])
        for r in mutual_best_links(edges).collect()
    ]
    assert got == [("a2", "b1", 0.95)]


def test_mutual_best_links_one_to_one_on_random_bipartite(spark):
    """Property pins on seeded random bipartite graphs with score ties:
    (1) the result is one-to-one (each endpoint at most once), (2) it
    equals a driver-side reciprocal-best reference with the min-partner
    tie-break, (3) every surviving pair is an edge with its true score."""
    import random

    from postal_address_spark.operators.link_datasets import mutual_best_links

    rng = random.Random(7)
    for trial in range(3):
        edges = []
        seen = set()
        for _ in range(120):
            a = f"a{rng.randrange(25)}"
            b = f"b{rng.randrange(25)}"
            if (a, b) in seen:
                continue
            seen.add((a, b))
            edges.append((a, b, rng.choice([0.82, 0.85, 0.9, 0.95, 1.0])))
        df = spark.createDataFrame(
            edges, "rec_id_a string, rec_id_b string, score double"
        )
        got = {
            (r["rec_id_a"], r["rec_id_b"]): r["score"]
            for r in mutual_best_links(df).collect()
        }
        # reference: argmax per side, ties -> min partner id
        def argmax(pairs):
            best = {}
            for k, p, s in pairs:
                cur = best.get(k)
                if cur is None or (-s, p) < (-cur[1], cur[0]):
                    best[k] = (p, s)
            return best

        ba = argmax([(a, b, s) for a, b, s in edges])
        bb = argmax([(b, a, s) for a, b, s in edges])
        want = {
            (a, p): s
            for a, (p, s) in ba.items()
            if bb.get(p, (None,))[0] == a
        }
        assert got == want, trial
        # one-to-one by construction
        assert len({a for a, _ in got}) == len(got)
        assert len({b for _, b in got}) == len(got)
