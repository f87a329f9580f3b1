"""Similarity-kernel tests: published goldens + properties.

Golden Jaro/Jaro-Winkler values are the classic Winkler (1990) examples;
Levenshtein goldens are textbook.  Property tests (identity, symmetry,
bounds) run via hypothesis over printable strings.
"""
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from postal_address_spark.core.similarity import (
    jaro_batch,
    jaro_winkler_batch,
    levenshtein_batch,
    levenshtein_ratio_batch,
    token_set_levenshtein_batch,
)


def arr(*xs):
    return np.array(xs, dtype=object)


class TestGoldens:
    def test_jaro_known_values(self):
        a = arr("MARTHA", "DIXON", "JELLYFISH", "DWAYNE", "ABC", "")
        b = arr("MARHTA", "DICKSONX", "SMELLYFISH", "DUANE", "ABC", "")
        got = jaro_batch(a, b)
        want = [0.944444, 0.766667, 0.896296, 0.822222, 1.0, 1.0]
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_jaro_winkler_known_values(self):
        a = arr("MARTHA", "DIXON", "DWAYNE", "ABC", "ABCDEF")
        b = arr("MARHTA", "DICKSONX", "DUANE", "ABC", "XYZZYX")
        got = jaro_winkler_batch(a, b)
        want = [0.961111, 0.813333, 0.840000, 1.0, 0.0]
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_levenshtein_known_values(self):
        a = arr("kitten", "flaw", "abc", "", "same")
        b = arr("sitting", "lawn", "", "xyz", "same")
        got = levenshtein_batch(a, b)
        np.testing.assert_array_equal(got, [3, 2, 3, 3, 0])

    def test_levenshtein_ratio(self):
        got = levenshtein_ratio_batch(arr("kitten", ""), arr("sitting", ""))
        np.testing.assert_allclose(got, [1 - 3 / 7, 1.0])

    def test_token_set(self):
        got = token_set_levenshtein_batch(
            arr("12 Main St", "12 Main St", None),
            arr("Main St 12", "13 Main St", "anything"),
        )
        assert got[0] == 1.0  # token reorder is free
        assert 0.8 < got[1] < 1.0  # one-char typo
        assert got[2] < 1.0

    def test_none_handling(self):
        got = jaro_winkler_batch(arr(None, None), arr("abc", None))
        assert got[0] == 0.0
        assert got[1] == 1.0  # both empty


text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF), max_size=40
)


class TestProperties:
    @settings(max_examples=200, deadline=None)
    @given(text, text)
    def test_bounds_and_symmetry(self, a, b):
        x, y = arr(a), arr(b)
        jw_ab = jaro_winkler_batch(x, y)[0]
        jw_ba = jaro_winkler_batch(y, x)[0]
        assert 0.0 <= jw_ab <= 1.0
        assert jw_ab == pytest.approx(jw_ba, abs=1e-12)
        lr = levenshtein_ratio_batch(x, y)[0]
        assert 0.0 <= lr <= 1.0
        assert lr == pytest.approx(levenshtein_ratio_batch(y, x)[0], abs=1e-12)

    @settings(max_examples=100, deadline=None)
    @given(text)
    def test_identity(self, a):
        x = arr(a)
        assert jaro_winkler_batch(x, x)[0] == pytest.approx(1.0)
        assert levenshtein_batch(x, x)[0] == 0
        assert token_set_levenshtein_batch(x, x)[0] == pytest.approx(1.0)

    @settings(max_examples=100, deadline=None)
    @given(st.lists(text, min_size=1, max_size=60), st.lists(text, min_size=1, max_size=60))
    def test_batch_matches_scalar(self, xs, ys):
        """Batch result == per-pair result (no cross-row leakage)."""
        n = min(len(xs), len(ys))
        xs, ys = xs[:n], ys[:n]
        batch = jaro_winkler_batch(arr(*xs), arr(*ys))
        single = [jaro_winkler_batch(arr(x), arr(y))[0] for x, y in zip(xs, ys)]
        np.testing.assert_allclose(batch, single, atol=1e-12)
        batch_l = levenshtein_batch(arr(*xs), arr(*ys))
        single_l = [levenshtein_batch(arr(x), arr(y))[0] for x, y in zip(xs, ys)]
        np.testing.assert_array_equal(batch_l, single_l)


def test_lsh_fixture_dots_clear_of_zero(spark):
    """Guards the mirrored sign-LSH oracle's rounding-boundary assumption:
    Spark signs come from a numpy BLAS matmul (pairwise/FMA summation),
    DuckDB's from a sequential list_sum — a |dot| within accumulated
    rounding error of 0 could flip a sign bit on one side only.  Assert
    every (vector, hyperplane) dot on the fixture clears zero by a margin
    vastly above float64 rounding at dim=64 (~1e-13), so a future testdata
    regen can't silently introduce a flaky oracle gate."""
    import numpy as np

    from postal_address_spark.operators.similarity_search import _hyperplanes

    planes = _hyperplanes(dim=64, n_tables=16, bits=4, seed=42)
    for sf in ("sf0.001", "sf0.01"):  # both gate scales
        emb = (
            spark.read.parquet(f"/root/testdata/{sf}/embeddings.parquet")
            .select("embedding")
            .toPandas()
        )
        vecs = np.array(
            [np.asarray(v, dtype=np.float64) for v in emb["embedding"]]
        )
        dots = vecs @ planes.reshape(-1, 64).T
        assert np.abs(dots).min() > 1e-9, (sf, np.abs(dots).min())


def test_ivf_fixture_margins_clear_of_rounding(spark):
    """Guards the mirrored ivf_ann_topk oracle's rounding-boundary
    assumptions (the LSH dots-clear-of-zero pattern): Spark's cell
    assignment/probing comes from a numpy BLAS matmul, DuckDB's from a
    sequential list_sum — any sim or cosine within accumulated rounding
    error of an ordering boundary could argmax/rank differently on one
    side only.  Assert, at both gate scales, that (a) every corpus
    vector's top-1 vs top-2 cell-sim gap, (b) every query's probe
    boundary (rank-4 vs rank-5 cell sim) gap, and (c) every query's
    adjacent all-pairs-cosine gaps are all vastly above float64 rounding
    at dim=64, so a future testdata regen can't silently introduce a
    flaky oracle gate."""
    import numpy as np

    from postal_address_spark.operators.similarity_search import (
        kmeans_unit_sphere,
    )

    for sf in ("sf0.001", "sf0.01"):
        emb = (
            spark.read.parquet(f"/root/testdata/{sf}/embeddings.parquet")
            .select("vec_id", "embedding")
            .orderBy("vec_id")
            .toPandas()
        )
        vecs = np.array(
            [np.asarray(v, dtype=np.float64) for v in emb["embedding"]]
        )
        cents = kmeans_unit_sphere(vecs[:4096], 16, seed=42, iters=8)
        un = vecs / np.maximum(
            np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30
        )
        sims = np.sort(un @ cents.T, axis=1)[:, ::-1]
        # (a) cell-assignment margin, every corpus vector
        assert (sims[:, 0] - sims[:, 1]).min() > 1e-9, sf
        # (b) probe boundary margin (n_probe=4), query vectors only
        qmask = emb["vec_id"].to_numpy() < 8
        assert (sims[qmask, 3] - sims[qmask, 4]).min() > 1e-9, sf
        # (c) re-rank ordering margins: per query, adjacent gaps of the
        # full cosine column (any candidate subset's ordering gap is a
        # sum of adjacent full-set gaps, so this bounds them all)
        cos = (un[qmask] @ un.T)
        for qi, qrow in zip(np.where(qmask)[0], cos):
            others = np.sort(np.delete(qrow, qi))[::-1]
            gaps = others[:-1] - others[1:]
            assert gaps.min() > 1e-9, (sf, qi, gaps.min())


def test_er_link_scores_clear_of_threshold(spark):
    """Guards the mirrored er_link_mentions oracle's rounding-boundary
    assumption: Spark scores come from the numpy JW/token-set-Levenshtein
    kernels, DuckDB's from its built-in jaro_winkler_similarity /
    levenshtein — agreement is exact to ~1 ulp (verified over every real
    candidate pair), but a score within rounding error of the 0.82
    threshold could still produce a one-sided edge.  Assert every
    candidate pair's FULL score clears the threshold boundary by a margin
    vastly above 1 ulp at both gate scales, so a future testdata regen
    can't silently introduce a flaky oracle gate."""
    import sys

    import numpy as np
    from pyspark.sql import functions as F

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as em
    from postal_address_spark.operators.blocking import with_block_key
    from postal_address_spark.operators.normalize_op import normalize_mentions
    from postal_address_spark.operators.pairs import candidate_pairs
    from postal_address_spark.operators.scoring import score_batch

    for sf in ("sf0.001", "sf0.01"):
        m = em._mentions_df(spark, f"/root/testdata/{sf}").select(
            F.concat(
                F.lit("m"), F.lpad(F.col("mention_id").cast("string"), 8, "0")
            ).alias("rec_id"),
            "line1", "line2", "postal_code", "city_name",
            "country_code", "subdivision_code",
        )
        blocked = with_block_key(normalize_mentions(m))
        pairs = candidate_pairs(blocked, threshold=0.82).toPandas()
        # threshold=0 disables the cascade short-circuit: every pair gets
        # its FULL score, which is what the oracle computes.
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


def test_explain_features_match_duckdb(spark):
    """Guards the mirrored er_explain_pairs oracle: unlike the closure
    mirror (which only needs score >= 0.82 to agree), the explain query
    hash-compares the SIMILARITY VALUES themselves, rounded to 6
    decimals.  The numpy JW kernels agree with DuckDB's builtin to ~1
    ulp, and the token-set Levenshtein is bit-identical (integer lev, one
    division) — so round-6 equality can only break if a value sits within
    float error of a 0.5e-6 rounding boundary.  Assert direct rounded
    agreement feature-by-feature over EVERY candidate pair at both gate
    scales, so a future testdata regen cannot introduce a one-sided flip
    without this test failing first."""
    import sys

    import duckdb
    from pyspark.sql import functions as F

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as em
    from postal_address_spark.operators.blocking import with_block_key
    from postal_address_spark.operators.normalize_op import normalize_mentions
    from postal_address_spark.operators.pairs import candidate_pairs

    jw = (
        lambda x, y: f"(CASE WHEN {x} = '' AND {y} = '' THEN 1.0 "
        f"ELSE jaro_winkler_similarity({x}, {y}) END)"
    )
    tsl = (
        lambda x, y: f"(CASE WHEN {x} = '' AND {y} = '' THEN 1.0 "
        f"ELSE 1.0 - levenshtein({x}, {y}) / "
        f"greatest(greatest(len({x}), len({y})), 1) END)"
    )
    tskey = (
        lambda c: "substr(array_to_string(list_sort(list_distinct("
        f"string_split_regex(trim(coalesce({c}, '')), '\\s+'))), ' '), 1, 64)"
    )
    trunc = lambda c: f"substr(coalesce({c}, ''), 1, 64)"  # noqa: E731

    for sf in ("sf0.001", "sf0.01"):
        m = em._mentions_df(spark, f"/root/testdata/{sf}").select(
            F.concat(
                F.lit("m"), F.lpad(F.col("mention_id").cast("string"), 8, "0")
            ).alias("rec_id"),
            "line1", "line2", "postal_code", "city_name",
            "country_code", "subdivision_code",
        )
        blocked = with_block_key(normalize_mentions(m))
        pairs = candidate_pairs(blocked).toPandas()

        l1a = pairs["line1_a"].to_numpy(dtype=object)
        l1b = pairs["line1_b"].to_numpy(dtype=object)
        got = {
            "jw_line1": jaro_winkler_batch(l1a, l1b),
            "tsl_line1": token_set_levenshtein_batch(l1a, l1b),
            "jw_city": jaro_winkler_batch(
                pairs["city_name_a"].to_numpy(dtype=object),
                pairs["city_name_b"].to_numpy(dtype=object),
            ),
        }

        con = duckdb.connect()
        con.register("p", pairs[["line1_a", "line1_b", "city_name_a", "city_name_b"]])
        want = con.sql(
            f"""SELECT
              {jw(trunc('line1_a'), trunc('line1_b'))} AS jw_line1,
              {tsl(tskey('line1_a'), tskey('line1_b'))} AS tsl_line1,
              {jw(trunc('city_name_a'), trunc('city_name_b'))} AS jw_city
            FROM p"""
        ).df()
        con.close()

        for feat, g in got.items():
            w = want[feat].to_numpy(dtype=np.float64)
            gr, wr = np.round(g, 6), np.round(w, 6)
            bad = gr != wr
            assert not bad.any(), (
                sf, feat, int(bad.sum()),
                list(zip(g[bad][:3], w[bad][:3])),
            )
            # and the raw disagreement really is at the ~1-ulp scale
            assert np.abs(g - w).max() < 1e-9, (sf, feat, np.abs(g - w).max())


def test_monge_elkan_kernel_semantics():
    """Hand-pinned Monge-Elkan (core/similarity.py monge_elkan_batch):
    composition over the module's own JW kernel, direction asymmetry,
    and the NULL/empty discipline."""
    import numpy as np

    from postal_address_spark.core.similarity import (
        jaro_winkler_batch,
        monge_elkan_batch,
    )

    def ref(sa, sb):
        ta = [t for t in sa.split() if t]
        tb = [t for t in sb.split() if t]
        if not ta and not tb:
            return 1.0
        if not ta or not tb:
            return 0.0
        acc = 0.0
        for x in ta:
            sims = jaro_winkler_batch(
                np.array([x] * len(tb), dtype=object),
                np.array(tb, dtype=object),
            )
            acc += float(sims.max())
        return acc / len(ta)

    cases = [
        ("12 MAIN ST", "MAIN STREET 12"),
        ("12 MAIN ST APT 4", "MAIN STREET 12"),
        ("PLATZ DER REPUBLIK 1", "1 PLATZ REPUBLIK"),
        ("BP 438", "BP 438"),
        ("A", "ZZZZZ"),
    ]
    a = np.array([c[0] for c in cases], dtype=object)
    b = np.array([c[1] for c in cases], dtype=object)
    got = monge_elkan_batch(a, b)
    for i, (sa, sb) in enumerate(cases):
        assert got[i] == ref(sa, sb), (sa, sb)
    assert got[3] == 1.0
    # directed: token-count mismatch makes the two directions differ
    rev = monge_elkan_batch(b, a)
    assert rev[1] != got[1]
    # NULL/empty discipline
    import math

    edge = monge_elkan_batch(
        np.array(["", "a b", None], dtype=object),
        np.array(["", "", "x"], dtype=object),
    )
    assert edge[0] == 1.0 and edge[1] == 0.0 and math.isnan(edge[2])


def test_monge_elkan_margins(spark):
    """Guards the mirrored er_monge_elkan oracle at both gate scales:
    (1) every raw directed mean sits far from a 0.5e-6 rounding boundary
    (the explain-features pattern — cross-engine JW noise is ~1 ulp per
    token, summed over <= ~8 tokens), and (2) no line1 approaches the
    64-codepoint kernel cap (the oracle tokenizes the raw string; a
    longer line1 would make trunc-vs-raw tokenization diverge)."""
    import sys

    import numpy as np

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    from postal_address_spark.core.similarity import monge_elkan_batch
    from postal_address_spark.operators.blocking import with_block_key
    from postal_address_spark.operators.normalize_op import normalize_mentions
    from postal_address_spark.operators.pairs import candidate_pairs

    for sf in ("sf0.001", "sf0.01"):
        m = em._mentions_df(spark, f"/root/testdata/{sf}").select(
            F.concat(
                F.lit("m"), F.lpad(F.col("mention_id").cast("string"), 8, "0")
            ).alias("rec_id"),
            "line1", "line2", "postal_code", "city_name",
            "country_code", "subdivision_code",
        )
        pairs = candidate_pairs(
            with_block_key(normalize_mentions(m))
        ).select("line1_a", "line1_b").toPandas()
        la = pairs["line1_a"].to_numpy(dtype=object)
        lb = pairs["line1_b"].to_numpy(dtype=object)
        # (2) far below the 64-codepoint kernel cap
        max_len = max(
            (len(s) for s in np.concatenate([la, lb]) if s is not None),
            default=0,
        )
        assert max_len < 56, (sf, max_len)
        for scores in (monge_elkan_batch(la, lb), monge_elkan_batch(lb, la)):
            vals = scores[~np.isnan(scores)]
            frac = np.abs((vals * 1e6) % 1.0 - 0.5)
            assert frac.min() > 1e-3, (sf, frac.min())
