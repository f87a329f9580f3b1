"""Conversation-level analytics (operators/conversations.py).

The load-bearing property here is the prefix-filter EXACTNESS claim:
jaccard_set_join must return the *identical* pair set as brute-force
all-pairs at every threshold — the PPJoin probing prefix
(|X| - ceil(tau*|X|) + 1 under a global rarity order) is recall-lossless
by theorem, and these tests check it empirically against planted
near-dups, random sets, and the real sf0.001 events distribution.
"""
import itertools
import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _turns_df(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, action string"
    )


# ---------------------------------------------------------------------------
# action_transitions
# ---------------------------------------------------------------------------


def test_transitions_hand_computed(spark):
    from postal_address_spark.operators.conversations import action_transitions

    rows = [
        ("c1", 1, "view"), ("c1", 2, "click"), ("c1", 3, "view"),
        ("c2", 1, "click"), ("c2", 2, "view"),
        ("c3", 1, "view"),          # single turn: no transition
        ("c4", 1, None), ("c4", 2, "view"), ("c4", 3, "click"),  # NULL dropped
    ]
    out = action_transitions(_turns_df(spark, rows), "conv_id", ("turn_idx",), "action")
    got = {(r.prev_action, r.action): r.n_transitions for r in out.collect()}
    assert got == {
        ("view", "click"): 2,   # c1 and c4 (NULL first turn dropped)
        ("click", "view"): 2,   # c1 and c2
    }


def test_transitions_empty_input(spark):
    from postal_address_spark.operators.conversations import action_transitions

    out = action_transitions(_turns_df(spark, []), "conv_id", ("turn_idx",), "action")
    assert out.count() == 0


# ---------------------------------------------------------------------------
# conversation_docs
# ---------------------------------------------------------------------------


def test_conversation_docs_order_and_determinism(spark):
    """Sequence order follows the order columns, never partition layout."""
    from postal_address_spark.operators.conversations import conversation_docs

    rows = [("c1", i, f"t{i}") for i in range(20, -1, -1)] + [("c2", 0, "x")]
    for nparts in (1, 7):
        df = _turns_df(spark, rows).repartition(nparts)
        out = {
            r.conv_id: (r.n_turns, r.seq)
            for r in conversation_docs(df, "conv_id", ("turn_idx",), "action").collect()
        }
        assert out["c1"] == (21, " ".join(f"t{i}" for i in range(21)))
        assert out["c2"] == (1, "x")


# ---------------------------------------------------------------------------
# jaccard_set_join: exactness vs brute force
# ---------------------------------------------------------------------------


def _brute_force(sets, tau_num, tau_den):
    truth = set()
    for (ia, sa), (ib, sb) in itertools.combinations(sorted(sets.items()), 2):
        inter = len(sa & sb)
        union = len(sa | sb)
        if inter * tau_den >= union * tau_num:
            truth.add((ia, ib, inter, union))
    return truth


def _join_result(spark, sets, tau_num, tau_den):
    from postal_address_spark.operators.conversations import jaccard_set_join

    df = spark.createDataFrame(
        [(k, sorted(v)) for k, v in sets.items()],
        "sid long, sh array<long>",
    )
    out = jaccard_set_join(df, "sid", "sh", tau_num, tau_den)
    return {(r.id_a, r.id_b, r.n_inter, r.n_union) for r in out.collect()}


def test_jaccard_join_exact_on_planted_and_random(spark):
    """Planted near-dup clusters + random background, three thresholds —
    the prefix-filtered join must equal all-pairs EXACTLY."""
    rng = random.Random(7)
    universe = list(range(1, 400))
    sets = {}
    sid = 0
    # planted clusters: a seed set plus mutated copies at various overlap
    for _ in range(6):
        seed_set = set(rng.sample(universe, rng.randint(8, 40)))
        for _ in range(rng.randint(2, 4)):
            s = set(seed_set)
            for _ in range(rng.randint(0, max(1, len(s) // 3))):
                if rng.random() < 0.5 and len(s) > 2:
                    s.discard(rng.choice(sorted(s)))
                else:
                    s.add(rng.choice(universe))
            sets[sid] = s
            sid += 1
    # random background
    for _ in range(25):
        sets[sid] = set(rng.sample(universe, rng.randint(3, 30)))
        sid += 1

    for tau_num, tau_den in ((42, 100), (1, 2), (9, 10)):
        got = _join_result(spark, sets, tau_num, tau_den)
        want = _brute_force(sets, tau_num, tau_den)
        assert got == want, (tau_num, tau_den, got ^ want)


def test_jaccard_join_identical_and_tiny_sets(spark):
    """J=1 pairs and single-element sets survive the prefix math
    (prefix length is always >= 1)."""
    sets = {1: {10, 11, 12}, 2: {10, 11, 12}, 3: {10}, 4: {10}, 5: {99}}
    got = _join_result(spark, sets, 9, 10)
    assert got == {(1, 2, 3, 3), (3, 4, 1, 1)}


def test_conversation_near_dups_matches_brute_force_on_events(spark):
    """Real-distribution check at sf0.001: the engine's composed pipeline
    (fold -> hashed trigrams -> prefix join) equals a driver-side
    brute-force over the same shingle sets."""
    from postal_address_spark.operators.conversations import (
        conversation_docs,
        conversation_near_dups,
    )
    from postal_address_spark.operators.dedup import with_shingle_hashes

    turns = (
        spark.read.parquet(f"{SF}/events.parquet")
        .where(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .select(
            F.col("user_id").alias("conv_id"),
            "ts",
            "event_id",
            F.lower(F.col("event_type")).alias("action"),
        )
    )
    # moderate threshold so the pair set is non-trivial at this tier
    got = {
        (r.conv_a, r.conv_b, r.n_inter, r.n_union)
        for r in conversation_near_dups(
            turns, "conv_id", ("ts", "event_id"), "action",
            shingle_n=3, tau_num=3, tau_den=10,
        ).collect()
    }
    docs = conversation_docs(turns, "conv_id", ("ts", "event_id"), "action")
    shingled = with_shingle_hashes(docs, "seq", 3, out_col="shingles")
    sets = {r.conv_id: set(r.shingles) for r in shingled.collect()}
    want = _brute_force(sets, 3, 10)
    assert got == want
    assert len(want) > 0  # non-vacuous at 3/10


@pytest.mark.parametrize(
    "regime,vocab,size_lo,size_hi,n_sets",
    [
        # tiny vocab + dense sets: heavy element collisions, prefixes
        # nearly exhausted — the regime where a leaky prefix bound shows
        ("dense_tiny_vocab", 12, 2, 10, 40),
        # large vocab + sparse sets: rare-token prefixes do real work
        ("sparse_wide_vocab", 500, 3, 25, 60),
        # mixed sizes incl. singletons: the length-filter boundary and
        # the prefix>=1 floor
        ("mixed_with_singletons", 80, 1, 30, 50),
    ],
)
def test_jaccard_join_property_grid(spark, regime, vocab, size_lo, size_hi, n_sets):
    """Seeded property grid (VERDICT r3 #7; the explicit seeded grid is
    kept deliberately — reproducible corpora beat shrunk examples for
    join-equality debugging): corpora spanning vocabulary density and
    set-size regimes, each checked against brute force at four
    thresholds including the exact-equality boundary tau=1."""
    rng = random.Random(hash(regime) % (2**31))
    universe = list(range(1, vocab + 1))
    sets = {
        sid: set(rng.sample(universe, rng.randint(size_lo, min(size_hi, vocab))))
        for sid in range(n_sets)
    }
    # plant a few exact copies so tau=1 is non-vacuous
    for sid, src in enumerate(rng.sample(sorted(sets), 3), start=n_sets):
        sets[sid] = set(sets[src])
    for tau_num, tau_den in ((1, 4), (1, 2), (9, 10), (1, 1)):
        got = _join_result(spark, sets, tau_num, tau_den)
        want = _brute_force(sets, tau_num, tau_den)
        assert got == want, (regime, tau_num, tau_den, got ^ want)
    assert _brute_force(sets, 1, 1), regime  # planted J=1 pairs exist


def test_jaccard_join_rejects_bad_threshold(spark):
    import pytest

    from postal_address_spark.operators.conversations import jaccard_set_join

    df = spark.createDataFrame([(1, [1, 2])], "sid long, sh array<long>")
    with pytest.raises(ValueError):
        jaccard_set_join(df, "sid", "sh", 0, 10)
    with pytest.raises(ValueError):
        jaccard_set_join(df, "sid", "sh", 11, 10)


# ---------------------------------------------------------------------------
# conversation_stats / conversation_quality / with_conversation_split
# ---------------------------------------------------------------------------


def test_conversation_stats_max_run_hand_computed(spark):
    from postal_address_spark.operators.conversations import conversation_stats

    rows = [
        # c1: a a a b a  -> max_run 3, distinct 2, n 5
        ("c1", 1, "a"), ("c1", 2, "a"), ("c1", 3, "a"), ("c1", 4, "b"),
        ("c1", 5, "a"),
        # c2: run at the END: a b b  -> max_run 2
        ("c2", 1, "a"), ("c2", 2, "b"), ("c2", 3, "b"),
        # c3: single turn -> max_run 1
        ("c3", 1, "z"),
        # c4: all identical -> max_run = n
        ("c4", 1, "x"), ("c4", 2, "x"), ("c4", 3, "x"), ("c4", 4, "x"),
    ]
    out = {
        r.conv_id: (r.n_turns, r.n_distinct_actions, r.max_run)
        for r in conversation_stats(
            _turns_df(spark, rows), "conv_id", ("turn_idx",), "action"
        ).collect()
    }
    assert out == {
        "c1": (5, 2, 3),
        "c2": (3, 2, 2),
        "c3": (1, 1, 1),
        "c4": (4, 1, 4),
    }


def test_partial_null_actions_counted_separately(spark):
    """Round-3 ADVICE: n_turns counts non-NULL-action turns (the
    sequence-stats domain) while n_total_turns counts every turn, so a
    conversation with many turns but mostly NULL actions is visible as
    such; a FULLY-NULL conversation stays absent from the fold (the
    curate job's explicit no_actions reject owns that case)."""
    from postal_address_spark.operators.conversations import (
        conversation_quality,
        conversation_stats,
    )

    rows = [
        # mixed: 6 turns, only 2 carry actions
        ("mixed", 1, None), ("mixed", 2, "a"), ("mixed", 3, None),
        ("mixed", 4, None), ("mixed", 5, "b"), ("mixed", 6, None),
        # clean: 2 turns, 2 actions
        ("clean", 1, "a"), ("clean", 2, "b"),
        # void: every action NULL -> absent from stats entirely
        ("void", 1, None), ("void", 2, None),
    ]
    stats = {
        r.conv_id: (r.n_turns, r.n_total_turns)
        for r in conversation_stats(
            _turns_df(spark, rows), "conv_id", ("turn_idx",), "action"
        ).collect()
    }
    assert stats == {"mixed": (2, 6), "clean": (2, 2)}
    gated = {
        r.conv_id: (r.n_turns, r.n_total_turns, r.reasons)
        for r in conversation_quality(
            _turns_df(spark, rows), "conv_id", ("turn_idx",), "action",
            min_turns=3, min_distinct=2, max_run=4,
        ).collect()
    }
    # both gate as too_short on ACTION turns, but n_total_turns tells
    # the partial-NULL one apart
    assert gated["mixed"] == (2, 6, "too_short")
    assert gated["clean"] == (2, 2, "too_short")
    assert "void" not in gated


def test_conversation_quality_reasons(spark):
    from postal_address_spark.operators.conversations import (
        conversation_quality,
    )

    rows = [
        ("short", 1, "a"),                                    # too_short (+low_diversity)
        ("loopy", 1, "a"), ("loopy", 2, "a"), ("loopy", 3, "a"),
        ("loopy", 4, "a"), ("loopy", 5, "b"),                 # stuck_loop at max_run=4
        ("good", 1, "a"), ("good", 2, "b"), ("good", 3, "c"),
    ]
    out = {
        r.conv_id: (r.keep, r.reasons)
        for r in conversation_quality(
            _turns_df(spark, rows), "conv_id", ("turn_idx",), "action",
            min_turns=3, min_distinct=2, max_run=4,
        ).collect()
    }
    assert out["good"] == (True, "")
    assert out["loopy"] == (False, "stuck_loop")
    assert out["short"] == (False, "too_short,low_diversity")


def test_conversation_split_never_straddles(spark):
    """Leakage-safety is structural: every turn of a conversation gets the
    same split under BOTH hash methods, and the assignment is identical
    at any partitioning."""
    from postal_address_spark.operators.conversations import (
        with_conversation_split,
    )

    turns = (
        spark.read.parquet(f"{SF}/events.parquet")
        .where(F.col("ts").isNotNull())
        .select(F.col("user_id").alias("conv_id"), "event_id")
    )
    for method in ("xxhash", "lcg"):
        assigned = with_conversation_split(
            turns.repartition(7), "conv_id", method=method
        )
        straddlers = (
            assigned.groupBy("conv_id")
            .agg(F.countDistinct("split").alias("k"))
            .where(F.col("k") > 1)
            .count()
        )
        assert straddlers == 0, method


def test_testdata_action_alphabet_guard():
    """Oracle-boundary guard (CLAUDE.md mirrored-oracle discipline): the
    conv_* oracles tokenize seq with string_split(' ') while the engine
    splits on \\s+ — equivalent ONLY while event_type values are
    non-empty and whitespace-free.  Fail loudly if a testdata regen ever
    breaks that, instead of letting the gate flake."""
    import re

    import duckdb

    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        vals = [
            r[0]
            for r in con.execute(
                f"SELECT DISTINCT event_type FROM "
                f"'/root/testdata/{sf}/events.parquet' "
                f"WHERE event_type IS NOT NULL"
            ).fetchall()
        ]
        assert vals, sf
        for v in vals:
            assert re.fullmatch(r"[a-z0-9_]+", v), (sf, repr(v))


def test_conversation_signatures_injection_free(spark):
    """The exact-dedup signature hashes the ordered token ARRAY: tokens
    containing the join separator cannot conflate distinct sequences
    (['a b','c'] vs ['a','b c']), while identical sequences collide."""
    from postal_address_spark.operators.conversations import (
        conversation_signatures,
    )

    rows = [
        ("c1", 0, "a b"), ("c1", 1, "c"),
        ("c2", 0, "a"), ("c2", 1, "b c"),
        ("c3", 0, "a b"), ("c3", 1, "c"),
    ]
    sigs = {
        r.conv_id: (r.n_turns, r.sig)
        for r in conversation_signatures(
            _turns_df(spark, rows), "conv_id", ("turn_idx",), "action"
        ).collect()
    }
    assert sigs["c1"] == sigs["c3"]
    assert sigs["c1"] != sigs["c2"]


# ---- conversation_windows (pretraining context chunking) ----

def _win_turns(spark):
    rows = []
    for cid, n in ((1, 7), (2, 3), (3, 1), (4, 10)):
        for i in range(n):
            rows.append((cid, i, f"a{cid}_{i}"))
    return spark.createDataFrame(
        rows, "conv_id long, turn_idx int, action string"
    )


def test_conversation_windows_hand_computed(spark):
    from postal_address_spark.operators.conversations import (
        conversation_windows,
    )

    out = conversation_windows(
        _win_turns(spark), "conv_id", ("turn_idx",), "action",
        window=3, stride=2,
    ).collect()
    got = {
        (r.conv, r.window_idx): (r.start_turn, r.n_window_turns,
                                 r.window_text)
        for r in out
    }
    # conv 1 (7 turns): starts 0,2,4 -> last window full (4..6)
    assert got[(1, 0)] == (0, 3, "a1_0 a1_1 a1_2")
    assert got[(1, 1)] == (2, 3, "a1_2 a1_3 a1_4")
    assert got[(1, 2)] == (4, 3, "a1_4 a1_5 a1_6")
    # conv 2 (3 turns == window): one window
    assert [k for k in got if k[0] == 2] == [(2, 0)]
    # conv 3 (1 turn < window): one short window
    assert got[(3, 0)] == (0, 1, "a3_0")
    # conv 4 (10 turns): starts 0,2,4,6 -> wait extra=7, ceil(7/2)=4 ->
    # 5 windows (starts 0,2,4,6,8), last short (8,9)
    c4 = sorted(k[1] for k in got if k[0] == 4)
    assert c4 == [0, 1, 2, 3, 4]
    assert got[(4, 4)] == (8, 2, "a4_8 a4_9")


def test_conversation_windows_cover_every_turn(spark):
    """With stride <= window every turn index appears in >= 1 window."""
    from postal_address_spark.operators.conversations import (
        conversation_windows,
    )

    for window, stride in ((4, 4), (5, 2), (3, 1)):
        out = conversation_windows(
            _win_turns(spark), "conv_id", ("turn_idx",), "action",
            window=window, stride=stride,
        ).collect()
        covered = {}
        for r in out:
            for t in range(r.start_turn, r.start_turn + r.n_window_turns):
                covered.setdefault(r.conv, set()).add(t)
        assert covered[1] == set(range(7)), (window, stride)
        assert covered[4] == set(range(10)), (window, stride)


def test_conversation_windows_plan_one_shuffle_one_generate(spark):
    from postal_address_spark.operators.conversations import (
        conversation_windows,
    )

    df = conversation_windows(_win_turns(spark), "conv_id", ("turn_idx",),
                              "action", window=3, stride=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan[:3000]
    assert plan.count("Generate") == 1, plan[:3000]
    assert "Join" not in plan, plan[:3000]


def test_conversation_windows_rejects_bad_args(spark):
    import pytest as _pytest

    from postal_address_spark.operators.conversations import (
        conversation_windows,
    )

    with _pytest.raises(ValueError):
        conversation_windows(_win_turns(spark), window=0)
    with _pytest.raises(ValueError):
        conversation_windows(_win_turns(spark), stride=0)


# ---- alternation_stats (role-alternation well-formedness) ----

def test_alternation_stats_hand_computed(spark):
    from postal_address_spark.operators.conversations import (
        alternation_stats,
    )

    rows = [
        # conv 1: u a u a -> well-formed
        (1, 0, "u"), (1, 1, "a"), (1, 2, "u"), (1, 3, "a"),
        # conv 2: u u a a -> violations at ordinals 1 and 3
        (2, 0, "u"), (2, 1, "u"), (2, 2, "a"), (2, 3, "a"),
        # conv 3: NULL roles excluded; survivors u a -> well-formed
        (3, 0, "u"), (3, 1, None), (3, 2, "a"),
        # conv 4: single turn
        (4, 0, "a"),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string"
    )
    got = {
        r.conv: (r.n_turns, r.n_same_adjacent, r.first_violation_idx)
        for r in alternation_stats(turns).collect()
    }
    assert got == {
        1: (4, 0, None),
        2: (4, 2, 1),
        3: (2, 0, None),
        4: (1, 0, None),
    }


def test_alternation_stats_single_exchange(spark):
    from postal_address_spark.operators.conversations import (
        alternation_stats,
    )

    turns = spark.createDataFrame(
        [(1, 0, "u"), (1, 1, "a")], "conv_id long, turn_idx int, role string"
    )
    plan = alternation_stats(turns)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan[:2500]
    assert "Join" not in plan, plan[:2500]


# ---------------------------------------------------------------------------
# prefix_containment_dups
# ---------------------------------------------------------------------------


def _prefix_rows(convs):
    rows = []
    for cid, toks in convs.items():
        rows.extend((cid, i, t) for i, t in enumerate(toks))
    return rows


def test_prefix_dups_hand_case_with_anagram_collision(spark):
    """B and C (equal-length exact dups) are both strict prefixes of A;
    E is an INFIX of A (kept — containment means shared opening, not
    shared middle); F is an ANAGRAM of B — its order-insensitive
    checksum collides with B's prefix signature, so the verify join must
    reject the A-candidacy while still catching F's true container G."""
    from postal_address_spark.operators.conversations import (
        prefix_containment_dups,
    )

    convs = {
        "A": ["a", "b", "c", "d"],
        "B": ["a", "b"],
        "C": ["a", "b"],
        "D": ["x", "y"],
        "E": ["b", "c"],
        "F": ["b", "a"],
        "G": ["b", "a", "z"],
    }
    out = prefix_containment_dups(
        _turns_df(spark, _prefix_rows(convs))
    ).collect()
    got = {
        r["conv_id"]: (
            r["status"], r["n_containers"], r["container"],
            r["container_n_turns"],
        )
        for r in out
    }
    assert got == {
        "A": ("kept", 0, None, None),
        "B": ("prefix_dup", 1, "A", 4),
        "C": ("prefix_dup", 1, "A", 4),
        "D": ("kept", 0, None, None),
        "E": ("kept", 0, None, None),
        "F": ("prefix_dup", 1, "G", 3),
        "G": ("kept", 0, None, None),
    }


def test_prefix_dups_longest_container_tie_break(spark):
    """Representative container = longest, then smallest id."""
    from postal_address_spark.operators.conversations import (
        prefix_containment_dups,
    )

    convs = {
        "p": ["a"],
        "m2": ["a", "b"],
        "m1": ["a", "c"],
        "long": ["a", "b", "c"],
    }
    out = {
        r["conv_id"]: r
        for r in prefix_containment_dups(
            _turns_df(spark, _prefix_rows(convs))
        ).collect()
    }
    # p is contained by m1, m2 and long; longest wins
    assert out["p"]["n_containers"] == 3
    assert out["p"]["container"] == "long"
    assert out["p"]["container_n_turns"] == 3
    # m2 is a prefix of long; m1 is not
    assert out["m2"]["status"] == "prefix_dup"
    assert out["m1"]["status"] == "kept"


def test_prefix_dups_brute_force_random_corpus(spark):
    """Seeded random corpora over a small alphabet (so prefix collisions
    and anagram checksum collisions genuinely occur) — the operator must
    equal python brute force exactly: per conversation the full set of
    strictly-longer containers whose opening equals the sequence."""
    from postal_address_spark.operators.conversations import (
        prefix_containment_dups,
    )

    rng = random.Random(17)
    alphabet = ["a", "b", "c"]
    convs = {}
    for i in range(80):
        n = rng.randint(1, 6)
        convs[f"c{i:03d}"] = [rng.choice(alphabet) for _ in range(n)]
    # plant explicit snapshot chains too
    convs["s0"] = ["a", "c", "b", "a", "c", "b", "b"]
    convs["s1"] = convs["s0"][:5]
    convs["s2"] = convs["s0"][:2]

    want = {}
    for c, toks in convs.items():
        containers = {
            (d, len(dt))
            for d, dt in convs.items()
            if d != c and len(dt) > len(toks) and dt[: len(toks)] == toks
        }
        if containers:
            rep = min((-n, d) for d, n in containers)
            want[c] = (
                "prefix_dup", len(containers), rep[1], -rep[0],
            )
        else:
            want[c] = ("kept", 0, None, None)

    out = prefix_containment_dups(
        _turns_df(spark, _prefix_rows(convs))
    ).collect()
    got = {
        r["conv_id"]: (
            r["status"], r["n_containers"], r["container"],
            r["container_n_turns"],
        )
        for r in out
    }
    assert got == want


def test_prefix_dups_degenerate_inputs(spark):
    from postal_address_spark.operators.conversations import (
        prefix_containment_dups,
    )

    empty = _turns_df(spark, [])
    assert prefix_containment_dups(empty).collect() == []
    single = _turns_df(spark, [("only", 0, "a")])
    [row] = prefix_containment_dups(single).collect()
    assert (row["status"], row["n_containers"]) == ("kept", 0)
    # NULL actions carry no sequence information: a conversation whose
    # non-NULL tokens prefix another is still caught
    withnull = spark.createDataFrame(
        [("x", 0, "a"), ("x", 1, None), ("y", 0, "a"), ("y", 1, "b")],
        "conv_id string, turn_idx int, action string",
    )
    got = {
        r["conv_id"]: r["status"]
        for r in prefix_containment_dups(withnull).collect()
    }
    assert got == {"x": "prefix_dup", "y": "kept"}


# ---------------------------------------------------------------------------
# boilerplate_turns / mask_boilerplate_identity
# ---------------------------------------------------------------------------


def test_boilerplate_profile_hand_computed(spark):
    from postal_address_spark.operators.conversations import (
        boilerplate_turns,
    )

    rows = (
        [("c1", 0, "sys"), ("c1", 1, "hello"), ("c1", 2, "sys")]
        + [("c2", 0, "sys"), ("c2", 1, "world")]
        + [("c3", 0, "unique"), ("c3", 1, None)]
    )
    out = {
        r["token"]: (r["n_convs"], r["n_turns"], r["share_convs"])
        for r in boilerplate_turns(
            _turns_df(spark, rows), "conv_id", "action"
        ).collect()
    }
    assert out == {
        "sys": (2, 3, 2 / 3),
        "hello": (1, 1, 1 / 3),
        "world": (1, 1, 1 / 3),
        "unique": (1, 1, 1 / 3),
    }
    # empty corpus: no rows, no div-by-zero
    assert boilerplate_turns(
        _turns_df(spark, []), "conv_id", "action"
    ).collect() == []


def test_mask_boilerplate_identity_and_all_boiler_fallback(spark):
    from postal_address_spark.operators.conversations import (
        mask_boilerplate_identity,
    )

    rows = (
        [("c1", 0, "sys"), ("c1", 1, "hello")]   # content-bearing: mask sys
        + [("c2", 0, "sys"), ("c2", 1, "sys")]   # ALL boilerplate: keep raw
        + [("c3", 0, "world"), ("c3", 1, None)]  # untouched
    )
    boiler = spark.createDataFrame([("sys",)], "token string")
    out = mask_boilerplate_identity(
        _turns_df(spark, rows), boiler, "conv_id", "action"
    )
    got = {
        (r["conv_id"], r["turn_idx"]): r["action"] for r in out.collect()
    }
    assert got[("c1", 0)] is None          # masked
    assert got[("c1", 1)] == "hello"
    assert got[("c2", 0)] == "sys"         # fallback: all-boiler keeps raw
    assert got[("c2", 1)] == "sys"
    assert got[("c3", 0)] == "world"
    assert got[("c3", 1)] is None
    # column set unchanged (no helper columns leak)
    assert set(out.columns) == {"conv_id", "turn_idx", "action"}


def test_mask_boilerplate_changes_dedup_outcome(spark):
    """The reason the stage exists: two conversations identical except
    for their (shared) system prompt exact-dedup ONLY after masking,
    while two all-boilerplate conversations still dedup via the raw
    fallback identity."""
    from postal_address_spark.operators.conversations import (
        conversation_signatures,
        mask_boilerplate_identity,
    )

    rows = (
        [("a", 0, "sys"), ("a", 1, "x"), ("a", 2, "y")]
        + [("b", 0, "sys"), ("b", 1, "sys"), ("b", 2, "x"), ("b", 3, "y")]
        + [("p", 0, "sys"), ("p", 1, "sys")]
        + [("q", 0, "sys"), ("q", 1, "sys")]
    )
    turns = _turns_df(spark, rows)
    boiler = spark.createDataFrame([("sys",)], "token string")

    before = conversation_signatures(turns, "conv_id", ("turn_idx",), "action")
    sig_before = {r["conv_id"]: r["sig"] for r in before.collect()}
    assert sig_before["a"] != sig_before["b"]   # prompt count differs
    assert sig_before["p"] == sig_before["q"]

    masked = mask_boilerplate_identity(turns, boiler, "conv_id", "action")
    after = conversation_signatures(masked, "conv_id", ("turn_idx",), "action")
    sig_after = {r["conv_id"]: r["sig"] for r in after.collect()}
    assert sig_after["a"] == sig_after["b"]     # content-equal after masking
    assert sig_after["p"] == sig_after["q"]     # fallback identity intact
