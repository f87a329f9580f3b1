"""Exact edit-distance similarity join via q-gram prefix filtering.

Emits every pair of records whose strings are within Levenshtein
distance ``k`` — WITHOUT an all-pairs comparison.  This is the
Ed-Join family shape (Xiao, Wang & Lin, "Ed-Join: an efficient
algorithm for similarity joins with edit distance constraints",
PVLDB 1(1), 2008), built on the q-gram count bound of Gravano et al.,
"Approximate string joins in a database (almost) for free", VLDB 2001.
It completes the similarity-join family next to the overlap-based
shapes (MinHash/SimHash in dedup.py grade SET overlap, token_join.py
grades rare-token evidence): an edit-distance threshold is the one
predicate those cannot express exactly, and it is the classic
name/typo matcher in record linkage.

Exactness argument (each step is recall-LOSSLESS; the driver oracle is
a brute-force all-pairs ``levenshtein(a, b) <= k`` — no mirroring of
the candidate generation, the filter chain must genuinely lose
nothing):

* Strings are padded with ``q-1`` sentinel chars per side; identical
  affixes preserve edit distance, and padding gives every non-null
  string ``len + q - 1 >= 1`` positional q-grams.
* One edit dirties at most ``q`` positional grams, so ``ed <= k``
  implies the gram MULTISETS share ``>= maxcount - q*k`` grams.  When
  that bound is ``>= 1`` (i.e. ``max(len_a, len_b) >= q*k - q + 2``),
  the standard overlap-prefix lemma applies: the first ``q*k + 1``
  grams of each multiset under ANY global total order must intersect.
  We order by ``xxhash64(gram)`` — deterministic and stats-free; a
  production deployment orders by ascending corpus gram frequency
  (one extra aggregate) to shrink candidates, which changes cost,
  never recall.
* Pairs where BOTH strings have ``len <= q*k - q + 1`` evade the bound
  and go through a dedicated short-string path: the short VALUE set is
  bounded by the alphabet (``|A|^(q*k-q+1)`` distinct values, a
  constant in corpus size), so its broadcast self-pairing is safe at
  any scale.
* Candidates are then verified with Spark's JVM ``levenshtein(a, b,
  threshold)`` — the threshold form runs the banded O(k*n) DP, not the
  full O(n^2) matrix.

Scale design (the engine rules in CLAUDE.md):

* Rule 9 — score VALUES, not mentions: the join runs over DISTINCT
  strings; a hot value (a million rows sharing one name) contributes
  ONE vertex to candidate generation.  Id-level pairs are produced
  only at the final expansion, whose size is the true answer's size.
* Rule 7 — the gram explosion carries ``(vid, gram)`` only (an 8-byte
  xxhash64 value id + a q-char gram); string payloads join back after
  candidate dedup.  A vid collision merely routes an extra string pair
  into verification — verification keeps only true pairs, so
  collisions cannot create false positives.
* Rule 1/2 — every HOF input (``padded``, ``n_grams``, ``grams``) is
  materialized as a real column before the lambda that consumes it,
  and the prefix explode is ``explode_outer``.
* ``include_exact=True`` also emits same-value id pairs (ed = 0).
  Those are cliques — quadratic in the value's row count — which is
  the size of the TRUE answer for such data; callers that only want
  representatives should run exact_dedup (dedup.py) instead.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# unit-separator sentinel: outside every printable alphabet the engine
# normalizes into (extract.py lowercases + strips control chars upstream)
_PAD_CHAR = "\x1f"


def _value_prefixes(vals: DataFrame, k: int, q: int) -> DataFrame:
    """(vid, prefix) — the first q*k+1 padded positional grams of each
    distinct string under the xxhash64 global gram order."""
    pad = _PAD_CHAR * (q - 1)
    prefix_len = q * k + 1
    g = vals.withColumn("padded", F.concat(F.lit(pad), F.col("s"), F.lit(pad)))
    g = g.withColumn("n_grams", F.length("padded") - F.lit(q - 1))
    # positional grams: multiset, NOT distinct — the prefix lemma is a
    # multiset statement ("aaaa" vs "aaab" needs the repeated 'aa').
    g = g.withColumn(
        "grams",
        F.expr(f"transform(sequence(1, n_grams), i -> substring(padded, i, {q}))"),
    )
    # global order without a comparator lambda: lift each gram into
    # struct(hash, gram) and use array_sort's natural struct ordering.
    g = g.withColumn(
        "sorted_grams",
        F.array_sort(
            F.expr("transform(grams, gr -> struct(xxhash64(gr) AS h, gr AS gr))")
        ),
    )
    g = g.withColumn(
        "prefix",
        F.expr(
            f"array_distinct(transform(slice(sorted_grams, 1, {prefix_len}),"
            " x -> x.gr))"
        ),
    )
    return g.select("vid", "prefix")


def edit_distance_pairs(
    df: DataFrame,
    id_col: str = "rec_id",
    str_col: str = "s",
    k: int = 2,
    q: int = 2,
    include_exact: bool = True,
) -> DataFrame:
    """All record pairs with ``levenshtein(s_a, s_b) <= k``.

    Returns (id_a, id_b, s_a, s_b, dist) with id_a < id_b (and s_a/s_b
    carried in id order).  NULL strings never match (SQL semantics —
    matches the brute-force ``levenshtein`` oracle, where a NULL side
    yields NULL and fails the threshold predicate).
    """
    if k < 1:
        raise ValueError("k must be >= 1; use exact_dedup for k = 0")
    if q < 2:
        raise ValueError("q must be >= 2")
    short_max = q * k - q + 1

    ids = df.select(
        F.col(id_col).alias("rec_id"), F.col(str_col).alias("s")
    ).where(F.col("s").isNotNull())

    vals = (
        ids.select("s")
        .distinct()
        .withColumn("vid", F.xxhash64("s"))
        .withColumn("slen", F.length("s"))
    )

    # -- long path: prefix-filtered gram join over (vid, gram) only
    pre = _value_prefixes(vals.select("vid", "s"), k, q)
    grams = pre.select("vid", F.explode_outer("prefix").alias("gram"))
    ga = grams.select(F.col("vid").alias("vid_a"), "gram")
    gb = grams.select(F.col("vid").alias("vid_b"), "gram")
    long_cands = (
        ga.join(gb, "gram")
        .where(F.col("vid_a") < F.col("vid_b"))
        .select("vid_a", "vid_b")
    )

    # -- short path: both-short value pairs (alphabet-bounded set)
    shorts = vals.where(F.col("slen") <= short_max).select("vid")
    short_cands = (
        shorts.select(F.col("vid").alias("vid_a"))
        .join(
            F.broadcast(shorts.select(F.col("vid").alias("vid_b"))),
            F.col("vid_a") < F.col("vid_b"),
        )
        .select("vid_a", "vid_b")
    )

    cands = long_cands.union(short_cands).distinct()

    # -- verify at VALUE level: strings join back post-dedup (rule 7)
    va = vals.select(
        F.col("vid").alias("vid_a"),
        F.col("s").alias("s_a"),
        F.col("slen").alias("len_a"),
    )
    vb = vals.select(
        F.col("vid").alias("vid_b"),
        F.col("s").alias("s_b"),
        F.col("slen").alias("len_b"),
    )
    verified = (
        cands.join(va, "vid_a")
        .join(vb, "vid_b")
        .where(F.abs(F.col("len_a") - F.col("len_b")) <= F.lit(k))
        .withColumn("dist", F.levenshtein("s_a", "s_b", k))
        .where(F.col("dist") >= 0)  # threshold form returns -1 above k
        .select("s_a", "s_b", "dist")
    )

    # -- expand value pairs to id pairs, normalizing to id order
    ma = ids.select(F.col("rec_id").alias("ra"), F.col("s").alias("s_a"))
    mb = ids.select(F.col("rec_id").alias("rb"), F.col("s").alias("s_b"))
    cross = (
        verified.join(ma, "s_a")
        .join(mb, "s_b")
        .select(
            F.least("ra", "rb").alias("id_a"),
            F.greatest("ra", "rb").alias("id_b"),
            F.when(F.col("ra") < F.col("rb"), F.col("s_a"))
            .otherwise(F.col("s_b"))
            .alias("s_a"),
            F.when(F.col("ra") < F.col("rb"), F.col("s_b"))
            .otherwise(F.col("s_a"))
            .alias("s_b"),
            "dist",
        )
    )
    if not include_exact:
        return cross

    same = (
        ids.select(F.col("rec_id").alias("id_a"), "s")
        .join(ids.select(F.col("rec_id").alias("id_b"), "s"), "s")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.col("s").alias("s_a"),
            F.col("s").alias("s_b"),
            F.lit(0).alias("dist"),
        )
    )
    return cross.unionByName(same)
