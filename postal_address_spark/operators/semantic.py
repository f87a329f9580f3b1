"""Semantic (embedding-space) near-duplicate detection for text/transcripts.

Token-set Jaccard (conversations.jaccard_set_join) misses paraphrase
duplicates — conversations that substitute a few actions/words but keep
the overall content.  This module embeds each document/conversation into
a small integer vector via a seeded hashed-gram projection and finds
pairs whose cosine exceeds a threshold (SemDeDup-shaped:
VERDICT r3 "Next round" #6), with EVERY decision made in 64-bit integer
arithmetic so a DuckDB oracle replays it bit-for-bit:

* embedding: ``emb[d] = Σ_{g ∈ distinct word 3-grams} R[slot(g)][d]``
  where ``slot(g) = hash(g) mod vocab`` and ``R`` is a seeded integer
  matrix with entries in [-2, 2].  Integer sums are order-independent —
  no float partial-agg divergence across engines (CLAUDE.md driver
  contract rule).
* threshold: ``cos(a,b) ≥ tau_num/tau_den``  ⇔
  ``dot > 0  AND  dot²·tau_den² ≥ |a|²·|b|²·tau_num²`` — an exact
  integer cross-multiply, no float boundary anywhere (the same
  adjudication as conversations.jaccard_set_join).  Overflow bound:
  with |R| ≤ 2 and G grams per doc, ``dot ≤ dim·(2G)²`` and the guarded
  product stays inside int64 for G ≤ ~30k grams at tau_den ≤ 10 —
  document-scale safe; corpus-scale embeddings should use the float
  ``similarity_search.embedding_near_dup`` path instead.

Candidate generation is seeded integer sign-LSH (hyperplanes H with
entries in [-2, 2]; bucket = sign-bit code of H·emb), pure whole-stage
codegen — no Python, no pandas UDF.  The bucket explosion carries
(id, table, bucket) ONLY; embeddings join back after the candidate dedup
(engine rule 7).  Recall is probabilistic (tunable via n_tables/bits —
defaults are sized for small dims; the pipeline is deterministic, so a
measured recall at a seed is stable across runs), and
:func:`semantic_near_dups_exact` is the brute-force grader.

The default gram hash is ``xxhash64`` (rule 4).  ``portable=True``
switches to the first 8 hex digits of md5 — reproducible in DuckDB via
``CAST('0x' || substr(md5(g),1,8) AS BIGINT)`` — for oracle-graded
queries; md5 is MessageDigest-backed and must stay off hot paths.
"""
from __future__ import annotations

import random
from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def projection_matrix(vocab: int, dim: int, seed: int) -> List[List[int]]:
    """Seeded integer projection matrix R[vocab][dim], entries in [-2, 2].

    The SAME rows are emitted as SQL literals by the mirrored DuckDB
    oracle (__spark_entry__._semantic_sql) — the sign-LSH-hyperplane
    oracle precedent."""
    rng = random.Random(seed * 1_000_003 + 17)
    return [
        [rng.randrange(-2, 3) for _ in range(dim)] for _ in range(vocab)
    ]


def hyperplanes(n_tables: int, bits: int, dim: int, seed: int) -> List[List[List[int]]]:
    """Seeded integer sign-LSH hyperplanes H[table][bit][dim] in [-2, 2]."""
    rng = random.Random(seed * 9_000_011 + 29)
    return [
        [[rng.randrange(-2, 3) for _ in range(dim)] for _ in range(bits)]
        for _ in range(n_tables)
    ]


def portable_hash32(col) -> F.Column:
    """First 32 bits of md5 as a non-negative BIGINT — identical in DuckDB
    as CAST('0x' || substr(md5(x), 1, 8) AS BIGINT).  MessageDigest-backed:
    oracle-graded fixtures only, never hot paths (rule 4)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def hashed_gram_embedding(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 8,
    vocab: int = 64,
    seed: int = 42,
    shingle_n: int = 3,
    portable: bool = False,
    out_col: str = "emb",
) -> DataFrame:
    """(id, n_grams, emb array<long>) — the seeded hashed-gram embedding.

    Composition: dedup.with_word_shingles (distinct lower-cased word
    n-grams, whole-text fallback for short docs) → slot per gram →
    per-dimension integer sum via one ``aggregate`` HOF sweep over the
    projected slot array (rule 1: slots are a real column, the lambda
    never re-inlines the gram expression)."""
    from .dedup import with_word_shingles

    r = projection_matrix(vocab, dim, seed)
    shingled = with_word_shingles(df, text_col, shingle_n, out_col="_grams")
    hash_fn = portable_hash32 if portable else F.xxhash64
    slotted = shingled.withColumn(
        "_slots",
        F.transform("_grams", lambda g: F.pmod(hash_fn(g), F.lit(vocab))),
    )
    def _dim_sum(d: int):
        # rd is a 1-based literal array indexed by slot+1 — pure codegen.
        # Bound via closure, NOT a lambda default: PySpark counts the
        # lambda's Python parameters to build the HOF, so a default arg
        # would turn this into an (acc, s, rd) 3-arg merge and fail
        # analysis.
        rd = F.array(*[F.lit(r[row][d]) for row in range(vocab)])
        return F.aggregate(
            "_slots",
            F.lit(0).cast("long"),
            lambda acc, s: acc
            + F.element_at(rd, (s + F.lit(1)).cast("int")).cast("long"),
        ).alias(f"_e{d}")

    dims = [_dim_sum(d) for d in range(dim)]
    return slotted.select(
        F.col(id_col),
        F.size("_grams").cast("long").alias("n_grams"),
        *dims,
    ).select(
        id_col,
        "n_grams",
        F.array(*[F.col(f"_e{d}") for d in range(dim)]).alias(out_col),
    )


def _int_dot(a, b, dim: int) -> F.Column:
    out = F.lit(0).cast("long")
    for d in range(1, dim + 1):
        out = out + F.element_at(a, d) * F.element_at(b, d)
    return out


def with_int_sign_buckets(
    embs: DataFrame,
    dim: int,
    n_tables: int,
    bits: int,
    seed: int,
    emb_col: str = "emb",
    out_col: str = "buckets",
) -> DataFrame:
    """Adds ``out_col array<long>`` — one integer sign-LSH bucket per
    table, computed entirely in whole-stage codegen (integer hyperplane
    dots, no pandas UDF — the small-dim sibling of
    similarity_search.with_lsh_buckets)."""
    h = hyperplanes(n_tables, bits, dim, seed)
    buckets = []
    for t in range(n_tables):
        code = F.lit(0).cast("long")
        for b in range(bits):
            dot = F.lit(0).cast("long")
            for d in range(dim):
                if h[t][b][d]:
                    dot = dot + F.element_at(emb_col, d + 1) * F.lit(h[t][b][d])
            code = code + F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0))
        buckets.append(code)
    return embs.withColumn(out_col, F.array(*buckets))


def semantic_near_dups(
    embs: DataFrame,
    id_col: str = "doc_id",
    emb_col: str = "emb",
    dim: int = 8,
    tau_num: int = 9,
    tau_den: int = 10,
    n_tables: int = 16,
    bits: int = 4,
    seed: int = 42,
) -> DataFrame:
    """(id_a, id_b, dot, norm_a, norm_b) for pairs with
    cos ≥ tau_num/tau_den — sign-LSH candidates + exact integer verify.

    Candidate explosion ships (id, table, bucket) only; embeddings join
    back after the candidate distinct (rule 7, plan discipline shared
    with similarity_search.embedding_near_dup).  Defaults (16 tables x
    4 bits) are sized for small dims where per-bit collision probability
    is the binding constraint; production-dim embeddings want fewer,
    wider tables."""
    if not (0 < tau_num <= tau_den):
        raise ValueError("threshold must satisfy 0 < tau_num/tau_den <= 1")
    b = with_int_sign_buckets(embs, dim, n_tables, bits, seed, emb_col)
    flat = b.select(
        F.col(id_col).alias("id"),
        # posexplode_outer: one bucket per table, never empty (rule 2)
        F.posexplode_outer("buckets").alias("table_idx", "bucket"),
    )
    cands = (
        flat.select(F.col("id").alias("id_a"), "table_idx", "bucket")
        .join(
            flat.select(F.col("id").alias("id_b"), "table_idx", "bucket"),
            ["table_idx", "bucket"],
        )
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    vecs = embs.select(F.col(id_col).alias("id"), F.col(emb_col).alias("v"))
    paired = cands.join(
        vecs.select(F.col("id").alias("id_a"), F.col("v").alias("va")), "id_a"
    ).join(
        vecs.select(F.col("id").alias("id_b"), F.col("v").alias("vb")), "id_b"
    )
    return _verify_int_cosine(paired, dim, tau_num, tau_den)


def _verify_int_cosine(
    paired: DataFrame, dim: int, tau_num: int, tau_den: int
) -> DataFrame:
    scored = paired.select(
        "id_a",
        "id_b",
        _int_dot(F.col("va"), F.col("va"), dim).alias("norm_a"),
        _int_dot(F.col("vb"), F.col("vb"), dim).alias("norm_b"),
        _int_dot(F.col("va"), F.col("vb"), dim).alias("dot"),
    )
    return scored.where(
        (F.col("dot") > 0)
        & (
            F.col("dot") * F.col("dot") * F.lit(tau_den * tau_den)
            >= F.col("norm_a") * F.col("norm_b") * F.lit(tau_num * tau_num)
        )
    ).select("id_a", "id_b", "dot", "norm_a", "norm_b")


def semantic_near_dups_exact(
    embs: DataFrame,
    id_col: str = "doc_id",
    emb_col: str = "emb",
    dim: int = 8,
    tau_num: int = 9,
    tau_den: int = 10,
) -> DataFrame:
    """Brute-force all-pairs grader for :func:`semantic_near_dups` —
    quadratic by construction, fixture scale only."""
    vecs = embs.select(F.col(id_col).alias("id"), F.col(emb_col).alias("v"))
    paired = (
        vecs.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
        .crossJoin(
            vecs.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
        )
        .where(F.col("id_a") < F.col("id_b"))
    )
    return _verify_int_cosine(paired, dim, tau_num, tau_den)


def conversation_semantic_dups(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_cols: Sequence[str] = ("turn_idx",),
    token_col: str = "action",
    dim: int = 8,
    vocab: int = 64,
    seed: int = 42,
    shingle_n: int = 3,
    tau_num: int = 9,
    tau_den: int = 10,
    n_tables: int = 16,
    bits: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Conversation-level semantic near-dups: conversation_docs →
    hashed-gram embedding → sign-LSH + integer-cosine verify.  Returns
    (conv_a, conv_b, dot, norm_a, norm_b)."""
    from .conversations import conversation_docs

    docs = conversation_docs(turns, conv_col, order_cols, token_col)
    embs = hashed_gram_embedding(
        docs, "seq", conv_col, dim=dim, vocab=vocab, seed=seed,
        shingle_n=shingle_n, portable=portable,
    )
    pairs = semantic_near_dups(
        embs, conv_col, "emb", dim=dim, tau_num=tau_num, tau_den=tau_den,
        n_tables=n_tables, bits=bits, seed=seed,
    )
    return pairs.select(
        F.col("id_a").alias("conv_a"),
        F.col("id_b").alias("conv_b"),
        "dot", "norm_a", "norm_b",
    )
