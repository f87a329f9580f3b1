"""Rarity-weighted token-pair similarity: the frequency-filtered inverted-
index join (the PPJoin/prefix-filtering family's workhorse shape, cf.
Xiao et al., "Efficient Similarity Joins for Near Duplicate Detection",
WWW 2008), with INTEGER idf-style weights so the scores are exactly
reproducible across engines.

Why this exists next to MinHash/SimHash (dedup.py): those grade OVERALL
set overlap; record linkage and fuzzy document matching often hinge on a
few RARE shared tokens (an id-like string, an unusual name) that overlap
measures dilute.  Weighting each shared token by corpus rarity surfaces
exactly those pairs — Splink calls the same idea term-frequency
adjustments.

Scale design:

* Inverted index carries (token, doc_id) ONLY (rule 7 discipline — no
  text payloads ride the shuffle).
* **The df cap IS the skew defense**: a token kept only when its document
  frequency <= max_df contributes at most C(max_df, 2) pairs, so total
  candidate volume is <= n_kept_tokens * C(max_df, 2) — LINEAR in corpus
  size for fixed max_df.  Without the cap one stop-token ('the') joins
  the whole corpus to itself: the classic quadratic blow-up.  This is
  the same frequency-filtering argument the blocking layer makes for
  full-postal keys (blocking.py).
* Weights are integers — floor(N / df) — so the pair-score SUM is exact
  and order-free: the driver can hash-compare it against a DuckDB oracle
  (float idf sums would differ by partial-aggregation order; same rule
  as operators/evaluate.py).
* One corpus count (a scalar), one groupBy for df (map-side combinable),
  one self-join on token, one groupBy (a, b) sum — no all-pairs stage
  anywhere.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# lowercase alnum runs; mirrored verbatim in the DuckDB oracle
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def doc_tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc, token) pairs, DISTINCT per doc (set semantics, like the
    shingle path in dedup.py)."""
    toks = F.array_distinct(
        F.filter(
            F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
            lambda t: t != F.lit(""),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
        .select("doc_id", F.explode_outer("toks").alias("token"))
        .where(F.col("token").isNotNull())
    )


def rare_token_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
    min_score: int = 0,
    n_docs: int | None = None,
) -> DataFrame:
    """Document pairs scored by their shared RARE tokens.

    score(a, b) = sum over shared tokens with df <= max_df of
    floor(N / df), N = corpus size — an integer idf surrogate (rarest
    token contributes N, a max_df-frequency token contributes N/max_df).
    Returns (doc_a, doc_b, n_shared, score), doc_a < doc_b.

    ``max_df`` defaults to ceil(N/20) — "rare" as a CORPUS SHARE (5%), so
    the cap tracks scale instead of silently emptying (small corpus) or
    exploding (large corpus) at a fixed count.  Computed as
    (N + 19) div 20 in integer arithmetic: ceil(0.05 * N) in floats is
    already wrong at N = 500 (0.05 has no exact binary representation,
    0.05 * 500 -> 25.000000000000004 -> ceil 26).

    ``n_docs``: the weight formula needs the corpus size as a SCALAR; when
    omitted it is counted here, which makes composition eager (one count
    job runs before this returns).  Callers that already know N — an
    upstream stage's row count, a catalog statistic — pass it to keep the
    whole plan lazy (e.g. plan dumps shouldn't scan the corpus).

    The (doc, token) relation feeds both the document-frequency aggregate
    and the inverted index, whose shuffles differ (partial-agg vs raw), so
    without help the corpus would be read and tokenized TWICE; it is
    cached (memory-then-disk) so tokenization runs once, and the index
    self-join's two identical cache reads collapse into one exchange
    (ReuseExchange).  The cache lives until the session drops it —
    ``spark.catalog.clearCache()`` or ``DataFrame.unpersist`` on a
    re-created ``doc_tokens`` frame releases it early.
    """
    from pyspark import StorageLevel

    tokens = doc_tokens(docs, text_col, id_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if n_docs is None:
        n_docs = docs.count()  # one scalar; the only driver-side value
    if max_df is None:
        max_df = (n_docs + 19) // 20

    df_counts = tokens.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    # integer division (div), not floor(double /): exact at any magnitude
    rare = df_counts.where(F.col("df") <= F.lit(max_df)).withColumn(
        "w", F.expr(f"CAST({int(n_docs)} AS BIGINT) div df")
    )
    # (token, doc, w) index over rare tokens only — the df cap guarantees
    # every token group fans out to <= C(max_df, 2) pairs.
    idx = tokens.join(rare, "token").select("token", "doc_id", "w")

    a, b = idx.alias("a"), idx.alias("b")
    pairs = (
        a.join(b, "token")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.w").alias("w"),
        )
    )
    scored = pairs.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("n_shared"),
        F.sum("w").alias("score"),
    )
    if min_score > 0:
        scored = scored.where(F.col("score") >= F.lit(min_score))
    return scored
