"""Weighted-cosine (TF-IDF-style) similarity self-join with L2 prefix
filtering — the AllPairs/Bayardo family (Bayardo, Ma, Srikant, "Scaling
Up All Pairs Similarity Search", WWW 2007), completing the exact
similarity-join set next to Jaccard/PPJoin (conversations.py), edit
distance/Ed-Join (edjoin.py) and the probabilistic MinHash/SimHash paths
(dedup.py).

Why next to rare_token_pairs (token_join.py): that operator SCORES pairs
by their shared rare tokens but its score is unnormalized — two long
documents sharing a handful of rare tokens outrank two short documents
that are nearly identical.  Weighted cosine normalizes by the documents'
own weight mass, the standard "how similar are these two documents"
measure, and this join returns exactly the pairs with
``cos(a, b) >= tau`` — no approximation.

Exactness discipline (the edjoin/conv_near_dups pattern):

* Token weights are INTEGERS — ``w = N div df`` (token_join.py's idf
  surrogate; integer division, exact at any magnitude).
* The threshold is a RATIONAL ``tau = tau_num / tau_den``, and the
  cosine test ``dot / sqrt(na2 * nb2) >= tau`` is evaluated as
  ``tau_den^2 * dot^2 >= tau_num^2 * na2 * nb2`` in DECIMAL(38,0)
  arithmetic (dot and the norms are bigint-exact; their squares can
  exceed 2^63, decimal multiplication is exact where a double would
  round).  No float ever decides membership, so the driver can
  hash-grade the full output against a brute-force DuckDB oracle.

Prefix filter (recall-lossless, Cauchy–Schwarz):

Order each document's tokens by a GLOBAL total order (weight descending,
token ascending — rarest first).  Index token position ``i`` iff the
tail-from-i weight mass keeps ``tail2(i) * tau_den^2 >= tau_num^2 *
norm2``; equivalently the UNINDEXED suffix of every document satisfies
``||suffix|| < tau * ||doc||``.  Any pair sharing no indexed token has
all common tokens inside both suffixes, so by Cauchy–Schwarz
``dot <= ||suffix_a|| * ||suffix_b|| < tau^2 ||a|| ||b|| <= tau ||a||
||b||`` (tau <= 1) — it cannot reach the threshold.  Every qualifying
pair therefore collides on at least one indexed (prefix) token; the
filter only ever drops pairs that PROVABLY fail.

Scale design:

* The inverted index carries (token, doc_id, norm2) ONLY — no text and
  no token arrays ride the candidate shuffle (rule 7 discipline).
* Prefix selection is one window over the (doc, token, w) relation
  (tail sum of w^2 per doc) — a single shuffle on doc_id, reused by the
  norm computation.
* Verification joins the (doc, token, w) relation back on the DEDUPED
  candidate ids, so the exact-dot stage touches candidate-token rows,
  never all-pairs.
* ``max_df`` (optional) drops tokens seen in more than max_df documents
  BEFORE weighting, the token_join.py skew defense; unlike the prefix
  filter it is NOT free — it changes the weight table (df-capped runs
  answer a different, stop-word-blind query) — so it is off by default
  and the oracle grades the lossless configuration.
"""
from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from postal_address_spark.operators.token_join import doc_tokens

_DEC = "decimal(38,0)"


def weighted_token_relation(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """The persisted (doc_id, token, w) relation the join is built on
    (w = N div df).  Exposed so diagnostics (scripts/wcos_probe.py) can
    measure candidate volumes on exactly the production relation.
    CACHING CONTRACT: persisted MEMORY_AND_DISK (it feeds the df
    aggregate, the prefix window and both verify probes); the cache
    lives until clearCache()/unpersist — the jaccard_set_join contract.
    """
    tokens = doc_tokens(docs, text_col, id_col)
    if n_docs is None:
        n_docs = docs.count()  # one scalar, same contract as token_join
    dfc = tokens.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    if max_df is not None:
        dfc = dfc.where(F.col("df") <= F.lit(int(max_df)))
    weights = dfc.select(
        "token", F.expr(f"CAST({int(n_docs)} AS BIGINT) div df").alias("w")
    )
    return (
        tokens.join(weights, "token")
        .select("doc_id", "token", "w")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def prefix_candidates(
    tw: DataFrame, tau_num: int, tau_den: int
) -> tuple[DataFrame, DataFrame]:
    """(candidate pairs, per-doc norms) from the weighted token relation.

    One window pass computes per-doc norm2 and the tail-from-here mass
    under the global (w DESC, token ASC) order; a token is indexed only
    while ``tail2 * tau_den^2 >= tau_num^2 * norm2`` (the Cauchy–Schwarz
    losslessness argument in the module doc).  The candidate join
    carries (token, doc_id) only.
    """
    from pyspark.sql import Window

    order = [F.col("w").desc(), F.col("token").asc()]
    wdoc = Window.partitionBy("doc_id")
    wtail = wdoc.orderBy(*order).rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    w2 = (F.col("w") * F.col("w")).alias("w2")
    sized = tw.select("doc_id", "token", "w", w2).select(
        "doc_id",
        "token",
        "w",
        F.sum("w2").over(wdoc).alias("norm2"),
        F.sum("w2").over(wtail).alias("tail2"),
    )
    norms = sized.groupBy("doc_id").agg(F.max("norm2").alias("norm2"))

    # prefix test in decimal: tail2 * tau_den^2 >= tau_num^2 * norm2
    # (tail2/norm2 are bigint; the products can pass 2^63 on weight-heavy
    # corpora — decimal keeps them exact)
    keep = (
        F.col("tail2").cast(_DEC) * F.lit(tau_den * tau_den).cast(_DEC)
        >= F.col("norm2").cast(_DEC) * F.lit(tau_num * tau_num).cast(_DEC)
    )
    prefix = sized.where(keep).select("doc_id", "token")

    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(b, "token")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    return cand, norms


def weighted_cosine_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tau_num: int = 7,
    tau_den: int = 10,
    max_df: int | None = None,
    n_docs: int | None = None,
    tw: DataFrame | None = None,
) -> DataFrame:
    """All document pairs with weighted cosine >= tau_num/tau_den.

    Returns (doc_a, doc_b, dot, norm2_a, norm2_b), doc_a < doc_b —
    integers only; ``dot / sqrt(norm2_a * norm2_b)`` is the caller's
    float cosine (engine rule: no float in hash-graded columns).

    ``n_docs`` keeps composition lazy exactly like rare_token_pairs.
    ``tw``: a pre-built :func:`weighted_token_relation` — long-lived
    callers (jobs, notebooks) pass their own so they can ``unpersist``
    it after the final action instead of leaking the internal cache
    (the jaccard_set_join caching contract).
    """
    if not (0 < tau_num <= tau_den):
        raise ValueError("require 0 < tau_num <= tau_den (tau in (0, 1])")
    if tw is None:
        tw = weighted_token_relation(docs, text_col, id_col, max_df, n_docs)
    cand, norms = prefix_candidates(tw, tau_num, tau_den)

    # exact dot: both docs' weighted token sets meet on the candidate
    # ids; shared-token weight product is w^2 (one global weight/token)
    ta = tw.select(
        F.col("doc_id").alias("doc_a"), "token", F.col("w").alias("wa")
    )
    tb = tw.select(
        F.col("doc_id").alias("doc_b"), "token", F.col("w").alias("wb")
    )
    dots = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "token"])
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(
        F.col("doc_id").alias("doc_a"), F.col("norm2").alias("norm2_a")
    )
    nb = norms.select(
        F.col("doc_id").alias("doc_b"), F.col("norm2").alias("norm2_b")
    )
    passes = (
        F.col("dot").cast(_DEC)
        * F.col("dot").cast(_DEC)
        * F.lit(tau_den * tau_den).cast(_DEC)
    ) >= (
        F.col("norm2_a").cast(_DEC)
        * F.col("norm2_b").cast(_DEC)
        * F.lit(tau_num * tau_num).cast(_DEC)
    )
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .where(passes)
        .select("doc_a", "doc_b", "dot", "norm2_a", "norm2_b")
    )
