"""Token-budget sequence packing — the training-data pipeline's last mile.

Pretraining / SFT loaders consume fixed-length context windows; feeding
them one short document per window wastes most of the budget, so corpora
are PACKED: documents are concatenated into bins of at most ``budget``
tokens and the loader reads whole bins.  (The reference has no dataflow
analogue — this extends the curation family `operators/corpus.py` /
`jobs/curate_transcripts.py`; cf. scaleway/postal-address `address.py`
which stops at per-record semantics.)

Spark-first shape
-----------------
Packing order is inherently sequential (bin state threads through the
scan), so a single global order would serialize the whole corpus.  The
standard scale-out is SHARDED next-fit:

* every document is assigned a shard by a deterministic hash of its id —
  uniform by construction, so no shard skew regardless of token skew;
* within a shard, documents are ordered by (hash, id) — a deterministic
  pseudo-random order, which is exactly what training wants (packing in
  source order would correlate neighbors) — and packed with the linear
  next-fit scan;
* bins never span shards, so shards pack independently in parallel: the
  ONLY shuffle is the ``groupBy(shard)``, and the relation it carries is
  (id, n_tokens, hash) — document TEXT never shuffles; the packed
  manifest joins back to payloads by id downstream.

Next-fit (not first-fit-decreasing) is deliberate: it is one O(rows)
streaming pass with O(1) state, loses only a few percent utilisation at
realistic budget/doc-length ratios, and — unlike best-fit — is exactly
replayable by the driver's DuckDB oracle (a recursive CTE threads the
same (fill, bin) state), so the gate proves the distributed run
bit-for-bit.  A document longer than the budget gets a bin of its own
(next-fit yields this automatically: an over-full bin can never accept a
successor) and is flagged ``oversize`` for the loader to truncate/split.

Determinism/portability (the labeling_sample dual-path precedent): the
order hash is a pure function of (seed, id).  ``rank_method='xxhash'``
(production) uses xxhash64 — engine rule 4 keeps MessageDigest off hot
paths; ``rank_method='md5'`` (portable) uses the md5-prefix hash
(``conv(substr(md5(..),1,8),16,10)`` ≡ DuckDB
``CAST('0x'||substr(md5(..),1,8) AS BIGINT)``) so the oracle replays the
identical shards, order, and bins.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def _order_hash(id_col: str, seed: int, rank_method: str):
    if rank_method == "xxhash":
        return F.xxhash64(F.col(id_col).cast("string"), F.lit(seed))
    if rank_method == "md5":
        return F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.lit(str(seed)), F.col(id_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
    raise ValueError(f"rank_method must be 'xxhash' or 'md5', got {rank_method!r}")


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_shards: int = 256,
    seed: int = 0,
    rank_method: str = "xxhash",
    group_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Assign every document to a (shard, bin, position) under a token
    budget — sharded deterministic next-fit (module docstring).

    Input needs ``id_col`` (unique) and ``tokens_col`` (non-negative
    int); all other columns are dropped before the shuffle so text bytes
    never move.  Output: (id, shard, bin_in_shard, pos_in_bin,
    start_offset, n_tokens, oversize) — ``start_offset`` is the token
    offset of the document inside its bin (cumulative fill before it),
    ``oversize`` flags docs longer than the budget (alone in their bin,
    loader decides truncate/split).  ``(shard, bin_in_shard)`` is the
    globally unique bin key.

    Scale: parallelism = ``n_shards`` (size it to ~cores x a few at your
    cluster; shards are hash-uniform so each packs ~rows/n_shards docs in
    one linear pandas pass).  The per-group python loop is the honest
    cost — next-fit state is sequential by definition — and it touches
    three int64 arrays, no strings.

    ``group_cols`` (e.g. the train/valid/test ``split``) partition the
    packing HARD: bins never straddle a group boundary — a loader reading
    a bin can never leak validation content into training — because the
    groups join the shuffle key (still ONE shuffle) and ride through to
    the output.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    h = _order_hash(id_col, seed, rank_method)
    slim = docs.select(
        F.col(id_col),
        *[F.col(c) for c in group_cols],
        F.col(tokens_col).cast("long").alias("n_tokens"),
        h.alias("_h"),
    ).withColumn("shard", F.pmod("_h", F.lit(n_shards)).cast("int"))

    fields = [slim.schema[id_col]]
    fields += [slim.schema[c] for c in group_cols]
    out_schema = StructType(
        fields
        + [
            StructField("shard", IntegerType(), False),
            StructField("bin_in_shard", LongType(), False),
            StructField("pos_in_bin", LongType(), False),
            StructField("start_offset", LongType(), False),
            StructField("n_tokens", LongType(), True),
            StructField("oversize", BooleanType(), False),
        ]
    )

    def pack(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(["_h", id_col], kind="mergesort")
        toks = pdf["n_tokens"].to_numpy(dtype=np.int64)
        n = len(toks)
        bins = np.empty(n, dtype=np.int64)
        pos = np.empty(n, dtype=np.int64)
        off = np.empty(n, dtype=np.int64)
        b, p, fill = 0, 0, 0
        for i in range(n):
            t = int(toks[i])
            if p > 0 and fill + t > budget:
                b += 1
                p, fill = 0, 0
            bins[i] = b
            off[i] = fill
            p += 1
            pos[i] = p
            fill += t
        out = {id_col: pdf[id_col].to_numpy()}
        for c in group_cols:
            out[c] = pdf[c].to_numpy()
        out.update(
            {
                "shard": pdf["shard"].to_numpy(),
                "bin_in_shard": bins,
                "pos_in_bin": pos,
                "start_offset": off,
                "n_tokens": toks,
                "oversize": toks > budget,
            }
        )
        return pd.DataFrame(out)

    return slim.groupBy(*group_cols, "shard").applyInPandas(pack, out_schema)


def bin_stats(
    packed: DataFrame, budget: int, group_cols: "tuple[str, ...]" = ()
) -> DataFrame:
    """Packed manifest -> one summary row (per ``group_cols`` group):
    bins, docs, token totals and utilisation = capped-bin tokens /
    (capped bins * budget) (oversize bins overflow by construction).
    One aggregation over the (group, shard, bin) keys then one reduce;
    all counts integer, the single division is int/int (the gate-safe
    shape)."""
    per_bin = packed.groupBy(*group_cols, "shard", "bin_in_shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.max(F.col("oversize").cast("int")).alias("has_oversize"),
    )
    return per_bin.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("bin_tokens").alias("total_tokens"),
        F.sum("has_oversize").alias("n_oversize_bins"),
        (
            F.sum(F.when(F.col("has_oversize") == 0, F.col("bin_tokens")))
            / (
                F.sum(F.when(F.col("has_oversize") == 0, F.lit(1)))
                * F.lit(budget)
            )
        ).alias("utilization"),
    )
