"""Deterministic corpus-mixture sampling for training-data pipelines.

A pre-training mixture is specified as per-stratum sampling WEIGHTS
(epochs over the stratum): web 0.125, books 1.0, wiki 2.5, ...  A weight
below 1 keeps a deterministic fraction of the stratum; a weight above 1
replicates each kept document with a copy index (multi-epoch upsampling).
What this must guarantee at 10^12-doc scale:

* **zero shuffle** — the keep/copy decision is a pure per-row function of
  the document id and its stratum (a ``when``-chain + one
  ``explode_outer``), so sampling composes into any scan without adding
  an Exchange;
* **deterministic and coordination-free** — re-runs, backfills, and
  late-arriving shards decide every document identically (the same
  property :func:`corpus.split_assign` gives dataset splits — no sampled
  manifest to store or distribute);
* **exact integer semantics** — weights are integer BASIS POINTS
  (1 bp = 1/10000 epoch), decisions are integer comparisons on a bucket
  in ``[0, 10000)``, so any engine replays them bit-for-bit (the driver
  query's DuckDB oracle does).

With ``b = bucket(id)`` uniform on ``[0, BASIS)`` and a weight of ``w``
basis points::

    n_copies(id) = w // BASIS  +  (1 if b < w % BASIS else 0)

``E[n_copies] = w / BASIS`` exactly; down-sampling is the ``w < BASIS``
case where ``n_copies ∈ {0, 1}``.  Copies carry ``copy_idx`` in
``[0, n_copies)`` so downstream shuffles/splits can keep replicas
distinguishable.
"""
from __future__ import annotations

from typing import Dict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .corpus import split_assign

BASIS = 10_000  # 1 basis point = 1/10000 epoch


def n_copies_col(
    id_col: Column,
    stratum_col: Column,
    weights_bp: Dict[str, int],
    default_bp: int = 0,
    method: str = "xxhash",
    salt: int = 2024,
) -> Column:
    """Integer copy count per row — the whole sampling decision.

    ``weights_bp`` maps stratum value -> weight in basis points (25000 =
    2.5 epochs, 1250 = keep 1/8).  Strata absent from the map get
    ``default_bp``.  The mapping compiles to a codegen ``when``-chain:
    mixture specs are small (tens of sources/languages); a >200-stratum
    spec should go through ``functions.map_lookup_col`` instead
    (CLAUDE.md rule 6).
    """
    for stratum, bp in weights_bp.items():
        if bp < 0:
            raise ValueError(f"negative weight for {stratum!r}: {bp}")
    bucket = split_assign(id_col, BASIS, method=method, salt=salt)
    w: Column = F.lit(int(default_bp))
    for stratum, bp in weights_bp.items():
        w = F.when(stratum_col == stratum, F.lit(int(bp))).otherwise(w)
    return (
        F.floor(w / BASIS).cast("int")
        + F.when(bucket < w % BASIS, F.lit(1)).otherwise(F.lit(0))
    ).alias("n_copies")


def mixture_sample(
    df: DataFrame,
    weights_bp: Dict[str, int],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    default_bp: int = 0,
    method: str = "xxhash",
    salt: int = 2024,
) -> DataFrame:
    """The sampled corpus: dropped rows gone, upsampled rows replicated
    with ``copy_idx`` in ``[0, n_copies)``.  Shuffle-free by construction
    (plan-asserted in tests/test_sampling.py)."""
    kept = df.withColumn(
        "n_copies",
        n_copies_col(
            F.col(id_col), F.col(stratum_col), weights_bp,
            default_bp=default_bp, method=method, salt=salt,
        ),
    ).where(F.col("n_copies") > 0)
    # explode_outer, not explode: the sequence is never empty here
    # (n_copies >= 1 after the filter) and plain explode's inferred
    # size>0 filter re-inlines the array expression (CLAUDE.md rule 2).
    return kept.withColumn(
        "copy_idx",
        F.explode_outer(F.sequence(F.lit(0), F.col("n_copies") - 1)),
    ).drop("n_copies")
