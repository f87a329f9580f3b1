"""Clerical-review feedback: fold human match/non-match decisions back
into the linkage graph.

The engine surfaces ambiguous pairs for human adjudication
(operators/fs_em.py:review_queue — Fellegi–Sunter's "possible match"
band); this operator CONSUMES the resulting decisions, completing the
loop a production linkage deployment runs continuously:

    review_queue -> human decisions -> apply_review -> re-closure

Semantics (Splink/Dedupe-style active-learning feedback):

* a REJECTED pair is removed from the automatic edge set — the closure
  can no longer merge through it (though the two records may stay
  connected via other evidence; hard cannot-link constraints are
  correlation clustering, out of scope and documented as such);
* a CONFIRMED pair is added as an edge regardless of its automatic
  score — human ground truth outranks the model.

Scale shape: pairs normalize to (least, greatest) key order, rejects
apply as ONE anti-join on the pair key, confirms as ONE union +
distinct — all equi-operations on id-only relations; no scores, no
payloads, no iteration.  The adjusted edge set feeds the same
large/small-star closure as the automatic path.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalized(pairs: DataFrame, a: str, b: str) -> DataFrame:
    """(src, dst) with src < dst and NULL/self pairs dropped."""
    return (
        pairs.where(F.col(a).isNotNull() & F.col(b).isNotNull())
        .select(
            F.least(F.col(a), F.col(b)).alias("src"),
            F.greatest(F.col(a), F.col(b)).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )


def apply_review(
    edges: DataFrame,
    rejected: DataFrame | None = None,
    confirmed: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Adjusted edge set: (edges \\ rejected) ∪ confirmed, all pairs
    normalized to src < dst, distinct.

    ``rejected`` / ``confirmed`` carry the pair in their first two
    columns (any names); either may be None/empty.  A pair appearing in
    BOTH lists is treated as confirmed — the later, affirmative decision
    wins (and the composition makes that order-independent: the reject
    removes it, the confirm re-adds it).
    """
    out = _normalized(edges, src, dst)
    if rejected is not None:
        rj = _normalized(rejected, *rejected.columns[:2])
        out = out.join(rj, ["src", "dst"], "left_anti")
    if confirmed is not None:
        cf = _normalized(confirmed, *confirmed.columns[:2])
        out = out.unionByName(cf)
    return out.distinct()
