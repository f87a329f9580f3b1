"""Grouped-aggregate (UDAF) surface: numpy/pandas statistics Spark lacks
natively, expressed as Arrow-batched GROUPED_AGG pandas UDFs.

Median absolute deviation is the canonical example: robust dispersion for
corpus length/quality audits (outlier-resistant where stddev is not), not
built into Spark SQL.  A GROUPED_AGG pandas UDF receives each group's
column as ONE pandas Series over Arrow — the right shape for a rank
statistic, which cannot partial-aggregate map-side.  That is also the
honest scale note: rank statistics need the group's values together, so
the shuffle carries the grouped column (here: one int per doc); for
100-TB corpora group counts are small (languages, sources, buckets) and
per-group value vectors are what a single executor holds comfortably.
Approximate alternatives (percentile_approx) partial-aggregate and should
be preferred when groups outgrow memory.

Exactness: median of ints is an int or an exact .5 half (average of the
two middle values) — binary-exact doubles, so the DuckDB oracle (its
built-in ``median``/``mad``) hash-matches bit-for-bit; no float-sum
ordering is involved anywhere.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def median_abs_dev(v: pd.Series) -> float:
    """MAD = median(|x - median(x)|); NaN-safe like the SQL aggregates."""
    med = v.median()
    return float((v - med).abs().median())


@pandas_udf("double")
def exact_median(v: pd.Series) -> float:
    return float(v.median())


@pandas_udf("long")
def group_count(v: pd.Series) -> int:
    return int(len(v))


def length_dispersion(
    df: DataFrame, group_col: str = "lang", value_col: str = "n_chars"
) -> DataFrame:
    """Per-group robust length profile: count, exact median, and MAD — all
    three as GROUPED_AGG pandas UDAFs, so the whole aggregation is ONE
    grouped-agg pandas node (ArrowAggregatePython in Spark 4) over one
    shuffle on the group key (plan-asserted in tests/test_corpus.py;
    mixing native and pandas aggregates would split the plan)."""
    v = F.col(value_col)
    return (
        df.groupBy(group_col)
        .agg(
            group_count(v).alias("n_docs"),
            exact_median(v).alias("med_len"),
            median_abs_dev(v).alias("mad_len"),
        )
        .orderBy(group_col)
    )
