"""Distributed address normalization: the reference's EP1 lifecycle
(construct -> normalize -> validate -> render, address.py:308-505,249-306)
as one Arrow-batched pandas UDF over the six base-field columns.

Per input_hint there is no per-row Python anywhere: the UDF body is the
vectorized pandas core (Series.map against broadcast refdata dicts), and
errors are data (struct fields), never exceptions.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from ..core.normalize import normalize_frame, render_frame, validate_frame
from ..refdata.territory_tables import FOREIGN_TERRITORIES_MAPPING

_EMPTY_PAIRS: list = []

NORMALIZED_SCHEMA = StructType(
    [
        StructField("line1", StringType()),
        StructField("line2", StringType()),
        StructField("postal_code", StringType()),
        StructField("city_name", StringType()),
        StructField("country_code", StringType()),
        StructField("subdivision_code", StringType()),
        StructField("state_name", StringType()),
        StructField("subdivision_name", StringType()),
        StructField("subdivision_type_id", StringType()),
        StructField("country_name", StringType()),
        StructField("top_country", StringType()),
        StructField("render", StringType()),
        StructField("subdiv_metadata", MapType(StringType(), StringType())),
        StructField("is_valid", BooleanType()),
        StructField("required_fields", ArrayType(StringType())),
        StructField("invalid_fields", MapType(StringType(), StringType())),
        StructField("inconsistent_fields", ArrayType(ArrayType(StringType()))),
    ]
)


def _normalize_batch(
    line1: pd.Series,
    line2: pd.Series,
    postal_code: pd.Series,
    city_name: pd.Series,
    country_code: pd.Series,
    subdivision_code: pd.Series,
    strict: bool,
    replace_city_name: bool,
) -> pd.DataFrame:
    frame = pd.DataFrame(
        {
            "line1": line1.astype(object),
            "line2": line2.astype(object),
            "postal_code": postal_code.astype(object),
            "city_name": city_name.astype(object),
            "country_code": country_code.astype(object),
            "subdivision_code": subdivision_code.astype(object),
        }
    )
    # pandas may carry NaN for nulls; the core expects str-or-None.
    frame = frame.where(frame.notna(), None)
    normalized = validate_frame(normalize_frame(frame, strict=strict,
                                                replace_city_name=replace_city_name))
    normalized["render"] = render_frame(normalized)
    # T3 — blocking-key coarsener (territory.py:238-245).
    cc = normalized["country_code"]
    top = cc.map(FOREIGN_TERRITORIES_MAPPING)
    normalized["top_country"] = top.where(top.notna(), cc)
    # strict-mode normalize conflicts fold into the inconsistent list
    # (the reference raises them from normalize(), address.py:415-424).
    # Per-row Python only on the conflict minority; clean rows share one
    # immutable empty list (Arrow copies values at the boundary).
    norm_inc = normalized["norm_inconsistent"]
    val_inc = normalized["inconsistent_fields"]
    hot = (
        norm_inc.notna().to_numpy()
        | (val_inc.str.len() > 0).to_numpy(dtype=bool)
    )
    merged = np.empty(len(frame), dtype=object)
    merged.fill(_EMPTY_PAIRS)
    if hot.any():
        na = norm_inc.to_numpy(dtype=object)
        vb = val_inc.to_numpy(dtype=object)
        for i in np.nonzero(hot)[0]:
            merged[i] = [list(p) for p in ((na[i] or []) + (vb[i] or []))]
    normalized["inconsistent_fields"] = pd.Series(merged, index=normalized.index)
    normalized["is_valid"] = normalized["is_valid"] & norm_inc.isna()
    normalized["subdiv_metadata"] = normalized["subdiv_metadata"].where(
        normalized["subdiv_metadata"].notna(), None
    )
    return normalized[[f.name for f in NORMALIZED_SCHEMA.fields]]


def normalize_mentions(
    mentions: DataFrame, strict: bool = False, replace_city_name: bool = True
) -> DataFrame:
    """mentions -> normalized mentions (struct exploded into columns).

    ``strict`` defaults to False for the pipeline: bulk reconciliation
    wants territory-derived values to win (the reference's non-strict mode,
    address.py:825-915); strict semantics remain available and fully
    tested at the core layer.
    """

    @pandas_udf(returnType=NORMALIZED_SCHEMA)
    def norm_udf(
        line1: pd.Series,
        line2: pd.Series,
        postal_code: pd.Series,
        city_name: pd.Series,
        country_code: pd.Series,
        subdivision_code: pd.Series,
    ) -> pd.DataFrame:
        return _normalize_batch(
            line1, line2, postal_code, city_name, country_code,
            subdivision_code, strict, replace_city_name,
        )

    out = mentions.withColumn(
        "norm",
        norm_udf(
            "line1", "line2", "postal_code", "city_name",
            "country_code", "subdivision_code",
        ),
    )
    keep = [c for c in mentions.columns if c not in {f.name for f in NORMALIZED_SCHEMA.fields}]
    return out.select(*keep, "norm.*")
