"""Mention extraction from transcript turns.

Pulls the fielded ``ADDR{...}`` mention out of ``text`` entirely JVM-side
(``regexp_extract`` inside whole-stage codegen — no Python in this stage),
producing one row per mention keyed by ``rec_id = conv_id#turn_idx``.

Input schema is BASELINE.json's ``input_hint`` transcripts table.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Mirrors postal_address_spark.synth.MENTION_RE (Java regex flavor).
_ADDR_RE = (
    r"ADDR\{line1=([^;}]*); line2=([^;}]*); postal=([^;}]*); "
    r"city=([^;}]*); country=([^;}]*); subdiv=([^;}]*)\}"
)

_FIELD_GROUPS = [
    ("line1", 1),
    ("line2", 2),
    ("postal_code", 3),
    ("city_name", 4),
    ("country_code", 5),
    ("subdivision_code", 6),
]


def extract_mentions(transcripts: DataFrame) -> DataFrame:
    """transcripts -> (rec_id, conv_id, turn_idx, line1..subdivision_code).

    The contains-filter narrows the scan before the regex runs; both are
    pushed into the same codegen stage by Catalyst.  Empty capture groups
    become NULL (the reference's blank-reset N3 then applies downstream —
    but extraction must not pre-normalize, so only ''->NULL for the
    *absent-field* encoding of the mention format).
    """
    out = transcripts.where(F.col("text").contains("ADDR{"))
    for name, group in _FIELD_GROUPS:
        out = out.withColumn(name, F.regexp_extract("text", _ADDR_RE, group))
        out = out.withColumn(
            name, F.when(F.col(name) == "", None).otherwise(F.col(name))
        )
    return out.select(
        F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string")).alias("rec_id"),
        "conv_id",
        "turn_idx",
        "line1",
        "line2",
        "postal_code",
        "city_name",
        "country_code",
        "subdivision_code",
    )
