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


_FIELD_KEYS = [
    ("line1", "line1="),
    ("line2", "line2="),
    ("postal_code", "postal="),
    ("city_name", "city="),
    ("country_code", "country="),
    ("subdivision_code", "subdiv="),
]


def extract_mentions(transcripts: DataFrame) -> DataFrame:
    """transcripts -> (rec_id, conv_id, turn_idx, line1..subdivision_code).

    The contains-filter narrows the scan before the regex runs; both are
    pushed into the same codegen stage by Catalyst.  The mention regex is
    matched ONCE per row (whole-brace capture), then the six fields peel
    off the split parts by their fixed ``key=`` prefixes — running the
    full pattern once per capture group costs 6x the regex work for
    nothing.  Empty values become NULL (the reference's blank-reset N3
    then applies downstream — but extraction must not pre-normalize, so
    only ''->NULL for the *absent-field* encoding of the mention format).
    """
    out = transcripts.where(F.col("text").contains("ADDR{"))
    # one match of the full pattern; parts split on the '; ' separators the
    # format guarantees (values cannot contain ';' or '}')
    out = out.withColumn(
        "_parts",
        F.split(F.regexp_extract("text", _ADDR_RE, 0), r"; "),
    )
    cols = []
    for i, (name, key) in enumerate(_FIELD_KEYS):
        raw = F.element_at("_parts", i + 1)
        # strip the surrounding syntax: leading 'ADDR{key=' on the first
        # part, trailing '}' on the last, plain 'key=' elsewhere
        if i == 0:
            value = F.substring(raw, len("ADDR{") + len(key) + 1, 1 << 20)
        else:
            value = F.substring(raw, len(key) + 1, 1 << 20)
        if i == len(_FIELD_KEYS) - 1:
            value = F.regexp_replace(value, r"\}$", "")
        cols.append(F.when(value == "", None).otherwise(value).alias(name))
    return out.select(
        F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string")).alias("rec_id"),
        "conv_id",
        "turn_idx",
        *cols,
    )
