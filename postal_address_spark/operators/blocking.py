"""Blocking-key emission.

The key composes the reference's own reconciliation machinery so that every
equivalence-coded mention of one entity lands in the SAME block
(SURVEY.md §2.C — the alias families define the match classes):

    block_key = sha2(top_country || '|' || substr(postal_norm, 1, 3), 256)

* ``top_country`` is T3 (territory_attachment, territory.py:238-245)
  applied to the N5/N7-normalized country — computed upstream in the
  normalize UDF.
* ``postal_norm`` is the N1-canonicalized postal code (address.py:326-335),
  so postal junk can't split a block.

City tokens are deliberately excluded: small city typos must not move a
mention out of its block (they are the similarity scorer's job).  Both
components are required; mentions lacking either cannot be linked and get a
NULL key (filtered before pairing).

Everything here is JVM-side expression work inside whole-stage codegen.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def block_key_col(
    top_country: Column, postal_code: Column, postal_prefix_len: int = 3
) -> Column:
    raw = F.concat_ws(
        "|", top_country, F.substring(postal_code, 1, postal_prefix_len)
    )
    return F.when(
        top_country.isNotNull() & postal_code.isNotNull(), F.sha2(raw, 256)
    )


def with_block_key(normalized: DataFrame, postal_prefix_len: int = 3) -> DataFrame:
    return normalized.withColumn(
        "block_key",
        block_key_col(
            F.col("top_country"), F.col("postal_code"), postal_prefix_len
        ),
    )
