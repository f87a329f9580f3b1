"""Per-document unigram-rarity scoring — the distributable proxy for a
perplexity filter (CCNet's quality signal without shipping a language
model): a document made of corpus-common tokens reads as boilerplate, a
document dominated by hapax tokens reads as gibberish/noise, and both
tails are what a curation gate wants to see BEFORE deciding thresholds.

Sufficient statistics per document, ALL INTEGERS (the corpus.py gate
discipline — no float aggregation ever rides a grading hash):

* ``n_tokens``   — whitespace token count (occurrences, not distinct)
* ``sum_df``     — sum over token occurrences of that token's corpus
                   document frequency; ``mean_df = sum_df / n_tokens``
                   is the single int/int division downstream consumers
                   (or the oracle) derive
* ``min_df``     — the rarest token's document frequency
* ``n_hapax``    — occurrences whose token appears in exactly ONE
                   corpus document (hapax ratio = n_hapax / n_tokens)

Scale shape: the (doc, token) relation carries (doc_id, xxhash64(token))
only — token STRINGS never shuffle (rule 7's id-only discipline; rule 4's
xxhash) — document frequency is one vocabulary-scale aggregation with
map-side combine, the df table joins back on the 64-bit hash, and the
per-doc roll-up is a second map-side-combinable aggregation.  The
`doc_rarity` driver oracle is deliberately keyed on the token STRINGS
(the sft_pairs grading pattern), so an engine-side hash collision that
merged two tokens' df counts would FAIL the gate rather than hide.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import tokens_col


def doc_rarity_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_tokens, sum_df, min_df, n_hapax) per document.

    Documents whose text is empty/NULL yield n_tokens = 0 with NULL
    df stats (errors are data; a gate treats them as its own reject
    reason, not a divide-by-zero).
    """
    toks = df.select(
        F.col(id_col),
        F.explode_outer(tokens_col(F.col(text_col))).alias("__tok"),
    ).select(
        id_col,
        # empty split yields [''] and NULL text yields a NULL token row —
        # treat both as no-token, and NEVER feed NULL to xxhash64 (it
        # hashes the bare seed to a non-null long, minting a phantom
        # token shared by every NULL-text doc)
        F.when(
            F.col("__tok").isNull() | (F.col("__tok") == ""), None
        )
        .otherwise(F.xxhash64("__tok"))
        .alias("__th"),
    )
    # corpus document frequency per token hash: distinct docs per token,
    # WITHOUT a countDistinct Expand — collapse (token, doc) first
    # (boilerplate_turns precedent), both aggregations map-side combined
    df_table = (
        toks.where(F.col("__th").isNotNull())
        .groupBy("__th", id_col)
        .agg(F.lit(1).alias("__one"))
        .groupBy("__th")
        .agg(F.count(F.lit(1)).alias("__df"))
    )
    return (
        toks.join(df_table, "__th", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.col("__th")).alias("n_tokens"),
            F.sum("__df").alias("sum_df"),
            F.min("__df").alias("min_df"),
            F.sum((F.col("__df") == 1).cast("long")).alias("n_hapax"),
        )
    )
