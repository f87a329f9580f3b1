"""Document chunking as a Python UDTF (user-defined TABLE function).

Closes the one unexercised sliver of the UDF/UDAF/UDTF surface (SURVEY
§2.B): a lateral table function that expands each document into fixed-size
word chunks — the shape a training pipeline uses to split long documents
into model-context-sized pieces with arbitrary Python (tokenizers,
sentence splitters) in the loop.

Scale note: THIS particular chunking is expressible with JVM higher-order
functions (see dedup.word_shingles for the technique) and a production hot
path should prefer that; the UDTF exists for the cases where the per-doc
expansion genuinely needs Python (a real BPE tokenizer, a layout-aware
splitter).  The lateral join plans as a single Python-UDTF eval node over
the scan — one process boundary, batched rows — asserted in
tests/test_plans.py.

The reference has no table-function surface (pure scalar library,
address.py); this is engine-side dataflow coverage.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

CHUNK_WORDS = 10


@udtf(returnType="chunk_idx int, chunk string, n_tokens int")
class ChunkWordsUDTF:
    """text -> one row per CHUNK_WORDS-word chunk (0-indexed).

    ``str.split()`` (no args) collapses whitespace runs and strips ends —
    mirrored in the DuckDB oracle by filtering empty pieces of a
    ``\\s+`` regex split.  NULL/empty text yields no rows.
    """

    def eval(self, text):  # noqa: D102 — schema above
        toks = (text or "").split()
        for i in range(0, len(toks), CHUNK_WORDS):
            piece = toks[i : i + CHUNK_WORDS]
            yield i // CHUNK_WORDS, " ".join(piece), len(piece)


def chunk_documents(
    spark: SparkSession, docs: DataFrame, id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """LATERAL-join every document against the chunking UDTF."""
    spark.udtf.register("chunk_words", ChunkWordsUDTF)
    docs.select(F.col(id_col), F.col(text_col)).createOrReplaceTempView(
        "_chunk_input"
    )
    return spark.sql(
        f"""
        SELECT d.{id_col}, c.chunk_idx, c.chunk, c.n_tokens
        FROM _chunk_input d, LATERAL chunk_words(d.{text_col}) c
        """
    )
