"""Cross-document duplicated-span measurement (exact-substring dedup at
token-w-gram granularity).

The span-level companion to the DOC-pair near-dup family (minhash /
simhash / ngram-jaccard in dedup.py): instead of asking "which document
pairs look alike", it asks "which TOKEN SPANS of each document also occur
verbatim in some other document" — the quantity the exact-substring
deduplication literature targets (Lee et al., "Deduplicating Training
Data Makes Language Models Better", ACL 2022, which removes repeated
50-token substrings corpus-wide; this operator measures the same overlap
at a configurable w-token granularity so a curation pipeline can gate or
trim on it).  Within-doc repetition is deliberately NOT counted — that is
``repetition_stats`` (corpus.py); a span is duplicated here only when it
appears in >= 2 DISTINCT documents.

Per document it reports (all integers, so the DuckDB oracle replays the
whole computation bit-for-bit):

* ``n_tokens``   — whitespace token count;
* ``n_grams``    — number of w-token spans (max(n_tokens - w + 1, 0));
* ``n_dup_grams``— spans also present verbatim in another document;
* ``dup_token_cover`` — tokens covered by the UNION of those spans'
  [pos, pos+w) intervals: the length of text an exact-substring dedup
  pass would flag.  (cover / n_tokens is the per-doc contamination
  fraction; left as two ints — engine-portable, hash-stable.)

Scale design:

* The exploded gram relation carries ``(doc_id, pos, xxhash64(gram))``
  only — rule 7; the w-token gram STRING never rides a shuffle.  (The
  oracle keys on the gram string itself; a 64-bit collision would need
  ~10^9 distinct grams to reach coin-flip odds.)
* Cross-doc support is two map-side-combinable aggregations (distinct
  (gram, doc) -> count per gram); the positions frame then keeps its
  duplicated rows via LEFT SEMI join — no fan-out multiplication, a
  boilerplate gram shared by the whole corpus still joins each of its
  occurrences exactly once.
* Interval union runs per document over its own sorted position array
  (bounded by doc length) with one ``aggregate`` HOF — a single sweep,
  JVM-side, no Python anywhere in the operator.
* Token and gram arrays are materialized as real columns before any
  lambda consumes them (rule 1), and every explode is ``explode_outer``
  (rule 2).

``contamination_stats`` is the two-dataset asymmetric variant (benchmark
decontamination): the small side broadcasts as a distinct gram-hash set,
so the corpus grams are probed in place without any shuffle.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# rides inside the gram join key only; outside the whitespace-token
# alphabet so w tokens concatenate injectively
_GRAM_SEP = "\x1f"


def _tokenized(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, toks, n_tokens) with empty arrays for blank/NULL text."""
    trimmed = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(trimmed == "", F.array().cast("array<string>"))
        .otherwise(F.split(F.lower(trimmed), r"\s+"))
        .alias("toks"),
    )
    return base.withColumn("n_tokens", F.size("toks"))


def _doc_grams(base: DataFrame, w: int) -> DataFrame:
    """(doc_id, pos, ghash) positional w-gram hashes; toks/n_tokens are
    projected columns, so the lambda's slice() does not re-inline the
    tokenization per element (rule 1)."""
    return base.where(F.col("n_tokens") >= w).select(
        "doc_id",
        F.explode_outer(
            F.expr(
                f"transform(sequence(1, n_tokens - {w} + 1),"
                f" i -> struct(i AS pos,"
                f" xxhash64(concat_ws('{_GRAM_SEP}', slice(toks, i, {w})))"
                " AS ghash))"
            )
        ).alias("g"),
    ).select("doc_id", "g.pos", "g.ghash")


def _interval_union(per_doc: DataFrame, w: int, out_col: str) -> DataFrame:
    """Union length of [pos, pos+w) over the sorted ``ps`` array: one
    JVM aggregate sweep, bounded by the document's own length."""
    return per_doc.withColumn(
        out_col,
        F.expr(
            "aggregate(ps,"
            " struct(CAST(0 AS INT) AS last_end, CAST(0 AS INT) AS total),"
            f" (acc, p) -> struct(greatest(acc.last_end, p + {w}) AS last_end,"
            f" acc.total + greatest(0, p + {w} - greatest(acc.last_end, p))"
            " AS total),"
            " acc -> acc.total)"
        ),
    )


def span_dup_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
) -> DataFrame:
    """(doc_id, n_tokens, n_grams, n_dup_grams, dup_token_cover) for
    EVERY input document (docs without duplicated spans report zeros)."""
    if w < 2:
        raise ValueError("w must be >= 2")

    base = _tokenized(docs, text_col, id_col)
    grams = _doc_grams(base, w)

    # grams occurring in >= 2 DISTINCT docs: two map-side-combinable aggs
    dup_grams = (
        grams.select("ghash", "doc_id")
        .distinct()
        .groupBy("ghash")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= 2)
        .select("ghash")
    )
    # LEFT SEMI: keeps each duplicated occurrence once, no fan-out
    dup_pos = grams.join(dup_grams, "ghash", "left_semi")

    # per-doc interval union of [pos, pos+w): one sorted sweep
    per_doc = dup_pos.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_grams"),
        F.sort_array(F.collect_list("pos")).alias("ps"),
    )
    per_doc = _interval_union(per_doc, w, "dup_token_cover").select(
        "doc_id", "n_dup_grams", "dup_token_cover"
    )

    out = (
        base.select("doc_id", "n_tokens")
        .withColumn("n_grams", F.greatest(F.col("n_tokens") - F.lit(w - 1), F.lit(0)))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_grams",
            F.coalesce(F.col("n_dup_grams"), F.lit(0).cast("long")).alias(
                "n_dup_grams"
            ),
            F.coalesce(F.col("dup_token_cover"), F.lit(0)).alias(
                "dup_token_cover"
            ),
        )
    )
    return out


def contamination_stats(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
) -> DataFrame:
    """Benchmark decontamination: per CORPUS document, the w-token spans
    that occur verbatim anywhere in the BENCHMARK set, and their
    interval-union token cover — the overlap statistic an eval-set
    decontamination pass (GPT-3-style n-gram overlap removal) gates on.

    Two-dataset asymmetric variant of ``span_dup_stats``: the benchmark
    side reduces to its DISTINCT gram-hash set, which is vocabulary-
    sized (eval sets are small by construction) and therefore BROADCAST
    — the corpus-side gram relation is never shuffled at all: tokenize,
    hash, broadcast-semi-probe, one per-doc regroup.  No doc-identity
    exclusion: a corpus row that IS a benchmark document reports full
    cover, which is exactly what decontamination should drop.

    Returns (doc_id, n_tokens, n_grams, n_contam_grams,
    contam_token_cover) for every corpus document, all integers.
    """
    if w < 2:
        raise ValueError("w must be >= 2")

    base = _tokenized(corpus, text_col, id_col)
    grams = _doc_grams(base, w)
    bench_grams = F.broadcast(
        _doc_grams(_tokenized(benchmark, text_col, id_col), w)
        .select("ghash")
        .distinct()
    )
    hit_pos = grams.join(bench_grams, "ghash", "left_semi")

    per_doc = hit_pos.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_contam_grams"),
        F.sort_array(F.collect_list("pos")).alias("ps"),
    )
    per_doc = _interval_union(per_doc, w, "contam_token_cover").select(
        "doc_id", "n_contam_grams", "contam_token_cover"
    )

    return (
        base.select("doc_id", "n_tokens")
        .withColumn(
            "n_grams", F.greatest(F.col("n_tokens") - F.lit(w - 1), F.lit(0))
        )
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_grams",
            F.coalesce(F.col("n_contam_grams"), F.lit(0).cast("long")).alias(
                "n_contam_grams"
            ),
            F.coalesce(F.col("contam_token_cover"), F.lit(0)).alias(
                "contam_token_cover"
            ),
        )
    )
