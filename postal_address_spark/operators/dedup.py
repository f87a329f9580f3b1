"""Document deduplication operators for large-scale training-data
pipelines: exact, MinHash+LSH, SimHash, and n-gram Jaccard.

All hot paths are JVM-side DataFrame expressions (xxhash64, higher-order
array functions, groupBy aggregates) — no Python in any per-row loop; the
only shuffles are the dedup groupBys and the bucket self-joins, which is
the theoretical minimum for these algorithms.

Designed for the ``documents(doc_id, text, ...)`` table shape.
"""
from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne prime for the universal-hash family h_i(x) = (a_i x + b_i) mod p.
# 2^31-1 keeps (h mod p) * a < 2^62, inside long range under ANSI mode.
_MH_PRIME = (1 << 31) - 1


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content hash.

    Returns (rep_id, dup_count): one row per distinct text, representative
    = min id.  Map-side partial aggregation makes this a single cheap
    shuffle keyed on a 128-bit content fingerprint (two independently
    seeded xxhash64 values — collision odds ~n²/2^129, negligible at
    10^12 docs) instead of the full text bytes.

    xxhash64 rather than ``F.sha2``: MessageDigest-backed hashes serialize
    on a JVM provider lock at high thread counts (see blocking.py — 8x
    degradation measured at 32 threads); xxhash64 scales linearly.
    """
    return (
        df.groupBy(
            F.xxhash64(F.lit(0), F.col(text_col)).alias("_h0"),
            F.xxhash64(F.lit(1), F.col(text_col)).alias("_h1"),
        )
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select("rep_id", "dup_count")
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct lower-cased word n-gram shingles, as an array column."""
    tokens = F.split(F.lower(F.trim(text)), r"\s+")
    count = F.greatest(F.size(tokens) - F.lit(n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
    )
    # Short docs: fall back to the whole text as a single shingle.
    return F.when(count > 0, F.array_distinct(grams)).otherwise(
        F.array(F.lower(F.trim(text)))
    )


def _minhash_sig_cols(num_hashes: int, seed: int) -> List[Column]:
    """num_hashes min-aggregates over the universal-hash family applied to
    the shingle xxhash64 value (column 'h')."""
    import random

    rng = random.Random(seed)
    cols = []
    for i in range(num_hashes):
        a = rng.randrange(1, _MH_PRIME)
        b = rng.randrange(0, _MH_PRIME)
        hashed = F.pmod(
            F.pmod(F.col("h"), F.lit(_MH_PRIME)) * F.lit(a) + F.lit(b),
            F.lit(_MH_PRIME),
        )
        cols.append(F.min(hashed).alias(f"mh_{i}"))
    return cols


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, sig array<long>) MinHash signatures; one shuffle (groupBy id)."""
    exploded = df.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle"),
    ).select(id_col, F.xxhash64("shingle").alias("h"))
    agg = exploded.groupBy(id_col).agg(*_minhash_sig_cols(num_hashes, seed))
    return agg.select(
        id_col,
        F.array(*[F.col(f"mh_{i}") for i in range(num_hashes)]).alias("sig"),
    )


def minhash_lsh_candidates(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs.

    shingle->minhash->band->bucket-join; the self-join key is
    (band_idx, band_hash), so only same-bucket docs ever meet.
    """
    banded = signatures.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_idx"),
                    # xxhash64, not sha2: band hashes are join keys only,
                    # and MessageDigest hashes throttle at high thread
                    # counts (blocking.py).  band_idx rides the join key
                    # too, so cross-band collisions are harmless.
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select(id_col, "band.band_idx", "band.band_hash")
    a = banded.select(
        F.col(id_col).alias("id_a"), "band_idx", "band_hash"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), "band_idx", "band_hash"
    )
    return (
        a.join(b, ["band_idx", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Exact shingle-set Jaccard over candidate pairs; keeps pairs >= tau.

    The shingle arrays are broadcast-joined per side when small, else
    shuffled on the ids — either way the set math is JVM array functions.
    """
    sets = df.select(
        F.col(id_col),
        word_shingles(F.col(text_col), shingle_n).alias("shingles"),
    )
    out = (
        candidates.join(
            sets.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a")),
            "id_a",
        )
        .join(
            sets.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b")),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.7,
    seed: int = 42,
) -> DataFrame:
    """Full near-dup pipeline: signatures -> LSH buckets -> Jaccard verify."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n, seed)
    cands = minhash_lsh_candidates(sigs, id_col, bands, rows_per_band)
    return jaccard_verify(df, cands, text_col, id_col, shingle_n, threshold)


def simhash_col(text: Column, bits: int = 64) -> Column:
    """64-bit SimHash of the token multiset, as a JVM-side expression.

    Each token votes sign(bit) on every bit of its xxhash64; the fingerprint
    takes the majority per bit.  aggregate() keeps it whole-stage-codegen.
    """
    tokens = F.split(F.lower(F.trim(text)), r"\s+")
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    # shift amounts must be literals; unroll the bit axis in the plan.
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[F.shiftright(h, i).bitwiseAND(F.lit(1)) for i in range(bits)]
            ),
            lambda c, bit: c + F.when(bit == 1, 1).otherwise(-1),
        ),
    )
    fingerprint = F.lit(0).cast("long")
    for i in range(bits):
        # signed-long wraparound for the top bit
        weight = (1 << i) if i < 63 else -(1 << 63)
        fingerprint = fingerprint.bitwiseOR(
            F.when(F.element_at(counts, i + 1) > 0, F.lit(weight).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
    return fingerprint


def simhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """SimHash near-dup: band 64-bit fingerprints into ``chunks`` 16-bit
    pieces (pigeonhole: Hamming<=3 pairs share >=1 of 4 chunks), bucket-join
    on (chunk_idx, chunk_value), verify with bit_count(xor)."""
    fp = df.select(
        F.col(id_col), simhash_col(F.col(text_col)).alias("simhash")
    )
    width = 64 // chunks
    mask = (1 << width) - 1
    # shift amounts must be plan-time literals -> unroll the chunk axis
    chunked = fp.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.shiftright(F.col("simhash"), i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk_val"),
                    )
                    for i in range(chunks)
                ]
            )
        ).alias("c"),
    ).select(id_col, "simhash", "c.chunk_idx", "c.chunk_val")
    a = chunked.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"),
        "chunk_idx", "chunk_val",
    )
    b = chunked.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"),
        "chunk_idx", "chunk_val",
    )
    return (
        a.join(b, ["chunk_idx", "chunk_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
