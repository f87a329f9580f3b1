"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode step needs codec libraries that are NOT in this container
(re-probed 2026-08-17: PIL/cv2/imageio/soundfile/av all absent), so
decoding is stubbed behind an import-try (``NotImplementedError`` with a
clear message) and a deterministic fake feature extractor stands in for
tests — but the Spark-side plumbing is real and exercised: schema, Arrow
batch shape, ``mapInPandas`` signature, partition-size control.  On a
host with Pillow installed, ``_real_decode`` becomes a genuine image
decode (grayscale 4x4 thumbnail features); audio/video still need
torchaudio/pyav and keep raising.

Schema convention::

    media(media_id string, kind string, payload binary,
          meta struct<mime string, width int, height int,
                      duration_ms int, sample_rate int>)
"""
from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("n_bytes", IntegerType()),
    ]
)

FEATURE_DIM = 16


def _real_decode(payload: bytes, kind: str) -> np.ndarray:
    """Decode + featurize one payload.  Image path is real behind the
    Pillow import-try (absent in this container — re-probed 2026-08-17);
    audio/video would go through torchaudio/pyav and stay stubbed."""
    try:
        import io

        from PIL import Image
    except ImportError:
        raise NotImplementedError(
            "media decode requires an image/audio codec library "
            "(PIL/torchaudio/pyav); not available in this environment — "
            "use deterministic_fake_features for testing the plumbing"
        )
    if kind != "image":
        raise NotImplementedError(
            "only image decode is implemented; audio/video need "
            "torchaudio/pyav"
        )
    img = Image.open(io.BytesIO(payload)).convert("L").resize((4, 4))
    return np.asarray(img, dtype=np.float32).reshape(FEATURE_DIM) / 255.0


def deterministic_fake_features(payload: bytes) -> np.ndarray:
    """Seeded stand-in for the decode+embed step: features are a pure
    function of the payload bytes (sha256-expanded), so tests are stable."""
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def extract_features(media: DataFrame, use_real_decode: bool = False) -> DataFrame:
    """mapInPandas over the binary column; one Arrow batch per call.

    The batch shape is the real production shape (binary payloads ride the
    Arrow stream); only the innermost decode is faked.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                if use_real_decode:
                    feats.append(_real_decode(payload, kind))
                else:
                    feats.append(deterministic_fake_features(payload))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224,
    use_real_decode: bool = False,
) -> DataFrame:
    """Image-resize plumbing over ``mapInPandas`` — binary in, binary out.

    A real implementation decodes with PIL and re-encodes at
    (width, height); that library is absent here (see ``_real_decode``),
    so the stand-in emits a deterministic payload derived from
    (source bytes, target dims) — stable for tests, same Arrow batch
    shape, schema, and partition behavior as production."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = pdf[pdf["kind"] == "image"]
            payloads = []
            for p in imgs["payload"]:
                if use_real_decode:
                    _real_decode(p, "image")
                payloads.append(
                    hashlib.sha256(
                        (p or b"") + f"{width}x{height}".encode()
                    ).digest()
                )
            yield pd.DataFrame(
                {
                    "media_id": imgs["media_id"],
                    "width": width,
                    "height": height,
                    "payload": payloads,
                }
            )

    return media.mapInPandas(
        run, schema="media_id string, width int, height int, payload binary"
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: computes the frame-timestamp plan
    JVM-side (sequence over duration); the actual frame grab is the stubbed
    decode.  Output: media_id, frame_ts_ms."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    import random

    rng = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.getrandbits(8) for _ in range(rng.randrange(64, 256)))
        rows.append(
            (
                f"m{i:06d}",
                kind,
                payload,
                (
                    f"{kind}/fake",
                    640 if kind == "image" else None,
                    480 if kind == "image" else None,
                    5000 if kind == "video" else None,
                    16000 if kind == "audio" else None,
                ),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
