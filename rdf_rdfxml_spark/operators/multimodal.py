"""Multimodal column plumbing (training-data pipeline ops).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; the Spark-side plumbing — schema, partition-friendly batch shape,
Arrow-vectorized UDF signatures — is real and tested, while the actual
codec work is stubbed: the container ships no image/audio libraries, so
``decode_image`` raises ``NotImplementedError`` unless ``fake=True``
selects the deterministic fake decoder (stable pseudo-pixels derived from
the payload hash) used by tests and benchmarks.

At 100 TB scale the pattern is the one that matters: ``mapInPandas`` over
Arrow batches keeps payload bytes zero-copy end-to-end, metadata columns
stay JVM-side for pruning/filter pushdown, and per-item failures land in an
``error`` column instead of failing tasks (same isolation contract as the
XML grammar stage).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType, IntegerType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("kind", StringType(), False),        # image|audio|video
    StructField("mime", StringType(), True),
    StructField("payload", BinaryType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("feature", StringType(), True),      # hex-encoded vector
    StructField("n_bytes", IntegerType(), True),
    StructField("error", StringType(), True),
])


def decode_image(payload: bytes, *, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 uint8 array.

    STUB: real decoding needs an image codec library not present in this
    container. ``fake=True`` returns deterministic pseudo-pixels (seeded by
    the payload sha256) with the right dtype/shape so downstream plumbing
    is exercised end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs unavailable in this environment; "
            "pass fake=True for the deterministic test decoder")
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def extract_features(media: DataFrame, *, fake_decode: bool = True,
                     payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over a media table: decode (stub) →
    8x8 mean-pool fingerprint, hex-encoded. Per-item failures → ``error``.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, feats, sizes, errors = [], [], [], []
            payloads = pdf[payload_col].values
            mids = pdf["media_id"].values
            for i in range(len(pdf)):
                payload = payloads[i] or b""
                ids.append(mids[i])
                sizes.append(len(payload))
                try:
                    img = decode_image(bytes(payload), fake=fake_decode)
                    feats.append(img.mean(axis=2).astype(np.uint8)
                                 .tobytes().hex())
                    errors.append(None)
                except Exception as e:  # per-item isolation
                    feats.append(None)
                    errors.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame({"media_id": ids, "feature": feats,
                                "n_bytes": sizes, "error": errors})

    pruned = media.select("media_id", payload_col)
    return pruned.mapInPandas(batches, schema=FEATURE_SCHEMA)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (no external data)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media:{i}".encode()).digest() * 4
        rows.append(("m%04d" % i, "image", "image/fake", bytearray(payload),
                     8, 8))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
