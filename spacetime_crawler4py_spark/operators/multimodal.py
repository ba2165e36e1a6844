"""Multimodal column plumbing.

Media are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched stages over
``mapInPandas``. The image/audio libraries are not in this container, so
the *decode kernels* are stubbed (deterministic fakes or
NotImplementedError), while everything Spark-side — schema, batch shape,
partitioning, UDF signatures — is real and tested (per the build brief).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "attach_binary_payload",
    "media_metadata",
    "decode_features_stage",
    "frame_sample_stage",
    "FEATURES_SCHEMA",
]


def attach_binary_payload(df: DataFrame, text_col: str) -> DataFrame:
    """Derive a deterministic opaque binary column (stand-in for image/
    audio bytes) + content-type metadata."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_type", F.lit("application/octet-stream")
    )


def media_metadata(df: DataFrame, id_col: str, payload_col: str = "payload") -> DataFrame:
    """Typed metadata over an opaque binary column — JVM-native, no decode."""
    return df.select(
        F.col(id_col).alias("id"),
        F.length(F.col(payload_col)).alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("content_md5"),
        F.substring(F.hex(F.col(payload_col)), 1, 8).alias("magic_hex"),
    )


FEATURES_SCHEMA = "id bigint, n_bytes int, feature array<float>, decoder string"


def decode_features_stage(feature_dim: int = 8, real_decode: bool = False):
    """mapInPandas stage: binary payload -> fixed-dim feature vector.

    real_decode=True is the production path (image decode + model
    embedding) and is intentionally unimplemented in this container; the
    deterministic fake derives features from the md5 digest so tests can
    assert exact values and batch shapes. Normalization is /256 (dyadic):
    byte/256 is exactly representable in float32, so downstream integer
    quantizations (floor(x*1e6)) are bit-identical across engines.
    feature_dim must be <= 16 (md5 digest length).
    """
    if feature_dim > 16:
        raise ValueError("stub decoder derives features from md5: feature_dim <= 16")

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg, absent here; "
                    "run with real_decode=False for the deterministic stub"
                )
            ids, sizes, feats = [], [], []
            for row in pdf.itertuples(index=False):
                payload = bytes(row.payload) if row.payload is not None else b""
                digest = hashlib.md5(payload).digest()[:feature_dim]
                feats.append(
                    (np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 256.0)
                    .tolist()
                )
                ids.append(row.id)
                sizes.append(len(payload))
            yield pd.DataFrame(
                {
                    "id": ids,
                    "n_bytes": sizes,
                    "feature": feats,
                    "decoder": "stub-md5",
                }
            )

    return stage


def frame_sample_stage(every_n_bytes: int = 64, max_frames: int = 4):
    """mapInPandas stage: binary 'video' -> sampled 'frames' (offset +
    frame checksum). Stub samples byte windows; the real path would call
    ffmpeg. Output: (id, frame_idx, offset, frame_md5)."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                payload = bytes(row.payload) if row.payload is not None else b""
                for i in range(max_frames):
                    off = i * every_n_bytes
                    if off >= len(payload):
                        break
                    window = payload[off : off + every_n_bytes]
                    recs.append(
                        (
                            row.id,
                            i,
                            off,
                            hashlib.md5(window).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                recs, columns=["id", "frame_idx", "offset", "frame_md5"]
            )

    return stage
