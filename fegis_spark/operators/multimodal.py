"""Multimodal column plumbing ([EXT]): image/audio/video as opaque
binary columns with typed metadata, processed by Arrow-batched
mapInPandas operators.

The Spark-side machinery here is REAL and tested — schemas, batch
shapes, partition sizing, UDF signatures. The codec step is the only
stub: image/audio libraries are not in this container, so decoding is
isolated behind `Codec` with a deterministic fake for tests and a
NotImplementedError for the real path (clearly marked SWAP POINT).

Scale posture: binary payloads dominate row size → keep
`spark.sql.files.maxPartitionBytes` low (128 MB default is fine),
never collect, and carry derived features forward instead of
re-reading payload bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical multimodal record: opaque payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


@dataclass
class Codec:
    """Isolates the non-Spark decode dependency. `fake=True` gives a
    deterministic stand-in (hash-derived pixels/features) so the whole
    distributed pipeline is testable in this container."""

    fake: bool = True

    def decode_image(self, payload: bytes) -> np.ndarray:
        if self.fake:
            h = hashlib.sha256(payload or b"").digest()
            side = 8
            arr = np.frombuffer((h * (side * side * 3 // len(h) + 1))[: side * side * 3],
                                dtype=np.uint8)
            return arr.reshape(side, side, 3)
        # SWAP POINT: real implementation = PIL.Image.open(BytesIO(payload))
        raise NotImplementedError("image decoding requires PIL/cv2 — not in container")

    def extract_features(self, img: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
        flat = img.astype(np.float64).ravel()
        chunks = np.array_split(flat, dim)
        return np.array([c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float32)

    def frame_sample(self, payload: bytes, n_frames: int) -> list[bytes]:
        if self.fake:
            return [hashlib.sha256((payload or b"") + bytes([i])).digest() for i in range(n_frames)]
        raise NotImplementedError("video decoding requires ffmpeg — not in container")


def media_features(df: DataFrame, codec: Codec | None = None, dim: int = FEATURE_DIM) -> DataFrame:
    """mapInPandas feature extraction: payload → fixed-dim float vector.

    Output schema = input minus payload plus features array (payload is
    dropped as early as possible — at 100 TB you never carry bytes past
    the operator that needs them)."""
    codec = codec or Codec()

    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != "payload"]
        + [T.StructField("features", T.ArrayType(T.FloatType()), True)]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                list(codec.extract_features(codec.decode_image(p), dim))
                if p is not None
                else None
                for p in pdf["payload"]
            ]
            yield pdf.drop(columns=["payload"]).assign(features=feats)

    return df.mapInPandas(op, out_schema)


def video_frame_sample(df: DataFrame, n_frames: int = 3, codec: Codec | None = None) -> DataFrame:
    """mapInPandas frame sampling: one output row per sampled frame
    (media_id, frame_idx, frame_payload). Row explosion happens inside
    the Arrow batch — no driver round trip."""
    codec = codec or Codec()
    out_schema = "media_id long, frame_idx int, frame_payload binary"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i, fr in enumerate(codec.frame_sample(payload, n_frames)):
                    rows.append((mid, i, fr))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_payload"])

    return df.select("media_id", "payload").mapInPandas(op, out_schema)


def synthetic_media(spark, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic fake media table for tests: payload = seeded bytes."""
    rows = [
        (
            i,
            kind,
            hashlib.sha256(f"media-{i}".encode()).digest() * 4,
            {"mime": f"{kind}/fake", "width": 8, "height": 8, "duration_ms": None},
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
