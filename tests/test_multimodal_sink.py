"""Multimodal plumbing + Qdrant-sink pure-function tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from fegis_spark.operators.multimodal import (
    Codec,
    media_features,
    synthetic_media,
    video_frame_sample,
)
from fegis_spark.sources.qdrant_sink import PAYLOAD_INDEXES, batched, row_to_point


def test_media_features_schema_and_determinism(spark):
    media = synthetic_media(spark, n=16)
    out = media_features(media)
    assert "payload" not in out.columns and "features" in out.columns
    rows1 = {r.media_id: r.features for r in out.collect()}
    rows2 = {r.media_id: r.features for r in media_features(synthetic_media(spark, 16)).collect()}
    assert rows1 == rows2
    assert all(len(v) == 16 for v in rows1.values())


def test_video_frame_sample_explodes(spark):
    media = synthetic_media(spark, n=8, kind="video")
    out = video_frame_sample(media, n_frames=3)
    assert out.count() == 24
    idx = {r.frame_idx for r in out.collect()}
    assert idx == {0, 1, 2}


def test_codec_real_path_is_marked():
    import pytest

    with pytest.raises(NotImplementedError):
        Codec(fake=False).decode_image(b"\x89PNG")


def test_row_to_point():
    r = Row(
        memory_id="m-1",
        title="t",
        tool="ToolX",
        session_id="s",
        sequence_order=2,
        timestamp=dt.datetime(2024, 1, 1, 12, 0, 0),
        preceding_memory_id=None,
        embedding=[0.1, 0.2],
    )
    p = row_to_point(r)
    assert p["id"] == "m-1"
    assert p["vector"] == [0.1, 0.2]
    assert p["payload"]["timestamp"] == "2024-01-01T12:00:00"
    assert "preceding_memory_id" not in p["payload"]  # nulls dropped
    assert "embedding" not in p["payload"]


def test_batched_bounds():
    rows = [Row(memory_id=str(i), embedding=None) for i in range(10)]
    sizes = [len(b) for b in batched(rows, size=4)]
    assert sizes == [4, 4, 2]


def test_payload_index_parity_with_reference():
    # reference storage.py:73-86: 2 TEXT, 8 KEYWORD, 1 INTEGER, 1 DATETIME
    kinds = sorted(PAYLOAD_INDEXES.values())
    assert kinds.count("text") == 2
    assert kinds.count("keyword") == 8
    assert kinds.count("integer") == 1
    assert kinds.count("datetime") == 1
