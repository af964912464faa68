"""Multimodal catalog queries ([EXT] §2.12): the binary-media pipeline
(decode → resize / feature-extract / stats) exercised end-to-end
through the driver contract.

Registered rows-only (oracle=None): WAV/PPM/BMP decoding is genuinely
non-SQL-expressible, so DuckDB cannot twin these — the per-codec
numerics are instead pinned exactly in tests/test_multimodal_sink.py
against pure-python references. Payloads are generated deterministically
(seeded gradients / integer sine ramps) on the driver — a handful of KB
— then every decode/transform runs distributed through mapInPandas,
which is precisely the shape the operator has at 100 TB (bytes never
leave the Arrow batch; only fixed-width stats flow downstream).

Determinism: payload bytes are pure functions of media_id, every
derived stat is rounded to 6 dp, and outputs are small (≤ hundreds of
rows) with total-order sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fegis_spark.catalog import register


def _media_df(spark: SparkSession, sf_dir: str, kind: str):
    """Deterministic media table sized by scale factor (sf0.001 → 64
    rows, sf0.1 → 512): payload bytes derive only from media_id."""
    from fegis_spark.operators.multimodal import MEDIA_SCHEMA, make_bmp, make_ppm, make_wav

    n = 512 if sf_dir.rstrip("/").endswith("0.1") else 64
    rows = []
    for i in range(n):
        if kind == "image":
            # alternate codecs so the magic-byte dispatch is exercised
            payload = make_ppm(16, 12, seed=i) if i % 2 == 0 else make_bmp(16, 12, seed=i)
            mime = "image/x-portable-pixmap" if i % 2 == 0 else "image/bmp"
            meta = {"mime": mime, "width": 16, "height": 12, "duration_ms": None}
        else:
            payload = make_wav(400 + 10 * (i % 7), sample_rate=8000, n_channels=1 + i % 2, seed=i)
            meta = {"mime": "audio/wav", "width": None, "height": None, "duration_ms": None}
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


@register(
    "media_audio_stats",
    oracle=None,  # WAV decode is not SQL-expressible; numerics pinned in tests
    covers=("[EXT]-multimodal",),
)
def media_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] audio analysis over binary payloads: PCM16 WAV → per-clip
    (sample_rate, channels, frames, duration, rms, peak) via one
    mapInPandas pass, then a per-channel-count rollup. Bytes are
    dropped inside the Arrow batch; only fixed-width stats shuffle."""
    from fegis_spark.operators.multimodal import audio_stats

    stats = audio_stats(_media_df(spark, sf_dir, "audio"))
    return (
        stats.groupBy("n_channels")
        .agg(
            F.count("*").alias("n_clips"),
            F.sum("n_samples").alias("total_frames"),
            F.round(F.avg("duration_ms"), 6).alias("avg_duration_ms"),
            F.round(F.avg("rms"), 6).alias("avg_rms"),
            F.max("peak").alias("max_peak"),
        )
        .orderBy("n_channels")
    )


@register(
    "media_image_features",
    oracle=None,  # PPM/BMP decode is not SQL-expressible; pinned in tests
    covers=("[EXT]-multimodal",),
)
def media_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] the pre-training image normalization path: decode (PPM and
    BMP via magic-byte dispatch) → nearest-neighbor resize to 8×8 →
    16-dim mean-pool features, all inside mapInPandas. Output is one
    row per image with its feature head — deterministic because the
    gradient payloads are pure functions of media_id."""
    from fegis_spark.operators.multimodal import media_features, resize_images

    imgs = _media_df(spark, sf_dir, "image")
    resized = resize_images(imgs, 8, 8)
    feats = media_features(resized.select("media_id", "payload"))
    return feats.select(
        "media_id",
        F.round(F.element_at("features", 1), 6).alias("f0"),
        F.round(F.element_at("features", 16), 6).alias("f15"),
        F.round(
            F.aggregate("features", F.lit(0.0), lambda a, x: a + x) / F.size("features"),
            6,
        ).alias("feat_mean"),
    ).orderBy("media_id")


@register(
    "media_frame_sample",
    oracle=None,  # frame sampling runs the stub codec (deterministic fake)
    covers=("[EXT]-multimodal",),
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] video frame sampling plumbing: payload → n per-frame rows
    exploded inside the Arrow batch (no driver round-trip), then a
    rollup proving the expected fan-out and distinct frame bytes."""
    from fegis_spark.operators.multimodal import video_frame_sample

    vids = _media_df(spark, sf_dir, "image")  # payload bytes are opaque to the sampler
    frames = video_frame_sample(vids, n_frames=3)
    return (
        frames.groupBy("media_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.countDistinct("frame_payload").alias("n_distinct_frames"),
        )
        .orderBy("media_id")
    )
