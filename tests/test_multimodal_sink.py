"""Multimodal plumbing + Qdrant-sink pure-function tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from fegis_spark.operators.multimodal import (
    MEDIA_SCHEMA,
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
        # a JPEG payload: header-parseable but pixel decode needs PIL
        Codec(fake=False).decode_image(b"\xff\xd8\xff\xd9")


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


def test_decode_ppm_roundtrip():
    import numpy as np

    from fegis_spark.operators.multimodal import decode_ppm, make_ppm

    img = decode_ppm(make_ppm(6, 4, seed=3))
    assert img.shape == (4, 6, 3) and img.dtype == np.uint8
    # spot-check the gradient formula at two pixels
    assert tuple(img[0, 0]) == ((0 * 7 + 3) % 256, (0 * 11 + 3) % 256, (0 + 0 + 3) % 256)
    assert tuple(img[3, 5]) == ((5 * 7 + 3) % 256, (3 * 11 + 3) % 256, (5 + 3 + 3) % 256)


def test_media_features_on_real_ppm_bytes(spark):
    import numpy as np

    from fegis_spark.operators.multimodal import (
        FEATURE_DIM,
        decode_ppm,
        make_ppm,
        media_features,
    )

    rows = [
        (i, "image", make_ppm(8, 8, seed=i),
         {"mime": "image/x-portable-pixmap", "width": 8, "height": 8,
          "duration_ms": None})
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r.features for r in media_features(df).collect()}
    # distributed result == local reference computation on the same bytes
    for i in range(5):
        img = decode_ppm(make_ppm(8, 8, seed=i)).astype(np.float64).ravel()
        want = [c.mean() for c in np.array_split(img, FEATURE_DIM)]
        assert np.allclose(got[i], want, atol=1e-5)


def test_audio_stats_on_real_wav_bytes(spark):
    import numpy as np

    from fegis_spark.operators.multimodal import audio_stats, decode_wav, make_wav

    rows = [
        (i, "audio", make_wav(1600 * (i + 1), sample_rate=8000, seed=i),
         {"mime": "audio/wav", "width": None, "height": None,
          "duration_ms": 200 * (i + 1)})
        for i in range(3)
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in audio_stats(df).collect()}
    for i in range(3):
        samples, sr = decode_wav(make_wav(1600 * (i + 1), sample_rate=8000, seed=i))
        r = got[i]
        assert (r.sample_rate, r.n_channels, r.n_samples) == (8000, 1, 1600 * (i + 1))
        assert abs(r.duration_ms - 200.0 * (i + 1)) < 1e-9
        x = samples.astype(np.float64)
        assert abs(r.rms - float(np.sqrt((x * x).mean()))) < 1e-9
        assert r.peak == int(np.abs(samples).max())


def test_stereo_wav_channels():
    from fegis_spark.operators.multimodal import decode_wav, make_wav

    samples, sr = decode_wav(make_wav(100, sample_rate=44100, n_channels=2))
    assert samples.shape == (100, 2) and sr == 44100


class TestResize:
    def test_resize_nearest_identity_and_downscale(self):
        import numpy as np

        from fegis_spark.operators.multimodal import (
            decode_ppm,
            encode_ppm,
            make_ppm,
            resize_nearest,
        )

        img = decode_ppm(make_ppm(8, 6, seed=3))
        assert np.array_equal(resize_nearest(img, 8, 6), img)  # identity
        half = resize_nearest(img, 4, 3)
        assert half.shape == (3, 4, 3)
        # pixel-center rule: out[0,0] = src[floor(0.5*6/3), floor(0.5*8/4)]
        assert np.array_equal(half[0, 0], img[1, 1])
        # round-trip through the encoder
        assert np.array_equal(decode_ppm(encode_ppm(half)), half)

    def test_resize_images_spark_plumbing(self, spark):
        from fegis_spark.operators.multimodal import (
            decode_ppm,
            resize_images,
            synthetic_media,
        )

        df = synthetic_media(spark, n=8, kind="image")
        out = resize_images(df, 4, 4).collect()
        assert len(out) == 8
        for r in out:
            img = decode_ppm(bytes(r.payload))
            assert img.shape == (4, 4, 3)
            assert (r.width, r.height) == (4, 4)
            assert r.src_width > 0 and r.src_height > 0


class TestBMP:
    def test_decode_bmp_roundtrip_and_ppm_parity(self):
        import numpy as np

        from fegis_spark.operators.multimodal import (
            decode_bmp,
            decode_ppm,
            encode_bmp,
            make_bmp,
            make_ppm,
        )

        # width=6 → stride 18 is already 4k+2, forces 2 pad bytes per row
        img = decode_bmp(make_bmp(6, 4, seed=3))
        assert img.shape == (4, 6, 3) and img.dtype == np.uint8
        # make_bmp and make_ppm draw the identical gradient
        assert np.array_equal(img, decode_ppm(make_ppm(6, 4, seed=3)))
        # encode→decode round-trip is lossless
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)

    def test_decode_bmp_top_down_raster(self):
        import struct

        import numpy as np

        from fegis_spark.operators.multimodal import decode_bmp, make_bmp

        data = bytearray(make_bmp(5, 3, seed=1))
        bottom_up = decode_bmp(bytes(data))
        (h,) = struct.unpack_from("<i", data, 22)
        struct.pack_into("<i", data, 22, -h)  # flip to top-down
        top_down = decode_bmp(bytes(data))
        assert np.array_equal(top_down, bottom_up[::-1])

    def test_decode_bmp_rejects_unsupported(self):
        import pytest

        from fegis_spark.operators.multimodal import decode_bmp

        with pytest.raises(ValueError):
            decode_bmp(b"PNG....")
        with pytest.raises(ValueError):
            # 24bpp claim but RLE compression flag
            import struct

            from fegis_spark.operators.multimodal import make_bmp

            data = bytearray(make_bmp(4, 4))
            struct.pack_into("<I", data, 30, 1)
            decode_bmp(bytes(data))

    def test_resize_images_accepts_bmp_payloads(self, spark):
        import numpy as np

        from fegis_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            decode_bmp,
            decode_ppm,
            make_bmp,
            resize_images,
        )

        rows = [
            (i, "image", make_bmp(8, 8, seed=i),
             {"mime": "image/bmp", "width": 8, "height": 8, "duration_ms": None})
            for i in range(6)
        ]
        df = spark.createDataFrame(rows, MEDIA_SCHEMA)
        out = {r.media_id: r for r in resize_images(df, 4, 4).collect()}
        assert len(out) == 6
        for i in range(6):
            # codec dispatches on magic bytes; output re-encodes as PPM
            img = decode_ppm(bytes(out[i].payload))
            assert img.shape == (4, 4, 3)
            src = decode_bmp(make_bmp(8, 8, seed=i))
            assert np.array_equal(img[0, 0], src[1, 1])


class TestBMPProperty:
    def test_bmp_roundtrip_property(self):
        """encode_bmp∘decode_bmp is identity for arbitrary RGB arrays —
        any width (every stride-padding class), any height."""
        import numpy as np
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from fegis_spark.operators.multimodal import decode_bmp, encode_bmp

        @settings(max_examples=50, deadline=None)
        @given(
            w=st.integers(min_value=1, max_value=21),
            h=st.integers(min_value=1, max_value=13),
            seed=st.integers(min_value=0, max_value=2**31 - 1),
        )
        def check(w, h, seed):
            rng = np.random.default_rng(seed)
            arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            assert np.array_equal(decode_bmp(encode_bmp(arr)), arr)

        check()


def test_decode_pgm_roundtrip_and_dispatch():
    import numpy as np

    from fegis_spark.operators.multimodal import Codec, decode_pgm, make_pgm

    gray = decode_pgm(make_pgm(6, 4, seed=5))
    assert gray.shape == (4, 6) and gray.dtype == np.uint8
    assert gray[0, 0] == (0 * 7 + 0 * 11 + 5) % 256
    assert gray[3, 5] == (5 * 7 + 3 * 11 + 5) % 256
    # codec dispatch promotes grayscale to the uniform (h, w, 3) shape
    img = Codec().decode_image(make_pgm(6, 4, seed=5))
    assert img.shape == (4, 6, 3)
    assert (img[..., 0] == gray).all() and (img[..., 2] == gray).all()


class TestJpegHeader:
    """JPEG SOF-marker metadata extraction (r8 verdict item 4) — a
    header parse, not a pixel decode (libjpeg is env-blocked; pixel
    decode remains the documented SWAP POINT)."""

    def test_parse_constructed_baseline(self):
        from fegis_spark.operators.multimodal import make_jpeg, parse_jpeg_header

        j = parse_jpeg_header(make_jpeg(640, 480, n_components=3, seed=7))
        assert j == {
            "precision": 8, "height": 480, "width": 640,
            "n_components": 3, "progressive": False,
        }

    def test_parse_progressive_and_grayscale(self):
        from fegis_spark.operators.multimodal import make_jpeg, parse_jpeg_header

        j = parse_jpeg_header(make_jpeg(31, 17, n_components=1, progressive=True))
        assert j["progressive"] is True
        assert (j["width"], j["height"], j["n_components"]) == (31, 17, 1)

    def test_parse_skips_appn_com_and_fill_bytes(self):
        from fegis_spark.operators.multimodal import parse_jpeg_header

        # SOI, APP1 (Exif-ish), fill FF, COM, SOF0 12x34x3, EOI
        app1 = b"Exif\x00\x00" + b"\x00" * 10
        com = b"hello"
        sof = bytes([8]) + (34).to_bytes(2, "big") + (12).to_bytes(2, "big") + bytes(
            [3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]
        )
        data = (
            b"\xff\xd8"
            + b"\xff\xe1" + (len(app1) + 2).to_bytes(2, "big") + app1
            + b"\xff"  # fill byte before next marker
            + b"\xff\xfe" + (len(com) + 2).to_bytes(2, "big") + com
            + b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
            + b"\xff\xd9"
        )
        j = parse_jpeg_header(data)
        assert (j["width"], j["height"], j["n_components"]) == (12, 34, 3)

    def test_parse_rejects_non_jpeg_and_headerless(self):
        import pytest

        from fegis_spark.operators.multimodal import parse_jpeg_header

        with pytest.raises(ValueError, match="SOI"):
            parse_jpeg_header(b"BM not a jpeg")
        # valid SOI but EOI before any SOF
        with pytest.raises(ValueError, match="no SOF"):
            parse_jpeg_header(b"\xff\xd8\xff\xd9")

    def test_image_header_dispatch_all_formats(self):
        from fegis_spark.operators.multimodal import (
            image_header,
            make_bmp,
            make_jpeg,
            make_pgm,
            make_ppm,
        )

        assert image_header(make_ppm(16, 12)) == ("ppm", 16, 12, 3)
        assert image_header(make_pgm(9, 7)) == ("pgm", 9, 7, 1)
        assert image_header(make_bmp(16, 12)) == ("bmp", 16, 12, 3)
        assert image_header(make_jpeg(16, 12)) == ("jpeg", 16, 12, 3)
        assert image_header(make_jpeg(16, 12, progressive=True)) == (
            "jpeg-progressive", 16, 12, 3,
        )

    def test_image_metadata_spark_plumbing(self, spark):
        from fegis_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            image_metadata,
            make_jpeg,
            make_ppm,
        )

        rows = [
            (0, "image", make_ppm(16, 12), None),
            (1, "image", make_jpeg(640, 480), None),
            (2, "image", None, None),  # null payload passes through
            (3, "image", b"\x00junk not an image", None),  # junk tolerated
            (4, "image", b"\xff\xd8\xff", None),  # truncated JPEG tolerated
        ]
        df = spark.createDataFrame(rows, MEDIA_SCHEMA)
        got = {r["media_id"]: r.asDict() for r in image_metadata(df).collect()}
        assert got[0]["format"] == "ppm" and got[0]["width"] == 16
        assert got[1]["format"] == "jpeg" and got[1]["width"] == 640
        assert got[1]["payload_bytes"] == len(make_jpeg(640, 480))
        assert got[2]["format"] is None and got[2]["width"] is None
        # advisor r9: one junk payload must not fail the triage job —
        # it routes as format='unknown' with its true byte size
        assert got[3]["format"] == "unknown" and got[3]["width"] is None
        assert got[3]["payload_bytes"] == len(b"\x00junk not an image")
        assert got[4]["format"] == "unknown" and got[4]["payload_bytes"] == 3


class TestPngGifHeaders:
    def test_png_header_roundtrip_and_color_types(self):
        from fegis_spark.operators.multimodal import make_png, parse_png_header

        p = parse_png_header(make_png(640, 480, color_type=2))
        assert (p["width"], p["height"], p["n_components"], p["bit_depth"]) == (
            640, 480, 3, 8,
        )
        assert parse_png_header(make_png(8, 8, color_type=6))["n_components"] == 4
        assert parse_png_header(make_png(8, 8, color_type=0))["n_components"] == 1
        assert parse_png_header(make_png(8, 8, color_type=3))["n_components"] == 1

    def test_png_rejects_bad_signature_and_missing_ihdr(self):
        import pytest

        from fegis_spark.operators.multimodal import parse_png_header

        with pytest.raises(ValueError, match="signature"):
            parse_png_header(b"not a png")
        with pytest.raises(ValueError, match="IHDR"):
            parse_png_header(b"\x89PNG\r\n\x1a\n" + b"\x00" * 21)

    def test_gif_header_roundtrip(self):
        import pytest

        from fegis_spark.operators.multimodal import make_gif, parse_gif_header

        g = parse_gif_header(make_gif(320, 200))
        assert (g["width"], g["height"], g["version"]) == (320, 200, "89a")
        with pytest.raises(ValueError, match="GIF"):
            parse_gif_header(b"JFIF....")

    def test_image_header_dispatch_png_gif(self):
        from fegis_spark.operators.multimodal import image_header, make_gif, make_png

        assert image_header(make_png(31, 17, color_type=6)) == ("png", 31, 17, 4)
        assert image_header(make_gif(31, 17)) == ("gif", 31, 17, 1)


class TestPngPixelDecode:
    """r10: real PNG pixel decode (zlib inflate + scanline unfilter)."""

    def test_roundtrip_rgb_and_gray(self):
        import numpy as np

        from fegis_spark.operators.multimodal import decode_png, encode_png

        y, x = np.mgrid[0:12, 0:16]
        rgb = np.stack([(x * 7) % 256, (y * 11) % 256, (x + y) % 256], -1).astype(
            np.uint8
        )
        assert (decode_png(encode_png(rgb)) == rgb).all()
        gray = ((x * 31 + y * 5) % 256).astype(np.uint8)
        got = decode_png(encode_png(gray))
        assert got.shape == (12, 16) and (got == gray).all()

    def test_unfilters_all_five_filter_types(self):
        """Hand-filter scanlines with Sub/Up/Average/Paeth (our encoder
        only emits None) and check decode_png inverts each per spec."""
        import struct
        import zlib

        import numpy as np

        from fegis_spark.operators.multimodal import _png_chunk, decode_png

        def build(img, types):
            h, w, ch = img.shape
            raw = bytearray()
            prev = np.zeros(w * ch, np.int64)
            for yy in range(h):
                cur = img[yy].reshape(-1).astype(np.int64)
                t = types[yy % len(types)]
                raw.append(t)
                for xx in range(w * ch):
                    a = int(cur[xx - ch]) if xx >= ch else 0
                    b = int(prev[xx])
                    c = int(prev[xx - ch]) if xx >= ch else 0
                    if t == 0:
                        pred = 0
                    elif t == 1:
                        pred = a
                    elif t == 2:
                        pred = b
                    elif t == 3:
                        pred = (a + b) // 2
                    else:
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    raw.append((int(cur[xx]) - pred) & 0xFF)
                prev = cur
            ihdr = struct.pack(">II", w, h) + bytes([8, 2, 0, 0, 0])
            return (
                b"\x89PNG\r\n\x1a\n"
                + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
                + _png_chunk(b"IEND", b"")
            )

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
        for types in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
            assert (decode_png(build(img, types)) == img).all(), types

    def test_rejects_unsupported_variants(self):
        import pytest

        from fegis_spark.operators.multimodal import decode_png, make_png

        # RGBA decodes for real since r11 (raw channels)
        assert decode_png(make_png(8, 8, color_type=6)).shape == (8, 8, 4)
        # palette (color 3) decodes for real since r10: PLTE lookup
        pimg = decode_png(make_png(8, 8, color_type=3, seed=2))
        assert pimg.shape == (8, 8, 3)
        # header-only fixture of a SUPPORTED color type: IDAT guard
        from fegis_spark.operators.multimodal import _png_chunk
        import struct, zlib
        ihdr = struct.pack(">II", 4, 4) + bytes([8, 2, 0, 0, 0])
        headeronly = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
        with pytest.raises(ValueError, match="IDAT"):
            decode_png(headeronly)

    def test_adam7_interlace_roundtrip_and_parity(self):
        """Adam7 (r11): the 7-pass grid partitions every pixel exactly
        once, round-trips losslessly at awkward sizes (passes that are
        empty in one dimension), and an interlaced payload decodes to
        the same pixels as its sequential twin."""
        import numpy as np

        from fegis_spark.operators.multimodal import _ADAM7, decode_png, encode_png

        for hh, ww in [(12, 16), (1, 1), (7, 5), (9, 3), (2, 2), (3, 9)]:
            cnt = np.zeros((hh, ww), dtype=int)
            for x0, y0, dx, dy in _ADAM7:
                cnt[y0::dy, x0::dx] += 1
            assert (cnt == 1).all(), (hh, ww)
        rng = np.random.default_rng(11)
        for shape in [(12, 16, 3), (7, 5), (9, 3, 4), (1, 1, 2)]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            got = decode_png(encode_png(img, interlace=True))
            assert (got.reshape(shape) == img).all(), shape
        img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
        assert (
            decode_png(encode_png(img, interlace=True))
            == decode_png(encode_png(img))
        ).all()

    def test_16bit_roundtrip_and_exact_reduction(self):
        """16-bit PNG (r11): big-endian uint16 samples round-trip at
        both interlace modes; Codec reduces to 8-bit via the exact
        round(v/257) map (65535 = 257·255, no .5 midpoints)."""
        import numpy as np

        from fegis_spark.operators.multimodal import (
            Codec,
            decode_png,
            encode_png,
            make_png,
            parse_png_header,
        )

        rng = np.random.default_rng(13)
        for shape in [(6, 5), (6, 5, 3), (4, 3, 4), (2, 9, 2)]:
            img = rng.integers(0, 65536, shape).astype(np.uint16)
            for il in (False, True):
                got = decode_png(encode_png(img, interlace=il))
                assert got.dtype == np.uint16
                assert (got.reshape(shape) == img).all(), (shape, il)
        p16 = make_png(16, 12, color_type=0, seed=5, bit_depth=16)
        assert parse_png_header(p16)["bit_depth"] == 16
        raw16 = decode_png(p16)
        out = Codec(fake=False).decode_image(p16)
        assert out.dtype == np.uint8 and out.shape == (12, 16, 3)
        want = ((raw16.astype(np.int64) + 128) // 257).astype(np.uint8)
        assert (out[:, :, 0] == want).all()
        # spot-check the map is the exactly-rounded v/257
        for v in (0, 128, 129, 257, 65535, 32896):
            assert (v + 128) // 257 == round(v / 257)

    def test_low_bit_depth_decode(self):
        """1/2/4-bit PNG (r11): MSB-first sub-byte unpack, exact
        integer gray scaling (255/(2^d−1) ∈ {255, 85, 17}), low-bit
        palette lookup, both interlace modes, odd widths (padded row
        tails)."""
        import numpy as np

        from fegis_spark.operators.multimodal import (
            decode_png,
            encode_png_lowbit,
            make_png,
        )

        rng = np.random.default_rng(29)
        for d in (1, 2, 4):
            n = 1 << d
            scale = 255 // (n - 1)
            for hh, ww in [(12, 16), (7, 5), (1, 1), (3, 11)]:
                s = rng.integers(0, n, (hh, ww)).astype(np.uint8)
                pal = rng.integers(0, 256, (n, 3)).astype(np.uint8)
                for il in (False, True):
                    gray = decode_png(encode_png_lowbit(s, 0, d, interlace=il))
                    assert (gray == s * scale).all(), (d, hh, ww, il)
                    rgb = decode_png(
                        encode_png_lowbit(s, 3, d, interlace=il, plte=pal)
                    )
                    assert (rgb == pal[s]).all(), (d, hh, ww, il)
        # make_png low-bit fixture rows decode through the same path
        assert decode_png(
            make_png(16, 12, color_type=3, seed=7, bit_depth=4, interlace=True)
        ).shape == (12, 16, 3)
        g1 = decode_png(make_png(16, 12, color_type=0, seed=7, bit_depth=1))
        assert set(np.unique(g1)) <= {0, 255}

    def test_gif_interlace_and_local_palette(self):
        """GIF (r11): 4-pass de-interlace is pixel-identical to the
        sequential twin at every height parity; a local color table
        overrides/replaces the global one (fixture shifts the local
        palette so misrouting is caught)."""
        import numpy as np

        from fegis_spark.operators.multimodal import Codec, decode_gif, make_gif

        for hh in (1, 2, 3, 5, 8, 9, 12):
            a = decode_gif(make_gif(7, hh, seed=3))
            b = decode_gif(make_gif(7, hh, seed=3, interlace=True))
            assert (a == b).all(), hh
        loc = decode_gif(make_gif(16, 12, seed=9, local_palette=True))
        both = decode_gif(
            make_gif(16, 12, seed=9, local_palette=True, interlace=True)
        )
        assert (loc == both).all()
        assert not (loc == decode_gif(make_gif(16, 12, seed=9))).all()
        out = Codec(fake=False).decode_image(
            make_gif(16, 12, seed=1, interlace=True, local_palette=True)
        )
        assert out.shape == (12, 16, 3)
        # a frame with neither global nor local table is rejected
        import pytest

        raw = bytearray(make_gif(8, 8, seed=0, local_palette=True))
        assert raw[13] == 0x2C
        raw[22] &= ~0x80  # clear the local-table flag
        with pytest.raises(ValueError, match="color table"):
            decode_gif(bytes(raw))

    def test_16bit_palette_rejected(self):
        import pytest

        from fegis_spark.operators.multimodal import decode_png, make_png

        bad = bytearray(make_png(8, 8, color_type=3, seed=2))
        bad[24] = 16  # IHDR bit-depth byte
        with pytest.raises(ValueError, match="spec-illegal"):
            decode_png(bytes(bad))

    def test_codec_dispatch_and_gray_uniformization(self):
        import numpy as np

        from fegis_spark.operators.multimodal import Codec, decode_png, make_png

        codec = Codec()
        rgb = codec.decode_image(make_png(10, 6, color_type=2, seed=3))
        assert rgb.shape == (6, 10, 3)
        assert (rgb == decode_png(make_png(10, 6, color_type=2, seed=3))).all()
        gray3 = codec.decode_image(make_png(10, 6, color_type=0, seed=3))
        assert gray3.shape == (6, 10, 3)
        assert (gray3[:, :, 0] == gray3[:, :, 2]).all()

    def test_resize_images_accepts_png_payloads(self, spark):
        from fegis_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            decode_ppm,
            make_png,
            resize_images,
        )

        rows = [(0, "image", make_png(16, 12, color_type=2, seed=9), None)]
        df = spark.createDataFrame(rows, MEDIA_SCHEMA)
        out = resize_images(df, 8, 8).collect()[0]
        assert (out["src_width"], out["src_height"]) == (16, 12)
        assert decode_ppm(bytes(out["payload"])).shape == (8, 8, 3)


class TestPngProperty:
    def test_roundtrip_property(self):
        """Derandomized hypothesis roundtrip: arbitrary uint8 content
        at arbitrary small shapes, gray and RGB, survives
        encode_png -> decode_png bit-exactly."""
        import numpy as np
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from fegis_spark.operators.multimodal import decode_png, encode_png

        @settings(derandomize=True, max_examples=12, deadline=None)
        @given(
            w=st.integers(1, 23),
            h=st.integers(1, 17),
            seed=st.integers(0, 2**31 - 1),
            gray=st.booleans(),
        )
        def check(w, h, seed, gray):
            rng = np.random.default_rng(seed)
            shape = (h, w) if gray else (h, w, 3)
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            out = decode_png(encode_png(img))
            assert out.shape == img.shape and (out == img).all()

        check()


class TestJunkToleranceR11:
    """Advisor r10 fixes: truncated/out-of-profile payloads must not
    crash the triage job (image_header normalizes struct.error and
    IndexError to ValueError) and Codec.decode_image's PNG/GIF branches
    must mirror the JPEG fall-through to the fake path."""

    def test_image_header_truncated_bmp_raises_valueerror(self):
        import pytest

        from fegis_spark.operators.multimodal import image_header

        # b'BM' + <26 bytes: struct.unpack_from at offset 18 would raise
        # struct.error pre-fix; contract says ValueError only
        with pytest.raises(ValueError):
            image_header(b"BM" + b"\x00" * 10)

    def test_image_metadata_truncated_bmp_routes_as_unknown(self, spark):
        from fegis_spark.operators.multimodal import image_metadata

        payload = b"BM" + b"\x00" * 10
        df = spark.createDataFrame(
            [(1, "image", payload, None)],
            "media_id long, kind string, payload binary, meta string",
        )
        got = image_metadata(df).collect()[0].asDict()
        assert got["format"] == "unknown"
        assert got["width"] is None
        assert got["payload_bytes"] == len(payload)

    def test_codec_fake_tolerates_out_of_profile_png_gif(self):
        import struct
        import zlib

        from fegis_spark.operators.multimodal import Codec

        codec = Codec(fake=True)
        # RGBA PNG header (color type 6) with a fake IDAT: out of profile
        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 6, 0, 0, 0)
        def chunk(tag, body):
            return (
                len(body).to_bytes(4, "big") + tag + body
                + zlib.crc32(tag + body).to_bytes(4, "big")
            )
        rgba_png = (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 80))
            + chunk(b"IEND", b"")
        )
        img = codec.decode_image(rgba_png)
        assert img.shape == (8, 8, 3)  # deterministic fake, not a crash

        # truncated GIF (magic only) → IndexError pre-fix
        img2 = codec.decode_image(b"GIF89a")
        assert img2.shape == (8, 8, 3)

    def test_codec_strict_raises_documented_swap_point(self):
        import pytest

        from fegis_spark.operators.multimodal import Codec

        with pytest.raises(NotImplementedError):
            Codec(fake=False).decode_image(b"GIF89a")

    def test_decode_jpeg_standalone_markers(self):
        import numpy as np
        import pytest

        from fegis_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        payload = encode_jpeg(img)
        # inject TEM (standalone, zero-length) right after SOI: a correct
        # marker walk skips it; the old walk misparsed it as a length
        with_tem = payload[:2] + b"\xff\x01" + payload[2:]
        out = decode_jpeg(with_tem)
        assert out.shape == (8, 8)
        # RSTn must reject with the documented restart error, not a
        # misalignment crash
        with_rst = payload[:2] + b"\xff\xd0" + payload[2:]
        with pytest.raises(ValueError, match="restart"):
            decode_jpeg(with_rst)


class TestPngAlphaR11:
    """r11: PNG color types 4 (gray+alpha) and 6 (RGBA) — raw-channel
    round-trips through decode_png and exact integer white-composite
    in Codec.decode_image."""

    def test_rgba_roundtrip_raw_channels(self):
        import numpy as np

        from fegis_spark.operators.multimodal import decode_png, encode_png

        rng = np.random.default_rng(3)
        rgba = rng.integers(0, 256, (9, 13, 4), dtype=np.uint8)
        out = decode_png(encode_png(rgba))
        assert out.shape == (9, 13, 4) and (out == rgba).all()
        ga = rng.integers(0, 256, (7, 5, 2), dtype=np.uint8)
        out2 = decode_png(encode_png(ga))
        assert out2.shape == (7, 5, 2) and (out2 == ga).all()

    def test_codec_composites_over_white(self):
        import numpy as np

        from fegis_spark.operators.multimodal import Codec, encode_png

        codec = Codec(fake=False)
        # opaque alpha: composite == foreground
        rgb = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
        rgba = np.concatenate([rgb, np.full((4, 6, 1), 255, np.uint8)], axis=2)
        assert (codec.decode_image(encode_png(rgba)) == rgb).all()
        # fully transparent: composite == white
        rgba0 = np.concatenate([rgb, np.zeros((4, 6, 1), np.uint8)], axis=2)
        assert (codec.decode_image(encode_png(rgba0)) == 255).all()
        # half alpha on black: round((0*128 + 255*127)/255) = 127
        black = np.zeros((2, 2, 3), np.uint8)
        half = np.concatenate([black, np.full((2, 2, 1), 128, np.uint8)], axis=2)
        assert (codec.decode_image(encode_png(half)) == 127).all()
        # gray+alpha uniformizes to (h, w, 3)
        ga = np.stack(
            [np.full((3, 3), 10, np.uint8), np.full((3, 3), 255, np.uint8)], axis=-1
        )
        out = codec.decode_image(encode_png(ga))
        assert out.shape == (3, 3, 3) and (out == 10).all()

    def test_make_png_alpha_fixtures_decode(self):
        from fegis_spark.operators.multimodal import (
            Codec,
            image_header,
            make_png,
        )

        for ct, nch in ((4, 2), (6, 4)):
            payload = make_png(16, 12, color_type=ct, seed=5)
            fmt, w, h, nc = image_header(payload)
            assert (fmt, w, h, nc) == ("png", 16, 12, nch)
            img = Codec(fake=False).decode_image(payload)
            assert img.shape == (12, 16, 3)

    def test_sixteen_bit_decodes_and_illegal_combo_rejects(self):
        """r11 flip of the old rejection pin: 16-bit RGBA now decodes
        for real (uint16 raw channels); spec-ILLEGAL (color, depth)
        combinations stay loud ValueError SWAP POINTs."""
        import struct
        import zlib

        import numpy as np
        import pytest

        from fegis_spark.operators.multimodal import decode_png, encode_png

        rgba16 = (np.arange(4 * 4 * 4).reshape(4, 4, 4) * 999 % 65536).astype(
            np.uint16
        )
        got = decode_png(encode_png(rgba16))
        assert got.dtype == np.uint16 and (got == rgba16).all()

        def chunk(tag, body):
            return (
                len(body).to_bytes(4, "big") + tag + body
                + zlib.crc32(tag + body).to_bytes(4, "big")
            )

        # 4-bit truecolor is illegal (spec 11.2.2: color 2 allows 8/16)
        ihdr = struct.pack(">IIBBBBB", 4, 4, 4, 2, 0, 0, 0)
        payload = (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 200)) + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="bit depth"):
            decode_png(payload)
        # depth 3 is illegal everywhere
        ihdr = struct.pack(">IIBBBBB", 4, 4, 3, 0, 0, 0, 0)
        payload = (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 20)) + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="bit depth"):
            decode_png(payload)

    def test_property_alpha_roundtrip(self):
        import numpy as np
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from fegis_spark.operators.multimodal import decode_png, encode_png

        @settings(max_examples=15, deadline=None, derandomize=True)
        @given(
            w=st.integers(1, 19),
            h=st.integers(1, 17),
            seed=st.integers(0, 2**31 - 1),
            nch=st.sampled_from([2, 4]),
        )
        def check(w, h, seed, nch):
            rng = np.random.default_rng(seed)
            img = rng.integers(0, 256, (h, w, nch), dtype=np.uint8)
            out = decode_png(encode_png(img))
            assert out.shape == img.shape and (out == img).all()

        check()
