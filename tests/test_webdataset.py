"""WebDataset tar shard sink: layout, ordering, capping, determinism."""

from __future__ import annotations

import hashlib
import json
import tarfile
from pathlib import Path

from fegis_spark.sources.export import write_webdataset_shards


def _rows():
    return [
        (f"{i:06d}", f"text body {i}", bytes([i % 256, 255 - i % 256]), i % 10)
        for i in range(23)
    ]


SCHEMA = "key string, text string, payload binary, label int"
COLUMNS = {"text": "txt", "payload": "bin", "label": "cls"}


def _export(spark, out: Path):
    df = spark.createDataFrame(_rows(), SCHEMA)
    manifest = write_webdataset_shards(
        df, str(out), "key", COLUMNS, samples_per_shard=5, num_shards=2
    ).collect()
    return sorted((r["shard"], r["n_samples"], r["first_key"], r["last_key"]) for r in manifest)


def test_webdataset_roundtrip(spark, tmp_path):
    out = tmp_path / "wds"
    manifest = _export(spark, out)

    # every sample landed exactly once, shards capped at 5
    assert sum(m[1] for m in manifest) == 23
    assert all(m[1] <= 5 for m in manifest)
    assert {Path(m[0]).name for m in manifest} == {
        p.name for p in out.glob("shard-*.tar")
    }
    assert not list(out.glob("*.tmp"))

    seen = {}
    for shard, n, first, last in manifest:
        with tarfile.open(shard) as tar:
            members = tar.getmembers()
            assert len(members) == n * len(COLUMNS)
            # members of one sample are adjacent and in columns order
            for i in range(0, len(members), len(COLUMNS)):
                group = members[i : i + len(COLUMNS)]
                key = group[0].name.split(".")[0]
                assert [m.name for m in group] == [
                    f"{key}.{ext}" for ext in COLUMNS.values()
                ]
                seen[key] = {
                    ext: tar.extractfile(f"{key}.{ext}").read()
                    for ext in COLUMNS.values()
                }
            keys = [m.name.split(".")[0] for m in members[:: len(COLUMNS)]]
            assert keys == sorted(keys) and keys[0] == first and keys[-1] == last

    assert len(seen) == 23
    for key, text, payload, label in _rows():
        assert seen[key]["txt"] == text.encode()
        assert seen[key]["bin"] == payload
        assert json.loads(seen[key]["cls"]) == label

    # range partitioning by key => shard name order replays global key order
    flat = [k for m in manifest for k in (m[2], m[3])]
    assert flat == sorted(flat)


def test_webdataset_deterministic_bytes(spark, tmp_path):
    sums = []
    for run in ("a", "b"):
        out = tmp_path / run
        _export(spark, out)
        sums.append(
            {
                p.name: hashlib.md5(p.read_bytes()).hexdigest()
                for p in sorted(out.glob("*.tar"))
            }
        )
    assert sums[0] == sums[1] and len(sums[0]) > 0


def test_read_webdataset_roundtrip(spark, tmp_path):
    """write → read round-trip: every sample comes back with its key
    and byte-exact members; reading shards in name order replays keys
    in global order when the export was range-partitioned."""
    from fegis_spark.sources.export import read_webdataset_shards

    out = tmp_path / "wds_rt"
    _export(spark, out)
    back = read_webdataset_shards(spark, str(out), COLUMNS)
    got = {r["key"]: r.asDict() for r in back.collect()}
    want = {k: (t, p, c) for k, t, p, c in _rows()}
    assert set(got) == set(want)
    for k, (t, p, c) in want.items():
        r = got[k]
        assert bytes(r["text"]) == t.encode("utf-8")
        assert bytes(r["payload"]) == p
        assert bytes(r["label"]) == str(c).encode()  # JSON-encoded int
    # one task per shard: partition count matches shard count
    import glob

    n_shards = len(glob.glob(str(out / "*.tar")))
    assert back.rdd.getNumPartitions() == n_shards


def test_read_webdataset_media_pipeline(spark, tmp_path):
    """Tar corpora feed the media operators directly: export real
    image payloads, read them back, decode via the real codecs."""
    from fegis_spark.operators.multimodal import Codec, make_jpeg_real, make_png
    from fegis_spark.sources.export import (
        read_webdataset_shards,
        write_webdataset_shards,
    )

    rows = [
        (f"{i:04d}", make_jpeg_real(16, 12, seed=i) if i % 2 else make_png(16, 12, seed=i))
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "key string, img binary")
    write_webdataset_shards(
        df, str(tmp_path / "imgs"), "key", {"img": "jpg"}, samples_per_shard=3
    ).collect()
    back = read_webdataset_shards(spark, str(tmp_path / "imgs"), {"img": "jpg"})
    codec = Codec()
    decoded = {
        r["key"]: codec.decode_image(bytes(r["img"])) for r in back.collect()
    }
    assert len(decoded) == 6
    assert all(v.shape == (12, 16, 3) for v in decoded.values())
