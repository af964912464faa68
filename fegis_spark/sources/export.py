"""Sharded corpus export ([EXT], SURVEY.md §2.12): the hand-off from
the curation engine to training — bounded-size shards, optional
partition layout, parquet or jsonl.

Reference parity: fegis has no batch export (its sink is the per-call
Qdrant upsert, storage.py:194-199); this is part of the
training-pipeline surface mandated by BASELINE.json's north star.

Scale notes:
* shard size is bounded with maxRecordsPerFile — one writer task can
  emit many shards, so no repartition-to-N-files global shuffle is
  needed and AQE-coalesced input partitioning is preserved;
* partition_by columns become directory partitions (hive layout) —
  the downstream reader prunes on them for free;
* jsonl (spark's `json` source) is newline-delimited JSON, the
  interchange format most training stacks ingest directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_shards(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    max_records_per_file: int = 100_000,
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """Write `df` as bounded-size shards under `path`.

    fmt: "parquet" (columnar, default) or "jsonl" (newline-delimited
    JSON). Shards never exceed max_records_per_file rows; files land
    as part-*.{parquet,json[.gz]} under path (or partition dirs).
    """
    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"unsupported export format: {fmt!r}")
    writer = df.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if compression is not None:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "parquet":
        writer.parquet(path)
    else:
        writer.json(path)


def read_corpus(
    spark,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
):
    """Read a corpus directory written by write_shards (or any
    compatible layout). For jsonl, pass an explicit DDL schema string
    whenever one is known — schema inference is an extra full pass
    over 100 TB; an explicit schema makes the scan single-pass and
    pins column types against drifting inference."""
    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"unsupported corpus format: {fmt!r}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path) if fmt == "parquet" else reader.json(path)


def write_sorted_shards(
    df: DataFrame,
    path: str,
    order_col: str,
    num_shards: int,
    fmt: str = "parquet",
    max_records_per_file: int | None = None,
) -> None:
    """Curriculum export: globally ordered shards via RANGE
    partitioning — shard i holds strictly lower `order_col` values
    than shard i+1, and rows inside a shard are sorted. Reading files
    in shard order replays the corpus easy→hard (or by any score),
    which is what curriculum/annealing training schedules consume.

    `repartitionByRange` samples range boundaries (one extra pass over
    `order_col` only), then each of the `num_shards` writers sorts its
    slice locally — a total order across files with NO single-machine
    global sort. Rows tied on `order_col` land in an arbitrary order
    relative to each other; pass a composite/struct order column with
    a unique tiebreak if byte-exact replay across runs matters.
    """
    from pyspark.sql import functions as F

    w = (
        df.repartitionByRange(num_shards, F.col(order_col))
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
    )
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.format(fmt).save(path)


def write_webdataset_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    columns: dict[str, str],
    samples_per_shard: int = 10_000,
    num_shards: int | None = None,
) -> DataFrame:
    """WebDataset-style tar shard export: each sample's members share a
    basename inside the tar (`{key}.{ext}` per `columns` {col: ext}),
    shards are `shard-{partition:05d}-{seq:04d}.tar` capped at
    `samples_per_shard` samples — the layout streaming data loaders
    (the public webdataset convention) consume sequentially, which is
    what makes tar the standard hand-off for image/audio/interleaved
    corpora: one sequential read per shard, no per-sample seeks.

    Returns a LAZY manifest DataFrame (shard, n_samples, first_key,
    last_key) — materialize it (collect/write) to run the export. Each
    task writes its own shards (no driver funnel); with `num_shards`
    set, rows are range-partitioned by key so shard boundaries are
    deterministic and reading shards in name order replays keys in
    global order; rows always sort by key inside a task. Cell encoding:
    binary as-is, strings utf-8, anything else compact JSON. Tar bytes
    are reproducible (mtime/uid/gid zeroed, POSIX format, members per
    key in `columns` order): same input + same partitioning = byte-
    identical shards, so shard md5s double as corpus checksums. Shards
    appear via write-to-temp + atomic rename, so a re-run or retried
    task never leaves a truncated tar behind; executors must share the
    target filesystem (object-store mount or DFS at cluster scale).
    """
    import io
    import json
    import os
    import tarfile

    import pandas as pd
    from pyspark import TaskContext
    from pyspark.sql import functions as F

    os.makedirs(path, exist_ok=True)
    part = (
        df.repartitionByRange(num_shards, F.col(key_col)) if num_shards else df
    ).sortWithinPartitions(key_col)
    part = part.select(key_col, *columns)
    colmap = dict(columns)
    out_cols = ["shard", "n_samples", "first_key", "last_key"]

    def encode(v) -> bytes:
        if isinstance(v, (bytes, bytearray)):
            return bytes(v)
        if isinstance(v, str):
            return v.encode("utf-8")
        return json.dumps(v, sort_keys=True, default=str).encode("utf-8")

    def run(batches):
        pid = TaskContext.get().partitionId()
        rows, seq, n, first, last, tar, tmp = [], 0, 0, None, None, None, None

        def close():
            nonlocal tar, tmp, n, first, last, seq
            if tar is None:
                return
            tar.close()
            final = os.path.join(path, f"shard-{pid:05d}-{seq:04d}.tar")
            os.replace(tmp, final)
            rows.append((final, n, first, last))
            tar, tmp, n, first, last = None, None, 0, None, None
            seq += 1

        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                rec = rec._asdict()
                key = str(rec[key_col])
                if tar is None:
                    tmp = os.path.join(path, f".shard-{pid:05d}-{seq:04d}.tmp")
                    tar = tarfile.open(tmp, "w", format=tarfile.USTAR_FORMAT)
                    first = key
                for col, ext in colmap.items():
                    data = encode(rec[col])
                    info = tarfile.TarInfo(f"{key}.{ext}")
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tar.addfile(info, io.BytesIO(data))
                last = key
                n += 1
                if n >= samples_per_shard:
                    close()
        close()
        yield pd.DataFrame(rows, columns=out_cols)

    return part.mapInPandas(
        run, schema="shard string, n_samples bigint, first_key string, last_key string"
    )


def read_webdataset_shards(
    spark,
    path: str,
    columns: dict[str, str],
    key_name: str = "key",
) -> DataFrame:
    """Inverse of write_webdataset_shards: tar shards → one row per
    sample with the key plus one BINARY column per `columns` {col: ext}
    member (decode/typing stays with the caller — text columns are
    utf-8 bytes, exactly what the writer emitted; a reader that guessed
    types would silently corrupt binary members whose bytes happen to
    be valid JSON).

    Scale shape: ONE task per shard (the tar is a sequential stream —
    intra-shard parallelism would re-read the whole file per split),
    shards distributed across executors via a repartitioned path list;
    each member is read once, in tar order, grouped by basename. This
    is the ingest half of the standard image/interleaved-corpus
    hand-off, so downstream ops (media_features, image_metadata) can
    run straight off tar corpora without a parquet conversion step.
    """
    import glob as _glob
    import os
    import tarfile

    import pandas as pd

    shard_paths = sorted(
        p
        for p in _glob.glob(os.path.join(path, "*.tar"))
        if not os.path.basename(p).startswith(".")
    )
    pdf = spark.createDataFrame([(p,) for p in shard_paths], "shard string")
    pdf = pdf.repartition(max(len(shard_paths), 1), "shard")
    ext_to_col = {ext: col for col, ext in columns.items()}
    out_cols = [key_name, *columns]

    def run(batches):
        for b in batches:
            for shard in b["shard"]:
                rows: dict[str, dict] = {}
                order: list[str] = []
                with tarfile.open(shard, "r") as tar:
                    for info in tar:
                        if not info.isfile():
                            continue
                        base, _, ext = info.name.rpartition(".")
                        col = ext_to_col.get(ext)
                        if col is None:
                            continue
                        if base not in rows:
                            rows[base] = {key_name: base}
                            order.append(base)
                        member = tar.extractfile(info)
                        rows[base][col] = member.read() if member else b""
                yield pd.DataFrame(
                    [[rows[k].get(c) for c in out_cols] for k in order],
                    columns=out_cols,
                )

    schema = f"{key_name} string, " + ", ".join(f"{c} binary" for c in columns)
    return pdf.mapInPandas(run, schema)
