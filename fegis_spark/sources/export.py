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
