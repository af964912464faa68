"""Streaming CDC maintenance of a parquet snapshot (streaming/cdc.py):
readStream → foreachBatch merge, pointer-committed snapshots,
idempotent epoch replay. The streaming analog of the oracle-checked
`apply_changes` catalog query (same fold plan: one full-outer-shaped
key merge + broadcast delete anti-join)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import SparkSession

from fegis_spark.streaming.cdc import apply_cdc_batch, cdc_sink, read_snapshot


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .appName("test_cdc_stream")
        .getOrCreate()
    )
    yield s


BATCHES = [
    [(1, 1, "upsert"), (2, 1, "upsert"), (3, 1, "upsert"), (4, 1, "upsert")],
    [(3, 2, "upsert"), (2, 0, "delete"), (5, 2, "upsert")],
    [(5, 0, "delete"), (1, 3, "upsert")],
]
SCHEMA = "key long, v long, op string"
FINAL = {1: 3, 3: 2, 4: 1}


def _snapshot_dict(spark, target):
    snap = read_snapshot(spark, target)
    return {r.key: r.v for r in snap.collect()}


def test_stream_merge_matches_sequential_fold(spark, tmp_path):
    staging = str(tmp_path / "staging")
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(staging)
    # one file per batch, strictly increasing mtimes so
    # maxFilesPerTrigger=1 replays them in order
    for i, rows in enumerate(BATCHES):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{staging}/b{i}")
        time.sleep(1.1)
    sdf = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{staging}/b*")
    )
    q = (
        sdf.writeStream.foreachBatch(cdc_sink(target, "key"))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not drain in 300s"
    assert _snapshot_dict(spark, target) == FINAL
    # and it equals the batch fold applied sequentially
    base = None
    for rows in BATCHES:
        base = apply_cdc_batch(base, spark.createDataFrame(rows, SCHEMA), "key")
    assert {r.key: r.v for r in base.collect()} == FINAL


def test_epoch_replay_is_idempotent(spark, tmp_path):
    target = str(tmp_path / "target")
    sink = cdc_sink(target, "key")
    for epoch, rows in enumerate(BATCHES):
        sink(spark.createDataFrame(rows, SCHEMA), epoch)
    assert _snapshot_dict(spark, target) == FINAL

    # replay the COMMITTED last epoch: commit log already at 2 → no-op
    sink(spark.createDataFrame(BATCHES[2], SCHEMA), 2)
    assert _snapshot_dict(spark, target) == FINAL

    # crash-before-commit: snapshot=2 written but commit log rewound
    # to 1; replaying epoch 2 must rebuild snapshot=2 from snapshot=1
    # and converge to the same state
    from fegis_spark.commitlog import rollback_to

    rollback_to(target, 1)
    sink(spark.createDataFrame(BATCHES[2], SCHEMA), 2)
    assert _snapshot_dict(spark, target) == FINAL


def test_in_batch_precedence_delete_beats_upsert(spark):
    # same key upserted and deleted in one batch → delete wins
    b = spark.createDataFrame(
        [(7, 1, "upsert"), (7, 0, "delete"), (8, 1, "upsert")], SCHEMA
    )
    out = {r.key: r.v for r in apply_cdc_batch(None, b, "key").collect()}
    assert out == {8: 1}


def test_in_batch_multi_upsert_last_wins_by_seq(spark):
    """Multiple upserts to one key in ONE micro-batch — the normal CDC
    case — must collapse to a single row (key-uniqueness invariant),
    highest seq_col winning."""
    b = spark.createDataFrame(
        [
            (7, 10, 1, "upsert"),
            (7, 20, 3, "upsert"),  # winner: highest seq
            (7, 15, 2, "upsert"),
            (8, 1, 1, "upsert"),
        ],
        "key long, v long, seq long, op string",
    )
    rows = apply_cdc_batch(None, b, "key", seq_col="seq").collect()
    assert len(rows) == 2  # exactly one row per key
    out = {r.key: (r.v, r.seq) for r in rows}
    assert out == {7: (20, 3), 8: (1, 1)}
    # and it also replaces base state, not just collapses in-batch
    base = spark.createDataFrame([(7, 0, 0), (9, 9, 0)], "key long, v long, seq long")
    nxt = apply_cdc_batch(base, b, "key", seq_col="seq")
    out2 = {r.key: r.v for r in nxt.collect()}
    assert out2 == {7: 20, 8: 1, 9: 9}


def test_seq_col_missing_from_base_raises(spark):
    """seq_col present in changes but absent from the stored snapshot is
    schema drift between epochs, not a supported mode: degrading to
    arrival-order merge would silently drop the cross-batch replay
    guard. Must raise, not fall back."""
    b = spark.createDataFrame(
        [(7, 20, 3, "upsert")], "key long, v long, seq long, op string"
    )
    base = spark.createDataFrame([(7, 0)], "key long, v long")  # no seq
    with pytest.raises(ValueError, match="seq_col 'seq' is not a column"):
        apply_cdc_batch(base, b, "key", seq_col="seq")


def test_sink_plumbs_seq_col(spark, tmp_path):
    """cdc_sink(seq_col=...) must resolve conflicts inside the
    committed snapshot BOTH in-batch and across batches: a later batch
    redelivering an older change (at-least-once delivery) must not
    regress the stored row."""
    target = str(tmp_path / "target")
    sink = cdc_sink(target, "key", seq_col="seq")
    schema = "key long, v long, seq long, op string"
    sink(
        spark.createDataFrame(
            [(1, 10, 1, "upsert"), (1, 30, 3, "upsert"), (1, 20, 2, "upsert")],
            schema,
        ),
        0,
    )
    sink(
        spark.createDataFrame(
            [(1, 99, 1, "upsert"),   # stale redelivery: seq 1 < stored 3
             (2, 5, 9, "upsert")],
            schema,
        ),
        1,
    )
    sink(
        spark.createDataFrame([(1, 77, 4, "upsert")], schema), 2
    )  # genuinely newer: seq 4 > stored 3
    snap = {r.key: (r.v, r.seq) for r in read_snapshot(spark, target).collect()}
    assert snap == {1: (77, 4), 2: (5, 9)}


def test_cross_batch_equal_seq_takes_arriving_change(spark):
    """Redelivering the CURRENT winner (same seq) must converge to the
    same row, not flap — the idempotency contract under replay."""
    base = apply_cdc_batch(
        None,
        spark.createDataFrame([(1, 30, 3, "upsert")], "key long, v long, seq long, op string"),
        "key",
        seq_col="seq",
    )
    nxt = apply_cdc_batch(
        base,
        spark.createDataFrame([(1, 30, 3, "upsert")], "key long, v long, seq long, op string"),
        "key",
        seq_col="seq",
    )
    assert [(r.key, r.v, r.seq) for r in nxt.collect()] == [(1, 30, 3)]


def test_in_batch_multi_upsert_without_seq_is_deterministic(spark):
    """No seq_col → the payload total-order breaks the tie, so replays
    converge to identical snapshots (no first()/arbitrary-row pick)."""
    b = spark.createDataFrame(
        [(7, 10, "upsert"), (7, 20, "upsert"), (7, 15, "upsert")], SCHEMA
    )
    outs = {
        tuple(sorted((r.key, r.v) for r in apply_cdc_batch(None, b, "key").collect()))
        for _ in range(3)
    }
    assert outs == {((7, 20),)}  # one row, max payload, every time


def test_dedup_then_cdc_chain(spark, tmp_path):
    """Composition: streaming exact-dedup feeding the CDC snapshot
    sink — the shape of a deduplicating incremental ingest (dedup
    drops repeated content within the watermark; the sink upserts
    survivors by key). Final snapshot must hold one row per distinct
    content, first-seen payload winning."""
    import time as _t

    from pyspark.sql import functions as F

    from fegis_spark.streaming.dedup import dedup_stream

    staging = str(tmp_path / "staging")
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(staging)
    batches = [
        [(1, "hello world", "2024-01-01 00:00:00"),
         (2, "hello world", "2024-01-01 00:00:10"),   # dup content, dropped
         (3, "fresh text", "2024-01-01 00:00:20")],
        [(4, "hello  WORLD", "2024-01-01 00:01:00"),  # normalizes to dup
         (5, "brand new", "2024-01-01 00:01:10")],
    ]
    schema = "doc_id long, text string, ts string"
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).coalesce(1).write.mode("overwrite").parquet(f"{staging}/b{i}")
        _t.sleep(1.1)
    sdf = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{staging}/b*")
    )
    deduped = dedup_stream(sdf, "text", "ts").select(
        F.col("content_hash").alias("key"),
        F.col("doc_id").alias("v"),
        F.lit("upsert").alias("op"),
    )
    q = (
        deduped.writeStream.foreachBatch(cdc_sink(target, "key"))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "chain did not drain in 300s"
    snap = {r.v for r in read_snapshot(spark, target).collect()}
    assert snap == {1, 3, 5}, snap  # first-seen of each distinct content
