"""Structured-streaming tests: the streaming sessionization/windows
must agree with their batch twins on complete data (driven by the
parquet file source + memory sink, processAllAvailable)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fegis_spark.model import load_table
from fegis_spark.streaming.sessionize import (
    session_stats_batch,
    sessionize_stream,
    tumbling_counts_stream,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream(spark, tmp_path_factory):
    import shutil

    batch = load_table(spark, SF_DIR, "events")
    # the file stream source wants a directory — stage the single file
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-0.parquet")
    return (
        spark.readStream.schema(
            "event_id long, ts long, user_id long, event_type string, value double, props string"
        )
        .parquet(str(d)),
        batch,
    )


def _normalize_stream_events(sdf):
    # watermarks require TIMESTAMP (not NTZ); identical instants under
    # the UTC session timezone
    return sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def test_streaming_sessionization_matches_batch(spark, events_stream):
    sdf, batch = events_stream
    agg = sessionize_stream(_normalize_stream_events(sdf), gap_minutes=30)
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql(
        "SELECT user_id, session_start, session_end, n_events FROM sess_out"
    )
    # session_window's end = last event + gap; shift the batch twin's
    # max(ts) end by the gap to compare like with like
    want = session_stats_batch(batch, gap_minutes=30).select(
        "user_id",
        "session_start",
        (F.col("session_end").cast("timestamp") + F.expr("INTERVAL 30 MINUTES")).alias(
            "session_end"
        ),
        "n_events",
    )
    # session_window closes sessions only below the watermark; with
    # processAllAvailable the final watermark passes max(ts) minus delay,
    # so late sessions at the tail may be withheld — compare the common
    # prefix: every emitted session must exactly match a batch session.
    got_rows = {tuple(r) for r in got.collect()}
    want_rows = {tuple(r) for r in want.collect()}
    assert got_rows, "stream emitted nothing"
    assert got_rows <= want_rows
    # and coverage is essentially complete
    assert len(got_rows) >= len(want_rows) * 0.9


def test_tumbling_counts_match_batch(spark, events_stream):
    sdf, batch = events_stream
    agg = tumbling_counts_stream(_normalize_stream_events(sdf), window_size="6 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.w_start, r.event_type): (r.n, round(r.total_value, 6))
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    want = {
        (r.w_start, r.event_type): (r.n, round(r.total_value, 6))
        for r in batch.groupBy(F.window("ts", "6 hours"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("w_start"),
            "event_type",
            "n",
            "total_value",
        )
        .collect()
    }
    assert got
    for k, v in got.items():
        assert want[k] == v


def test_stateful_sequence_numbering(spark, events_stream):
    from fegis_spark.streaming.sessionize import assign_sequence_stream

    sdf, batch = events_stream
    seq = assign_sequence_stream(_normalize_stream_events(sdf))
    q = (
        seq.writeStream.format("memory")
        .queryName("seq_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.user_id, r.event_id): r.sequence_order
        for r in spark.sql("SELECT * FROM seq_out").collect()
    }
    # must equal the batch window numbering (same ts+event_id order)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want = {
        (r.user_id, r.event_id): r.sequence_order
        for r in batch.withColumn("sequence_order", F.row_number().over(w)).collect()
    }
    assert got == want


def test_streaming_dedup_matches_batch_distinct(spark, events_stream):
    from fegis_spark.streaming.dedup import dedup_stream

    sdf, batch = events_stream
    dd = dedup_stream(_normalize_stream_events(sdf), "props", "ts", delay="10 minutes")
    q = (
        dd.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT count(*) AS n FROM dedup_sink").collect()[0].n
    from fegis_spark.operators.dedup import normalize_text as nt
    from pyspark.sql import functions as FF

    exp = batch.select(FF.md5(nt(FF.col("props"))).alias("h")).distinct().count()
    assert got == exp
