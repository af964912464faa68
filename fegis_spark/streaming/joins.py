"""Stream-stream interval join (SURVEY.md §2.10 [EXT]).

The canonical Structured Streaming two-stream correlation: match each
event on stream A to events on stream B for the same key within a
bounded event-time interval. Both sides carry watermarks and the join
condition bounds event-time distance, so Spark can expire buffered
rows — state is O(rate × interval), not O(stream length).

At 100 TB-rate ingestion this is the attribution / conversion-pairing
primitive (view→click, impression→purchase); the batch twin below is
the identical join expressed over static frames, which the tests use
as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    interval_minutes: int = 5,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Join left events to right events with the same key where the
    right event lands in (left.ts, left.ts + interval]. Both inputs
    must be streaming DataFrames with TIMESTAMP ``ts_col``; output
    columns: key, l_event_id, l_ts, r_event_id, r_ts.

    The two-sided watermark + both-sided time bound is what lets the
    join prune state: rows older than watermark + interval are dropped
    from the buffer (Structured Streaming's stream-stream inner-join
    contract).
    """
    l = (
        left.withWatermark(ts_col, watermark)
        .select(
            F.col(key).alias("l_key"),
            F.col("event_id").alias("l_event_id"),
            F.col(ts_col).alias("l_ts"),
        )
    )
    r = (
        right.withWatermark(ts_col, watermark)
        .select(
            F.col(key).alias("r_key"),
            F.col("event_id").alias("r_event_id"),
            F.col(ts_col).alias("r_ts"),
        )
    )
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {interval_minutes} MINUTES"))
    )
    return l.join(r, cond).select(
        F.col("l_key").alias(key), "l_event_id", "l_ts", "r_event_id", "r_ts"
    )


def interval_join_batch(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    interval_minutes: int = 5,
) -> DataFrame:
    """Static twin of interval_join_stream — same condition, same
    output schema; the streaming result must be a subset-equal match
    (exact equality once every watermark has passed)."""
    l = left.select(
        F.col(key).alias("l_key"),
        F.col("event_id").alias("l_event_id"),
        F.col(ts_col).alias("l_ts"),
    )
    r = right.select(
        F.col(key).alias("r_key"),
        F.col("event_id").alias("r_event_id"),
        F.col(ts_col).alias("r_ts"),
    )
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {interval_minutes} MINUTES"))
    )
    return l.join(r, cond).select(
        F.col("l_key").alias(key), "l_event_id", "l_ts", "r_event_id", "r_ts"
    )


def enrich_stream_static(
    stream: DataFrame,
    dim: DataFrame,
    keys: tuple[str, str],
    dim_cols: tuple[str, ...],
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join (§2.10 [EXT]): decorate a stream
    with dimension attributes (user → account tier, doc → source
    domain). The static side is re-read per micro-batch by contract
    (Structured Streaming re-plans the batch side every trigger, so a
    slowly-changing dim picks up updates), and is broadcast explicitly:
    no stream-side shuffle, no state store at all — the ONLY stateless
    join shape in the streaming family, which is why it scales to any
    stream rate.

    keys = (stream_key, dim_key); dim is pruned to key + dim_cols
    before the broadcast so only the needed columns ship.
    """
    s_key, d_key = keys
    pruned = dim.select(F.col(d_key).alias(s_key), *dim_cols)
    # bcast-ok: dimension side — bounded by the stream-static
    # contract documented above (key + pruned attribute columns)
    return stream.join(F.broadcast(pruned), s_key, how)
