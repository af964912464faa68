"""Streaming CDC maintenance of a plain-parquet snapshot ([EXT]-cdc,
§2.10).

The reference's storage loop upserts each request into Qdrant
incrementally (/root/reference/fegis/storage.py:194-199). The batch
analog is the catalog's `apply_changes` (MERGE semantics via one
full-outer join); this module is the *streaming* form: readStream of
change rows → foreachBatch merge into a versioned snapshot directory.

Exactly-once without a table format: each micro-batch writes a COMPLETE
new snapshot under ``snapshot=<epoch_id>`` (idempotent — replaying an
epoch after a crash overwrites the same directory, converging to the
same bytes) and then commits the epoch to the ``_commits`` marker log
(fegis_spark/commitlog.py: write-new-marker / read-max — one atomic
small-object PUT, no rename, so the protocol holds on S3-class object
stores, not just rename-atomic POSIX/HDFS; r14, replacing the r12
``_latest`` pointer file). Readers resolve the max committed epoch,
never a partial write. This is the classic
snapshot-isolation-on-object-store recipe; swap in Delta/Iceberg MERGE
when a table format is available — the fold itself (`apply_cdc_batch`)
is unchanged.

Scale: the fold is ONE full-outer join on the key per batch plus a
broadcast anti-join for deletes — identical plan shape to
`apply_changes`. Pre-bucket the snapshot by key
(operators/scale.write_bucketed) and the full-outer co-locates
shuffle-free; rewrite cost is the snapshot size, which is the honest
price of plain parquet (a table format turns it into a log append).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fegis_spark.commitlog import commit_epoch, committed_epoch


def apply_cdc_batch(
    base: DataFrame | None,
    changes: DataFrame,
    key_col: str,
    op_col: str = "op",
    seq_col: str | None = None,
) -> DataFrame:
    """Fold one change batch into a snapshot: rows with op='upsert'
    insert-or-replace by key, op='delete' removes the key.

    Precedence (the snapshot holds AT MOST ONE row per key, the
    invariant read_snapshot consumers rely on):

    - multiple upserts to one key collapse to a single winner BEFORE
      the merge. ``seq_col`` names the ordering column (a sequence
      number / commit timestamp): highest value wins, exactly MERGE's
      "latest change wins". Ties on ``seq_col`` — and the no-seq_col
      default — break by the total order of the remaining payload
      columns, so replaying an epoch always rebuilds byte-identical
      snapshots (required for the pointer-commit idempotency claim).
    - with ``seq_col``, the ordering also holds ACROSS batches: an
      upsert only replaces the base row when its seq is >= the stored
      one (ties → the arriving change wins, so reprocessing the same
      change converges), so at-least-once delivery that redelivers an
      OLD change in a LATER micro-batch cannot regress the snapshot.
      Without ``seq_col``, cross-batch order is arrival order.
    - a delete beats every upsert of the same key in the same batch
      (MERGE WHEN MATCHED THEN DELETE precedence). Deletes carry no
      seq and are NOT replay-guarded across batches — a redelivered
      stale delete removes the key; sources that can redeliver deletes
      need sequenced tombstones (a table format's MERGE has the same
      contract).
    """
    ups = changes.filter(F.col(op_col) == "upsert").drop(op_col)
    others = [c for c in ups.columns if c != key_col]
    payload = [c for c in others if c != seq_col]
    order = F.struct(
        *([F.col(seq_col)] if seq_col else []),
        *[F.col(c) for c in payload],
    )
    ups = (
        ups.groupBy(key_col)
        .agg(F.max_by(F.struct(*[F.col(c) for c in others]), order).alias("_w"))
        .select(key_col, *[F.col(f"_w.{c}").alias(c) for c in others])
    )
    dels = changes.filter(F.col(op_col) == "delete").select(key_col).distinct()
    if base is not None and seq_col is not None and seq_col not in base.columns:
        # The in-batch collapse above already required seq_col in the
        # changes schema; a base snapshot lacking it is schema drift
        # between epochs, and silently degrading to arrival-order merge
        # would drop the cross-batch replay guard (stale redeliveries
        # could regress the snapshot) with no signal to the caller.
        raise ValueError(
            f"seq_col {seq_col!r} is not a column of the base snapshot "
            f"(columns: {base.columns}); the seq-guarded merge requires "
            "it in BOTH the changes and the stored snapshot. Pass "
            "seq_col=None explicitly to opt into arrival-order merge."
        )
    if base is None:
        merged = ups
    elif seq_col is None:
        # arrival order: upsert wins over base unconditionally
        keep = base.join(ups.select(key_col), key_col, "left_anti")
        merged = keep.unionByName(ups)
    else:
        # seq-guarded merge: per key, keep whichever of (stored row,
        # arriving upsert) carries the higher seq; equal seq → the
        # arriving change (idempotent under redelivery of the winner)
        pack = lambda df: df.select(  # noqa: E731
            key_col, F.struct(*[F.col(c) for c in others]).alias("_r")
        )
        j = pack(base).withColumnRenamed("_r", "_b").join(
            pack(ups).withColumnRenamed("_r", "_u"), key_col, "full_outer"
        )
        winner = (
            F.when(F.col("_u").isNull(), F.col("_b"))
            .when(F.col("_b").isNull(), F.col("_u"))
            .when(
                F.col("_b").getField(seq_col) > F.col("_u").getField(seq_col),
                F.col("_b"),
            )
            .otherwise(F.col("_u"))
        )
        merged = j.select(key_col, winner.alias("_w")).select(
            key_col, *[F.col(f"_w.{c}").alias(c) for c in others]
        )
    # bcast-ok: CDC delete set — bounded by the arriving change
    # batch (micro-batch contract), not the accumulated corpus
    return merged.join(F.broadcast(dels), key_col, "left_anti")


def read_snapshot(spark: SparkSession, target_dir: str) -> DataFrame | None:
    """Resolve the commit log's max epoch to the committed snapshot
    (epoch ids are monotone per checkpoint, so max == latest)."""
    epoch = committed_epoch(target_dir)
    if epoch < 0:
        return None
    return spark.read.parquet(os.path.join(target_dir, f"snapshot={epoch}"))


def cdc_sink(
    target_dir: str, key_col: str, op_col: str = "op", seq_col: str | None = None
):
    """foreachBatch callable maintaining `target_dir` from a stream of
    change rows. Idempotent per epoch: replaying batch N overwrites
    snapshot=N and re-commits the marker — same final state.
    ``seq_col`` names the in-batch ordering column for conflicting
    upserts to one key (see apply_cdc_batch)."""

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        if committed_epoch(target_dir) >= epoch_id:
            # epoch already committed (the marker write is the commit
            # point) — replay is a no-op; re-merging would read and
            # overwrite the same directory.
            return
        base = read_snapshot(spark, target_dir)
        out = os.path.join(target_dir, f"snapshot={epoch_id}")
        merged = apply_cdc_batch(base, batch_df, key_col, op_col, seq_col)
        merged.write.mode("overwrite").parquet(out)
        commit_epoch(target_dir, epoch_id)  # object-store-safe commit

    return _sink
