"""Scale helpers ([EXT]): skew-safe aggregation, bucketed layouts.

These encode the 100 TB playbook as reusable operators:

* ``salted_count_agg`` — two-phase aggregation for skewed keys: phase 1
  shuffles on (key, salt) spreading a hot key over `salt_buckets`
  reducers, phase 2 merges the partials on the key alone (now tiny).
  Equivalent results to a plain groupBy, proven in tests.
* ``write_bucketed`` / ``read_bucketed`` — bucketBy table layout so
  later equi-joins/aggregations on the bucket key are co-located
  (no shuffle; Catalyst sees the bucketing spec).
* AQE note: spark.sql.adaptive.skewJoin handles skewed *joins* at
  runtime; salting remains the tool for skewed *aggregations* with
  high-cardinality combiners (e.g. collect_list/exact distinct).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_count_agg(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe count + decimal-exact sum per key.

    Phase 1: groupBy(keys + salt) — partial rows spread evenly even if
    one key holds most of the data. Phase 2: merge partials per key.
    Both phases are map-side-combinable; total shuffle bytes ≈ the
    plain plan's, but no reducer receives a whole hot key.
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("__salt")
    phase1 = (
        df.select(*keys, F.col(value_col), salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.count("*").alias("__n"),
            F.sum(F.col(value_col).cast("decimal(38,6)")).alias("__s"),
        )
    )
    return (
        phase1.groupBy(*keys)
        .agg(
            F.sum("__n").alias("n"),
            F.sum("__s").cast("double").alias("total"),
        )
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist with a bucketed layout: joins/aggs on `bucket_col`
    against another table bucketed the same way skip the shuffle."""
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
