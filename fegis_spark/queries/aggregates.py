"""Aggregation catalog queries (SURVEY.md §2.4 + [EXT] corpus stats).

Hash-stability policy: per-row arithmetic stays in DOUBLE (IEEE ops are
bit-identical across engines), but the SUM runs through DECIMAL(38,6)
— exact and commutative, so partition/visit order can't change the
result — then casts back to DOUBLE. avg = decimal-sum / count, divided
in double on both engines. Never multiply two decimals (DuckDB widens
past 38 and silently falls back to DOUBLE; Spark clips scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from fegis_spark.catalog import register
from fegis_spark.model import load_table

DEC = "decimal(38,6)"


def dsum(col) -> Column:
    """Order-independent sum of a double column/expr, emitted as double."""
    col = F.col(col) if isinstance(col, str) else col
    return F.sum(col.cast(DEC)).cast("double")


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    covers=("A3", "§2.4-agg", "F3"),
    bench=True,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → filter (pushed to parquet) → partial agg →
    single shuffle on the 2 grouping cols → final agg. The canonical
    100 TB-safe aggregation: map-side combine shrinks shuffle volume to
    |groups| per partition."""
    li = load_table(spark, sf_dir, "lineitem")
    d1 = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    d2 = d1 * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(d1).alias("sum_disc_price"),
            dsum(d2).alias("sum_charge"),
            (dsum("l_quantity") / F.count("*")).alias("avg_qty"),
            (dsum("l_discount") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "corpus_stats",
    oracle="""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT doc_id) AS n_distinct_docs,
           CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS DOUBLE) AS total_chars,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           CAST(CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_chars
    FROM documents
    GROUP BY lang, source
    """,
    covers=("§2.4-agg", "[EXT]-text-stats"),
)
def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] per-(lang, source) corpus statistics for a training-data
    pipeline: counts, distincts, char totals."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("doc_id").alias("n_distinct_docs"),
        dsum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        (dsum("n_chars") / F.count("*")).cast("double").alias("avg_chars"),
    )


@register(
    "events_rollup",
    oracle="""
    SELECT event_type, CAST(ts AS DATE) AS day,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY ROLLUP(event_type, CAST(ts AS DATE))
    """,
    covers=("§2.4-rollup",),
)
def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy (type → type×day → grand total) — one shuffle,
    grouping-set expansion is map-side."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("day", F.col("ts").cast("date"))
        .rollup("event_type", "day")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
    )


@register(
    "events_cube",
    oracle="""
    SELECT event_type, (CAST(json_extract_string(props, '$.k') AS BIGINT) % 3) AS k_mod,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY CUBE(event_type, (CAST(json_extract_string(props, '$.k') AS BIGINT) % 3))
    """,
    covers=("§2.4-cube", "T12"),
)
def events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over event_type × a JSON-extracted key (T12:
    get_json_object on the props column, reference-analog of frame
    field access)."""
    ev = load_table(spark, sf_dir, "events")
    kmod = (F.get_json_object("props", "$.k").cast("bigint") % 3).alias("k_mod")
    return (
        ev.select("event_type", kmod, "value")
        .cube("event_type", "k_mod")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
    )


@register(
    "approx_distinct_parts",
    oracle=None,  # approx_count_distinct (HLL++) is engine-specific — rows-only check
    covers=("§2.4-approx",),
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per returnflag — the
    scale-path distinct; exact countDistinct shown alongside for the
    sf-correctness eyeball. HLL sketches differ across engines → no SQL
    oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
