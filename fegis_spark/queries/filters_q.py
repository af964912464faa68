"""Filter-algebra catalog queries (SURVEY.md §2.2, F1-F13) over the
driver test tables. Each query routes through the same
plans.filters.compile_filters compiler the search strategies use, so
the driver's oracle checks exercise the production code path."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fegis_spark.catalog import register
from fegis_spark.model import load_table
from fegis_spark.plans.filters import compile_filters

# events-table field surface for the compiler (F10 mapping is identity
# here; the memories-shaped mapping is unit-tested in tests/).
EVENT_FIELDS = {"event_id", "ts", "user_id", "event_type", "value", "props"}


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@register(
    "filter_conjunction",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_type = 'click'
      AND CAST(ts AS TIMESTAMP) > TIMESTAMP '2024-01-10 00:00:00'
      AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-20 00:00:00'
      AND value BETWEEN 10 AND 90
      AND user_id IN (1, 2, 3, 5, 8, 13, 21, 34, 55, 89)
    """,
    covers=("F1", "F3", "F4", "F5", "F7", "F8"),
)
def filter_conjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 AND-composition of is/after/before/between/any_of — the
    compiled predicate lands in the parquet scan's PushedFilters."""
    pred = compile_filters(
        [
            {"field": "event_type", "operator": "is", "value": "click"},
            {"field": "ts", "operator": "after", "value": "2024-01-10T00:00:00Z"},
            {"field": "ts", "operator": "before", "value": "2024-01-20T00:00:00Z"},
            {"field": "value", "operator": "between", "value": [10, 90]},
            {"field": "user_id", "operator": "any_of", "value": [1, 2, 3, 5, 8, 13, 21, 34, 55, 89]},
        ],
        valid_fields=EVENT_FIELDS,
        timestamp_fields={"ts"},
    )
    return _events(spark, sf_dir).filter(pred).select("event_id", "user_id", "event_type", "value")


@register(
    "filter_is_not_nullsafe",
    oracle="""
    WITH chain AS (
      SELECT event_id, user_id,
             lag(event_id) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS preceding_event_id
      FROM events
    )
    SELECT event_id, user_id, preceding_event_id
    FROM chain
    WHERE preceding_event_id IS DISTINCT FROM 0
    """,
    covers=("F2",),
)
def filter_is_not_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: is_not must KEEP rows where the field is NULL (Qdrant
    MatchExcept keeps points lacking the field) — exercised on the
    lineage chain whose heads have NULL preceding ids."""
    ev = _events(spark, sf_dir)
    # grpwin-ok: user_id cardinality scales with input
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chain = ev.withColumn("preceding_event_id", F.lag("event_id").over(w))
    pred = compile_filters(
        [{"field": "preceding_event_id", "operator": "is_not", "value": 0}],
        valid_fields={"preceding_event_id"},
        timestamp_fields=set(),
    )
    return chain.filter(pred).select("event_id", "user_id", "preceding_event_id")


@register(
    "filter_contains_case_variants",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE contains(text, 'data') OR contains(text, 'Data')
    """,
    covers=("F6", "F9", "T10"),
)
def filter_contains_case_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6/F9: contains with the reference's exact case-variant OR set
    {v, v.lower(), v.capitalize()} — for 'Data' that's {Data, data}."""
    docs = load_table(spark, sf_dir, "documents")
    pred = compile_filters(
        [{"field": "text", "operator": "contains", "value": "Data"}],
        valid_fields={"text", "lang", "source"},
        timestamp_fields=set(),
    )
    return docs.filter(pred).select("doc_id", "lang", "source")


@register(
    "filter_timestamp_between",
    oracle="""
    SELECT event_id, ts
    FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
    WHERE ts BETWEEN TIMESTAMP '2024-01-05 12:00:00' AND TIMESTAMP '2024-01-06 12:00:00'
    """,
    covers=("F5", "F11", "T4"),
)
def filter_timestamp_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 datetime-aware inclusive between, ISO strings with Z suffix
    normalized exactly as the reference does (strategies.py:224-225)."""
    ev = _events(spark, sf_dir)
    pred = compile_filters(
        [
            {
                "field": "ts",
                "operator": "between",
                "value": ["2024-01-05T12:00:00Z", "2024-01-06T12:00:00Z"],
            }
        ],
        valid_fields=EVENT_FIELDS,
        timestamp_fields={"ts"},
    )
    return ev.filter(pred).select("event_id", "ts")


@register(
    "filter_numeric_range_json",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
      AND event_type IS DISTINCT FROM 'view'
    """,
    covers=("F4", "T12"),
)
def filter_numeric_range_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 numeric 'after' on a JSON-extracted field (T12) + plain
    exclusion on a non-null column."""
    ev = _events(spark, sf_dir).withColumn(
        "k", F.get_json_object("props", "$.k").cast("bigint")
    )
    pred = compile_filters(
        [
            {"field": "k", "operator": "after", "value": 50},
            {"field": "event_type", "operator": "is_not", "value": "view"},
        ],
        valid_fields={"k", "event_type"},
        timestamp_fields=set(),
    )
    return ev.filter(pred).select("event_id", "k")


from fegis_spark.queries.sqlfrag import duck_match_text  # noqa: E402

_MT_QUERY = "The Data"  # case variants collapse: the analyzer lowercases


@register(
    "filter_match_text",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN contains(lower(text), 'the data') THEN 1 ELSE 0 END
             AS also_substring
    FROM documents
    WHERE {duck_match_text('text', _MT_QUERY)}
    """,
    covers=("F6",),
)
def filter_match_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-based full-text `contains` — true Qdrant MatchText
    semantics (reference strategies.py:240-259 emits MatchText; Qdrant
    applies it analyzed on text-indexed fields). Every analyzer token
    of the query must appear among the field's tokens; word order and
    adjacency don't matter. The also_substring flag exposes the
    semantic gap vs the substring default: docs holding 'the' and
    'data' apart match here but not as a substring."""
    docs = load_table(spark, sf_dir, "documents")
    pred = compile_filters(
        [{"field": "text", "operator": "contains", "value": _MT_QUERY}],
        valid_fields={"text", "lang"},
        timestamp_fields=set(),
        text_index_fields={"text"},
    )
    return docs.filter(pred).select(
        "doc_id",
        "lang",
        F.when(F.lower(F.col("text")).contains("the data"), 1)
        .otherwise(0)
        .alias("also_substring"),
    )


#: constructed corruption for the quarantine parser: every 13th event
#: ships malformed JSON (the testdata props column is always valid, so
#: corruption is injected deterministically on both engines — the
#: constructed-corpus pattern).
_JSON_CORRUPT = (
    "CASE WHEN event_id % 13 = 0 THEN '{broken' ELSE props END"
)


@register(
    "json_quarantine_parse",
    oracle=f"""
    WITH raw AS (
      SELECT event_type, {_JSON_CORRUPT} AS p FROM events
    ), parsed AS (
      SELECT event_type,
             CASE WHEN json_valid(p)
                  THEN CAST(json_extract_string(p, '$.k') AS BIGINT)
                  ELSE NULL END AS k,
             CASE WHEN json_valid(p) THEN 0 ELSE 1 END AS corrupt
      FROM raw
    )
    SELECT event_type,
           COUNT(*) AS n_rows,
           CAST(SUM(corrupt) AS BIGINT) AS n_corrupt,
           CAST(SUM(COALESCE(k, 0)) AS BIGINT) AS k_sum
    FROM parsed GROUP BY event_type
    """,
    covers=("T12", "F10"),
)
def json_quarantine_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T12/F10 corrupt-record quarantine: parse a JSON payload column
    under PERMISSIVE semantics — malformed rows yield NULL and are
    counted into a per-type quarantine tally instead of failing the
    job — the ingestion-hardening move for semi-structured feeds
    (spark.read.json's corrupt-record column, expressed over an
    already-loaded string column). Every 13th event is injected with
    malformed JSON on both engines so the quarantine path is
    non-vacuous at every sf.

    Validity probe: get_json_object(p, '$') IS NULL on Spark ==
    NOT json_valid(p) on DuckDB for this data (whole-document
    extraction fails exactly on malformed input). Pure projection +
    one |event_types|-row agg; map-only at any scale."""
    ev = load_table(spark, sf_dir, "events")
    p = F.expr(_JSON_CORRUPT)
    valid = F.get_json_object(p, "$").isNotNull()
    parsed = ev.select(
        "event_type",
        F.when(valid, F.get_json_object(p, "$.k").cast("bigint")).alias("k"),
        F.when(valid, 0).otherwise(1).alias("corrupt"),
    )
    # no rounded corrupt_rate column: round(count_ratio, 6) is the
    # .5e-6 midpoint tie-break class — consumers divide the exact
    # integers n_corrupt / n_rows themselves
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.sum("corrupt").cast("bigint").alias("n_corrupt"),
        F.sum(F.coalesce("k", F.lit(0))).cast("bigint").alias("k_sum"),
    )
