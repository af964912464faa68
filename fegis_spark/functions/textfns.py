"""Scalar text/time functions (SURVEY.md §2.8, T1-T10) as native Column
expressions — JVM-side, whole-stage-codegen'd; no Python UDFs.

Faithful ports of reference fegis/search/formatters.py:141-218 with one
deliberate change: ``relative_time`` takes an explicit reference
timestamp instead of wall-clock now() (SURVEY.md §7.4 determinism).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: reference formatters.py:27
CONTENT_PREVIEW_LENGTH = 150


def clean_whitespace(col: Column) -> Column:
    """Python ``" ".join(s.split())``: collapse whitespace runs, trim."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def _sentences(col: Column) -> Column:
    """Split on [.!?]+ runs, trim pieces, drop empties
    (reference extract_summary, formatters.py:177-179)."""
    return F.filter(
        F.transform(F.split(col, r"[.!?]+"), lambda s: F.trim(s)),
        lambda s: s != F.lit(""),
    )


def extract_summary(col: Column, max_sentences: int = 1) -> Column:
    """T2: first-N-sentence summary (reference formatters.py:172-195).

    Join with ". ", re-append terminal "."; when no sentences survive
    the split, fall back to the raw content (<=100 chars) or a
    97-char+"..." truncation.
    """
    sents = _sentences(col)
    joined = F.array_join(F.slice(sents, 1, max_sentences), ". ")
    # components contain no terminal punctuation (they were delimiters),
    # but keep the reference's conditional shape for fidelity
    summary = F.when(
        F.substring(joined, -1, 1).isin(".", "!", "?"), joined
    ).otherwise(F.concat(joined, F.lit(".")))
    fallback = F.when(F.length(col) <= 100, col).otherwise(
        F.concat(F.substring(col, 1, 97), F.lit("..."))
    )
    return (
        F.when(col.isNull() | (col == ""), F.lit(""))
        .when(F.size(sents) == 0, fallback)
        .otherwise(summary)
    )


def content_preview(col: Column, max_length: int = CONTENT_PREVIEW_LENGTH) -> Column:
    """T1: display preview (reference format_content_preview,
    formatters.py:198-218): collapse whitespace → short content passes
    through → else 2-sentence summary → else truncate to max-3 + "..."."""
    cleaned = clean_whitespace(col)
    summary = extract_summary(cleaned, max_sentences=2)
    return (
        F.when(col.isNull() | (col == ""), F.lit(""))
        .when(F.length(cleaned) <= max_length, cleaned)
        .when(F.length(summary) <= max_length, summary)
        .otherwise(F.concat(F.substring(summary, 1, max_length - 3), F.lit("...")))
    )


def relative_time(ts: Column, ref: Column) -> Column:
    """T3: human-readable relative time (reference format_relative_time,
    formatters.py:141-169), parameterized on an explicit reference
    instant so results are deterministic/testable.

    Mirrors Python timedelta semantics: days = floor(diff/86400),
    remaining seconds decompose into hours/minutes.
    """
    # cast(timestamp as long) floors to epoch seconds; the DuckDB mirror
    # is CAST(floor(epoch(ts)) AS BIGINT). TIMESTAMP_NTZ has no direct
    # long cast — hop through TIMESTAMP (identity under the UTC session).
    def _secs(c: Column) -> Column:
        return c.cast("timestamp").cast("long")

    secs = _secs(ref) - _secs(ts)
    days = F.floor(secs / 86400)
    # pmod, not %: Spark % keeps the dividend sign, so a future ts
    # (secs < 0) would yield a negative remainder and fall through to
    # "just now" — Python timedelta normalizes to days=-1, rem>=0
    # (e.g. ts 10s in the future => "23 hours ago"), and the reference
    # inherits that
    rem = F.pmod(secs, F.lit(86400))
    hours = F.floor(rem / 3600)
    minutes = F.floor(F.pmod(rem, F.lit(3600)) / 60)
    weeks = F.floor(days / 7)
    months = F.floor(days / 30)

    def plural(n: Column, unit: str) -> Column:
        return F.concat(
            n.cast("string"),
            F.lit(f" {unit}"),
            F.when(n > 1, F.lit("s")).otherwise(F.lit("")),
            F.lit(" ago"),
        )

    return (
        F.when(days == 1, F.lit("1 day ago"))
        .when((days > 1) & (days < 7), plural(days, "day"))
        .when((days >= 7) & (days < 30), plural(weeks, "week"))
        .when(days >= 30, plural(months, "month"))
        .when(hours > 0, plural(hours, "hour"))
        .when(minutes > 0, plural(minutes, "minute"))
        .otherwise(F.lit("just now"))
    )


def capitalize(col: Column) -> Column:
    """T10: Python str.capitalize — first char upper, REST LOWER
    (not initcap; SURVEY.md §7.4)."""
    return F.concat(F.upper(F.substring(col, 1, 1)), F.lower(F.substring(col, 2, 2**31 - 1)))


def default_title(title: Column, tool: Column) -> Column:
    """T8: reference storage.py:154-156 default-title fill."""
    return F.coalesce(title, F.concat(tool, F.lit(" Invocation")))


def exclude_standard_keys(map_col: Column) -> Column:
    """T9: drop Title/Content/Context keys from a parameters/frames map
    (reference storage.py:162-169) via higher-order map_filter."""
    return F.map_filter(
        map_col, lambda k, v: ~k.isin("Title", "Content", "Context")
    )
