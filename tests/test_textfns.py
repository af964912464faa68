"""Text-function parity tests: the Column expressions must agree with a
direct Python port of the reference implementation
(fegis/search/formatters.py:172-218) over adversarial inputs."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from fegis_spark.functions.textfns import content_preview, extract_summary


def ref_extract_summary(content: str, max_sentences: int = 1) -> str:
    if not content:
        return ""
    sentences = re.split(r"[.!?]+", content)
    sentences = [s.strip() for s in sentences if s.strip()]
    if not sentences:
        if len(content) <= 100:
            return content
        return content[:97] + "..."
    summary = ". ".join(sentences[:max_sentences])
    if summary and summary[-1] not in ".!?":
        summary += "."
    return summary


def ref_content_preview(content: str, max_length: int = 150) -> str:
    if not content:
        return ""
    cleaned = " ".join(content.split())
    if len(cleaned) <= max_length:
        return cleaned
    preview = ref_extract_summary(cleaned, max_sentences=2)
    if len(preview) <= max_length:
        return preview
    return preview[: max_length - 3] + "..."


CASES = [
    "",
    "short",
    "Tiny. Sentences! Here?",
    "   lots   of \t whitespace \n everywhere   ",
    "One long sentence " + "x" * 200,
    ("A first sentence that is quite long and wordy. A second one too! "
     "And a third that should be cut off entirely? Plus a fourth."),
    "!!!???...",
    "!" * 120,
    "No terminal punctuation at all just words " * 5,
    "Ends mid",
    "Multi.  spaced.   sentences.  " * 10,
    "Ünïcödé sentences. Ære you sure? Daß ist gut!",
]


@pytest.mark.parametrize("n", [1, 2])
def test_extract_summary_parity(spark, n):
    df = spark.createDataFrame([(c,) for c in CASES], "content string")
    got = [r.s for r in df.select(extract_summary(F.col("content"), n).alias("s")).collect()]
    want = [ref_extract_summary(c, n) for c in CASES]
    assert got == want


def test_content_preview_parity(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "content string")
    got = [r.s for r in df.select(content_preview(F.col("content")).alias("s")).collect()]
    want = [ref_content_preview(c) for c in CASES]
    assert got == want


def test_relative_time_future_ts_matches_python_timedelta(spark):
    """A timestamp AFTER the reference instant must decompose the way
    Python timedelta does (days=-1, rem normalized positive): 10s in
    the future reads '23 hours ago', not 'just now'."""
    import datetime as dt

    from pyspark.sql import functions as F

    from fegis_spark.functions.textfns import relative_time

    ref = dt.datetime(2024, 1, 2, 0, 0, 0)
    rows = [
        (1, ref + dt.timedelta(seconds=10)),    # future: 23 hours ago
        (2, ref + dt.timedelta(minutes=30)),    # future: 23 hours ago
        (3, ref - dt.timedelta(seconds=10)),    # past: just now
        (4, ref - dt.timedelta(hours=3)),       # past: 3 hours ago
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp_ntz")
    got = {
        r.id: r.rel
        for r in df.select(
            "id",
            relative_time(
                F.col("ts"), F.lit("2024-01-02 00:00:00").cast("timestamp_ntz")
            ).alias("rel"),
        ).collect()
    }
    assert got[1] == "23 hours ago"
    assert got[2] == "23 hours ago"
    assert got[3] == "just now"
    assert got[4] == "3 hours ago"


def test_unigram_logprob_known_values(spark):
    import math

    from fegis_spark.operators.text_analysis import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b")], "doc_id long, text string"
    )
    got = {r.doc: r for r in unigram_logprob(docs).collect()}
    # corpus tokens: a,a,b,b -> p(a)=p(b)=0.5; output = decimal-exact
    # SUM of per-token nl (r7: means are midpoint-prone cross-engine)
    exp = round(-math.log(0.5), 6)
    assert got[1].n_tokens == 3 and got[2].n_tokens == 1
    assert abs(got[1].sum_neg_logprob - 3 * exp) < 3e-6
    assert abs(got[2].sum_neg_logprob - exp) < 1e-6


def test_expr_fast_paths_match_column_forms(spark):
    """lang_id_expr / quality_score_expr are single-F.expr rebuilds of
    the Column forms (driver-side plan cost ~170x lower); they must stay
    value-identical on representative text, including empty/edge rows."""
    from pyspark.sql import functions as F

    from fegis_spark.operators.text_analysis import (
        lang_id,
        lang_id_expr,
        quality_score,
        quality_score_expr,
    )

    rows = [
        ("the cat and the dog is here of course",),
        ("le chat et la porte une les",),
        ("",), ("   ",), ("的是在你好",),
        ("a! b? c; d: e, f. " * 20,),
        ("x" * 150,),
    ]
    df = spark.createDataFrame(rows, "text string")
    bad = df.filter(
        ~(lang_id(F.col("text")) == lang_id_expr("text"))
        | ~quality_score(F.col("text")).eqNullSafe(quality_score_expr("text"))
    ).count()
    assert bad == 0


def test_strip_html_rules(spark):
    from pyspark.sql import functions as F

    from fegis_spark.operators.text_analysis import strip_html

    cases = {
        "<p>Hello <b>world</b></p>": "Hello world",
        "<script>var x=1;</script>keep": "keep",
        "<style>.a{color:red}</style>text": "text",
        "<!-- c -->a<div>b</div>": "a b",
        "a &amp; b": "a & b",
        "&amp;lt; stays escaped once": "&lt; stays escaped once",
        "<SCRIPT>\nmulti\nline\n</SCRIPT>ok": "ok",
        "plain": "plain",
    }
    df = spark.createDataFrame(list(cases.items()), "t string, want string")
    bad = df.filter(strip_html(F.col("t")) != F.col("want")).count()
    assert bad == 0


def test_text_exprs_null_behavior_pinned(spark):
    """NULL-text behavior, pinned: CASE-ELSE fallthrough makes lang_id
    yield its tie-fallback ('zh') and quality its punct-term floor
    (0.3) — NOT NULL. DuckDB evaluates the generated SQL identically
    (NULL comparisons fall to ELSE), so oracles stay aligned; pure
    regex/array expressions DO propagate NULL. Real corpora should
    filter missing text upstream — this test documents, not endorses.
    """
    import duckdb
    from pyspark.sql import functions as F

    from fegis_spark.operators.text_analysis import (
        lang_id_expr,
        lang_id_sql,
        lang_margin_expr,
        quality_score_expr,
        quality_score_sql,
        strip_html,
    )
    from fegis_spark.plans.filters import match_text

    df = spark.createDataFrame([(1, None), (2, "the data")], "i long, t string")
    row = (
        df.select(
            "i",
            lang_id_expr("t").alias("lang"),
            quality_score_expr("t").alias("q"),
            lang_margin_expr("t").alias("m"),
            strip_html(F.col("t")).alias("s"),
            match_text(F.col("t"), "data").alias("mt"),
        )
        .filter(F.col("i") == 1)
        .first()
    )
    assert (row.lang, row.q) == ("zh", 0.3)  # CASE-ELSE fallthrough
    assert row.m is None and row.s is None and row.mt is None
    # DuckDB agrees on the fallthrough values
    d_lang, d_q = duckdb.connect().execute(
        f"SELECT {lang_id_sql('t')}, round({quality_score_sql('t')}, 6) "
        "FROM (SELECT CAST(NULL AS VARCHAR) AS t)"
    ).fetchone()
    assert (d_lang, round(d_q, 6)) == ("zh", 0.3)
