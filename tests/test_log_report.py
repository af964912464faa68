"""tools/log_report.py golden-output test (r13, reference log_viewer
parity — /root/reference/log_viewer.py:18-180): the tool-call and
search-result views over the ingest parquet must render byte-identical
output run-over-run (content-deterministic memory ids, row timestamps
instead of wall clock, key-sorted maps, fixed relative_time instant).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fegis_spark.ingest import ingest_batch


@pytest.fixture(scope="module")
def mem(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    topics = [
        "spark runs distributed queries over columnar data",
        "cats and dogs are common household pets",
        "vector embeddings power semantic search engines",
    ]
    rows = [
        (
            "NoteTaker",
            f"sess-{i % 2}",
            t0 + dt.timedelta(minutes=i),
            {
                "Title": f"note {i}",
                "Content": txt,
                "Context": "test",
                "Mood": ["calm", "curious", "bright"][i],
                "Tags": f"t{i} " + "x" * 90,
            },
        )
        for i, txt in enumerate(topics)
    ]
    calls = spark.createDataFrame(
        rows,
        "tool string, session_id string, ts timestamp_ntz, arguments map<string,string>",
    )
    return ingest_batch(calls, param_keys=["Mood"]).cache()


GOLDEN_TOOLCALLS = """\
🔧 [12:00:00] TOOL CALL: NoteTaker
  Content: spark runs distributed queries over columnar data
  Context: test
  Mood: calm
  Tags: t0…
  Title: note 0

🔧 [12:02:00] TOOL CALL: NoteTaker
  Content: vector embeddings power semantic search engines
  Context: test
  Mood: bright
  Tags: t2…
  Title: note 2

🔧 [12:01:00] TOOL CALL: NoteTaker
  Content: cats and dogs are common household pets
  Context: test
  Mood: curious
  Tags: t1…
  Title: note 1
"""

GOLDEN_COMPACT = """\
🔎 SEARCH: "household pets" -> 3 results
  1. note 2
     memory_id: 128498f6-55c1-364d-696b-fe8aa6aa18ec
     tool: NoteTaker
     context: test
     session_id: sess-0
     score: 0.7

  2. note 1
     memory_id: ab586095-4b7b-7f18-5054-e744fca613d2
     tool: NoteTaker
     context: test
     session_id: sess-1
     score: 0.6

  3. note 0
     memory_id: aec91882-c8a5-956e-30e4-c0161f48ecbb
     tool: NoteTaker
     context: test
     session_id: sess-0
     score: 0.6"""

GOLDEN_SUMMARY = """\
🔎 SEARCH: "household pets" -> 2 results
  1. note 2
     memory_id: 128498f6-55c1-364d-696b-fe8aa6aa18ec
     context: test
     tool: NoteTaker
     score: 0.7
     content_preview: vector embeddings power semantic search engines
     relative_time: 58 minutes ago
     session_id: sess-0

  2. note 1
     memory_id: ab586095-4b7b-7f18-5054-e744fca613d2
     context: test
     tool: NoteTaker
     score: 0.6
     content_preview: cats and dogs are common household pets
     relative_time: 59 minutes ago
     session_id: sess-1"""


def _scored(mem):
    return mem.withColumn("score", F.lit(0.5) + F.col("sequence_order") / 10.0)


def test_tool_calls_golden(mem):
    from tools.log_report import render_tool_calls

    # replay order (session_id, sequence_order); the Tags arg collapses
    # to its first word + ellipsis — textwrap.shorten word-boundary
    # semantics, same as the reference's _pretty (log_viewer.py:25-29)
    assert render_tool_calls(mem) == GOLDEN_TOOLCALLS


def test_tool_calls_full_json(mem):
    from tools.log_report import render_tool_calls

    out = render_tool_calls(mem, full_output=True, limit=1)
    assert '"Tags": "t0 ' + "x" * 90 + '"' in out  # untruncated
    assert out.startswith("🔧 [12:00:00] TOOL CALL: NoteTaker")


def test_search_compact_golden(mem):
    from tools.log_report import render_search_results

    got = render_search_results(_scored(mem), "household pets", view="compact")
    assert got == GOLDEN_COMPACT


def test_search_summary_golden_fixed_ref(mem):
    from tools.log_report import render_search_results

    got = render_search_results(
        _scored(mem),
        "household pets",
        view="summary",
        ref_ts=F.lit(dt.datetime(2024, 1, 1, 13, 0, 0)),
        limit=2,
    )
    assert got == GOLDEN_SUMMARY


def test_rendering_is_deterministic(mem):
    from tools.log_report import render_tool_calls

    assert render_tool_calls(mem) == render_tool_calls(mem)


GOLDEN_ADVERSARIAL = """\
🔧 [09:00:00] TOOL CALL: EdgeTool
  Content: 
  Context: a b c
  Exact80: {x80}
  LongWord: …
  Title: EdgeTool Invocation
  Unicode: héllo 🌍🌍🌍🌍🌍

🔧 [09:01:00] TOOL CALL: EdgeTool
  Title: only a title
""".replace("{x80}", "x" * 80)


def test_tool_calls_adversarial_golden(spark):
    """r13 verdict #8: pin _pretty/shorten edge classes one level
    deeper than the long-word collapse the r13 goldens cover —
    empty-string values render as empty (not dropped, not '…'),
    exactly-width strings pass untruncated, a single word over width
    collapses to the bare placeholder, internal whitespace runs
    COLLAPSE (shorten re-wraps: 'a      b\\t\\tc' → 'a b c'), unicode
    survives, a missing Title falls back to the reference's
    '<tool> Invocation' fill, and a call whose arguments carry ONLY
    standard fields renders with empty parameters/frames maps."""
    import datetime as dt

    from tools.log_report import render_tool_calls

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    t0 = dt.datetime(2024, 3, 1, 9, 0, 0)
    rows = [
        (
            "EdgeTool",
            "s0",
            t0,
            {
                "Content": "",
                "Context": "a      b\t\tc",
                "LongWord": "y" * 81,
                "Exact80": "x" * 80,
                "Unicode": "héllo " + "🌍" * 5,
            },
        ),
        ("EdgeTool", "s0", t0 + dt.timedelta(minutes=1), {"Title": "only a title"}),
    ]
    calls = spark.createDataFrame(
        rows,
        "tool string, session_id string, ts timestamp_ntz, "
        "arguments map<string,string>",
    )
    mem = ingest_batch(calls)
    assert render_tool_calls(mem) == GOLDEN_ADVERSARIAL
