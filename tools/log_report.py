"""Batch analog of the reference's MCP log pretty-printer
(/root/reference/log_viewer.py:18-180): the reference tails the MCP
protocol log and renders tool calls and search results; in this engine
the ingest parquet IS the durable record of tool invocations (one
memories row per call, SURVEY §2.1), so the same two views render
straight from DataFrames through the functions/views.py projections.

Deterministic by design (golden-output tested, tests/test_log_report.py):
the tool-call header shows the ROW's ingest timestamp, not the wall
clock the reference prints (log_viewer.py:40 — its one nondeterminism);
map-typed argument fields print key-sorted.

Usage:
  python tools/log_report.py <memories.parquet> [--view summary]
                             [--full] [--limit N]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path
from textwrap import shorten

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _pretty(value, width: int = 80, full_output: bool = False):
    """Reference log_viewer._pretty: truncate long strings unless full."""
    if isinstance(value, str) and not full_output:
        return shorten(value, width=width, placeholder="…")
    return value


def render_tool_calls(
    mem_df: DataFrame, full_output: bool = False, limit: int = 100
) -> str:
    """The reference's TOOL CALL view (log_viewer.py:32-50) over
    memories rows: one block per ingested call, replay order
    (session_id, sequence_order), bounded by ``limit``."""
    rows = (
        mem_df.select(
            "tool",
            "session_id",
            "sequence_order",
            F.date_format("timestamp", "HH:mm:ss").alias("hms"),
            "title",
            "content",
            "context",
            "parameters",
            "frames",
        )
        .orderBy("session_id", "sequence_order")
        .limit(limit)
        .collect()
    )
    out: list[str] = []
    for r in rows:
        out.append(f"🔧 [{r['hms']}] TOOL CALL: {r['tool']}")
        # reconstruct the call's argument map: ingest lifts the standard
        # fields out and splits the rest into parameters/frames (P7/T9)
        args = {
            k: v
            for k, v in {
                "Title": r["title"],
                "Content": r["content"],
                "Context": r["context"],
            }.items()
            if v is not None
        }
        args.update(r["parameters"] or {})
        args.update(r["frames"] or {})
        if full_output:
            out.append(json.dumps(args, indent=2, ensure_ascii=False, sort_keys=True))
        else:
            for k in sorted(args):
                out.append(f"  {k}: {_pretty(args[k], full_output=full_output)}")
        out.append("")
    return "\n".join(out)


def render_search_results(
    results_df: DataFrame,
    query: str,
    view: str = "summary",
    full_output: bool = False,
    limit: int = 100,
    ref_ts=None,
) -> str:
    """The reference's SEARCH view (log_viewer.py:53-108): numbered
    titles plus the per-result fields of the requested projection
    (functions/views.RESULT_VIEWS), score-descending (memory_id
    tiebreak). ``results_df`` is a search output frame — the memories
    columns plus ``score`` (plans/search.py shapes). ``ref_ts``: fixed
    reference instant for the summary view's relative_time (golden
    tests pass a literal; None = now, the reference's behavior)."""
    from fegis_spark.functions.views import apply_view

    shaped = apply_view(results_df, view, ref_ts)
    rows = (
        shaped.orderBy(F.desc("score"), "memory_id").limit(limit).collect()
    )
    out = [f'🔎 SEARCH: "{query}" -> {len(rows)} results']
    for idx, r in enumerate(rows, 1):
        d = r.asDict(recursive=True)
        title = d.get("title") or "Untitled"
        out.append(f"  {idx}. {title}")
        if full_output:
            out.append(json.dumps(d, indent=4, ensure_ascii=False, sort_keys=True, default=str))
            out.append("")
        else:
            for k, v in d.items():
                if k.lower() == "title":
                    continue
                out.append(f"     {k}: {_pretty(v, full_output=full_output)}")
            if idx != len(rows):
                out.append("")
    return "\n".join(out)


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("memories", help="memories parquet path (ingest output)")
    p.add_argument("--view", default="summary", help="projection for --search")
    p.add_argument("--search", default=None, help="render as search results for this query (df must carry score)")
    p.add_argument("--full", action="store_true", help="full JSON instead of compact")
    p.add_argument("--limit", type=int, default=100)
    a = p.parse_args()

    from fegis_spark.session import get_spark

    spark = get_spark("log_report")
    df = spark.read.parquet(a.memories)
    if a.search is not None:
        print(render_search_results(df, a.search, a.view, a.full, a.limit))
    else:
        print(render_tool_calls(df, a.full, a.limit))
    return 0


if __name__ == "__main__":
    sys.exit(main())
