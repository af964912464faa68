"""Plan-shape report for catalog queries: the scale-posture facts
(shuffles, broadcasts, scans + pushed filters/columns, windows,
codegen spans) extracted from `.explain("formatted")`.

Usage: python tools/plan_report.py [query ...]   (default: bench set)
One line per query; append -v for the full formatted plan.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fegis_spark.catalog import catalog  # noqa: E402
from fegis_spark.session import configure_for_oracle, get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def report(plan: str) -> dict[str, object]:
    lines = plan.splitlines()
    pushed = [
        l.split("PushedFilters:", 1)[1].strip()
        for l in lines
        if "PushedFilters:" in l and "[]" not in l
    ]
    reads = [l.split("ReadSchema:", 1)[1].strip() for l in lines if "ReadSchema:" in l]
    return {
        "exchanges": plan.count("Exchange hashpartitioning"),
        "broadcasts": plan.count("BroadcastExchange"),
        "scans": plan.count("Scan parquet"),
        "cached": plan.count("InMemoryTableScan"),
        "windows": plan.count("Window"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin")
        + plan.count("CartesianProduct"),
        "takeordered": plan.count("TakeOrderedAndProject"),
        "codegen_spans": plan.count("WholeStageCodegen"),
        "pushed_filters": pushed[:2],
        "read_schemas": [r[:80] for r in reads[:2]],
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "-v"]
    verbose = "-v" in sys.argv[1:]
    spark = configure_for_oracle(get_spark("plan_report"))
    cat = catalog()
    names = args or [e.name for e in cat.values() if e.bench]
    for name in names:
        df = cat[name].builder(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        r = report(plan)
        flags = " ".join(
            f"{k}={v}"
            for k, v in r.items()
            if not isinstance(v, list) and v
        )
        print(f"{name}: {flags or 'pure-projection'}")
        for p in r["pushed_filters"]:
            print(f"  pushed: {p[:100]}")
        for s in r["read_schemas"]:
            print(f"  reads:  {s}")
        if verbose:
            print(plan)


if __name__ == "__main__":
    main()
