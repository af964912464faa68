"""Headline benchmark: runs the bench-flagged catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop-sink write (full plan
execution, no driver collect overhead); per-query time is the median
of 3 runs after a warmup.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fegis_spark.catalog import catalog
from fegis_spark.session import configure_for_oracle, get_spark

RUNS = 3


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = configure_for_oracle(get_spark("fegis_spark_bench"))

    entries = [e for e in catalog().values() if e.bench]
    times: dict[str, float] = {}
    for e in entries:
        force(e.builder(spark, sf_dir))  # warmup: JIT + file listing + codegen
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            force(e.builder(spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        times[e.name] = round(statistics.median(samples), 4)

    total = round(sum(times.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
