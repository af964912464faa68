"""Spill/shuffle posture probe at replicated scale (VERDICT r14 #8,
guide §5): replicate documents/embeddings Nx (gate_replicated's build),
run the named catalog queries against the replicated corpus, and
report per-query stage-metric aggregates from the driver's
AppStatusStore — total/max memoryBytesSpilled, diskBytesSpilled,
shuffleWriteBytes, shuffleReadBytes, max peakExecutionMemory, wall.

The point is a MEMORY baseline next to the wall-clock scale probes:
the r14 vector-family reshape carries extra per-side norm columns
through pair joins, and this records whether that pressure spills at
replication factors the wall numbers alone can't show.

Usage: python tools/spill_probe.py <factor> <query> [<query>...]
Writes nothing; prints one JSON line. Run SOLO (timing rule).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

# the replicated corpus is a few single parquet files — without this
# split override every map stage is ONE task at the 128 MB default
# (gate_replicated's hard-won r12 note)
os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "262144")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from fegis_spark.catalog import catalog  # noqa: E402
from fegis_spark.session import configure_for_oracle, get_spark  # noqa: E402
from gate_replicated import build  # noqa: E402


def stage_metrics(spark, min_stage_id: int) -> dict:
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    store = spark.sparkContext._jsc.sc().statusStore()
    stages = store.stageList(
        jvm.java.util.ArrayList(), False, False,
        gw.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
    )
    agg = {
        "n_stages": 0,
        "mem_spill_total": 0, "mem_spill_max_stage": 0,
        "disk_spill_total": 0, "disk_spill_max_stage": 0,
        "shuffle_write_total": 0, "shuffle_write_max_stage": 0,
        "shuffle_read_total": 0,
        "peak_execution_memory_max_stage": 0,
    }
    for i in range(stages.size()):
        s = stages.apply(i)
        if s.stageId() < min_stage_id:
            continue
        agg["n_stages"] += 1
        agg["mem_spill_total"] += s.memoryBytesSpilled()
        agg["mem_spill_max_stage"] = max(
            agg["mem_spill_max_stage"], s.memoryBytesSpilled()
        )
        agg["disk_spill_total"] += s.diskBytesSpilled()
        agg["disk_spill_max_stage"] = max(
            agg["disk_spill_max_stage"], s.diskBytesSpilled()
        )
        agg["shuffle_write_total"] += s.shuffleWriteBytes()
        agg["shuffle_write_max_stage"] = max(
            agg["shuffle_write_max_stage"], s.shuffleWriteBytes()
        )
        agg["shuffle_read_total"] += s.shuffleReadBytes()
        agg["peak_execution_memory_max_stage"] = max(
            agg["peak_execution_memory_max_stage"], s.peakExecutionMemory()
        )
    return agg


def next_stage_id(spark) -> int:
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    store = spark.sparkContext._jsc.sc().statusStore()
    stages = store.stageList(
        jvm.java.util.ArrayList(), False, False,
        gw.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
    )
    mx = -1
    for i in range(stages.size()):
        mx = max(mx, stages.apply(i).stageId())
    return mx + 1


def main() -> None:
    factor = int(sys.argv[1])
    names = sys.argv[2:]
    out: dict = {"factor": factor, "queries": {}}
    with tempfile.TemporaryDirectory(prefix=f"spill_{factor}x_") as rep_dir:
        build(rep_dir, factor)
        spark = configure_for_oracle(get_spark("fegis_spill_probe"))
        cat = catalog()
        for name in names:
            spark.sparkContext.setJobDescription(f"spill:{name}")
            base_id = next_stage_id(spark)
            t0 = time.perf_counter()
            cat[name].builder(spark, rep_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = round(time.perf_counter() - t0, 2)
            m = stage_metrics(spark, base_id)
            m["wall_sec"] = wall
            out["queries"][name] = m
            spark.sparkContext.setJobDescription(None)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
