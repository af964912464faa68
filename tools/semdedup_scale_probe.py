"""SemDeDup scaling probe (r14): measure the n_lists-scales-with-corpus
contract that the catalog query documents but — holding n_lists=16 —
cannot follow.

Background: the 64x replicated gate caught dedup_semantic's fixed
16-cluster shape going quadratic (clusters GROW with replication, so
the within-cluster self-join is ~(n/16)^2 pairs per cluster — a >1h
single stage at 64x; the query is factor-excluded >= 64x in
tools/gate_replicated.py). The operator's own scaling answer — and
SemDeDup's (50k clusters at LAION-440M) — is MORE clusters, not bigger
ones. This probe measures both shapes on the same replicated corpora:

* fixed route: semantic_dedup (md5-literal routing, n_lists=16) at
  factors where it is still tractable — per-corpus-unit wall should
  GROW ~linearly with the factor (total ~quadratic);
* scaled route: semantic_dedup_trained with n_lists = 16 x
  sqrt(factor) — the operator docstring's balanced k ~ sqrt(n) choice,
  where the assignment term (n*k) and the pair term (n^2/k) are both
  ~n^1.5: cluster size grows only as sqrt(n), so the pair stage stays
  tractable at every octave (vs the fixed shape's n^2/16). Crosses the
  trainer's 64-list threshold, so both the driver spherical route and
  the MLlib k-means|| route get exercised.

Timing discipline: best-of-2 fresh builds per leg (CLAUDE.md r7: a
single timing occasionally eats a GC pause), run SOLO (no concurrent
Spark drivers). Output: one JSON line per leg + a summary block;
redirect to evidence/semdedup_scaling_r14.json.

Usage: python tools/semdedup_scale_probe.py [factors...]  (default
4 16 for the fixed route, 4 16 64 for the scaled route).
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def _leg(spark, emb_path: str, factor: int, route: str, n_lists: int):
    from pyspark.sql import functions as F

    from fegis_spark.operators.dedup import (
        semantic_dedup,
        semantic_dedup_trained,
    )

    walls, out = [], None
    for _ in range(2):
        spark.catalog.clearCache()
        emb = spark.read.parquet(emb_path)
        t0 = time.time()
        if route == "fixed":
            res = semantic_dedup(emb, "embedding", "vec_id", n_lists=n_lists)
        else:
            res = semantic_dedup_trained(
                emb, "embedding", "vec_id", n_lists=n_lists
            )
        out = res.agg(
            F.count("*").alias("rows"),
            F.sum(F.col("is_dup").cast("int")).alias("dups"),
            F.countDistinct("list_id").alias("lists_used"),
        ).collect()[0]
        walls.append(round(time.time() - t0, 2))
    return {
        "route": route,
        "factor": factor,
        "n_lists": n_lists,
        "wall_s": min(walls),
        "walls": walls,
        "rows": out["rows"],
        "dups": out["dups"],
        "lists_used": out["lists_used"],
    }


def main() -> None:
    from fegis_spark.session import configure_for_oracle, get_spark
    from scale_probe import replicate

    factors = [int(a) for a in sys.argv[1:]] or [4, 16, 64]
    spark = configure_for_oracle(get_spark("semdedup_scale_probe"))
    legs = []
    with tempfile.TemporaryDirectory(prefix="semdedup_probe_") as tmp:
        for f in factors:
            replicate(spark, f"{tmp}/x{f}", f)
            emb = f"{tmp}/x{f}/embeddings.parquet"
            if f <= 16:  # the fixed shape is the >1h stage at 64x
                legs.append(_leg(spark, emb, f, "fixed", 16))
                print(json.dumps(legs[-1]), flush=True)
            legs.append(
                _leg(spark, emb, f, "scaled", max(16, int(16 * f ** 0.5)))
            )
            print(json.dumps(legs[-1]), flush=True)
    by = {(r["route"], r["factor"]): r["wall_s"] for r in legs}
    summary = {
        "probe": "semdedup n_lists scaling (r14; see module doc)",
        "legs": legs,
        "wall_ratio_fixed_16x_over_4x": (
            round(by["fixed", 16] / by["fixed", 4], 2)
            if ("fixed", 16) in by and ("fixed", 4) in by
            else None
        ),
        "wall_ratio_scaled_16x_over_4x": (
            round(by["scaled", 16] / by["scaled", 4], 2)
            if ("scaled", 16) in by and ("scaled", 4) in by
            else None
        ),
        "wall_ratio_scaled_64x_over_16x": (
            round(by["scaled", 64] / by["scaled", 16], 2)
            if ("scaled", 64) in by and ("scaled", 16) in by
            else None
        ),
    }
    print(json.dumps(summary, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
