"""Sketch-then-verify operators ([EXT]): bounded-memory streaming
summaries whose candidate sets are re-verified exactly, so the final
output is deterministic (and oracle-checkable) even though the sketch
itself is partition-order-dependent.

`heavy_hitters`: distributed Misra-Gries. Per partition, a mergeable
MG summary with `k` counters (Agarwal et al., "Mergeable Summaries",
PODS'12: merge batch counts, then subtract the (k+1)-th largest value
and drop non-positives — error ≤ n_p/(k+1)). Any corpus item with
count > n/k exceeds n_p/k in at least one partition (averaging
argument), and n_p/k > n_p/(k+1) ≥ MG error, so every true heavy
hitter survives some partition summary. The union of candidates
(≤ k·partitions rows) is broadcast back for an exact recount; the
strict `cnt · k > n` filter then yields EXACTLY the true heavy
hitters — sketch nondeterminism cannot leak into the output.

100 TB posture: two corpus passes (sketch+total, then recount), both
map-side — the only shuffles are the tiny candidate union and the
recount hash-agg keyed on ≤ k·partitions distinct values. No corpus
persist, no driver materialization beyond the candidate list.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(cap: int):
    """mapInPandas op: one mergeable Misra-Gries summary per partition.

    Emits the surviving counters as (t, wt) rows plus one sentinel row
    (t=NULL, wt=partition row count) so the corpus total comes out of
    the same scan."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary = pd.Series(dtype="int64")
        n_p = 0
        for pdf in batches:
            col = pdf.iloc[:, 0].dropna()
            n_p += len(col)
            summary = summary.add(col.value_counts(), fill_value=0)
            if len(summary) > cap:
                kth = summary.nlargest(cap + 1).iloc[-1]
                summary = summary - kth
                summary = summary[summary > 0]
        out = pd.DataFrame(
            {"t": list(summary.index) + [None], "wt": list(summary.astype("int64")) + [n_p]}
        )
        yield out

    return op


def heavy_hitters(items: DataFrame, col: str = "t", k: int = 50) -> DataFrame:
    """Exact heavy hitters (count·k > total strictly) of `items[col]`
    via distributed Misra-Gries candidates + exact recount.

    Returns (t, cnt) with cnt the exact corpus count, ordered
    (cnt DESC, t) — a total order."""
    stream = items.select(F.col(col).alias("t"))
    sketch = stream.mapInPandas(_mg_partition(k), "t string, wt long")
    candidates = sketch.where(F.col("t").isNotNull()).select("t").distinct()
    total = sketch.where(F.col("t").isNull()).agg(F.sum("wt").alias("n"))
    exact = (
        stream.join(F.broadcast(candidates), "t")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * k > F.col("n"))
        .select("t", "cnt")
        .orderBy(F.desc("cnt"), "t")
    )
