"""Window-free top-k with ranks — global (ranked_topk) and per-group
(grouped_topk).

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY plans a
single-partition WindowExec — the whole input funnels through one task,
which is the canonical scale-killer for "rank the corpus" shapes. When
only the top k ranked rows are needed, the same result is available
with nothing single-partition at corpus size:

    TakeOrderedAndProject (per-partition top-k heaps, no global sort)
      -> collect the k survivors into ONE bounded array
      -> sort_array -> posexplode; rank = position + 1.

Only k rows ever leave the TakeOrdered, so the array/posexplode stage
is O(k) regardless of corpus size.

The PER-GROUP analog (r11 verdict #1) — ``Window.partitionBy(panel)``
over a corpus-proportional input — is MOSTLY not a funnel on Spark 4:
for ``row_number()/rank()/dense_rank() OVER (...) <= k`` the optimizer
inserts ``WindowGroupLimit(Partial)`` BELOW the exchange, so each map
task pre-sorts its partition and ships only top-k per group, exactly
the two-stage shape — measured FASTER than the aggregate form at every
replication factor (grouped form 0.59-0.82x of the window+WGL form;
evidence/topk_ab_r12.json, plan pinned in tests/test_plans.py).

``grouped_topk`` is therefore for the shapes where the group-limit
rule CANNOT fire: a filter bounding TWO rank columns at once (the
dual-ranking recall audit — only the last window gets a limit, and
above the exchange), a rank consumed without an immediate bound, or
several rankings wanted in ONE pass (two bounded slices in one
aggregation). For a plain per-group top-k, prefer the window + filter
and pin WindowGroupLimit(Partial) in the plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ranked_topk(
    df: DataFrame,
    value_col: str,
    id_col: str,
    k: int,
    rank_name: str = "rank",
) -> DataFrame:
    """Top-k rows by (value desc, id asc) with 1-based ranks — exactly
    ``row_number() OVER (ORDER BY value DESC, id)`` filtered to rank<=k,
    but with no WindowExec anywhere in the plan.

    ``value_col``/``id_col`` must be non-null; ``id_col`` is the
    tiebreak and must be unique. Output columns: (id_col, value_col,
    rank_name).
    """
    s = F.struct((-F.col(value_col)).alias("neg"), F.col(id_col).alias("id"))
    top = df.select(s.alias("s")).orderBy(F.col("s.neg"), F.col("s.id")).limit(k)
    arr = top.agg(F.sort_array(F.collect_list("s")).alias("a"))
    return arr.select(F.posexplode("a").alias("pos", "e")).select(
        F.col("e.id").alias(id_col),
        (-F.col("e.neg")).alias(value_col),
        (F.col("pos") + 1).cast("bigint").alias(rank_name),
    )


def grouped_topk(
    df: DataFrame,
    group_cols: str | Sequence[str],
    value_col: str,
    id_col: str,
    k: int,
    payload_cols: Sequence[str] = (),
    ascending: bool = False,
    rank_name: str = "rank",
) -> DataFrame:
    """Per-group top-k by (value DESC, id ASC) — or ASC/ASC with
    ``ascending=True`` — with 1-based ranks: row-for-row identical to
    ``row_number() OVER (PARTITION BY group ORDER BY value [DESC], id)``
    filtered to ``rank <= k``, but with NO WindowExec anywhere.

    Use this ONLY where WindowGroupLimit cannot fire (see module doc) —
    for the plain window-expressible shape the window + filter form is
    measured faster (evidence/topk_ab_r12.json). Two-stage aggregate:

    * stage 1 groups on (group, ``spark_partition_id()``) and keeps a
      bounded ``slice(sort_array(collect_list(struct)), 1, k)`` per
      input partition — |groups| x |input partitions| parallel keys
      whose count scales automatically with the input;
    * stage 2 merges the <= k x |partitions| survivors per group with
      the same slice(sort_array(flatten)) and posexplodes ranks —
      bounded input by construction.

    The exchange between the stages still carries every candidate row
    once (as any groupBy does — project df down to (groups, value, id,
    payload) before calling). At true corpus scale prefer pruning
    candidates FIRST (IVF probing, banded LSH) and rank the survivors.

    Memory: each stage-1 buffer holds one group's rows from ONE input
    partition before the slice (bounded by
    ``spark.sql.files.maxPartitionBytes`` worth of (value, id, payload)
    structs); collect_list's ObjectHashAggregate falls back to
    sort-based aggregation past the key threshold rather than OOM.

    Requirements: ``value_col`` and ``id_col`` non-null, ``id_col``
    unique within a group (it is the total-order tiebreak, always
    ascending). ``payload_cols`` ride along with the winning rows and
    do not affect ordering. Output: group cols, id, value, payloads,
    rank — value round-trips bit-exactly (double negation is sign-flip
    only; bigints stay far from the overflow edge).
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    v = F.col(value_col) if ascending else (-F.col(value_col))
    s = F.struct(
        v.alias("v"),
        F.col(id_col).alias("i"),
        *[F.col(p).alias(p) for p in payload_cols],
    )
    part = df.groupBy(
        *groups, F.spark_partition_id().alias("__gtk_part")
    ).agg(F.slice(F.sort_array(F.collect_list(s)), 1, k).alias("__gtk_a"))
    merged = part.groupBy(*groups).agg(
        F.slice(
            F.sort_array(F.flatten(F.collect_list("__gtk_a"))), 1, k
        ).alias("__gtk_a")
    )
    ex = merged.select(*groups, F.posexplode("__gtk_a").alias("__gtk_pos", "__gtk_e"))
    val = F.col("__gtk_e.v") if ascending else (-F.col("__gtk_e.v"))
    return ex.select(
        *groups,
        F.col("__gtk_e.i").alias(id_col),
        val.alias(value_col),
        *[F.col(f"__gtk_e.{p}").alias(p) for p in payload_cols],
        (F.col("__gtk_pos") + 1).cast("bigint").alias(rank_name),
    )
