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

``grouped_ntile`` / ``grouped_lead`` (r13) cover the OTHER
WGL-uncoverable family: window functions that need the FULL partition
by semantics (ntile, lead) over a group whose partition size scales
with the corpus. Both use the epoch_shuffle bucket offset-merge
decomposition — local windows per (group, order-range bucket), merged
with bounded panel offsets (evidence/ntile_ab_r13.json: the native
window's wall grows with data under a |groups|-task parallelism cap,
the decomposition's with cluster parallelism).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

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


def _as_list(cols: str | Sequence[str]) -> list[str]:
    return [cols] if isinstance(cols, str) else list(cols)


def grouped_ntile(
    df: DataFrame,
    group_cols: str | Sequence[str],
    order_cols: str | Sequence[str],
    bucket_col: str,
    ns: Mapping[str, int],
) -> DataFrame:
    """``ntile(n) OVER (PARTITION BY group ORDER BY order_cols)``
    without ever materializing a full group in one task — the r12
    verdict's open window family: WindowGroupLimit NEVER fires for
    ntile (it needs the whole partition by semantics), so the plain
    window form funnels a corpus-scaling hot group through one task.

    Decomposition (the epoch_shuffle offset-merge pattern, per group):

    * the caller supplies ``bucket_col``: an integer column that is a
      NON-DECREASING function of the first order column (a range
      radix — fixed-width value buckets here, quantile-derived splits
      at production scale). Monotonicity makes global (order) order
      == (bucket, order) order, so per-bucket local ranks merge by
      adding per-bucket base offsets;
    * per-(group, bucket) row counts prefix-sum into base offsets and
      the group total — a window over the bounded per-group bucket
      panel;
    * the local rank window partitions by (group, bucket): each task
      holds 1/|buckets| of a group. The bucket fan-out is the
      parallelism knob — widen the radix until a slice fits a task;
    * global rank = base + local rank; ntile is then a PURE integer
      function of (rank, group count, n): with q = cnt DIV n and
      r = cnt % n, the first r tiles get q+1 rows, so
      tile = ceil(rank/(q+1)) while rank <= r*(q+1), else
      r + ceil((rank - r*(q+1))/q) — exactly the SQL-standard ntile
      bucket sizes, all in exact BIGINT arithmetic (cross-engine
      portable; the DuckDB oracle runs native ntile).

    ``ns`` maps output column name -> n (rank and counts are computed
    once; each requested tile is one projection). ``order_cols`` are
    ascending and must be a total order within a group (append an id).
    Output: df's columns plus one BIGINT column per ``ns`` entry.
    """
    from pyspark.sql import Window

    groups = _as_list(group_cols)
    orders = _as_list(order_cols)
    # panel-ok: partition key is (group, bucket) — each slice is
    # 1/|radix| of a group; the bucket fan-out is the parallelism knob
    # (docstring), NOT a full-group funnel
    wloc = Window.partitionBy(*groups, bucket_col).orderBy(*orders)
    ranked = df.withColumn("__gn_lr", F.row_number().over(wloc))
    # bucket sizes come from the WINDOWED side (max local rank), not a
    # second pass over df: the groupBy keys equal the window's
    # partition keys, so this aggregation plans with NO new exchange
    # and the corpus is scanned ONCE (r13 plan-shape fix: the first
    # draft's df.groupBy counts cost a second scan + shuffle)
    counts = ranked.groupBy(*groups, bucket_col).agg(
        F.max("__gn_lr").alias("__gn_n")
    )
    woff = (
        # panel-ok: counts is <= |bucket radix| rows per group (the
        # caller's bounded bucket_col keyspace) — a panel window
        Window.partitionBy(*groups)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wall = (
        # panel-ok: same bounded per-group bucket panel (one WindowExec:
        # same partition/order spec, different frame)
        Window.partitionBy(*groups)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    offs = counts.select(
        *groups,
        bucket_col,
        F.coalesce(F.sum("__gn_n").over(woff), F.lit(0))
        .cast("long")
        .alias("__gn_base"),
        F.sum("__gn_n").over(wall).cast("long").alias("__gn_cnt"),
    )
    # join key == the window's partition key: the big side reuses its
    # exchange/sort; only the panel-sized offset table moves
    j = ranked.join(offs, [*groups, bucket_col])
    rk = "(__gn_base + CAST(__gn_lr AS BIGINT))"
    q = "(__gn_cnt DIV {n})"
    r = "(__gn_cnt % {n})"
    tile = (
        f"CASE WHEN {rk} <= {r} * ({q} + 1) "
        f"THEN ({rk} + {q}) DIV ({q} + 1) "
        f"ELSE {r} + ({rk} - {r} * ({q} + 1) + {q} - 1) DIV nullif({q}, 0) "
        f"END"
    )
    out = j
    for name, n in ns.items():
        out = out.withColumn(name, F.expr(tile.format(n=int(n))))
    return out.drop("__gn_lr", "__gn_base", "__gn_cnt")


def order_range_buckets(
    df: DataFrame,
    order_col: str,
    num_buckets: int = 64,
    bucket_name: str = "bucket",
    relative_error: float = 0.001,
) -> DataFrame:
    """Production bucket derivation for grouped_ntile/grouped_lead: a
    range radix from the order column's approximate quantiles, so the
    per-(group, bucket) slices are load-balanced even when the order
    values are skewed (the fixed-width `v DIV w` recipe degenerates to
    a few hot buckets on a heavy-tailed column).

    approxQuantile (Greenwald-Khanna) is a bounded driver round-trip —
    one aggregation pass, |boundaries| doubles back to the driver —
    re-entered as literals, so the bucket column compiles to a plain
    codegen CASE ladder (no HOF: a transform()-based searchsorted
    would disable whole-stage codegen for the consuming projection,
    the r9 rrf regression class). Assignment is searchsorted over the
    interior boundaries: bucket = |{b : v > b}| — a non-decreasing
    pure function of the order value, which is the ONLY correctness
    requirement grouped_ntile/grouped_lead place on the bucket column
    (boundary quality affects balance, never results; equal boundary
    duplicates from low-cardinality columns just leave some buckets
    empty, which both operators tolerate). NULL order values bucket
    to -1, below every real bucket — matching NULLS FIRST ascending
    order. Adds ``bucket_name`` (INT) to df."""
    qs = [i / num_buckets for i in range(1, num_buckets)]
    cuts = df.approxQuantile(order_col, qs, relative_error)
    v = F.col(order_col)
    expr = F.lit(0)
    for c in cuts:
        expr = expr + F.when(v > F.lit(c), 1).otherwise(0)
    bucket = F.when(v.isNull(), F.lit(-1)).otherwise(expr)
    return df.withColumn(bucket_name, bucket.cast("int"))


def grouped_lead(
    df: DataFrame,
    group_cols: str | Sequence[str],
    order_cols: str | Sequence[str],
    value_col: str,
    bucket_col: str,
    out_name: str = "lead",
) -> DataFrame:
    """``lead(value) OVER (PARTITION BY group ORDER BY order_cols)``
    (offset 1) without a full-group window — lead, like ntile, never
    gets a WindowGroupLimit, so the plain form funnels hot groups.
    Same bucket decomposition as grouped_ntile (``bucket_col`` must be
    a non-decreasing function of the first order column):

    * local lead within (group, bucket) — the successor of every row
      except each bucket's last;
    * the per-(group, bucket) FIRST value (min_by over the order key)
      forms a bounded panel; lead over that panel, ordered by bucket,
      is "the first value of my next non-empty bucket" — exactly what
      each bucket-last row needs (empty buckets don't appear in the
      panel, so they are skipped, and the last bucket's NULL is the
      correct no-successor answer);
    * the boundary is decided by the lifted STRUCT being null (a
      missing successor), never by the value itself — NULL values in
      ``value_col`` flow through correctly.

    Output: df's columns plus ``out_name`` (same type as value_col).
    """
    from pyspark.sql import Window

    groups = _as_list(group_cols)
    orders = _as_list(order_cols)
    # panel-ok: partition key is (group, bucket) — 1/|radix| group
    # slices, bucket fan-out is the parallelism knob (see grouped_ntile)
    wloc = Window.partitionBy(*groups, bucket_col).orderBy(*orders)
    led = df.withColumn(
        "__gl_ld", F.lead(F.struct(F.col(value_col).alias("v"))).over(wloc)
    ).withColumn("__gl_rn", F.row_number().over(wloc))
    # per-bucket FIRST values from the WINDOWED side (local rank 1) —
    # same spec as the lead window, so one WindowExec / one corpus
    # scan, no second groupBy pass (r13 plan-shape fix, see
    # grouped_ntile's counts note)
    firsts = led.filter(F.col("__gl_rn") == 1).select(
        *groups,
        bucket_col,
        F.struct(F.col(value_col).alias("v")).alias("__gl_first"),
    )
    # panel-ok: firsts is <= |bucket radix| rows per group — the
    # next-bucket lookup is a bounded panel window
    wnext = Window.partitionBy(*groups).orderBy(bucket_col)
    nxt = firsts.select(
        *groups,
        bucket_col,
        F.lead("__gl_first").over(wnext).alias("__gl_nx"),
    )
    j = led.join(nxt, [*groups, bucket_col])
    return j.withColumn(
        out_name,
        F.when(F.col("__gl_ld").isNotNull(), F.col("__gl_ld.v")).otherwise(
            F.col("__gl_nx.v")
        ),
    ).drop("__gl_ld", "__gl_nx", "__gl_rn")
