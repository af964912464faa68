"""As-of join ([EXT], SURVEY.md §2.6 gap list) — Spark has no native
ASOF JOIN; two implementations with different scale envelopes:

* ``asof_join_union``  — pure-DataFrame: union both sides tagged, one
  window pass per key carrying the last-seen right payload forward
  (last ignoreNulls). ONE shuffle on the key and no range join at all
  — the 100 TB-safe default.
* ``asof_join_pandas`` — cogrouped applyInPandas with pd.merge_asof
  (Arrow-batched) — demonstrates the grouped-map UDF surface (§2.11);
  right answer when per-key volumes fit a pandas frame.

Both are backward as-of (greatest right_ts <= left_ts). Right-side
(key, ts) duplicates are deduped to the highest-payload row first so
results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dedupe_right(right: DataFrame, key: str, right_ts: str, payload: list[str]) -> DataFrame:
    # grpwin-ok: (key, right_ts) cardinality scales with the right table
    w = Window.partitionBy(key, right_ts).orderBy(*[F.desc(c) for c in payload])
    return (
        right.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def asof_join_union(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    right_key: str | None = None,
    tolerance: float | int | None = None,
) -> DataFrame:
    """Backward as-of via tagged union + running last_value.

    Sort within key by (ts, side): right rows (side 0) sort before
    left rows (side 1) at equal ts, giving `<=` semantics. Output =
    all left columns + asof_<payload> columns (NULL when no earlier
    right row exists).

    ``tolerance`` bounds the lookback (pd.merge_asof semantics): a
    match older than `tolerance` is treated as no match. Units are
    seconds for timestamp columns, the column's own units otherwise.
    Implemented by carrying the matched right timestamp through the
    same running last_value and nulling payloads past the bound — no
    extra shuffle.
    """
    if right_key and right_key != key:
        right = right.withColumnRenamed(right_key, key)
    ldt, rdt = dict(left.dtypes), dict(right.dtypes)
    lcols = list(left.columns)
    right = _dedupe_right(right, key, right_ts, payload)
    # The matched right row travels as ONE struct (its timestamp + all
    # payload columns) through a single last(ignorenulls) — carrying
    # each column independently would let a NULL payload cell in the
    # newest right row backfill from an OLDER row, desyncing the
    # payload from the timestamp the tolerance check uses and
    # diverging from pd.merge_asof (which returns the matched row's
    # values, NULLs included).
    pack_t = (
        "struct<__rts:" + rdt[right_ts]
        + "".join(f",asof_{c}:{rdt[c]}" for c in payload) + ">"
    )
    l = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(pack_t).alias("__pack"),
    )
    r = right.select(
        F.col(key),
        *[F.lit(None).cast(ldt[c]).alias(c) for c in lcols if c != key],
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__ts"),
        F.struct(
            F.col(right_ts).alias("__rts"),
            *[F.col(c).alias(f"asof_{c}") for c in payload],
        ).cast(pack_t).alias("__pack"),
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy(key)  # grpwin-ok: as-of key cardinality scales with input
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        *lcols,
        "__side",
        F.col("__ts"),
        F.last("__pack", ignorenulls=True).over(w).alias("__pack"),
    )
    out = carried.filter(F.col("__side") == 1).drop("__side")
    if tolerance is not None:
        rts = F.col("__pack.__rts")
        if rdt[right_ts].startswith("timestamp"):
            age = (F.unix_micros(F.col("__ts")) - F.unix_micros(rts)) / 1_000_000.0
        else:
            age = F.col("__ts") - rts
        ok = rts.isNotNull() & (age <= F.lit(tolerance))
        out = out.select(
            *lcols,
            *[
                F.when(ok, F.col(f"__pack.asof_{c}")).alias(f"asof_{c}")
                for c in payload
            ],
        )
    else:
        out = out.select(
            *lcols,
            *[F.col(f"__pack.asof_{c}").alias(f"asof_{c}") for c in payload],
        )
    return out


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    right_key: str | None = None,
    tolerance: float | int | None = None,
) -> DataFrame:
    """Backward as-of via cogrouped applyInPandas + pd.merge_asof.
    ``tolerance`` passes through to merge_asof (seconds for datetime
    columns, raw units otherwise)."""
    import pandas as pd

    if right_key and right_key != key:
        right = right.withColumnRenamed(right_key, key)

    rdt = dict(right.dtypes)
    schema = ", ".join([f"{c} {t}" for c, t in left.dtypes]) + ", " + ", ".join(
        f"asof_{c} {rdt[c]}" for c in payload
    )
    right = _dedupe_right(right, key, right_ts, payload).select(key, right_ts, *payload)

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=list(lpdf.columns) + [f"asof_{c}" for c in payload])
        lpdf = lpdf.sort_values(left_ts, kind="mergesort")
        rpdf = (
            rpdf.sort_values(right_ts, kind="mergesort")
            .rename(columns={c: f"asof_{c}" for c in payload})
            .drop(columns=[key])
        )
        if rpdf.empty:
            out = lpdf.copy()
            for c in payload:
                out[f"asof_{c}"] = None
            return out
        tol = tolerance
        if tol is not None and str(lpdf[left_ts].dtype).startswith("datetime"):
            tol = pd.Timedelta(seconds=tol)
        return pd.merge_asof(
            lpdf,
            rpdf,
            left_on=left_ts,
            right_on=right_ts,
            direction="backward",
            tolerance=tol,
        ).drop(columns=[right_ts] if right_ts != left_ts else [])

    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInPandas(merge, schema)
    )
