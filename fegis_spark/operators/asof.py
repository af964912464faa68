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
    l = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__ts"),
        *[F.lit(None).cast(rdt[c]).alias(f"asof_{c}") for c in payload],
    )
    r = right.select(
        F.col(key),
        *[F.lit(None).cast(ldt[c]).alias(c) for c in lcols if c != key],
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(f"asof_{c}") for c in payload],
    )
    if tolerance is not None:
        l = l.withColumn("__rts", F.lit(None).cast(rdt[right_ts]))
        r = r.withColumn("__rts", F.col("__ts"))
    u = l.unionByName(r)
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carry = [
        F.last(f"asof_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
        for c in payload
    ]
    if tolerance is not None:
        carry.append(F.last("__rts", ignorenulls=True).over(w).alias("__rts"))
    carried = u.select(*lcols, "__side", F.col("__ts"), *carry)
    out = carried.filter(F.col("__side") == 1).drop("__side")
    if tolerance is not None:
        if rdt[right_ts].startswith("timestamp"):
            age = (
                F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__rts"))
            ) / 1_000_000.0
        else:
            age = F.col("__ts") - F.col("__rts")
        ok = F.col("__rts").isNotNull() & (age <= F.lit(tolerance))
        out = out.select(
            *lcols,
            *[
                F.when(ok, F.col(f"asof_{c}")).alias(f"asof_{c}")
                for c in payload
            ],
        )
    else:
        out = out.drop("__ts")
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
