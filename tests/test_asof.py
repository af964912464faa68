"""As-of join: the pure-DataFrame union form and the cogrouped
merge_asof form must agree exactly (independent implementations)."""

from __future__ import annotations

import datetime as dt

from fegis_spark.operators.asof import asof_join_pandas, asof_join_union


def _frames(spark):
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(5), "a"), (1, t(10), "b"), (1, t(2), "c"), (2, t(7), "d"), (3, t(1), "e")],
        "k long, ts timestamp_ntz, tag string",
    )
    right = spark.createDataFrame(
        [(1, t(2), 100.0), (1, t(5), 200.0), (1, t(9), 300.0), (2, t(8), 400.0)],
        "k long, rts timestamp_ntz, price double",
    )
    return left, right


def test_union_form_semantics(spark):
    left, right = _frames(spark)
    out = {
        r.tag: r.asof_price
        for r in asof_join_union(left, right, "k", "ts", "rts", ["price"]).collect()
    }
    # <= semantics: equal timestamps match (tag a at t5 gets the t5 order)
    assert out == {"a": 200.0, "b": 300.0, "c": 100.0, "d": None, "e": None}


def test_pandas_form_agrees(spark):
    left, right = _frames(spark)
    a = {
        (r.k, r.tag): r.asof_price
        for r in asof_join_union(left, right, "k", "ts", "rts", ["price"]).collect()
    }
    b = {
        (r.k, r.tag): r.asof_price
        for r in asof_join_pandas(left, right, "k", "ts", "rts", ["price"]).collect()
    }
    assert a == b


def test_asof_tolerance_bounds_lookback(spark):
    """tolerance: matches older than the bound become NULL — both the
    union form and the merge_asof form, identically."""
    from fegis_spark.operators.asof import asof_join_pandas, asof_join_union

    left = spark.createDataFrame(
        [("k", 10.0), ("k", 100.0), ("k", 101.0)], "key string, ts double"
    )
    right = spark.createDataFrame(
        [("k", 8.0, "old"), ("k", 99.0, "fresh")], "key string, rts double, v string"
    )
    for fn in (asof_join_union, asof_join_pandas):
        rows = {
            r.ts: r.asof_v
            for r in fn(left, right, "key", "ts", "rts", ["v"], tolerance=5).collect()
        }
        # ts=10: nearest right is 8 (age 2 <= 5) -> old
        # ts=100: nearest is 99 (age 1) -> fresh
        # ts=101: nearest is 99 (age 2) -> fresh
        assert rows == {10.0: "old", 100.0: "fresh", 101.0: "fresh"}, (fn, rows)
        tight = {
            r.ts: r.asof_v
            for r in fn(left, right, "key", "ts", "rts", ["v"], tolerance=1).collect()
        }
        assert tight == {10.0: None, 100.0: "fresh", 101.0: None}, (fn, tight)


def test_asof_null_payload_comes_from_matched_row(spark):
    """When the matched (most recent) right row carries a NULL payload
    cell, the join must return that NULL — not backfill the value from
    an older right row. Timestamp bookkeeping and payload must travel
    together (merge_asof semantics), with and without tolerance."""
    from fegis_spark.operators.asof import asof_join_pandas, asof_join_union

    left = spark.createDataFrame(
        [("k", 10.0), ("k", 20.0)], "key string, ts double"
    )
    right = spark.createDataFrame(
        [("k", 5.0, "old"), ("k", 19.0, None)],
        "key string, rts double, v string",
    )
    for fn in (asof_join_union, asof_join_pandas):
        plain = {
            r.ts: r.asof_v
            for r in fn(left, right, "key", "ts", "rts", ["v"]).collect()
        }
        # ts=20 matches rts=19 whose v IS NULL; ts=10 matches rts=5
        assert plain == {10.0: "old", 20.0: None}, (fn, plain)
        # tolerance=3: ts=20/rts=19 within bound -> still the NULL row
        # (a stale 'old' here would mean payload desynced from __rts)
        tol = {
            r.ts: r.asof_v
            for r in fn(left, right, "key", "ts", "rts", ["v"], tolerance=3).collect()
        }
        assert tol == {10.0: None, 20.0: None}, (fn, tol)
