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
