"""grouped_topk (operators/topk.py): row-for-row equivalence with the
row_number() window form it replaces (r11 verdict #1), including ties,
ascending mode, payload columns, and the no-WindowExec plan pin.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from fegis_spark.operators.topk import grouped_topk


def _window_topk(df, group, value, ident, k, ascending=False):
    order = [F.asc(value) if ascending else F.desc(value), F.col(ident)]
    w = Window.partitionBy(group).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("bigint"))
    )


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_matches_window_desc_with_ties(spark):
    # scores engineered so every group has ties at the k boundary —
    # the id tiebreak must decide identically to the window form
    rows = [
        (g, i, float((i * 7) % 5))
        for g in range(3)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "g int, id int, score double").repartition(7)
    got = grouped_topk(df, "g", "score", "id", 6)
    want = _window_topk(df, "g", "score", "id", 6)
    cols = ["g", "id", "score", "rank"]
    assert _rows(got, cols) == _rows(want.select(*cols), cols)


def test_matches_window_ascending_bigint(spark):
    rows = [(g, i, (i * 13) % 9) for g in range(2) for i in range(30)]
    df = spark.createDataFrame(rows, "g int, id int, d long").repartition(5)
    got = grouped_topk(df, "g", "d", "id", 4, ascending=True)
    want = _window_topk(df, "g", "d", "id", 4, ascending=True)
    cols = ["g", "id", "d", "rank"]
    assert _rows(got, cols) == _rows(want.select(*cols), cols)


def test_payload_and_multi_group(spark):
    rows = [
        (g, s, i, float(i % 11), f"p{g}-{i}")
        for g in range(2)
        for s in ("a", "b")
        for i in range(25)
    ]
    df = spark.createDataFrame(
        rows, "g int, s string, id int, score double, tag string"
    ).repartition(4)
    got = grouped_topk(
        df, ["g", "s"], "score", "id", 3, payload_cols=("tag",)
    )
    out = {(r["g"], r["s"], r["rank"]): (r["id"], r["tag"]) for r in got.collect()}
    assert len(out) == 2 * 2 * 3
    # payload rides with the winning row
    for (g, s, _rk), (i, tag) in out.items():
        assert tag == f"p{g}-{i}"
    # rank 1 in each group is the max score (10.0 first hit by id asc)
    want = _window_topk(df, ["g", "s"], "score", "id", 3)
    w = {
        (r["g"], r["s"], r["rank"]): (r["id"], r["tag"])
        for r in want.collect()
    }
    assert out == w


def test_k_exceeds_group_size(spark):
    df = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 2.0), (1, 3, 3.0)], "g int, id int, v double"
    )
    got = grouped_topk(df, "g", "v", "id", 10)
    assert _rows(got, ["g", "id", "rank"]) == [
        (0, 1, 2),
        (0, 2, 1),
        (1, 3, 1),
    ]


def test_value_roundtrip_bit_exact(spark):
    # double negation is a sign-bit flip: values survive bit-exactly
    vals = [1.0000000000000002, 0.1, -0.0, 2.5e-17, 1922.4999999999998]
    df = spark.createDataFrame(
        [(0, i, v) for i, v in enumerate(vals)], "g int, id int, v double"
    )
    got = {r["id"]: r["v"] for r in grouped_topk(df, "g", "v", "id", 5).collect()}
    for i, v in enumerate(vals):
        assert got[i] == v and str(got[i]) == str(v)


def test_no_window_exec_in_plan(spark):
    df = spark.createDataFrame(
        [(g, i, float(i)) for g in range(2) for i in range(10)],
        "g int, id int, v double",
    )
    plan = (
        grouped_topk(df, "g", "v", "id", 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
