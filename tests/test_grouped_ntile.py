"""grouped_ntile / grouped_lead (operators/topk.py, r13): row-for-row
equivalence with the native full-partition window forms they replace —
ntile/lead never get a WindowGroupLimit, so the plain window funnels a
corpus-scaling hot group; the bucket offset-merge decomposition must
reproduce them exactly, including remainder tiles, empty buckets,
single-row groups, and NULL lead values.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from fegis_spark.operators.topk import grouped_lead, grouped_ntile


def _df(spark, rows, schema, bucket_expr):
    return (
        spark.createDataFrame(rows, schema)
        .repartition(7)
        .withColumn("b", F.expr(bucket_expr))
    )


def _rows(df, cols):
    return sorted(
        tuple(r[c] for c in cols) for r in df.collect()
    )


def test_ntile_matches_window_all_n(spark):
    # group sizes 1..12 plus 29..33 hit EVERY (cnt % n) remainder
    # class for n in {2, 4, 7} at both q = cnt DIV n regimes (q = 0/1
    # small groups, q >= 4 large ones) — the first draft's g*8+1 sizes
    # were all ≡1 (mod 4), leaving the n=4 remainder classes untested;
    # v has ties so the id tiebreak must decide identically
    sizes = list(range(1, 13)) + list(range(29, 34))
    rows = [
        (g, i, (i * 7) % 13) for g, n in enumerate(sizes) for i in range(n)
    ]
    df = _df(spark, rows, "g int, id int, v int", "v DIV 3")
    got = grouped_ntile(df, "g", ["v", "id"], "b", {"n2": 2, "n4": 4, "n7": 7})
    w = Window.partitionBy("g").orderBy("v", "id")
    want = (
        df.withColumn("n2", F.ntile(2).over(w).cast("bigint"))
        .withColumn("n4", F.ntile(4).over(w).cast("bigint"))
        .withColumn("n7", F.ntile(7).over(w).cast("bigint"))
    )
    cols = ["g", "id", "n2", "n4", "n7"]
    assert _rows(got, cols) == _rows(want.select(*cols), cols)


def test_ntile_n_exceeds_group_size(spark):
    # cnt < n: q = 0, every tile is the rank itself (first branch only)
    rows = [(0, 1, 10), (0, 2, 20), (1, 3, 5)]
    df = _df(spark, rows, "g int, id int, v int", "v DIV 8")
    got = {
        (r["g"], r["id"]): r["n5"]
        for r in grouped_ntile(df, "g", ["v", "id"], "b", {"n5": 5}).collect()
    }
    assert got == {(0, 1): 1, (0, 2): 2, (1, 3): 1}


def test_ntile_multi_group_and_sparse_buckets(spark):
    # bucket values with holes (v DIV 100 over scattered v): offsets
    # must come from the non-empty panel only
    rows = [
        (g, s, i, v)
        for g in range(2)
        for s in ("a", "b")
        for i, v in enumerate([3, 205, 207, 901, 950, 951, 952, 1500])
    ]
    df = _df(spark, rows, "g int, s string, id int, v int", "v DIV 100")
    got = grouped_ntile(df, ["g", "s"], ["v", "id"], "b", {"n3": 3})
    w = Window.partitionBy("g", "s").orderBy("v", "id")
    want = df.withColumn("n3", F.ntile(3).over(w).cast("bigint"))
    cols = ["g", "s", "id", "n3"]
    assert _rows(got, cols) == _rows(want.select(*cols), cols)


def test_lead_matches_window_across_buckets(spark):
    rows = [(g, i, (i * 11) % 17) for g in range(4) for i in range(g * 9 + 1)]
    df = _df(spark, rows, "g int, id int, v int", "v DIV 4")
    got = grouped_lead(df, "g", ["v", "id"], "v", "b", out_name="nv")
    w = Window.partitionBy("g").orderBy("v", "id")
    want = df.withColumn("nv", F.lead("v").over(w))
    cols = ["g", "id", "nv"]
    assert _rows(got, cols) == _rows(want.select(*cols), cols)


def test_lead_null_values_and_boundaries(spark):
    # NULL values inside the sequence: the boundary test is the lifted
    # struct, so a NULL successor VALUE must surface as NULL while a
    # missing successor row also yields NULL — same as native lead
    rows = [
        (0, 1, 10, None),
        (0, 2, 20, 5.0),
        (0, 3, 30, None),
        (0, 4, 40, 7.0),
        (1, 5, 50, 1.0),
    ]
    df = _df(spark, rows, "g int, id int, v int, x double", "v DIV 15")
    got = grouped_lead(df, "g", ["v", "id"], "x", "b", out_name="nx")
    w = Window.partitionBy("g").orderBy("v", "id")
    want = df.withColumn("nx", F.lead("x").over(w))
    cols = ["g", "id", "nx"]
    assert _rows(got, cols) == _rows(want.select(*cols), cols)


def test_order_range_buckets_skewed_and_null(spark):
    """Quantile-derived buckets: monotone in the order column (the one
    correctness requirement), far better balanced than fixed-width on
    a heavy-tailed column, NULLs to bucket -1, and grouped_ntile over
    them still equals the native window."""
    from fegis_spark.operators.topk import order_range_buckets

    # heavy tail: 90% of values in [0, 10), a few huge outliers
    rows = [(0, i, float(i % 10)) for i in range(180)] + [
        (0, 1000 + j, float(10 ** (j + 2))) for j in range(20)
    ]
    rows += [(0, 2000, None), (0, 2001, None)]
    df = spark.createDataFrame(rows, "g int, id int, v double").repartition(5)
    b = order_range_buckets(df, "v", num_buckets=8, bucket_name="b")
    got = {(r["id"]): (r["v"], r["b"]) for r in b.collect()}
    # monotone: sort by (v, id) and check bucket never decreases
    seq = [got[i][1] for i in sorted(got, key=lambda i: (got[i][0] is not None, got[i][0], i))]
    assert all(x <= y for x, y in zip(seq, seq[1:]))
    assert got[2000][1] == -1 and got[2001][1] == -1
    # balance: fixed-width (v DIV width) would put 90% of rows in one
    # bucket; quantile buckets cap the biggest non-null bucket well below
    from collections import Counter

    sizes = Counter(v[1] for k, v in got.items() if v[1] >= 0)
    assert max(sizes.values()) <= 0.5 * 200
    # and the decomposition over these buckets still matches native ntile
    got_nt = grouped_ntile(b, "g", ["v", "id"], "b", {"n4": 4})
    w = Window.partitionBy("g").orderBy(F.asc_nulls_first("v"), "id")
    want = b.withColumn("n4", F.ntile(4).over(w).cast("bigint"))
    cols = ["id", "n4"]
    assert _rows(got_nt, cols) == _rows(want.select(*cols), cols)


def test_no_full_group_window_in_plan(spark):
    """The decomposition's whole point: no WindowExec partitioned by
    the group columns ALONE over the corpus-scaling input. Windows in
    the plan must either include the bucket column (local slices) or
    run over the bounded counts panel (input is an Aggregate)."""
    rows = [(g, i, i % 29) for g in range(2) for i in range(50)]
    df = _df(spark, rows, "g int, id int, v int", "v DIV 4")
    plan = (
        grouped_ntile(df, "g", ["v", "id"], "b", {"n4": 4})
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    import re

    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        # classify EACH spec individually (ADVICE r13: a whole-plan
        # '__gn_n in plan' fallback is vacuous — it is always true for
        # these plans, so a rogue full-group corpus window could never
        # fail it). Partition clause = the spec args before the first
        # ordered (ASC/DESC) column; the window FUNCTION sits in the
        # text immediately before the spec, so a panel window is one
        # whose function references the bounded counts column __gn_n.
        pcols = []
        for tok in spec.split("specifiedwindowframe")[0].split(","):
            if " ASC" in tok or " DESC" in tok:
                break
            pcols.append(tok.strip())
        is_panel = "__gn_n#" in plan[max(0, m.start() - 200) : m.start()]
        assert any(t.startswith("b#") for t in pcols) or is_panel, (
            f"full-group window found: {spec}"
        )
