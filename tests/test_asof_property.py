"""Property-based check: asof_join_union must agree with pandas
merge_asof (the de-facto reference semantics for backward as-of) on
arbitrary generated frames — keys with no matches, duplicate
timestamps, empty right side, unsorted input."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fegis_spark.operators.asof import asof_join_union

_key = st.integers(min_value=0, max_value=3)
_ts = st.integers(min_value=0, max_value=50)
_val = st.integers(min_value=-1000, max_value=1000)

_left_rows = st.lists(st.tuples(_key, _ts), min_size=1, max_size=25)
_right_rows = st.lists(st.tuples(_key, _ts, _val), min_size=0, max_size=25)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_left_rows, right=_right_rows)
def test_asof_union_matches_pandas_merge_asof(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k int, ts int, row_id int"
    )
    rdf = spark.createDataFrame(right, "k int, ts int, v int") if right else (
        spark.createDataFrame([], "k int, ts int, v int")
    )

    got = {
        r.row_id: r.asof_v
        for r in asof_join_union(ldf, rdf, "k", "ts", "ts", ["v"]).collect()
    }

    lp = pd.DataFrame([(k, t, i) for i, (k, t) in enumerate(left)], columns=["k", "ts", "row_id"])
    rp = pd.DataFrame(right, columns=["k", "ts", "v"]).astype(
        {"k": "int64", "ts": "int64", "v": "int64"}
    )
    # merge_asof requires per-key unique right timestamps to be
    # deterministic; our operator keeps the max v at equal (k, ts)
    # (see _dedupe_right) — apply the same rule to the reference
    rp = rp.sort_values(["k", "ts", "v"]).groupby(["k", "ts"], as_index=False).last()
    exp_df = pd.merge_asof(
        lp.sort_values(["ts", "row_id"]),
        rp.sort_values("ts"),
        on="ts",
        by="k",
        direction="backward",
    )
    exp = {
        int(r.row_id): (None if pd.isna(r.v) else int(r.v))
        for r in exp_df.itertuples()
    }
    assert got == exp
