"""Search-strategy semantics tests (limits, threshold-after-topk,
filter-before-score ordering) on a controlled corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fegis_spark.plans.search import (
    basic_search,
    by_id_search,
    filtered_search,
    topk,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # unit vectors on a plane: similarity to [1,0] = cos(angle)
    import math

    rows = [
        (i, [math.cos(math.radians(a)), math.sin(math.radians(a))], i % 2)
        for i, a in enumerate([0, 10, 20, 45, 60, 80, 90, 120, 150, 180])
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")


Q = [1.0, 0.0]


def test_basic_topk_order(corpus):
    got = [r.vec_id for r in basic_search(corpus, "embedding", Q, k=3).collect()]
    assert got == [0, 1, 2]


def test_threshold_after_topk(corpus):
    # k=3 keeps angles 0,10,20 — threshold 0.9 keeps cos>=0.9 (0,10,20 all >=0.93)
    out = basic_search(corpus, "embedding", Q, k=3, score_threshold=0.98)
    assert [r.vec_id for r in out.collect()] == [0, 1]
    # threshold-before-topk would instead return 3 rows (0,1,2 all pass 0.9);
    # with 0.98 only 2 survive — ordering is observable
    out2 = basic_search(corpus, "embedding", Q, k=10, score_threshold=0.98)
    assert [r.vec_id for r in out2.collect()] == [0, 1]


def test_filtered_before_score(corpus):
    # label==1 removes the top match (vec 0 has label 0): filtered search
    # must return vec 1 first — proof the filter ran BEFORE top-k
    out = filtered_search(
        corpus,
        "embedding",
        Q,
        filters=[{"field": "label", "operator": "is", "value": 1}],
        k=2,
        valid_fields={"label", "vec_id"},
        timestamp_fields=set(),
    )
    assert [r.vec_id for r in out.collect()] == [1, 3]


def test_filtered_empty_query(corpus):
    out = filtered_search(
        corpus,
        "embedding",
        None,
        filters=[{"field": "label", "operator": "is", "value": 0}],
        k=100,
        valid_fields={"label"},
        timestamp_fields=set(),
    )
    rows = out.collect()
    assert len(rows) == 5 and all(r.score == 0.0 for r in rows)


def test_by_id(corpus):
    rows = by_id_search(corpus, "vec_id", 7).collect()
    assert len(rows) == 1 and rows[0].score == 1.0


def test_limit_bounds(corpus):
    scored = corpus.withColumn("score", F.lit(1.0))
    with pytest.raises(ValueError, match="limit"):
        topk(scored, 0, "vec_id")
    with pytest.raises(ValueError, match="limit"):
        topk(scored, 101, "vec_id")


def test_zero_norm_guard(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = basic_search(df, "embedding", Q, k=2).collect()
    scores = {r.vec_id: r.score for r in out}
    assert scores[0] == 0.0 and scores[1] == 1.0
