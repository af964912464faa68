"""r9 memo mechanics: the hoisted BM25 stats memo (keyed on the
analyzed tfs plan's semanticHash + analyzer terms) and the query-vec
memo must (a) hit on identical corpus+terms, (b) miss on different
terms or different data, (c) never change values vs a cold build."""

from __future__ import annotations

from pyspark.sql import functions as F

import fegis_spark.operators.bm25 as bm25mod
from fegis_spark.operators.bm25 import bm25_scores


def _corpus(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(path)
    return spark.read.parquet(path)


def test_stats_memo_hit_miss_and_value_stability(spark, tmp_path):
    df = _corpus(
        spark,
        str(tmp_path / "c1"),
        [(1, "data systems store data"), (2, "model data"), (3, "no match here")],
    )
    bm25mod._STATS_MEMO.clear()
    cold = {r.id: r.score for r in bm25_scores(df, "text", "doc_id", ["data"]).collect()}
    assert len(bm25mod._STATS_MEMO) == 1

    # identical corpus plan + terms -> memo HIT (no new entry), values identical
    warm = {r.id: r.score for r in bm25_scores(df, "text", "doc_id", ["data"]).collect()}
    assert len(bm25mod._STATS_MEMO) == 1
    assert warm == cold

    # different terms -> new key
    bm25_scores(df, "text", "doc_id", ["model"]).collect()
    assert len(bm25mod._STATS_MEMO) == 2

    # different DATA (different path) -> new key even with same terms
    df2 = _corpus(
        spark, str(tmp_path / "c2"), [(1, "data"), (2, "data data")]
    )
    bm25_scores(df2, "text", "doc_id", ["data"]).collect()
    assert len(bm25mod._STATS_MEMO) == 3

    # memo values == a cold rebuild (clearing the memo must not change scores)
    bm25mod._STATS_MEMO.clear()
    recold = {r.id: r.score for r in bm25_scores(df, "text", "doc_id", ["data"]).collect()}
    assert recold == cold


def test_stats_memo_is_bounded():
    bm25mod._STATS_MEMO.clear()
    for i in range(bm25mod._STATS_MEMO_MAX + 10):
        if len(bm25mod._STATS_MEMO) >= bm25mod._STATS_MEMO_MAX:
            bm25mod._STATS_MEMO.pop(next(iter(bm25mod._STATS_MEMO)))
        bm25mod._STATS_MEMO[(i, ("t",))] = (1.0, (0.0,))
    assert len(bm25mod._STATS_MEMO) <= bm25mod._STATS_MEMO_MAX
    bm25mod._STATS_MEMO.clear()


def test_query_vec_memo(spark):
    from fegis_spark.queries import vector_q

    vector_q._QUERY_VEC_MEMO.clear()
    v1 = vector_q._query_vec(spark, "/root/testdata/sf0.001")
    assert len(vector_q._QUERY_VEC_MEMO) == 1
    v2 = vector_q._query_vec(spark, "/root/testdata/sf0.001")
    assert v2 is v1  # memo hit, no second lookup job
    vector_q._query_vec(spark, "/root/testdata/sf0.001", vec_id=1)
    assert len(vector_q._QUERY_VEC_MEMO) == 2
