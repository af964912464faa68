"""Index-once/query-many IVF: the stored-layout flow must return the
same results as the in-session ann_ivf, and the probed query must scan
only the probed list partitions (dynamic partition pruning)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fegis_spark.model import load_table
from fegis_spark.operators.knn import ann_ivf, ann_ivf_indexed, build_ivf_index

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ivf_index(spark, tmp_path_factory):
    emb = load_table(spark, SF_DIR, "embeddings")
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    build_ivf_index(emb, path, "vec_id", n_lists=8)
    return path, emb


def test_indexed_matches_in_session(spark, ivf_index):
    path, emb = ivf_index
    queries = emb.filter(F.col("vec_id") < 5)
    fresh = {
        (r.query_id, r.corpus_id, r.rank)
        for r in ann_ivf(emb, queries, "vec_id", "vec_id", k=3, n_lists=8).collect()
    }
    stored = {
        (r.query_id, r.corpus_id, r.rank)
        for r in ann_ivf_indexed(spark, path, queries, "vec_id", k=3).collect()
    }
    assert fresh == stored
    assert stored  # non-empty


def test_indexed_scan_is_partition_pruned(spark, ivf_index):
    path, emb = ivf_index
    queries = emb.filter(F.col("vec_id") < 5)
    plan = (
        ann_ivf_indexed(spark, path, queries, "vec_id", k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the corpus scan must carry a runtime partition filter on list_id
    assert "dynamicpruning" in plan, plan


def test_index_layout_partitioned_by_list(spark, ivf_index):
    import os

    path, _ = ivf_index
    dirs = [d for d in os.listdir(f"{path}/corpus") if d.startswith("list_id=")]
    assert len(dirs) > 1, dirs
