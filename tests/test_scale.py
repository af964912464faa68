"""Scale-helper equivalence tests: salting and bucketing must not
change results, only physical behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from fegis_spark.model import load_table
from fegis_spark.operators.scale import read_bucketed, salted_count_agg, write_bucketed

SF_DIR = "/root/testdata/sf0.001"


def test_salted_agg_equals_plain(spark):
    ev = load_table(spark, SF_DIR, "events")
    salted = {
        (r.event_type,): (r.n, round(r.total, 6))
        for r in salted_count_agg(ev, ["event_type"], "value", salt_buckets=8).collect()
    }
    plain = {
        (r.event_type,): (r.n, round(r.total, 6))
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total"),
        )
        .collect()
    }
    assert salted == plain


def test_bucketed_write_no_shuffle_join(spark):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    write_bucketed(ev, "ev_bucketed", "user_id", num_buckets=8)
    t = read_bucketed(spark, "ev_bucketed")
    # self-join on the bucket key: plan must contain no Exchange on the
    # bucketed scan side (bucketing replaces the shuffle)
    j = t.alias("a").join(t.alias("b"), "user_id")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    # count Exchanges: bucketed-bucketed equi-join needs none (broadcast
    # may kick in at this size; accept either zero-exchange SMJ or broadcast)
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 0, plan[:2000]
    assert j.count() > 0
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    import shutil

    shutil.rmtree("spark-warehouse/ev_bucketed", ignore_errors=True)


def test_sharded_packing_invariants(spark):
    from fegis_spark.operators.scale import pack_greedy_sharded

    docs = load_table(spark, SF_DIR, "documents")
    budget = 16_384
    out = pack_greedy_sharded(
        docs, ["lang"], "doc_id", "n_chars", budget=budget, shards=4
    )
    # every doc packed exactly once
    assert out.count() == docs.count()
    max_doc = docs.agg(F.max("n_chars")).collect()[0][0]
    rows = (
        out.groupBy("lang", "pack_id")
        .agg(F.sum("n_chars").alias("w"))
        .collect()
    )
    for r in rows:
        # greedy bound: budget + the row that crossed the boundary
        assert r.w <= budget + max_doc, (r.lang, r.pack_id, r.w)
    # pack ids contiguous from 0 per lang
    by_lang: dict[str, list[int]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.pack_id)
    for lang, ids in by_lang.items():
        assert sorted(ids) == list(range(len(ids))), lang
    # deterministic across runs
    a = {(r.lang, r.pack_id): r.w for r in rows}
    b = {
        (r.lang, r.pack_id): r.w
        for r in pack_greedy_sharded(
            docs, ["lang"], "doc_id", "n_chars", budget=budget, shards=4
        )
        .groupBy("lang", "pack_id")
        .agg(F.sum("n_chars").alias("w"))
        .collect()
    }
    assert a == b


def test_aqe_splits_skewed_join_at_runtime(spark):
    """SCALE.md claims AQE skew-join handles residual join skew; pin it:
    a join where one key owns 90% of the left side must execute with
    OptimizeSkewedJoin splitting the hot partition (skew=true in the
    final adaptive plan) once the skew thresholds are in range. Restores
    session confs afterward (shared fixture)."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the SMJ path
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 — unset conf
            old[k] = None
        spark.conf.set(k, v)
    try:
        left = spark.range(200_000).select(
            F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
            F.expr("repeat('x', 64)").alias("pad"),
        )
        right = spark.range(2_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k")
        rows = j.collect()  # executes THIS DataFrame's QueryExecution
        assert len(rows) == 180_200
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
