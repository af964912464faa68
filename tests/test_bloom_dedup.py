"""Bloom-prefiltered incremental dedup: equivalence with the plain
anti-join, no-false-negative routing on a constructed duplicate-heavy
batch, and the prefilter's pruning actually biting (the sf tables have
no exact duplicates, so the bloom-positive path needs constructed
pressure)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fegis_spark.operators.dedup import bloom_maybe, build_bloom

SF_DIR = "/root/testdata/sf0.001"


def test_bloom_incremental_matches_plain_anti_join(spark):
    from fegis_spark.catalog import catalog

    q = catalog()["dedup_bloom_incremental"].builder
    plain = catalog()["dedup_incremental"].builder
    got = {tuple(r) for r in q(spark, SF_DIR).collect()}
    exp = {tuple(r) for r in plain(spark, SF_DIR).collect()}
    assert got == exp and len(got) > 0


def test_bloom_prunes_constructed_duplicates(spark):
    corpus = spark.createDataFrame(
        [(f"doc {i}",) for i in range(500)], "text string"
    ).select(F.md5(F.col("text")).alias("h"))
    # batch: 100 dups of the corpus + 100 genuinely new docs
    batch = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)]
        + [(1000 + i, f"new {i}") for i in range(100)],
        "doc_id long, text string",
    ).select("doc_id", F.md5(F.col("text")).alias("h"))

    num_bits = 23_000
    bf = build_bloom(corpus, "h", num_bits)
    b = batch.withColumn("maybe", bloom_maybe(spark, bf, num_bits)(F.col("h")))

    rows = b.collect()
    maybe_ids = {r.doc_id for r in rows if r.maybe}
    # no false negatives: every true dup is bloom-positive
    assert set(range(100)) <= maybe_ids
    # pruning bites: the false-positive fraction among new docs is small
    assert len(maybe_ids) <= 110

    direct = b.filter(~F.col("maybe")).select("doc_id")
    verified = (
        b.filter(F.col("maybe")).join(corpus, "h", "left_anti").select("doc_id")
    )
    new_ids = {r.doc_id for r in direct.unionAll(verified).collect()}
    assert new_ids == {1000 + i for i in range(100)}


def test_bloom_partial_merge_covers_all_partitions(spark):
    # keys spread over many partitions: the OR-merge must not lose any
    df = spark.range(0, 5000, 1, 16).select(
        F.md5(F.col("id").cast("string")).alias("h")
    )
    num_bits = 120_000
    bf = build_bloom(df, "h", num_bits)
    probe = df.withColumn("maybe", bloom_maybe(spark, bf, num_bits)(F.col("h")))
    assert probe.filter(~F.col("maybe")).count() == 0
