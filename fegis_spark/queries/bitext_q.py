"""Margin-based bitext mining ([EXT] §2.12 family: similarity search
applied to training-data construction).

The standard parallel-pair miner for translation / cross-lingual
training corpora (Artetxe & Schwenk, "Margin-based Parallel Corpus
Mining with Multilingual Sentence Embeddings", ACL 2019): a candidate
pair (x, y) scores by its cosine RELATIVE to the average cosine of
each side's k-nearest neighborhood —

    margin(x, y) = cos(x, y) / ((avgK(x→Y) + avgK(y→X)) / 2)

which suppresses hub vectors that are near everything. Pairs with
margin > 1 beat their neighborhoods and are accepted.

Scale shape (batch-vs-corpus, same framing as minhash_incremental):
the X side is the bounded incoming batch (broadcast), the Y corpus is
scanned ONCE for the forward k-NN; the backward k-NN only needs the
≤ |X|·k forward candidates (broadcast) against the X-side corpus —
one more linear scan. No corpus×corpus product anywhere; at 100 TB
swap the forward scan for the IVF index probe (operators/knn) and the
margin re-rank is unchanged.

Determinism: ranking compares the UNROUNDED fold cosine (bit-identical
cross-engine — the _cos_pair/cosine_sql convention); neighborhood
averages ride the SRP integer quantization recipe
(CAST(round(cos*1e6) AS BIGINT) — half-away-from-zero in both engines)
so the k-term sums are exact integers and the margin is a quotient of
bit-identical doubles, shipped UNROUNDED (CLAUDE.md midpoint rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fegis_spark.catalog import register
from fegis_spark.model import load_table
from fegis_spark.queries.vector_q import _cos_pair

#: bounded incoming batch: X side = label < 5 (the "source language"),
#: restricted to the first BITEXT_BATCH vec_ids — the batch-vs-corpus
#: contract that keeps both broadcasts provably small
BITEXT_BATCH = 64
#: neighborhood size for the margin denominator
BITEXT_K = 4
#: acceptance threshold: margin > 1 = pair beats its neighborhoods
BITEXT_ACCEPT = 1.0


def _bitext_oracle() -> str:
    cos_f = _cos_pair("a.embedding", "b.embedding")
    cos_b = _cos_pair("x.embedding", "c.embedding")
    k = BITEXT_K
    return f"""
    WITH xb AS MATERIALIZED (
      SELECT vec_id, embedding FROM embeddings
      WHERE label < 5 AND vec_id < {BITEXT_BATCH}
    ), yc AS MATERIALIZED (
      SELECT vec_id, embedding FROM embeddings WHERE label >= 5
    ), xc AS MATERIALIZED (
      SELECT vec_id, embedding FROM embeddings WHERE label < 5
    ), fwd AS MATERIALIZED (
      SELECT a_id, b_id, cos, rk FROM (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id, {cos_f} AS cos,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY {cos_f} DESC, b.vec_id) AS rk
        FROM xb a CROSS JOIN yc b
      ) WHERE rk <= {k}
    ), fa AS (
      SELECT a_id, CAST(SUM(CAST(round(cos * 1e6) AS BIGINT)) AS BIGINT) AS sa,
             COUNT(*) AS na
      FROM fwd GROUP BY a_id
    ), cand AS (
      SELECT DISTINCT b_id FROM fwd
    ), bwd AS (
      SELECT b_id, CAST(SUM(CAST(round(cos * 1e6) AS BIGINT)) AS BIGINT) AS sb,
             COUNT(*) AS nb
      FROM (
        SELECT c.vec_id AS b_id, x.vec_id AS x_id, {cos_b} AS cos,
               row_number() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY {cos_b} DESC, x.vec_id) AS rk
        FROM (SELECT y.vec_id, y.embedding FROM yc y
              JOIN cand ON cand.b_id = y.vec_id) c
        CROSS JOIN xc x
      ) WHERE rk <= {k}
      GROUP BY b_id
    ), scored AS (
      SELECT f.a_id, f.b_id,
             CAST(round(f.cos * 1e6) AS BIGINT) AS cos_q,
             f.cos / nullif(((sa / (na * 1e6)) + (sb / (nb * 1e6))) / 2.0, 0.0)
               AS margin
      FROM fwd f JOIN fa USING (a_id) JOIN bwd USING (b_id)
    )
    SELECT a_id, b_id, cos_q, margin, (margin > {BITEXT_ACCEPT}) AS accepted
    FROM (
      SELECT a_id, b_id, cos_q, margin,
             row_number() OVER (
               PARTITION BY a_id ORDER BY margin DESC, b_id) AS mrk
      FROM scored
    ) WHERE mrk = 1
    """


@register(
    "bitext_margin_mining",
    oracle=_bitext_oracle(),
    covers=("K1-approx", "[EXT]-ann", "K8-pattern"),
)
def bitext_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] margin-based bitext mining (module doc): per batch vector
    the best cross-side match with its margin score and acceptance
    flag. Forward k-NN = one corpus scan with the broadcast batch,
    backward k-NN = one X-corpus scan with the broadcast candidate set
    (≤ batch·k rows); margins are pure projections over the two k-row
    aggregates. Output is one row per batch vector (top-1 by margin,
    b_id tiebreak) — non-vacuous at every sf regardless of how many
    pairs clear the threshold."""
    from fegis_spark.functions.vector import (
        cosine_from_parts_sql,
        dot_sql,
        norm_sql,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # norms once per side of each corpus x panel fanout (bit-identical
    # to cosine(), 1.8x less CPU per pair — r14)
    xb = emb.filter((F.col("label") < 5) & (F.col("vec_id") < BITEXT_BATCH)).select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("__xa"),
        F.expr(norm_sql("embedding")).alias("__an"),
    )
    yc = emb.filter(F.col("label") >= 5).select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("__yb"),
        F.expr(norm_sql("embedding")).alias("__bn"),
    )
    xc = emb.filter(F.col("label") < 5).select(
        F.col("vec_id").alias("x_id"),
        F.col("embedding").alias("__xx"),
        F.expr(norm_sql("embedding")).alias("__xn"),
    )
    # grpwin-ok: a_id is the corpus-side row id — partition count scales
    wf = Window.partitionBy("a_id").orderBy(F.desc("cos"), F.col("b_id"))
    fwd = (
        yc.crossJoin(F.broadcast(xb))  # bcast-ok: BITEXT_BATCH-row batch panel
        .withColumn(
            "cos",
            F.expr(
                cosine_from_parts_sql(dot_sql("__xa", "__yb"), "__an", "__bn")
            ),
        )
        .withColumn("rk", F.row_number().over(wf))
        .filter(F.col("rk") <= BITEXT_K)
        .select("a_id", "b_id", "cos")
    )
    from pyspark import StorageLevel

    # three consumers (fa, cand, scored) — persist or the corpus
    # cross-score recomputes per consumer
    fwd = fwd.persist(StorageLevel.MEMORY_AND_DISK)
    cq = F.round(F.col("cos") * 1e6).cast("bigint")
    fa = fwd.groupBy("a_id").agg(
        F.sum(cq).cast("bigint").alias("sa"), F.count("*").alias("na")
    )
    cand = (
        fwd.select("b_id").distinct().join(yc, "b_id")
    )  # ≤ batch·k rows, with embeddings
    # panel-ok: WindowGroupLimit(Partial) below the exchange (row_number + immediate filter)
    wb = Window.partitionBy("b_id").orderBy(F.desc("cos"), F.col("x_id"))
    bwd = (
        xc.crossJoin(F.broadcast(cand))  # bcast-ok: <= batch*k candidate panel
        .withColumn(
            "cos",
            F.expr(
                cosine_from_parts_sql(dot_sql("__xx", "__yb"), "__xn", "__bn")
            ),
        )
        .withColumn("rk", F.row_number().over(wb))
        .filter(F.col("rk") <= BITEXT_K)
        .groupBy("b_id")
        .agg(F.sum(cq).cast("bigint").alias("sb"), F.count("*").alias("nb"))
    )
    denom = (
        (F.col("sa") / (F.col("na") * 1e6)) + (F.col("sb") / (F.col("nb") * 1e6))
    ) / 2.0
    scored = (
        fwd.join(F.broadcast(fa), "a_id")  # bcast-ok: one row per batch vector
        .join(F.broadcast(bwd), "b_id")  # bcast-ok: one row per candidate (<= batch*k)
        .select(
            "a_id",
            "b_id",
            cq.alias("cos_q"),
            (F.col("cos") / F.nullif(denom, F.lit(0.0))).alias("margin"),
        )
    )
    # grpwin-ok: a_id is the corpus-side row id — partition count scales
    wm = Window.partitionBy("a_id").orderBy(F.desc("margin"), F.col("b_id"))
    return (
        scored.withColumn("mrk", F.row_number().over(wm))
        .filter(F.col("mrk") == 1)
        .select(
            "a_id",
            "b_id",
            "cos_q",
            "margin",
            (F.col("margin") > BITEXT_ACCEPT).alias("accepted"),
        )
    )
