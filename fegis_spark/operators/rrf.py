"""Deterministic reciprocal-rank fusion (SURVEY.md K5).

The reference only *documents* hybrid RRF (qdrant-client rank-fuses
and overwrites scores — fegis/search/handler.py:52 comment); here it
is implemented explicitly: dense rank (cosine) + lexical rank (term
occurrence count), fused as 1/(K+r_dense) + 1/(K+r_lex) with the
canonical K=60. Ranks come from row_number windows with id tiebreaks,
so the fusion is fully deterministic and oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fegis_spark.functions.vector import cosine, lit_vector
from fegis_spark.operators.text_analysis import occurrences, padded

RRF_K = 60


def lexical_score(text: Column, terms: Sequence[str]) -> Column:
    """Occurrence-count lexical relevance (portable; BM25 needs corpus
    stats — this is the deterministic stand-in the fusion rank needs)."""
    p = padded(text)
    return sum([occurrences(p, f" {t} ") for t in terms], F.lit(0).cast("double"))


def rrf_fuse(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    text_col: str,
    query_vec: Sequence[float],
    query_terms: Sequence[str],
    k: int = 10,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """Hybrid search: dense + lexical ranks → RRF score → top-k.

    Both rank windows are global (unpartitioned) — correct for a
    search result set; at scale the input should already be a
    candidate pool (top-N per modality), not the full corpus.
    """
    scored = df.select(
        F.col(id_col).alias("id"),
        cosine(F.col(vec_col), lit_vector(query_vec)).alias("dense"),
        lexical_score(F.col(text_col), query_terms).alias("lex"),
    )
    w_d = Window.orderBy(F.desc("dense"), F.col("id"))
    w_l = Window.orderBy(F.desc("lex"), F.col("id"))
    fused = (
        scored.withColumn("r_dense", F.row_number().over(w_d).cast("bigint"))
        .withColumn("r_lex", F.row_number().over(w_l).cast("bigint"))
        .withColumn(
            "rrf",
            F.round(
                1.0 / (rrf_k + F.col("r_dense")) + 1.0 / (rrf_k + F.col("r_lex")), 6
            ),
        )
    )
    return fused.orderBy(F.desc("rrf"), F.col("id")).limit(k).select(
        "id", "r_dense", "r_lex", "rrf"
    )


def rrf_fuse_pooled(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    text_col: str,
    query_vec: Sequence[float],
    query_terms: Sequence[str],
    k: int = 10,
    pool: int = 100,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """Scale-path hybrid search: top-`pool` per modality first (each a
    TakeOrderedAndProject over the corpus — per-partition heaps, no
    global sort), then rank + fuse inside the constant-size pools.

    A doc's rank within its top-`pool` equals its global rank, so for
    docs present in a pool the RRF contribution is identical to the
    all-corpus form (rrf_fuse); a doc absent from a modality's pool
    contributes 0 for that modality (the standard candidate-pool RRF
    convention). Corpus-size work is two scans + two top-k heaps; the
    windows and the join touch only 2×pool rows."""
    scored = df.select(
        F.col(id_col).alias("id"),
        cosine(F.col(vec_col), lit_vector(query_vec)).alias("dense"),
        lexical_score(F.col(text_col), query_terms).alias("lex"),
    )
    w_d = Window.orderBy(F.desc("dense"), F.col("id"))
    w_l = Window.orderBy(F.desc("lex"), F.col("id"))
    dpool = (
        scored.select("id", "dense")
        .orderBy(F.desc("dense"), F.col("id"))
        .limit(pool)
        .withColumn("r_dense", F.row_number().over(w_d).cast("bigint"))
        .select("id", "r_dense")
    )
    lpool = (
        scored.select("id", "lex")
        .orderBy(F.desc("lex"), F.col("id"))
        .limit(pool)
        .withColumn("r_lex", F.row_number().over(w_l).cast("bigint"))
        .select("id", "r_lex")
    )
    fused = dpool.join(lpool, "id", "full_outer").withColumn(
        "rrf",
        F.round(
            F.coalesce(1.0 / (rrf_k + F.col("r_dense")), F.lit(0.0))
            + F.coalesce(1.0 / (rrf_k + F.col("r_lex")), F.lit(0.0)),
            6,
        ),
    )
    return fused.orderBy(F.desc("rrf"), F.col("id")).limit(k).select(
        "id", "r_dense", "r_lex", "rrf"
    )
