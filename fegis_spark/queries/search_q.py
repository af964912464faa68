"""Search-pipeline catalog queries: strategy dispatch (K6) composed
end-to-end, and RRF hybrid fusion (K5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fegis_spark.catalog import register
from fegis_spark.model import load_table
from fegis_spark.operators.rrf import rrf_fuse
from fegis_spark.operators.text_analysis import occurrences, padded
from fegis_spark.queries.vector_q import _COS, _query_vec

_TERMS = ["data", "model", "system"]


def _lex_sql(c: str) -> str:
    p = "' ' || lower(trim(regexp_replace({c}, '\\s+', ' ', 'g'))) || ' '".format(c=c)
    return (
        "("
        + " + ".join(
            f"(length({p}) - length(replace({p}, ' {t} ', ''))) / {len(t) + 2}"
            for t in _TERMS
        )
        + ")"
    )


@register(
    "rrf_hybrid_search",
    oracle=f"""
    WITH scored AS (
      SELECT d.doc_id AS id,
             {_COS} AS dense,
             {_lex_sql('d.text')}::DOUBLE AS lex
      FROM documents d
      JOIN embeddings a ON a.vec_id = d.doc_id
      CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    ), ranked AS (
      SELECT id,
             row_number() OVER (ORDER BY dense DESC, id) AS r_dense,
             row_number() OVER (ORDER BY lex DESC, id) AS r_lex
      FROM scored
    )
    SELECT id, r_dense, r_lex,
           round(1.0/(60 + r_dense) + 1.0/(60 + r_lex), 6) AS rrf
    FROM ranked
    ORDER BY round(1.0/(60 + r_dense) + 1.0/(60 + r_lex), 6) DESC, id
    LIMIT 10
    """,
    covers=("K5", "K6"),
    bench=True,
)
def rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 hybrid: dense cosine rank + lexical occurrence rank fused
    with RRF(K=60) — the deterministic form of the qdrant-client
    hybrid mode the reference documents (handler.py:52)."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    joined = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "text", "embedding"
    )
    return rrf_fuse(
        joined,
        "doc_id",
        "embedding",
        "text",
        _query_vec(spark, sf_dir),
        _TERMS,
        k=10,
    )


@register(
    "search_pipeline_full",
    oracle=f"""
    SELECT vec_id, label, score FROM (
      SELECT a.vec_id, a.label, round({_COS}, 6) AS score
      FROM embeddings a
      CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
      WHERE a.label BETWEEN 1 AND 8 AND a.vec_id IS DISTINCT FROM 0
      ORDER BY {_COS} DESC, a.vec_id
      LIMIT 20
    ) WHERE score >= 0.1
    """,
    covers=("K2", "K6", "F2", "F5", "F12", "X1"),
)
def search_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6 end-to-end composed pipeline in the reference's stage order
    (§3.2): compile filters → filter → score → top-k → threshold →
    project. Exercises the between + is_not algebra inside a filtered
    search."""
    from fegis_spark.plans.search import filtered_search

    emb = load_table(spark, sf_dir, "embeddings")
    out = filtered_search(
        emb,
        "embedding",
        _query_vec(spark, sf_dir),
        filters=[
            {"field": "label", "operator": "between", "value": [1, 8]},
            {"field": "vec_id", "operator": "is_not", "value": 0},
        ],
        k=20,
        score_threshold=0.1,
        valid_fields={"label", "vec_id"},
        timestamp_fields=set(),
    )
    return out.select("vec_id", "label", F.round("score", 6).alias("score"))


@register(
    "rrf_hybrid_pooled",
    oracle=f"""
    WITH scored AS (
      SELECT d.doc_id AS id,
             {_COS} AS dense,
             {_lex_sql('d.text')}::DOUBLE AS lex
      FROM documents d
      JOIN embeddings a ON a.vec_id = d.doc_id
      CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    ), dp AS (
      SELECT id, row_number() OVER (ORDER BY dense DESC, id) AS r_dense
      FROM scored ORDER BY dense DESC, id LIMIT 100
    ), lp AS (
      SELECT id, row_number() OVER (ORDER BY lex DESC, id) AS r_lex
      FROM scored ORDER BY lex DESC, id LIMIT 100
    ), fused AS (
      SELECT COALESCE(dp.id, lp.id) AS id, dp.r_dense, lp.r_lex,
             round(COALESCE(1.0/(60 + dp.r_dense), 0) + COALESCE(1.0/(60 + lp.r_lex), 0), 6) AS rrf
      FROM dp FULL OUTER JOIN lp ON dp.id = lp.id
    )
    SELECT id, r_dense, r_lex, rrf FROM fused ORDER BY rrf DESC, id LIMIT 10
    """,
    covers=("K5", "K6", "X2"),
)
def rrf_hybrid_pooled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 hybrid at scale: candidate pools (top-100 per modality via
    TakeOrderedAndProject) are ranked and fused instead of the whole
    corpus — the form whose corpus-size cost is two scans and two
    constant-size heaps. Pool-absent docs contribute 0 for that
    modality, the standard candidate-pool RRF convention."""
    from fegis_spark.operators.rrf import rrf_fuse_pooled

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    joined = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "text", "embedding"
    )
    return rrf_fuse_pooled(
        joined,
        "doc_id",
        "embedding",
        "text",
        _query_vec(spark, sf_dir),
        _TERMS,
        k=10,
        pool=100,
    )
