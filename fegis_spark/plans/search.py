"""Search strategies (SURVEY.md §2.3, K1-K7 + F12): the reference's
three SearchMemory modes re-expressed as DataFrame plans.

Reference dispatch: fegis/search/handler.py:22-50; strategies at
fegis/search/strategies.py:262-320. Semantics preserved exactly:

* ``basic``     — score corpus against embedded query, top-k (K1).
* ``filtered``  — predicate applied BEFORE scoring/top-k ("filtered
  ANN", strategies.py:286-291; ordering is semantically significant —
  X1). Catalyst pushes the predicate into the scan.
* ``by_id``     — primary-key lookup, score := 1.0 (strategies.py:294-320).
* score_threshold applies AFTER top-k (handler.py:52-59, F12 — RRF
  can overwrite scores, so threshold-then-limit would be wrong).
* limit k ∈ [1,100], default 3 (search_tool_schema.json:12-18).

orderBy+limit compiles to TakeOrderedAndProject — per-partition heap
top-k then driver merge of k·partitions rows; no global sort at scale.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fegis_spark.functions.vector import cosine_lit_sql
from fegis_spark.plans.filters import compile_filters

DEFAULT_LIMIT = 3
MAX_LIMIT = 100
DEFAULT_SCORE_THRESHOLD = 0.4
EXACT_MATCH_SCORE = 1.0  # reference strategies.py:65


def _check_limit(limit: int) -> int:
    if not 1 <= limit <= MAX_LIMIT:
        raise ValueError(f"limit must be in [1, {MAX_LIMIT}], got {limit}")
    return limit


def score_against(df: DataFrame, vec_col: str, query_vec: Sequence[float]) -> DataFrame:
    """Attach exact cosine ``score`` against a literal query vector.
    Single-parse expression with the query's self-norm HOISTED to a
    driver-computed literal (cosine_lit_sql — bitwise equal to the
    Column/HOF forms, pinned in tests/test_search.py): one parse
    instead of ~130 py4j round-trips, and one fewer per-row fold —
    a HOF is not foldable, so the cosine_sql form re-folded the
    constant self-norm per corpus row (r14; measured 1.4x on the
    scoring projection, evidence/cosine_codegen_ab_r14.json)."""
    return df.withColumn("score", F.expr(cosine_lit_sql(vec_col, query_vec)))


def topk(df: DataFrame, k: int, tiebreak: str | Column) -> DataFrame:
    """K4: deterministic top-k by score desc (TakeOrderedAndProject)."""
    tb = F.col(tiebreak) if isinstance(tiebreak, str) else tiebreak
    return df.orderBy(F.desc("score"), tb).limit(_check_limit(k))


def basic_search(
    df: DataFrame,
    vec_col: str,
    query_vec: Sequence[float],
    k: int = DEFAULT_LIMIT,
    tiebreak: str = "vec_id",
    score_threshold: float | None = None,
) -> DataFrame:
    """K1: exact brute-force KNN (correctness tier; the reference's ANN
    is approximate HNSW — SURVEY.md §7.4). Threshold applied after
    top-k per F12."""
    out = topk(score_against(df, vec_col, query_vec), k, tiebreak)
    if score_threshold is not None:
        out = out.filter(F.col("score") >= F.lit(score_threshold))
    return out


def filtered_search(
    df: DataFrame,
    vec_col: str,
    query_vec: Sequence[float] | None,
    filters: Sequence[Mapping[str, Any]],
    k: int = DEFAULT_LIMIT,
    tiebreak: str = "vec_id",
    score_threshold: float | None = None,
    **compile_kw: Any,
) -> DataFrame:
    """K2: filter-first search. With an empty/None query vector the
    reference still returns filter-matching points (empty query string
    allowed for filtered, handler.py:38-43) — score is 0.0 then."""
    pred = compile_filters(filters, **compile_kw)
    base = df.filter(pred)
    if query_vec is None:
        scored = base.withColumn("score", F.lit(0.0))
    else:
        scored = score_against(base, vec_col, query_vec)
    out = topk(scored, k, tiebreak)
    if score_threshold is not None:
        out = out.filter(F.col("score") >= F.lit(score_threshold))
    return out


def by_id_search(df: DataFrame, id_col: str, id_value: Any) -> DataFrame:
    """K3: point lookup wrapped as a scored result (score := 1.0).
    Parquet predicate pushdown makes this a min/max-pruned scan (S5)."""
    return df.filter(F.col(id_col) == F.lit(id_value)).withColumn(
        "score", F.lit(EXACT_MATCH_SCORE)
    )
