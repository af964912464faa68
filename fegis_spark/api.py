"""User-facing API parity surface: the reference's SearchMemory tool
(fegis/search_tool_schema.json + fegis/server.py:118-133) as one
function over a memories DataFrame.

A user of the reference switches by replacing the MCP call

    SearchMemory(query=..., limit=..., search_type=..., filters=[...],
                 detail=..., score_threshold=...)

with ``search_memory(memories_df, query=..., ...)`` — same defaults,
same validation errors, same stage order (§3.2): compile filters →
filter → score → top-k → threshold → project view.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fegis_spark.functions.views import apply_view
from fegis_spark.ingest import EMBEDDING_DIM
from fegis_spark.plans import search as S
from fegis_spark.sources.qdrant_sink import PAYLOAD_INDEXES

#: fields the reference declares with a TEXT payload index
#: (storage.py:74-75) — Qdrant gives `contains` on these fields
#: analyzed MatchText semantics, so the filter compiler does too.
TEXT_INDEX_FIELDS = frozenset(
    f for f, kind in PAYLOAD_INDEXES.items() if kind == "text"
)

DEFAULTS = {
    "limit": 3,
    "search_type": "basic",
    "detail": "summary",
    "score_threshold": 0.4,
}  # reference server.py:118-128 / search_tool_schema.json

QUERY_MAX_LENGTH = 1000  # search_tool_schema.json:11


def embed_query(text: str, dim: int = EMBEDDING_DIM) -> list[float]:
    """Driver-side single-string embedding with the SAME feature-hash
    the ingest pandas_udf uses — query and corpus must share the
    embedding space (the reference embeds queries in-process with the
    same fastembed model it ingests with, storage.py:53)."""
    import numpy as np
    from zlib import crc32

    v = np.zeros(dim, dtype=np.float32)
    for tok in (text or "").lower().split():
        v[crc32(tok.encode()) % dim] += 1.0
    n = float(np.linalg.norm(v))
    return [float(x) for x in (v / n if n > 0 else v)]


def search_memory(
    memories: DataFrame,
    query: str = "",
    limit: int = DEFAULTS["limit"],
    search_type: str = DEFAULTS["search_type"],
    filters: Sequence[Mapping[str, Any]] = (),
    detail: str = DEFAULTS["detail"],
    score_threshold: float = DEFAULTS["score_threshold"],
    query_vec: Sequence[float] | None = None,
    ref_ts: Column | None = None,
) -> DataFrame:
    """The SearchMemory entry point.

    * ``basic``        — semantic top-k over embedded query (K1)
    * ``filtered``     — filters first, then semantic top-k; empty
                         query allowed (K2)
    * ``by_memory_id`` — point lookup, score 1.0 (K3)

    Guards mirror reference handler.py:38-43 (F13) and the schema's
    1000-char query limit. ``query_vec`` overrides the built-in query
    embedder (e.g. when memories were embedded with a real model).
    ``ref_ts`` pins relative_time for deterministic output.
    """
    if len(query or "") > QUERY_MAX_LENGTH:
        raise ValueError(f"query exceeds {QUERY_MAX_LENGTH} characters")
    if search_type in ("basic", "by_memory_id") and not (query or "").strip():
        # reference handler.py:38-43
        raise ValueError(f"Query required for '{search_type}' search")

    if search_type == "by_memory_id":
        # the reference handler applies score_threshold uniformly after
        # every search type — a threshold > 1.0 filters out even the
        # exact-match point (score 1.0)
        out = S.by_id_search(memories, "memory_id", query.strip()).filter(
            F.col("score") >= score_threshold
        )
    elif search_type == "basic":
        qv = list(query_vec) if query_vec is not None else embed_query(query)
        out = S.basic_search(
            memories, "embedding", qv, k=limit, tiebreak="memory_id",
            score_threshold=score_threshold,
        )
    elif search_type == "filtered":
        qv = (
            list(query_vec)
            if query_vec is not None
            else (embed_query(query) if (query or "").strip() else None)
        )
        out = S.filtered_search(
            memories, "embedding", qv, filters, k=limit, tiebreak="memory_id",
            score_threshold=score_threshold,
            text_index_fields=TEXT_INDEX_FIELDS,
        )
    else:
        raise ValueError(f"Unknown search_type: {search_type}")

    return apply_view(out, detail, ref_ts=ref_ts)
