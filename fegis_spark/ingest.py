"""Batch ingest pipeline (SURVEY.md §3.1): the reference's per-call
ingest path re-expressed as one DataFrame pipeline.

Reference flow per invocation (fegis/server.py:80-115 +
fegis/storage.py:145-200): partition args → validate → lineage lookup
(one Qdrant round trip per call!) → assemble payload → embed → upsert.

Batch shape: the read-modify-write disappears — sequence numbers come
from ONE window pass over the whole batch, the embedding is an
Arrow-batched pandas_udf, and the write is a partitioned parquet (plus
optionally the Qdrant sink, sources/qdrant_sink.py):

    raw tool-call log
      → apply_defaults + validation predicate   (schema.py)
      → default title / content fallback        (T8, T7)
      → map split into parameters/frames        (P7, T9)
      → sequence + preceding ids per session    (A2, W2 — one window)
      → embed content                           (pandas_udf, §2.11)
      → write parquet partitioned by tool       (S2-S4)

At 100 TB: the only shuffle is the session window (keyed on
session_id, high cardinality → even distribution); embedding
parallelism = executor cores; the write is append-only columnar.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fegis_spark.functions.textfns import default_title, exclude_standard_keys

EMBEDDING_DIM = 64


def _uuid_layout(hex32: Column) -> Column:
    """Format a 32-hex-char string in 8-4-4-4-12 UUID layout."""
    return F.concat_ws(
        "-",
        F.substring(hex32, 1, 8),
        F.substring(hex32, 9, 4),
        F.substring(hex32, 13, 4),
        F.substring(hex32, 17, 4),
        F.substring(hex32, 21, 12),
    )


def document_text(content: Column, tool: Column, frames_json: Column) -> Column:
    """T7: the embedded document = Content, falling back to
    'Tool: {name}\\n' + frames JSON (reference storage.py:158-160)."""
    return F.when(
        content.isNotNull() & (content != ""), content
    ).otherwise(F.concat(F.lit("Tool: "), tool, F.lit("\n"), frames_json))


def hash_embedding_udf(dim: int = EMBEDDING_DIM):
    """Deterministic stand-in embedder (Arrow-batched, iterator form).

    The reference embeds with fastembed/ONNX (BAAI/bge-small-en,
    storage.py:53) — that model is not in this container, so the
    PRODUCTION pattern is kept (iterator pandas_udf: load model once
    per executor, stream Arrow batches) with a deterministic
    feature-hash projection standing in for the ONNX forward pass.
    Swap `_encode` for the real model where available.
    """

    from zlib import crc32  # stable across processes (Python's hash() is salted)

    def _encode(texts: pd.Series) -> np.ndarray:
        out = np.zeros((len(texts), dim), dtype=np.float32)
        for i, t in enumerate(texts.fillna("")):
            # token feature-hash: deterministic, language-agnostic
            for tok in t.lower().split():
                out[i, crc32(tok.encode()) % dim] += 1.0
            n = np.linalg.norm(out[i])
            if n > 0:
                out[i] /= n
        return out

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # per-executor init happens here (model load in the real impl)
        for s in batches:
            m = _encode(s)
            yield pd.Series(list(m))

    return _embed


BGE_SMALL_EN_DIM = 384  # reference config.py:49 / storage.py:53


def fastembed_embedding_udf(
    model_name: str = "BAAI/bge-small-en", dim: int = BGE_SMALL_EN_DIM
):
    """Real embedding inference path: fastembed/ONNX BAAI/bge-small-en
    (384-dim, cosine space), the exact model the reference ingests with
    (storage.py:53, config.py:49). Import-gated — raises ImportError on
    the driver if fastembed isn't installed (it isn't in this
    container; the hash stand-in stays the oracle default).

    Same iterator-pandas_udf shape as the stand-in: the model loads
    ONCE per executor Python worker, then streams Arrow batches through
    the ONNX forward pass.
    """
    import fastembed  # noqa: F401 — fail fast driver-side, not in tasks

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from fastembed import TextEmbedding

        model = TextEmbedding(model_name=model_name)  # once per worker
        for s in batches:
            vecs = model.embed(s.fillna("").tolist())
            yield pd.Series([np.asarray(v, dtype=np.float32) for v in vecs])

    return _embed


def make_embed_udf(kind: str | None = None, dim: int | None = None):
    """Embedder selection: FEGIS_EMBEDDER env var ('hash' default,
    'fastembed' for the real model). The hash stand-in remains the
    default because oracle checks need cross-engine determinism and the
    ONNX model isn't in this container; flipping the env var swaps in
    real inference with no other code change."""
    import os

    kind = kind or os.environ.get("FEGIS_EMBEDDER", "hash")
    if kind == "fastembed":
        return fastembed_embedding_udf(dim=dim or BGE_SMALL_EN_DIM)
    if kind == "hash":
        return hash_embedding_udf(dim or EMBEDDING_DIM)
    raise ValueError(f"Unknown embedder kind: {kind!r} (use 'hash' or 'fastembed')")


def ingest_batch(
    calls: DataFrame,
    param_keys: list[str] | None = None,
    embed_udf=None,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Raw tool-call rows → canonical memories rows.

    Expects columns: tool, session_id, ts (arrival), arguments
    MAP<STRING,STRING>. Produces the MEMORIES_SCHEMA columns (model.py)
    minus the meta struct (caller attaches build metadata).
    """
    param_keys = param_keys or []
    args = F.col("arguments")
    params_all = F.map_filter(
        args, lambda k, v: k.isin("Title", "Content", "Context", *param_keys)
    )
    frames = F.map_filter(
        args, lambda k, v: ~k.isin("Title", "Content", "Context", *param_keys)
    )
    step = (
        calls.withColumn("title_raw", args.getItem("Title"))
        .withColumn("content", args.getItem("Content"))
        .withColumn("context", args.getItem("Context"))
        .withColumn("parameters", exclude_standard_keys(params_all))
        .withColumn("frames", frames)
    )
    step = step.withColumn(
        "title", default_title(F.col("title_raw"), F.col("tool"))
    ).withColumn(
        "document",
        document_text(F.col("content"), F.col("tool"), F.to_json(F.col("frames"))),
    )
    # grpwin-ok: session_id cardinality scales with input
    w = Window.partitionBy("session_id").orderBy(*(order_cols or ["ts"]))
    step = step.withColumn("sequence_order", F.row_number().over(w))
    # The reference mints uuid4 per memory (T6, storage.py:171). Batch
    # ingest derives ids content-deterministically instead (md5 of
    # session+sequence in uuid layout): reproducible reruns, and the
    # preceding id is then a pure expression — no second window pass,
    # and no nondeterministic-expression re-evaluation hazard that
    # uuid() + lag(uuid()) would carry.
    step = step.withColumn(
        "memory_id", _uuid_layout(F.md5(F.concat_ws("#", "session_id", "sequence_order")))
    ).withColumn(
        "preceding_memory_id",
        F.when(
            F.col("sequence_order") > 1,
            _uuid_layout(
                F.md5(F.concat_ws("#", F.col("session_id"), F.col("sequence_order") - 1))
            ),
        ),
    ).withColumn("timestamp", F.col("ts"))
    embed = embed_udf or make_embed_udf()
    step = step.withColumn("embedding", embed(F.col("document")))
    return step.select(
        "memory_id",
        "title",
        "context",
        "content",
        "tool",
        "session_id",
        "sequence_order",
        "timestamp",
        "preceding_memory_id",
        "parameters",
        "frames",
        "embedding",
    )


def write_memories(df: DataFrame, path: str) -> None:
    """S2-S4 batch sink: parquet partitioned by tool (the Qdrant payload
    indexes' layout analog — partition pruning serves keyword filters,
    min/max stats serve ranges)."""
    df.write.mode("overwrite").partitionBy("tool").parquet(path)
