"""Streaming NEAR-dup dedup ([EXT] §2.10 x K9-minhash, r12; made
replay-idempotent + state-capped in r13): incoming micro-batches are
checked against a persisted MinHash-band index of everything
previously admitted — the near-dup rung of the streaming ladder above
streaming/dedup.py's exact-hash tier.

Shape (the foreachBatch state pattern the repo already uses for the
CDC sink and the IVF index append):

* state at ``{state_dir}/bands/epoch=N``  — (doc, band, bh) for every
  document ADMITTED in epoch N (the persisted banded index; at scale:
  partition by (band, bh-prefix) so the batch probe prunes), and
  ``{state_dir}/shingles/epoch=N`` — (doc, sh) for exact-Jaccard
  verification; ``{state_dir}/_epoch`` is the atomic commit pointer
  (the CDC sink's pointer-committed recipe, streaming/cdc.py).
* per batch: compute the batch's bands/shingles ONCE
  (_portable_sig_bands — a pure function of text, so state written by
  earlier batches is mutually consistent), flag batch docs matching
  the CORPUS index (minhash_incremental_pairs_precomputed: corpus-band
  x batch-band equi-join only, hot state buckets routed through their
  min-id representative — per-batch cost tracks the batch even as the
  index grows), flag WITHIN-batch near-dups via the capped portable
  pair generator + min-id representative, then write, in this order:
  (1) the batch verdicts to ``{out_dir}/epoch=N`` (mode=overwrite —
  replaying an epoch rewrites the same directory with the same
  deterministic content), (2) the novel docs' bands and shingles to
  the epoch-partitioned state, (3) the ``_epoch`` pointer (os.replace,
  the commit point).
* REPLAY SAFETY (the r12 verdict's defect, fixed here): a crash
  anywhere inside the body re-runs the epoch. The probe reads ONLY
  state with epoch <= the committed pointer, so a half-written state
  append from the crashed attempt is invisible — a replayed batch can
  never match its own rows (and minhash_incremental_pairs_precomputed
  additionally excludes corpus_doc == batch_doc as defense in depth).
  A replay of an already-committed epoch is a no-op. Epoch ids must be
  monotone per state_dir (one checkpoint owns one state_dir — restart
  the checkpoint, recompact the state).
* duplicates admitted concurrently within one batch collapse to the
  min-id representative; a near-dup arriving in a later batch points
  at the admitted doc it duplicates.

Unlike dropDuplicatesWithinWatermark (exact tier), near-dup state
cannot be keyed by one column, so eviction is operational, not
engine-managed: compact/expire {state_dir} on the nightly batch-dedup
schedule (same posture as compact_ivf_index). State grows with
ADMITTED (novel) docs only.

The verdict ALGEBRA (what is_near_dup/rep mean after folding chunks in
order) is oracle-checked cross-engine by the catalog query
`dedup_streaming_replay` (queries/dedup.py), which drives
neardup_replay_chunks below; the file/commit plumbing is covered by
tests/test_neardup_stream.py including crash-replay scenarios.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fegis_spark.operators.dedup import (
    _portable_sig_bands,
    banded_candidate_pairs,
    minhash_incremental_pairs_precomputed,
    minhash_verify_pairs,
)

#: candidate cap — the same hot-bucket routing bound the batch catalog
#: queries use (queries/sqlfrag.HOT_CAP rationale), applied BOTH to the
#: within-batch self-join and to the state-side probe buckets (an
#: admitted boilerplate family's bucket grows with the stream; without
#: the cap, per-batch candidates grow with state occupancy — the
#: uncapped-LSH quadratic class, r10).
NEARDUP_CAP = 64


def neardup_verdicts(
    batch_ids: DataFrame,
    bands_b: DataFrame,
    sh_b: DataFrame,
    bands_c: DataFrame | None = None,
    sh_c: DataFrame | None = None,
    jaccard_threshold: float = 0.5,
    within_cap: int | None = NEARDUP_CAP,
    state_cap: int | None = NEARDUP_CAP,
) -> DataFrame:
    """Pure verdict core (no I/O): given the batch ids (column `doc`),
    the batch's precomputed bands/shingles, and the admitted-corpus
    state (None on the first epoch), return (doc, is_near_dup, rep) —
    rep is the admitted corpus doc this one duplicates (a corpus match
    wins: it is the already-admitted doc), else the within-batch
    min-id representative, else NULL (novel). Deterministic: min-id
    representatives, pure-function signatures, no rand()."""
    if bands_c is not None:
        vs_corpus = minhash_incremental_pairs_precomputed(
            bands_c, sh_c, bands_b, sh_b, jaccard_threshold,
            max_bucket_size=state_cap,
        )
        corpus_rep = vs_corpus.groupBy(F.col("batch_doc").alias("doc")).agg(
            F.min("corpus_doc").alias("rep_corpus")
        )
    else:
        corpus_rep = None

    # within-batch pairs from the SAME precomputed bands/shingles (the
    # r12 body computed the batch signature twice; ADVICE r12 low #1)
    # band-ok: cap plumbed from the call site — the sink passes
    # NEARDUP_CAP; the catalog replay passes None (2^60 md5 band
    # keyspace, oracle replays the uncapped candidate set exactly)
    cand_b = banded_candidate_pairs(bands_b, max_bucket_size=within_cap)
    pairs_b = minhash_verify_pairs(cand_b, sh_b, jaccard_threshold)
    # min-id representative per batch doc: (a < b) by generator contract
    within_rep = pairs_b.groupBy(F.col("b").alias("doc")).agg(
        F.min("a").alias("rep_within")
    )

    doc_type = batch_ids.schema["doc"].dataType
    verdicts = (
        batch_ids.join(within_rep, "doc", "left")
        if corpus_rep is None
        else batch_ids.join(corpus_rep, "doc", "left").join(
            within_rep, "doc", "left"
        )
    )
    if corpus_rep is None:
        verdicts = verdicts.withColumn("rep_corpus", F.lit(None).cast(doc_type))
    return verdicts.select(
        "doc",
        (F.col("rep_corpus").isNotNull() | F.col("rep_within").isNotNull()).alias(
            "is_near_dup"
        ),
        F.coalesce("rep_corpus", "rep_within").alias("rep"),
    )


def _read_committed_epoch(state_dir: str) -> int:
    ptr = os.path.join(state_dir, "_epoch")
    if not os.path.exists(ptr):
        return -1
    with open(ptr) as f:
        return int(f.read().strip())


def _read_state(
    spark: SparkSession,
    state_dir: str,
    committed: int,
    bands_b: DataFrame,
    sh_b: DataFrame,
) -> tuple[DataFrame | None, DataFrame | None]:
    """Committed admitted-corpus state: epoch-partitioned parquet
    filtered to epoch <= the pointer, so half-written appends from a
    crashed attempt (epoch > pointer) are invisible to the probe.
    Explicit schemas (the batch side's, plus the epoch partition
    column) keep the read well-defined even when some epoch admitted
    zero docs and left a footerless empty partition directory."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    bdir = os.path.join(state_dir, "bands")
    if committed < 0 or not os.path.exists(bdir):
        return None, None

    def with_epoch(schema):  # StructType.add mutates; build fresh
        return StructType(
            list(schema.fields) + [StructField("epoch", IntegerType())]
        )

    bands_c = (
        spark.read.schema(with_epoch(bands_b.schema))
        .parquet(bdir)
        .filter(F.col("epoch") <= committed)
        .select("doc", "band", "bh")
    )
    sh_c = (
        spark.read.schema(with_epoch(sh_b.schema))
        .parquet(os.path.join(state_dir, "shingles"))
        .filter(F.col("epoch") <= committed)
        .select("doc", "sh")
    )
    return bands_c, sh_c


def neardup_sink(
    state_dir: str,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    ngram: int = 3,
    jaccard_threshold: float = 0.5,
):
    """foreachBatch callable: verdicts to ``{out_dir}/epoch=N``, novel
    docs' bands/shingles to the epoch-partitioned state, then the
    atomic pointer commit — idempotent under epoch replay (see module
    doc). Read verdicts with spark.read.parquet(out_dir); the epoch
    partition column identifies the micro-batch."""

    def body(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        committed = _read_committed_epoch(state_dir)
        if committed >= epoch_id:
            # pointer flip is the commit point: verdicts + state for
            # this epoch are already fully written — replay is a no-op
            return
        base_b, _sig, banded_b = _portable_sig_bands(
            batch_df, text_col, id_col, num_hashes, bands, ngram, True
        )
        bands_b = banded_b.select("doc", "band", "bh")
        sh_b = base_b.select("doc", "sh")
        bands_c, sh_c = _read_state(spark, state_dir, committed, bands_b, sh_b)
        out = neardup_verdicts(
            batch_df.select(F.col(id_col).alias("doc")),
            bands_b, sh_b, bands_c, sh_c, jaccard_threshold,
        )
        out = out.persist()  # two consumers: verdict sink + novel filter
        try:
            # (1) verdicts FIRST (the r12 body mutated state before the
            # caller's verdict write — the crash window that re-flagged
            # novel docs as duplicates of themselves)
            out.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")
            # (2) state append, epoch-partitioned + overwrite (replay
            # rewrites the same directory)
            novel = out.filter(~F.col("is_near_dup")).select("doc")
            # bcast-ok: batch-bounded novel ids
            bands_new = bands_b.join(F.broadcast(novel), "doc")
            # bcast-ok: batch-bounded novel ids
            sh_new = sh_b.join(F.broadcast(novel), "doc")
            bands_new.write.mode("overwrite").parquet(
                f"{state_dir}/bands/epoch={epoch_id}"
            )
            sh_new.write.mode("overwrite").parquet(
                f"{state_dir}/shingles/epoch={epoch_id}"
            )
            # (3) atomic commit
            tmp = os.path.join(state_dir, "_epoch.tmp")
            with open(tmp, "w") as f:
                f.write(str(epoch_id))
            os.replace(tmp, os.path.join(state_dir, "_epoch"))
        finally:
            # batch intermediates must not accumulate over a
            # long-running stream (ADVICE r12 low #1)
            out.unpersist()
            base_b.unpersist()

    return body


def run_neardup_sink(
    stream_df: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kw,
):
    """Wire neardup_sink as a foreachBatch sink writing batch verdicts
    under ``{out_dir}/epoch=N`` (idempotent per epoch: verdict-first
    ordering + epoch-partitioned overwrites + pointer commit). Returns
    the StreamingQuery."""
    return (
        stream_df.writeStream.foreachBatch(
            neardup_sink(state_dir, out_dir, text_col, id_col, **kw)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_neardup_state(spark: SparkSession, state_dir: str) -> int:
    """Operational state maintenance (the module doc's nightly
    compaction): fold all committed epoch partitions into ONE
    partition at the current pointer epoch, leaving the pointer — the
    replay guard — untouched, so replays of already-committed epochs
    stay no-ops and the probe's ``epoch <= committed`` filter reads
    the compacted layout unchanged. Run while the stream is stopped.

    Crash-safe by content equivalence: each table is rewritten to a
    sibling directory and swapped in with atomic renames; a crash
    between the two tables' swaps leaves one compacted and one not,
    but both layouts hold exactly the committed rows, so the probe's
    answer is identical either way. Uncommitted leftovers (epoch >
    pointer, from a crashed batch attempt) are dropped — the retry
    rewrites them. Returns the committed epoch (-1 = nothing to do)."""
    import shutil

    committed = _read_committed_epoch(state_dir)
    if committed < 0:
        return -1
    for sub in ("bands", "shingles"):
        src = os.path.join(state_dir, sub)
        if not os.path.exists(src):
            continue
        df = (
            spark.read.parquet(src)
            .filter(F.col("epoch") <= committed)
            .drop("epoch")
        )
        tmp = src + ".compact"
        shutil.rmtree(tmp, ignore_errors=True)
        df.write.mode("overwrite").parquet(f"{tmp}/epoch={committed}")
        old = src + ".old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(src, old)
        os.rename(tmp, src)
        shutil.rmtree(old)
    return committed


def neardup_replay_chunks(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str,
    id_col: str,
    chunk_col: str,
    n_chunks: int,
    num_hashes: int = 16,
    bands: int = 4,
    ngram: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Pure batch replay of the streaming verdict algebra (no files, no
    checkpoints): fold `docs` chunk-by-chunk in `chunk_col` order —
    each chunk is one micro-batch probing the admitted-docs state of
    all earlier chunks — and return every doc's verdict
    (doc, chunk, is_near_dup, rep). This is the cross-engine-checkable
    surface for the streaming tier: the catalog query
    `dedup_streaming_replay` oracle-replays the same fold in SQL
    (uncapped candidates so DuckDB reproduces the set exactly; the
    capped routing is certified separately by dedup_minhash_capped and
    the hot-state cap by tests/test_neardup_stream.py).

    Bounded rounds (n_chunks is a design constant), so plan nesting is
    bounded — no localCheckpoint needed; chunk intermediates persist
    (multi-consumer: verdicts + state growth)."""
    state_bands: DataFrame | None = None
    state_sh: DataFrame | None = None
    outs: list[DataFrame] = []
    for t in range(n_chunks):
        chunk = docs.filter(F.col(chunk_col) == t)
        base_b, _sig, banded_b = _portable_sig_bands(
            chunk, text_col, id_col, num_hashes, bands, ngram, True
        )
        bands_b = banded_b.select("doc", "band", "bh")
        sh_b = base_b.select("doc", "sh")
        out = neardup_verdicts(
            chunk.select(F.col(id_col).alias("doc")),
            bands_b, sh_b, state_bands, state_sh, jaccard_threshold,
            within_cap=None, state_cap=None,
        ).persist()  # consumers: result union + novel-state filter
        outs.append(out.withColumn("chunk", F.lit(t)))
        novel = out.filter(~F.col("is_near_dup")).select("doc")
        # persist the admitted bands/shingles: chunk t's state is read
        # by EVERY later chunk's probe (and rides inside their state
        # unions) — unpersisted, chunk 0's signature aggregation would
        # recompute once per later chunk (quadratic in n_chunks)
        nb = bands_b.join(novel, "doc").persist()
        ns = sh_b.join(novel, "doc").persist()
        state_bands = nb if state_bands is None else state_bands.unionByName(nb)
        state_sh = ns if state_sh is None else state_sh.unionByName(ns)
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.select("doc", "chunk", "is_near_dup", "rep")
