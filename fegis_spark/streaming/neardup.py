"""Streaming NEAR-dup dedup ([EXT] §2.10 x K9-minhash, r12): incoming
micro-batches are checked against a persisted MinHash-band index of
everything previously admitted — the near-dup rung of the streaming
ladder above streaming/dedup.py's exact-hash tier.

Shape (the foreachBatch state pattern the repo already uses for the
CDC sink and the IVF index append):

* state at ``{state_dir}/bands``  — (doc, band, bh) for every ADMITTED
  document (the persisted banded index; at scale: partition by
  (band, bh-prefix) so the batch probe prunes), and
  ``{state_dir}/shingles`` — (doc, sh) for exact-Jaccard verification;
* per batch: compute the batch's bands/shingles once
  (_portable_sig_bands — a pure function of text, so state written by
  earlier batches is mutually consistent), flag batch docs matching
  the CORPUS index (minhash_incremental_pairs_precomputed: corpus-band
  x batch-band equi-join only — per-batch cost tracks the batch),
  flag WITHIN-batch near-dups via the capped portable pair generator +
  min-id representative, then append only the novel docs' bands and
  shingles to the state;
* duplicates admitted concurrently within one batch collapse to the
  min-id representative; a near-dup arriving in a later batch points
  at the admitted doc it duplicates.

Unlike dropDuplicatesWithinWatermark (exact tier), near-dup state
cannot be keyed by one column, so eviction is operational, not
engine-managed: compact/expire {state_dir} on the nightly batch-dedup
schedule (same posture as compact_ivf_index). State grows with
ADMITTED (novel) docs only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fegis_spark.operators.dedup import (
    _portable_sig_bands,
    minhash_incremental_pairs_precomputed,
    minhash_lsh_pairs_portable,
)

#: within-batch candidate cap — the same hot-bucket routing bound the
#: batch catalog queries use (queries/sqlfrag.HOT_CAP rationale)
NEARDUP_CAP = 64


def neardup_stream_batch(
    batch_df: DataFrame,
    state_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    ngram: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """foreachBatch body: returns the batch verdicts
    (doc, is_near_dup, rep — the admitted/representative doc this one
    duplicates, NULL when novel) and appends the novel docs' bands and
    shingles to the state. Deterministic: min-id representatives,
    pure-function signatures, no rand()."""
    spark = batch_df.sparkSession
    base_b, _sig, banded_b = _portable_sig_bands(
        batch_df, text_col, id_col, num_hashes, bands, ngram, True
    )
    bands_b = banded_b.select("doc", "band", "bh")
    sh_b = base_b.select("doc", "sh")

    # --- vs the admitted corpus state ---------------------------------
    have_state = os.path.exists(f"{state_dir}/bands")
    if have_state:
        bands_c = spark.read.parquet(f"{state_dir}/bands")
        sh_c = spark.read.parquet(f"{state_dir}/shingles")
        vs_corpus = minhash_incremental_pairs_precomputed(
            bands_c, sh_c, bands_b, sh_b, jaccard_threshold
        )
        corpus_rep = vs_corpus.groupBy(F.col("batch_doc").alias("doc")).agg(
            F.min("corpus_doc").alias("rep_corpus")
        )
    else:
        corpus_rep = None

    # --- within the batch ----------------------------------------------
    pairs_b = minhash_lsh_pairs_portable(
        batch_df,
        text_col,
        id_col,
        num_hashes=num_hashes,
        bands=bands,
        ngram=ngram,
        jaccard_threshold=jaccard_threshold,
        max_bucket_size=NEARDUP_CAP,
    )
    # min-id representative per batch doc: (a < b) by generator contract
    within_rep = pairs_b.groupBy(F.col("b").alias("doc")).agg(
        F.min("a").alias("rep_within")
    )

    verdicts = batch_df.select(F.col(id_col).alias("doc"))
    verdicts = (
        verdicts.join(within_rep, "doc", "left")
        if corpus_rep is None
        else verdicts.join(corpus_rep, "doc", "left").join(
            within_rep, "doc", "left"
        )
    )
    if corpus_rep is None:
        verdicts = verdicts.withColumn("rep_corpus", F.lit(None).cast("long"))
    out = verdicts.select(
        "doc",
        (F.col("rep_corpus").isNotNull() | F.col("rep_within").isNotNull()).alias(
            "is_near_dup"
        ),
        # a corpus match wins (it is the already-admitted doc); else the
        # within-batch min-id representative
        F.coalesce("rep_corpus", "rep_within").alias("rep"),
    )

    novel = out.filter(~F.col("is_near_dup")).select("doc")
    bands_new = bands_b.join(F.broadcast(novel), "doc")  # bcast-ok: batch-bounded novel ids
    sh_new = sh_b.join(F.broadcast(novel), "doc")  # bcast-ok: batch-bounded novel ids
    bands_new.write.mode("append").parquet(f"{state_dir}/bands")
    sh_new.write.mode("append").parquet(f"{state_dir}/shingles")
    return out


def run_neardup_sink(
    stream_df: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kw,
):
    """Wire neardup_stream_batch as a foreachBatch sink writing batch
    verdicts to ``{out_dir}`` (idempotent per epoch via the standard
    checkpoint contract). Returns the StreamingQuery."""

    def body(batch_df: DataFrame, epoch_id: int) -> None:
        verdicts = neardup_stream_batch(
            batch_df, state_dir, text_col, id_col, **kw
        )
        verdicts.withColumn("epoch", F.lit(epoch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    return (
        stream_df.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
