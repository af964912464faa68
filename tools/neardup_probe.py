"""Streaming near-dup state-probe pruning probe (r13 verdict #3).

Grows the admitted band/shingle state by sinking successive novel
batches, then measures at state = {1,4,8,16}x the admission batch:

* the per-batch PROBE wall (phase 1 band candidates + phase 2 shingle
  verify + the corpus_rep agg, forced via a noop write; best of 2
  fresh-plan builds, solo-run discipline per CLAUDE.md timing rules),
  pruned vs full-scan;
* the state rows the probe's partition-filtered reads actually touch
  vs total state rows — the scale-proof observable: wall at these MBs
  is mostly fixed overhead, but the rows-read ratio is exactly what a
  1000-executor probe pays at 100 TB state.

Two batch regimes, because the honest story differs:

* TRICKLE (8 docs): |batch band keys| = 32 << P=64 prefixes — the
  regime partition pruning serves; band reads should drop to the
  touched-prefix share and shingle reads to the candidate docs' few
  prefixes.
* FULL (= admission size, 2000 docs): 8000 band keys touch every
  prefix, so band-side pruning is a no-op BY DESIGN (the numbers say
  so); shingle-side pruning still helps because candidates are few.

Usage: python tools/neardup_probe.py [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

BATCH = 250  # sf0.1 documents has 5000 rows: 16x admission + probe tail
TRICKLE = 8
GROWTH = (1, 4, 8, 16)


def _mk_batch(spark, docs, lo, n, dup_of=None):
    """n docs with ids starting at lo; dup_of clones earlier texts
    (near-dup probes that exercise the verify phase)."""
    d = docs.filter((F.col("rn") >= lo) & (F.col("rn") < lo + n))
    if dup_of is not None:
        # same text as the docs admitted at offset dup_of, fresh ids
        d = docs.filter(
            (F.col("rn") >= dup_of) & (F.col("rn") < dup_of + n)
        ).withColumn("rn", F.col("rn") + F.lit(lo))
    return d.select(F.col("rn").alias("doc_id"), "text")


def _probe_once(spark, state_dir, batch_df, prune):
    from fegis_spark.operators.dedup import (
        _portable_sig_bands,
        incremental_band_candidates,
        incremental_verify_candidates,
    )
    from fegis_spark.streaming.neardup import (
        NEARDUP_CAP,
        _dhp,
        _read_bands_state,
        _read_shingles_state,
    )
    from fegis_spark.commitlog import committed_epoch

    committed = committed_epoch(state_dir)
    base_b, _sig, banded_b = _portable_sig_bands(
        batch_df, "text", "doc_id", 16, 4, 3, True
    )
    bands_b = banded_b.select("doc", "band", "bh").persist()
    bands_b.count()  # materialize the batch signature OUTSIDE the timing
    sh_b = base_b.select("doc", "sh")
    t0 = time.perf_counter()
    bands_c = _read_bands_state(spark, state_dir, committed, bands_b, prune=prune)
    cand = incremental_band_candidates(
        bands_c, bands_b, max_bucket_size=NEARDUP_CAP
    ).persist()
    sh_prefixes = None
    if prune:
        sh_prefixes = [
            r[0]
            for r in cand.select(_dhp(F.col("corpus_doc")).alias("p"))
            .distinct()
            .collect()
        ]
    sh_c = _read_shingles_state(spark, state_dir, committed, sh_b, sh_prefixes)
    vs = incremental_verify_candidates(cand, sh_c, sh_b, 0.5)
    rep = vs.groupBy(F.col("batch_doc").alias("doc")).agg(
        F.min("corpus_doc").alias("rep_corpus")
    )
    rep.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    # untimed observables: state rows the pruned reads touch
    bands_read = bands_c.count()
    sh_read = sh_c.count()
    n_matched = rep.count()
    cand.unpersist()
    bands_b.unpersist()
    base_b.unpersist()
    return wall, bands_read, sh_read, n_matched


def probe(spark, state_dir, batch_df, prune):
    spark.catalog.clearCache()
    w1 = _probe_once(spark, state_dir, batch_df, prune)
    spark.catalog.clearCache()
    w2 = _probe_once(spark, state_dir, batch_df, prune)
    best = min(w1[0], w2[0])
    return {
        "wall_sec": round(best, 3),
        "band_rows_read": w1[1],
        "shingle_rows_read": w1[2],
        "matched_docs": w1[3],
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "evidence/neardup_prune_r14.json"
    from fegis_spark.model import load_table
    from fegis_spark.session import configure_for_oracle, get_spark
    from fegis_spark.streaming.neardup import neardup_sink

    spark = configure_for_oracle(get_spark("neardup_probe"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .withColumn(
            "rn",
            # window-ok: probe harness, one-off global order
            F.row_number().over(Window.orderBy("doc_id")),
        )
        .drop("doc_id")
        .persist()
    )
    n_docs = docs.count()
    need = BATCH * max(GROWTH) + BATCH
    assert n_docs >= need, f"need {need} docs, sf dir has {n_docs}"

    tmp = tempfile.mkdtemp(prefix="neardup_probe_")
    state, outd = f"{tmp}/state", f"{tmp}/out"
    sink = neardup_sink(state, outd)

    # probe batches: half dups of batch 0's texts, half novel tail docs
    def mixed(n, lo):
        half = n // 2
        dups = _mk_batch(spark, docs, lo, half, dup_of=1)
        novel = _mk_batch(spark, docs, BATCH * max(GROWTH) + 1, n - half)
        return dups.unionByName(novel)

    from fegis_spark.streaming.neardup import compact_neardup_state

    results = {"batch": BATCH, "trickle": TRICKLE, "legs": []}
    admitted, epoch = 0, 0
    for g in GROWTH:
        while admitted < g * BATCH:
            sink(_mk_batch(spark, docs, admitted + 1, BATCH), epoch)
            admitted += BATCH
            epoch += 1
        epoch_dirs = len(
            [
                d
                for d in os.listdir(f"{state}/bands")
                if d.startswith("epoch=")
            ]
        )
        leg = {"state_docs": admitted, "epoch_dirs_at_probe": epoch_dirs}
        for label, n in (("trickle", TRICKLE), ("full", BATCH)):
            b = mixed(n, 10_000_000)
            leg[label] = {
                "pruned": probe(spark, state, b, True),
                "unpruned": probe(spark, state, b, False),
            }
        # nightly-compaction regime: fold epoch dirs, re-probe — the
        # listing term (epoch dirs x prefix dirs, the dominant probe
        # cost when fragmented) collapses and the wall goes flat
        compact_neardup_state(spark, state)
        leg["trickle_compacted"] = probe(
            spark, state, mixed(TRICKLE, 10_000_000), True
        )
        leg["state_band_rows"] = admitted * 4
        results["legs"].append(leg)
        print(json.dumps(leg))

    shutil.rmtree(tmp, ignore_errors=True)
    results["note"] = (
        "three regimes per leg: fragmented-pruned, fragmented-unpruned, "
        "compacted-pruned. The fragmented probe's dominant cost is the "
        "state-dir LISTING (epoch dirs x prefix dirs — profiled at 2.6-3.4s "
        "per table at 16 epochs vs 0.4-0.5s compacted, candidates/verify "
        "~0.4s constant); nightly compact_neardup_state bounds it, and the "
        "bhp/dhp partition filters bound ROWS READ to the touched fraction "
        "(trickle: ~39% band rows = the batch's ~25/64 prefixes, ~6-8% "
        "shingle rows = the candidates' few prefixes). Full-size batches "
        "touch every band prefix by design and say so in the numbers."
    )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
