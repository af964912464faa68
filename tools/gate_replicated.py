"""Beyond-bench-scale correctness gate (r12): replicate the sf0.1
documents/embeddings tables Nx, flatten to single splittable parquet
files, symlink the other tables, and run the FULL DuckDB-oracle gate
over the mixed corpus — the large-scale complement of the sf0.001
degenerate-corpus sweeps (catches scale-dependent midpoint/tie/
overflow classes the bench scale masks; evidence/gate4x_r12.json).

Usage: python tools/gate_replicated.py [N] [--panel] [query ...]
(default N=4; --panel runs the curated scale-sensitive panel below;
no names = the full catalog). Declared-quadratic exclusions are
mechanized (r13 verdict #7): EXCLUSIONS below is always applied, with
reasons printed in the run log — rerunning any replication factor
needs no hand-editing.

Implementation notes (each learned the hard way, CLAUDE.md r12):
* DuckDB views in check_correctness need FILE paths, so the replicate
  part-dirs are flattened via DuckDB COPY with ROW_GROUP_SIZE 700;
* a few-MB single file is ONE Spark partition at the 128 MB
  maxPartitionBytes default — every map stage pins to one core and
  heavy queries run 30+ min; the gate subprocess therefore runs with
  SPARK_GRAFT_MAX_PARTITION_BYTES=262144.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

#: queries excluded from replicated runs at or above the given factor,
#: with the reason printed in the run log (mechanized from the r13
#: ad-hoc evidence note; made factor-aware in r14). Factor 1 = every
#: replicated run.
EXCLUSIONS: dict[str, tuple[int, str]] = {
    "dedup_embedding_cosine": (1, (
        "quadratic BY DECLARATION (recall-conservative BRP bucketing "
        "≈ brute force: ~n²/2 verified pairs on BOTH engines — 512M "
        "pairs / a 45+ min single stage at 16x). Its own docstring "
        "names capped SRP + IVF as the scale paths; both are in the "
        "panel and must pass instead (embedding_srp_capped, "
        "ann_ivf_portable + recall audits)."
    )),
    "dedup_semantic": (64, (
        "the CATALOG query fixes n_lists=16, so replication grows "
        "clusters instead of cluster COUNT and the within-cluster "
        "self-join is ~(n/16)² pairs per cluster on BOTH engines "
        "(~1B 64-dim cosines at 64x — a single >1h stage, observed "
        "r14). Green through 16x (evidence/gate16x_r13.json); the "
        "operator's documented scaling answer is n_lists ∝ corpus "
        "(SemDeDup runs 50k clusters at 440M) — demonstrated by "
        "evidence/semdedup_scaling_r14.json via the library n_lists "
        "knob, which the static oracle string cannot follow."
    )),
}

#: the r13 scale-sensitive panel (the r12 49-query set + the four r13
#: additions) — every query whose plan shape or oracle convention is
#: exercised differently by corpus growth: band/LSH families, ANN/PQ,
#: components, packing/splits, decimal-mass and portable-ln users.
SCALE_PANEL = [
    "ann_ivf_portable", "ann_ivf_recall_audit", "ann_ivfpq_portable",
    "ann_lsh_recall_audit", "ann_pq_adc", "ann_pq_recall_audit",
    "ann_pq_rerank", "ann_pq_rerank_trained", "ann_recall_curve",
    "bm25_topk", "contamination_check", "corpus_stats",
    "curation_pipeline", "dedup_components", "dedup_components_star",
    "dedup_exact", "dedup_incremental", "dedup_incremental_near",
    "dedup_minhash_capped", "dedup_minhash_estimate_audit",
    "dedup_minhash_eval", "dedup_minhash_portable",
    "dedup_ngram_jaccard", "dedup_semantic", "dedup_simhash_portable",
    "dedup_soft_weights", "dedup_streaming_replay",
    "dedup_substring_spans", "doc_novelty", "dsir_importance",
    "embedding_srp_blocked_hamming", "embedding_srp_capped",
    "embedding_srp_codes", "group_split_leakage",
    "grouped_lead_sharded", "grouped_ntile_sharded", "knn_basic",
    "knn_join_batch", "knn_top100", "label_centroids",
    "pack_sequences", "pack_sequences_sharded", "quantize_embeddings",
    "rrf_hybrid_bm25", "split_divergence", "split_leakage_neardup",
    "srp_ndcg_eval",
    "text_kn_logprob", "text_lang_id", "train_test_split",
    "vocab_growth_curve", "vocab_zipf_slope", "winnow_fingerprints",
    "winnow_match_capped",
]


def build(out_dir: str, factor: int) -> None:
    import duckdb

    from fegis_spark.model import TABLES
    from fegis_spark.session import configure_for_oracle, get_spark
    from scale_probe import SF_DIR, replicate

    spark = configure_for_oracle(get_spark("gate_replicated_build"))
    with tempfile.TemporaryDirectory(prefix="gate_rep_build_") as tmp:
        replicate(spark, tmp, factor)
        os.makedirs(out_dir, exist_ok=True)
        con = duckdb.connect()
        for t in ("documents", "embeddings"):
            con.sql(
                f"COPY (SELECT * FROM '{tmp}/{t}.parquet/*.parquet') "
                f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 700)"
            )
        for t in TABLES:
            if t in ("documents", "embeddings"):
                continue
            dst = f"{out_dir}/{t}.parquet"
            if not os.path.exists(dst):
                os.symlink(f"{SF_DIR}/{t}.parquet", dst)
    spark.stop()


def resolve_names(names: list[str], factor: int) -> list[str]:
    """Apply the mechanized exclusion list to the requested set (the
    curated panel via --panel, an explicit list, or — empty — the full
    catalog), printing each exclusion with its reason. Exclusions are
    factor-aware: a query proven green at smaller factors stays in
    those runs and drops out only where its declared scaling limit
    bites."""
    if names == ["--panel"]:
        names = list(SCALE_PANEL)
    elif not names:
        from fegis_spark.catalog import catalog

        names = list(catalog())
    kept = []
    for n in names:
        min_factor, reason = EXCLUSIONS.get(n, (None, None))
        if min_factor is not None and factor >= min_factor:
            print(f"gate_replicated: EXCLUDED {n} (at >= {min_factor}x): "
                  f"{reason}")
        else:
            kept.append(n)
    return kept


def main() -> int:
    args = sys.argv[1:]
    reuse = "--reuse" in args
    args = [a for a in args if a != "--reuse"]
    factor = int(args[0]) if args and args[0].isdigit() else 4
    names = args[1:] if args and args[0].isdigit() else args
    names = resolve_names(names, factor)
    out_dir = f"/tmp/gate_rep_x{factor}"
    if reuse and os.path.exists(f"{out_dir}/documents.parquet"):
        print(f"gate_replicated: reusing existing corpus at {out_dir}")
    else:
        shutil.rmtree(out_dir, ignore_errors=True)
        build(out_dir, factor)
    env = dict(os.environ, SPARK_GRAFT_MAX_PARTITION_BYTES="262144")
    cmd = [
        sys.executable,
        str(Path(__file__).parent / "check_correctness.py"),
        "--sf",
        out_dir,
        *names,
    ]
    print(f"gate_replicated: corpus x{factor} at {out_dir}; "
          f"running gate over {len(names)} queries")
    return subprocess.call(cmd, env=env)


if __name__ == "__main__":
    sys.exit(main())
