"""Streaming near-dup dedup (streaming/neardup.py): micro-batches
checked against the persisted MinHash-band state — corpus matches
point at the admitted doc, within-batch duplicates collapse to the
min-id representative, and only novel docs grow the state. Replay
tests (r13) drive the crash-between-writes scenarios from the r12
verdict: a retried epoch must never re-flag its own docs as
duplicates of themselves.
"""

from __future__ import annotations

import os

import pytest

from fegis_spark.commitlog import rollback_to
from fegis_spark.streaming.neardup import neardup_sink, run_neardup_sink


def _doc(i: int, n_words: int = 60, changed: int | None = None, like: int | None = None) -> str:
    """Unique per-doc vocabulary (no accidental cross-doc shingles);
    like=j clones doc j's text, changed=k then swaps word k."""
    src = like if like is not None else i
    words = [f"d{src}w{j}" for j in range(n_words)]
    if changed is not None:
        words[changed] = f"d{i}CHANGED"
    return " ".join(words)


@pytest.fixture()
def dirs(tmp_path):
    return {
        "in": str(tmp_path / "in"),
        "state": str(tmp_path / "state"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _write_chunk(spark, path: str, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).json(path)


def _drain(spark, dirs):
    stream = spark.readStream.schema("doc_id long, text string").json(dirs["in"])
    q = run_neardup_sink(stream, dirs["state"], dirs["out"], dirs["ckpt"])
    q.awaitTermination(120)


def _verdicts(spark, dirs) -> dict:
    return {
        r["doc"]: (r["is_near_dup"], r["rep"])
        for r in spark.read.parquet(dirs["out"]).collect()
    }


def test_streaming_neardup_three_chunks(spark, dirs):
    # chunk 1: three novel docs
    _write_chunk(spark, dirs["in"], [(1, _doc(1)), (2, _doc(2)), (3, _doc(3))])
    _drain(spark, dirs)
    v = _verdicts(spark, dirs)
    assert v == {1: (False, None), 2: (False, None), 3: (False, None)}

    # chunk 2: doc 4 is a 1-word-changed near-dup of ADMITTED doc 1;
    # doc 5 is novel
    _write_chunk(
        spark, dirs["in"], [(4, _doc(4, changed=30, like=1)), (5, _doc(5))]
    )
    _drain(spark, dirs)
    v = _verdicts(spark, dirs)
    assert v[4] == (True, 1)
    assert v[5] == (False, None)

    # chunk 3: docs 6/7 are within-batch near-dups of each other (both
    # novel vs the corpus); doc 8 near-dups admitted doc 5
    _write_chunk(
        spark,
        dirs["in"],
        [
            (6, _doc(6)),
            (7, _doc(7, changed=45, like=6)),
            (8, _doc(8, changed=10, like=5)),
        ],
    )
    _drain(spark, dirs)
    v = _verdicts(spark, dirs)
    assert v[6] == (False, None)      # min-id representative, admitted
    assert v[7] == (True, 6)          # within-batch dup of 6
    assert v[8] == (True, 5)          # corpus dup of admitted 5

    # state contains ONLY the admitted (novel) docs
    admitted = {
        r["doc"]
        for r in spark.read.parquet(dirs["state"] + "/bands")
        .select("doc")
        .distinct()
        .collect()
    }
    assert admitted == {1, 2, 3, 5, 6}


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_replay_of_committed_epoch_is_noop(spark, dirs):
    """Replaying an epoch whose pointer already committed must change
    neither verdicts nor state (the foreachBatch at-least-once
    contract)."""
    sink = neardup_sink(dirs["state"], dirs["out"])
    sink(_batch(spark, [(1, _doc(1)), (2, _doc(2))]), 0)
    v = _verdicts(spark, dirs)
    assert v == {1: (False, None), 2: (False, None)}
    sink(_batch(spark, [(1, _doc(1)), (2, _doc(2))]), 0)  # replay
    assert _verdicts(spark, dirs) == v
    admitted = {
        r["doc"]
        for r in spark.read.parquet(dirs["state"] + "/bands")
        .select("doc").distinct().collect()
    }
    assert admitted == {1, 2}


def test_neardup_replay_is_idempotent(spark, dirs):
    """THE r12 defect scenario: crash AFTER the state append but BEFORE
    the epoch commit (simulated by rewinding the pointer). The retried
    epoch probes state that physically contains its own bands — the
    committed-epoch filter must hide them, so previously-novel docs
    stay novel instead of self-matching at jaccard 1.0."""
    sink = neardup_sink(dirs["state"], dirs["out"])
    sink(_batch(spark, [(1, _doc(1)), (2, _doc(2))]), 0)
    assert _verdicts(spark, dirs) == {1: (False, None), 2: (False, None)}

    # crash-before-commit: state for epoch 0 is on disk, commit gone
    rollback_to(dirs["state"], -1)
    sink(_batch(spark, [(1, _doc(1)), (2, _doc(2))]), 0)  # retry
    assert _verdicts(spark, dirs) == {1: (False, None), 2: (False, None)}

    # next epoch still sees docs 1/2 as admitted corpus
    sink(_batch(spark, [(3, _doc(3, changed=7, like=1))]), 1)
    assert _verdicts(spark, dirs)[3] == (True, 1)

    # and the same crash on a LATER epoch: rewind 1 -> 0, retry epoch 1
    rollback_to(dirs["state"], 0)
    sink(_batch(spark, [(3, _doc(3, changed=7, like=1))]), 1)
    v = _verdicts(spark, dirs)
    assert v[3] == (True, 1)
    admitted = {
        r["doc"]
        for r in spark.read.parquet(dirs["state"] + "/bands")
        .select("doc").distinct().collect()
    }
    assert admitted == {1, 2}


def test_compaction_preserves_probe_and_replay_guard(spark, dirs):
    """Nightly compaction folds committed epoch partitions into one;
    afterwards (a) later epochs still flag dups of pre-compaction
    admissions, (b) replaying an already-committed epoch is still a
    no-op, (c) the state holds one partition directory per table."""
    import os as _os

    from fegis_spark.streaming.neardup import compact_neardup_state

    sink = neardup_sink(dirs["state"], dirs["out"])
    sink(_batch(spark, [(1, _doc(1)), (2, _doc(2))]), 0)
    sink(_batch(spark, [(3, _doc(3))]), 1)
    assert compact_neardup_state(spark, dirs["state"]) == 1
    for sub in ("bands", "shingles"):
        parts = [
            p
            for p in _os.listdir(f"{dirs['state']}/{sub}")
            if p.startswith("epoch=")
        ]
        assert parts == ["epoch=1"], parts
    # (b) replay of committed epoch 1: still a no-op post-compaction
    sink(_batch(spark, [(3, _doc(3))]), 1)
    v = _verdicts(spark, dirs)
    assert v == {1: (False, None), 2: (False, None), 3: (False, None)}
    # (a) a new epoch probes the compacted state
    sink(_batch(spark, [(4, _doc(4, changed=12, like=2))]), 2)
    assert _verdicts(spark, dirs)[4] == (True, 2)


def test_exact_duplicate_is_flagged_across_batches(spark, dirs):
    _write_chunk(spark, dirs["in"], [(10, _doc(10))])
    _drain(spark, dirs)
    # byte-identical text under a new id: jaccard 1.0, every band collides
    _write_chunk(spark, dirs["in"], [(11, _doc(11, like=10))])
    _drain(spark, dirs)
    v = _verdicts(spark, dirs)
    assert v[11] == (True, 10)
    admitted = {
        r["doc"]
        for r in spark.read.parquet(dirs["state"] + "/bands")
        .select("doc")
        .distinct()
        .collect()
    }
    assert admitted == {10}


def test_compactor_crash_between_renames_self_heals(spark, dirs, monkeypatch):
    """THE r13 verdict defect (compact_neardup_state's within-table
    swap): kill the compactor between its two renames — the state
    table dir is MISSING while the complete data sits in the
    .compact/.old siblings. Before the r14 repair, the next probe read
    the gap as "no state" and silently re-admitted every known
    duplicate; re-running the compactor skipped the orphans. Pins:
    (a) the next probe self-heals and still flags dups of
    pre-crash admissions, (b) a rerun compactor converges with zero
    leftovers, (c) the replay guard (commit log) survived untouched."""
    from fegis_spark.streaming.neardup import compact_neardup_state

    sink = neardup_sink(dirs["state"], dirs["out"])
    sink(_batch(spark, [(1, _doc(1)), (2, _doc(2))]), 0)
    sink(_batch(spark, [(3, _doc(3))]), 1)

    real_rename = os.rename
    calls = {"n": 0}

    def crashing_rename(a, b):
        real_rename(a, b)
        calls["n"] += 1
        if calls["n"] == 1:  # right after rename(src, src.old) on bands
            raise RuntimeError("injected compactor crash")

    monkeypatch.setattr(os, "rename", crashing_rename)
    with pytest.raises(RuntimeError, match="injected"):
        compact_neardup_state(spark, dirs["state"])
    monkeypatch.undo()

    state = dirs["state"]
    assert not os.path.exists(f"{state}/bands")  # the crash window
    assert os.path.exists(f"{state}/bands.compact")
    assert os.path.exists(f"{state}/bands.old")

    # (a) probe self-heals on first touch: dup of admitted doc 1
    sink(_batch(spark, [(4, _doc(4, changed=9, like=1))]), 2)
    assert _verdicts(spark, dirs)[4] == (True, 1)

    # (b) rerun compaction converges, no swap leftovers, one epoch dir
    assert compact_neardup_state(spark, dirs["state"]) == 2
    for sub in ("bands", "shingles"):
        assert os.path.exists(f"{state}/{sub}")
        assert not os.path.exists(f"{state}/{sub}.compact")
        assert not os.path.exists(f"{state}/{sub}.old")
        parts = [
            p for p in os.listdir(f"{state}/{sub}") if p.startswith("epoch=")
        ]
        assert parts == ["epoch=2"], (sub, parts)

    # (c) post-heal probe still sees every pre-crash admission
    sink(_batch(spark, [(5, _doc(5, changed=3, like=3))]), 3)
    assert _verdicts(spark, dirs)[5] == (True, 3)


def test_compaction_skips_footerless_empty_state(spark, dirs):
    """ADVICE r13 low #2: a state table whose committed epochs all
    admitted zero docs holds no parquet footers (empty-DataFrame
    writes emit zero part files) — the compactor must skip it instead
    of dying on schema inference, and later epochs must keep working."""
    from fegis_spark.streaming.neardup import compact_neardup_state

    sink = neardup_sink(dirs["state"], dirs["out"])
    sink(_batch(spark, []), 0)  # empty micro-batch: zero admissions
    assert compact_neardup_state(spark, dirs["state"]) == 0

    sink(_batch(spark, [(1, _doc(1))]), 1)
    sink(_batch(spark, [(2, _doc(2, changed=5, like=1))]), 2)
    assert _verdicts(spark, dirs)[2] == (True, 1)


def test_prune_off_matches_pruned_probe(spark, dirs, tmp_path):
    """The bhp/dhp partition-filtered probe (r14) is a pure I/O
    optimization: verdicts must be identical with pruning disabled
    (full state scan) across a multi-epoch fold with corpus dups,
    within-batch dups and novels."""
    chunks = [
        [(1, _doc(1)), (2, _doc(2)), (3, _doc(3))],
        [(4, _doc(4, changed=30, like=1)), (5, _doc(5))],
        [(6, _doc(6)), (7, _doc(7, changed=45, like=6)),
         (8, _doc(8, changed=10, like=5))],
    ]
    d2 = {k: str(tmp_path / f"np_{k}") for k in ("state", "out")}
    pruned = neardup_sink(dirs["state"], dirs["out"], prune=True)
    full = neardup_sink(d2["state"], d2["out"], prune=False)
    for e, rows in enumerate(chunks):
        pruned(_batch(spark, rows), e)
        full(_batch(spark, rows), e)
    assert _verdicts(spark, dirs) == _verdicts(spark, d2)


def test_in_sink_compaction_cadence(spark, dirs, tmp_path):
    """compact_every folds state inside the sink post-commit: epoch
    dirs stay bounded by the cadence, verdicts match a never-compacting
    twin exactly, and replay of a committed epoch remains a no-op."""
    chunks = [
        [(1, _doc(1)), (2, _doc(2))],
        [(3, _doc(3, changed=7, like=1))],        # corpus dup of 1
        [(4, _doc(4))],
        [(5, _doc(5, changed=2, like=4)), (6, _doc(6))],  # dup of 4 + novel
        [(7, _doc(7, changed=11, like=2))],       # dup of 2 (pre-compaction)
    ]
    d2 = {k: str(tmp_path / f"nc_{k}") for k in ("state", "out")}
    cadenced = neardup_sink(dirs["state"], dirs["out"], compact_every=2)
    plain = neardup_sink(d2["state"], d2["out"], compact_every=None)
    for e, rows in enumerate(chunks):
        cadenced(_batch(spark, rows), e)
        plain(_batch(spark, rows), e)
    assert _verdicts(spark, dirs) == _verdicts(spark, d2)
    assert _verdicts(spark, dirs)[7] == (True, 2)
    # cadence bound: compactions fired after epochs 1 and 3 — at most
    # (cadence) epoch dirs ever exist
    parts = sorted(
        p for p in os.listdir(f"{dirs['state']}/bands") if p.startswith("epoch=")
    )
    assert parts == ["epoch=3", "epoch=4"], parts
    # replay of a committed epoch post-compaction: still a no-op
    cadenced(_batch(spark, chunks[2]), 2)
    assert _verdicts(spark, dirs) == _verdicts(spark, d2)
