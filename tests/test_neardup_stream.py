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

    # crash-before-commit: state for epoch 0 is on disk, pointer gone
    os.remove(os.path.join(dirs["state"], "_epoch"))
    sink(_batch(spark, [(1, _doc(1)), (2, _doc(2))]), 0)  # retry
    assert _verdicts(spark, dirs) == {1: (False, None), 2: (False, None)}

    # next epoch still sees docs 1/2 as admitted corpus
    sink(_batch(spark, [(3, _doc(3, changed=7, like=1))]), 1)
    assert _verdicts(spark, dirs)[3] == (True, 1)

    # and the same crash on a LATER epoch: rewind 1 -> 0, retry epoch 1
    with open(os.path.join(dirs["state"], "_epoch"), "w") as f:
        f.write("0")
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
