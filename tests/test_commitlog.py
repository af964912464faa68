"""Object-store-safe commit log (fegis_spark/commitlog.py): marker
names are the payload, readers take the max — shared by the neardup
state, the CDC snapshot and the IVF corpus versions (r14)."""

from __future__ import annotations

import os

from fegis_spark.commitlog import (
    commit_epoch,
    committed_epoch,
    prune_commits,
    rollback_to,
)


def test_commitlog_roundtrip(tmp_path):
    d = str(tmp_path)
    assert committed_epoch(d) == -1
    commit_epoch(d, 0)
    commit_epoch(d, 3)
    commit_epoch(d, 2)  # out-of-order writes: read-max still correct
    assert committed_epoch(d) == 3
    rollback_to(d, 2)
    assert committed_epoch(d) == 2
    prune_commits(d)
    assert committed_epoch(d) == 2
    assert os.listdir(os.path.join(d, "_commits")) == ["2"]
    commit_epoch(d, 2)  # re-commit (epoch replay) is idempotent
    assert committed_epoch(d) == 2


def test_commitlog_ignores_foreign_files(tmp_path):
    d = str(tmp_path)
    commit_epoch(d, 5)
    # a stray non-numeric object in the log dir must not break read-max
    with open(os.path.join(d, "_commits", "x.tmp"), "w"):
        pass
    assert committed_epoch(d) == 5
    prune_commits(d)
    assert committed_epoch(d) == 5
