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


def test_commitlog_matches_set_model(tmp_path_factory):
    """Property: under any interleaving of commit/rollback/prune, the
    reader's answer equals max over a plain set model — prune (a
    hygiene op) must never change what readers see, and rollback must
    drop exactly the markers above its epoch."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    op = st.tuples(
        st.sampled_from(["commit", "rollback", "prune"]),
        st.integers(min_value=0, max_value=12),
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(op, max_size=30))
    def run(ops):
        d = str(tmp_path_factory.mktemp("clog"))
        model: set[int] = set()
        for name, e in ops:
            if name == "commit":
                commit_epoch(d, e)
                model.add(e)
            elif name == "rollback":
                rollback_to(d, e)
                model = {x for x in model if x <= e}
            else:
                prune_commits(d)
                model = {max(model)} if model else set()
            assert committed_epoch(d) == (max(model) if model else -1)

    run()
