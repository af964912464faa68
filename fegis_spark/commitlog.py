"""Object-store-safe epoch commit log (r13 verdict #5).

The r12/r13 sinks committed an epoch by ``os.replace`` of a single
pointer file — atomic under POSIX/HDFS *rename* semantics, which
S3-class object stores do not provide (rename is copy+delete, neither
atomic nor isolated). This module replaces the pointer with a
**write-new-file / read-max** protocol that needs no rename and no
overwrite at all:

* committing epoch N creates the empty marker object
  ``{dir}/_commits/{N}`` — the marker's NAME is the payload, its
  content is never read, so a torn write is structurally impossible;
  on an object store this is one atomic small-object PUT;
* readers resolve ``max(int(name))`` over the ``_commits`` listing
  (epoch ids are monotone per directory — the Structured Streaming
  epoch_id contract — so max == latest committed);
* a crash before the PUT leaves the epoch uncommitted; the retry
  rewrites the epoch's idempotent outputs and re-PUTs the marker. A
  crash AFTER the PUT means the epoch is committed and the replay is
  a no-op. There is no window in which a reader can observe a partial
  commit.

Markers accumulate one zero-byte object per epoch; ``prune_commits``
drops all but the max (safe at any time — readers only consult the
max) and is called from the sinks' compaction utilities.

Listing consistency: S3 and GCS have been strongly consistent for
list-after-write since 2020, so read-max is exact there; on weaker
stores a stale listing can only UNDER-report the committed epoch,
which re-runs an idempotent epoch — never corrupts state.

Used by streaming/neardup.py (band-index state), streaming/cdc.py
(snapshot maintenance) and operators/knn.py (IVF corpus versions) —
one protocol across all three sinks.
"""

from __future__ import annotations

import os

_COMMITS = "_commits"


def commit_epoch(log_dir: str, epoch: int) -> None:
    """Durably mark ``epoch`` committed: one marker-object create."""
    d = os.path.join(log_dir, _COMMITS)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, str(int(epoch))), "w"):
        pass


def committed_epoch(log_dir: str) -> int:
    """Highest committed epoch, or -1 when nothing ever committed."""
    d = os.path.join(log_dir, _COMMITS)
    if not os.path.isdir(d):
        return -1
    epochs = [int(n) for n in os.listdir(d) if n.lstrip("-").isdigit()]
    return max(epochs, default=-1)


def rollback_to(log_dir: str, epoch: int) -> None:
    """Test/maintenance helper: drop markers above ``epoch`` so the
    next read-max resolves to it (crash-injection fixtures rewind the
    log this way instead of reaching into the directory layout)."""
    d = os.path.join(log_dir, _COMMITS)
    if not os.path.isdir(d):
        return
    for n in os.listdir(d):
        if n.lstrip("-").isdigit() and int(n) > epoch:
            os.remove(os.path.join(d, n))


def prune_commits(log_dir: str) -> None:
    """Remove all markers but the max (compaction-time hygiene)."""
    d = os.path.join(log_dir, _COMMITS)
    if not os.path.isdir(d):
        return
    epochs = sorted(
        int(n) for n in os.listdir(d) if n.lstrip("-").isdigit()
    )
    for e in epochs[:-1]:
        os.remove(os.path.join(d, str(e)))
