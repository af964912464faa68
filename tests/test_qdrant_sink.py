"""Qdrant sink contract tests against a fake client — no server, no
qdrant-client package. Pins the reference's DDL/upsert semantics
(/root/reference/fegis/storage.py:56-111,194-199): create-if-absent
idempotency, payload-index diffing, bounded batching, and that real
errors propagate while already-exists races don't."""

from __future__ import annotations

from types import SimpleNamespace

import pytest

from fegis_spark.sources.qdrant_sink import (
    DEFAULT_BATCH_SIZE,
    PAYLOAD_INDEXES,
    batched,
    ensure_collection,
    upsert_batches,
)


class FakeModels:
    class Distance:
        COSINE = "Cosine"

    class PayloadSchemaType:
        TEXT = "text"
        KEYWORD = "keyword"
        INTEGER = "integer"
        DATETIME = "datetime"

    @staticmethod
    def VectorParams(size, distance):
        return {"size": size, "distance": distance}


class FakeClient:
    def __init__(self, collections=(), payload_schema=None, fail_index_with=None,
                 fail_upsert_at_batch=None):
        self._collections = list(collections)
        self._payload_schema = dict(payload_schema or {})
        self._fail_index_with = fail_index_with
        self._fail_upsert_at_batch = fail_upsert_at_batch
        self.created_collections = []
        self.created_indexes = []
        self.upserts = []
        self.closed = False

    def get_collections(self):
        return SimpleNamespace(
            collections=[SimpleNamespace(name=n) for n in self._collections]
        )

    def get_collection(self, name):
        return SimpleNamespace(payload_schema=self._payload_schema)

    def create_collection(self, collection_name, vectors_config):
        self.created_collections.append((collection_name, vectors_config))
        self._collections.append(collection_name)

    def create_payload_index(self, collection_name, field_name, field_schema):
        if self._fail_index_with is not None:
            raise self._fail_index_with
        self.created_indexes.append((field_name, field_schema))
        self._payload_schema[field_name] = field_schema

    def upsert(self, collection_name, points):
        if (
            self._fail_upsert_at_batch is not None
            and len(self.upserts) == self._fail_upsert_at_batch
        ):
            raise RuntimeError("connection reset by peer")
        pts = list(points)
        self.upserts.append((collection_name, pts))
        # real Qdrant upsert semantics: keyed by point id, last write wins
        self.points = getattr(self, "points", {})
        for p in pts:
            pid = p["id"] if isinstance(p, dict) else p.id
            self.points[pid] = p

    def close(self):
        self.closed = True


def _point(i):
    return SimpleNamespace(
        asDict=lambda recursive=True, _i=i: {
            "memory_id": f"m{_i}",
            "embedding": [0.1, 0.2],
            "title": f"t{_i}",
            "nullfield": None,
        }
    )


def test_ensure_creates_absent_collection_and_all_indexes():
    c = FakeClient()
    ensure_collection(c, "memories", 384, models=FakeModels)
    assert [n for n, _ in c.created_collections] == ["memories"]
    assert c.created_collections[0][1] == {"size": 384, "distance": "Cosine"}
    assert {f for f, _ in c.created_indexes} == set(PAYLOAD_INDEXES)


def test_ensure_is_idempotent_and_diffs_existing_indexes():
    have = {"title": "text", "tool": "keyword"}
    c = FakeClient(collections=["memories"], payload_schema=have)
    ensure_collection(c, "memories", 384, models=FakeModels)
    assert c.created_collections == []  # create-if-absent: absent it is not
    created = {f for f, _ in c.created_indexes}
    assert created == set(PAYLOAD_INDEXES) - set(have)  # only the diff


def test_ensure_swallows_already_exists_race_only():
    c = FakeClient(fail_index_with=RuntimeError("index already exists (409)"))
    ensure_collection(c, "memories", 384, models=FakeModels)  # no raise

    c2 = FakeClient(fail_index_with=RuntimeError("unauthorized: bad api key"))
    with pytest.raises(RuntimeError, match="unauthorized"):
        ensure_collection(c2, "memories", 384, models=FakeModels)


def test_batched_respects_default_batch_size():
    rows = [_point(i) for i in range(DEFAULT_BATCH_SIZE * 2 + 5)]
    sizes = [len(b) for b in batched(rows)]
    assert sizes == [DEFAULT_BATCH_SIZE, DEFAULT_BATCH_SIZE, 5]
    # null payload fields dropped, vector split out
    first = next(iter(batched(rows)))[0]
    assert first["id"] == "m0" and first["vector"] == [0.1, 0.2]
    assert "nullfield" not in first["payload"] and "embedding" not in first["payload"]


def test_upsert_batches_counts_and_batches():
    c = FakeClient()
    rows = [_point(i) for i in range(25)]
    counts = list(upsert_batches(c, dict, rows, "memories", batch_size=10))
    assert counts == [10, 10, 5]
    assert len(c.upserts) == 3
    assert all(name == "memories" for name, _ in c.upserts)
    ids = [p["id"] for _, pts in c.upserts for p in pts]
    assert ids == [f"m{i}" for i in range(25)]


def test_upsert_errors_propagate():
    c = FakeClient(fail_upsert_at_batch=1)
    rows = [_point(i) for i in range(25)]
    gen = upsert_batches(c, dict, rows, "memories", batch_size=10)
    assert next(gen) == 10
    with pytest.raises(RuntimeError, match="connection reset"):
        next(gen)  # the second batch must NOT be silently dropped


def test_double_index_of_same_batch_is_idempotent_by_point_id():
    """Reference upsert is idempotent by point id (storage.py:194-199):
    re-indexing the same memory_ids must leave the store's point count
    unchanged — last write wins, no duplicates."""
    c = FakeClient()
    rows = [_point(i) for i in range(25)]
    first = sum(upsert_batches(c, dict, rows, "memories", batch_size=10))
    second = sum(upsert_batches(c, dict, [_point(i) for i in range(25)],
                                "memories", batch_size=10))
    assert first == second == 25          # both runs report all rows written
    assert len(c.points) == 25            # but the store holds each id once
    assert set(c.points) == {f"m{i}" for i in range(25)}


def test_partial_failure_then_full_retry_converges():
    """A partition task that dies mid-upsert gets retried whole by
    Spark; with id-keyed upserts the retry must converge to exactly one
    point per memory_id (no loss from the failed batch, no duplication
    from the succeeded ones)."""
    c = FakeClient(fail_upsert_at_batch=1)  # batch 0 lands, batch 1 dies
    rows = [_point(i) for i in range(25)]
    with pytest.raises(RuntimeError):
        list(upsert_batches(c, dict, rows, "memories", batch_size=10))
    assert len(c.points) == 10            # partial write happened
    c._fail_upsert_at_batch = None        # "server recovered"; task retries
    total = sum(upsert_batches(c, dict, [_point(i) for i in range(25)],
                               "memories", batch_size=10))
    assert total == 25
    assert len(c.points) == 25
    assert set(c.points) == {f"m{i}" for i in range(25)}
