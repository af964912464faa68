"""Qdrant sink contract tests against a fake client — no server, no
qdrant-client package. Pins the reference's DDL/upsert semantics
(/root/reference/fegis/storage.py:56-111,194-199): create-if-absent
idempotency, payload-index diffing, bounded batching, and that real
errors propagate while already-exists races don't."""

from __future__ import annotations

import json
import uuid
from pathlib import Path
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
                 fail_upsert_at_batch=None, vector_size=None,
                 transient_upsert_failures=0, fail_upsert_with=None):
        self._collections = list(collections)
        self._payload_schema = dict(payload_schema or {})
        self._fail_index_with = fail_index_with
        self._fail_upsert_at_batch = fail_upsert_at_batch
        self._vector_size = vector_size
        self._transient_left = transient_upsert_failures
        self._fail_upsert_with = fail_upsert_with
        self.created_collections = []
        self.created_indexes = []
        self.deleted_collections = []
        self.upserts = []
        self.upsert_attempts = 0
        self.closed = False

    def get_collections(self):
        return SimpleNamespace(
            collections=[SimpleNamespace(name=n) for n in self._collections]
        )

    def get_collection(self, name):
        config = None
        if self._vector_size is not None:
            config = SimpleNamespace(
                params=SimpleNamespace(
                    vectors=SimpleNamespace(size=self._vector_size)
                )
            )
        return SimpleNamespace(payload_schema=self._payload_schema, config=config)

    def delete_collection(self, collection_name):
        self.deleted_collections.append(collection_name)
        self._collections.remove(collection_name)
        self._vector_size = None
        self._payload_schema = {}

    def create_collection(self, collection_name, vectors_config):
        self.created_collections.append((collection_name, vectors_config))
        self._collections.append(collection_name)

    def create_payload_index(self, collection_name, field_name, field_schema):
        if self._fail_index_with is not None:
            raise self._fail_index_with
        self.created_indexes.append((field_name, field_schema))
        self._payload_schema[field_name] = field_schema

    def upsert(self, collection_name, points):
        self.upsert_attempts += 1
        if self._transient_left > 0:
            self._transient_left -= 1
            raise RuntimeError("upstream connect error: deadline exceeded (503)")
        if (
            self._fail_upsert_at_batch is not None
            and len(self.upserts) == self._fail_upsert_at_batch
        ):
            raise self._fail_upsert_with or RuntimeError("connection reset by peer")
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
    # 'connection reset' is TRANSIENT: retried max_attempts times with
    # the deterministic backoff, then propagated (never dropped)
    c = FakeClient(fail_upsert_at_batch=1)
    rows = [_point(i) for i in range(25)]
    naps = []
    gen = upsert_batches(c, dict, rows, "memories", batch_size=10,
                         sleep=naps.append)
    assert next(gen) == 10
    with pytest.raises(RuntimeError, match="connection reset"):
        next(gen)  # the second batch must NOT be silently dropped
    assert naps == [0.5, 2.0]  # full deterministic backoff ladder used

    # non-transient errors propagate IMMEDIATELY, no retry
    c2 = FakeClient(fail_upsert_at_batch=0,
                    fail_upsert_with=RuntimeError("400 bad vector size"))
    naps2 = []
    gen2 = upsert_batches(c2, dict, [_point(0)], "memories", sleep=naps2.append)
    with pytest.raises(RuntimeError, match="bad vector size"):
        next(gen2)
    assert naps2 == [] and c2.upsert_attempts == 1


def test_upsert_transient_error_retries_then_succeeds():
    """r9 verdict #7: a transient failure (503/deadline) on the wire is
    retried with deterministic backoff and the batch lands — idempotent
    by point id, so the retry after a half-applied batch is safe."""
    c = FakeClient(transient_upsert_failures=2)
    naps = []
    counts = list(
        upsert_batches(c, dict, [_point(i) for i in range(5)], "memories",
                       sleep=naps.append)
    )
    assert counts == [5]
    assert c.upsert_attempts == 3 and len(c.points) == 5
    assert naps == [0.5, 2.0]

    # one more transient failure than attempts -> propagates
    c2 = FakeClient(transient_upsert_failures=3)
    with pytest.raises(RuntimeError, match="deadline"):
        list(upsert_batches(c2, dict, [_point(0)], "memories",
                            sleep=lambda _s: None))


def test_dim_mismatch_fails_loudly_then_recreates_on_optin():
    """r9 verdict #7: an existing collection with the wrong vector size
    fails at DDL time with both sizes named (reference posture —
    storage.py:56-72 raises rather than adapts); the explicit opt-in
    drops and recreates, then rebuilds every payload index."""
    c = FakeClient(collections=["memories"], vector_size=256,
                   payload_schema={"title": "text"})
    with pytest.raises(ValueError, match="vector size 256, expected 384"):
        ensure_collection(c, "memories", 384, models=FakeModels)
    assert c.deleted_collections == [] and c.created_collections == []

    ensure_collection(c, "memories", 384, models=FakeModels,
                      recreate_on_dim_mismatch=True)
    assert c.deleted_collections == ["memories"]
    assert [n for n, _ in c.created_collections] == ["memories"]
    assert c.created_collections[0][1] == {"size": 384, "distance": "Cosine"}
    # the recreated collection lost its indexes: ALL are re-issued
    assert {f for f, _ in c.created_indexes} == set(PAYLOAD_INDEXES)


def test_dim_match_and_unknown_shape_pass_through():
    # matching dim: no delete, no create, just index diffing
    c = FakeClient(collections=["memories"], vector_size=384)
    ensure_collection(c, "memories", 384, models=FakeModels)
    assert c.deleted_collections == [] and c.created_collections == []
    # a client whose collection info lacks the config shape: dim check
    # is skipped (older servers / fakes), DDL proceeds as before
    c2 = FakeClient(collections=["memories"])
    ensure_collection(c2, "memories", 384, models=FakeModels)
    assert c2.created_collections == []


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


class FileRecordingClient:
    """Fake QdrantClient whose state lives on the FILESYSTEM, so
    worker-process upserts are visible to the driver (local-mode Python
    workers are separate processes — an in-memory fake would record
    nothing the test can see). Implements exactly the surface the sink
    uses: get_collections / get_collection / create_collection /
    create_payload_index (driver DDL) + upsert / close (workers)."""

    def __init__(self, root):
        self.root = Path(root)

    def _coll_dir(self, name):
        return self.root / "collections" / name

    def _log(self, event):
        p = self.root / "ddl_log" / f"{uuid.uuid4().hex}.json"
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps(event))

    def get_collections(self):
        base = self.root / "collections"
        names = [p.name for p in base.iterdir()] if base.is_dir() else []
        return SimpleNamespace(
            collections=[SimpleNamespace(name=n) for n in names]
        )

    def get_collection(self, name):
        idx = self._coll_dir(name) / "indexes"
        schema = (
            {p.name: p.read_text() for p in idx.iterdir()} if idx.is_dir() else {}
        )
        return SimpleNamespace(payload_schema=schema)

    def create_collection(self, collection_name, vectors_config):
        self._coll_dir(collection_name).mkdir(parents=True)
        self._log({"op": "create_collection", "name": collection_name,
                   "vectors": vectors_config})

    def create_payload_index(self, collection_name, field_name, field_schema):
        d = self._coll_dir(collection_name) / "indexes"
        d.mkdir(parents=True, exist_ok=True)
        (d / field_name).write_text(str(field_schema))
        self._log({"op": "create_payload_index", "field": field_name})

    def upsert(self, collection_name, points):
        d = self.root / "upserts"
        d.mkdir(parents=True, exist_ok=True)
        (d / f"{uuid.uuid4().hex}.json").write_text(
            json.dumps({"collection": collection_name, "points": list(points)})
        )

    def close(self):
        pass


def _fake_factory(root, url):
    # point_cls=dict: row_to_point dicts pass through, JSON-serializable
    return FileRecordingClient(root), lambda **kw: kw


def test_index_to_qdrant_end_to_end_with_fake_client(spark, tmp_path):
    """Drives the FULL batch-indexing job (r8 verdict item 3) — driver
    DDL, partition-parallel upsert through real Spark python workers,
    bounded batches, payload shape (reference storage.py:173-191), and
    idempotent re-run with payload-index diffing — with qdrant-client
    absent from the environment."""
    from datetime import datetime
    from functools import partial

    from fegis_spark.sources.qdrant_sink import index_to_qdrant

    # the fake factory lives in THIS module, which python workers can't
    # import from pytest's runtime sys.path — ship the file to them
    spark.sparkContext.addPyFile(__file__)

    rows = [
        (
            f"m{i:03d}",
            [float(i), 0.5],
            f"title {i}",
            "observe",
            i,
            datetime(2026, 1, 1, 12, 0, i % 60),
            None,
        )
        for i in range(57)
    ]
    df = spark.createDataFrame(
        rows,
        "memory_id string, embedding array<double>, title string, tool string,"
        " sequence_order bigint, timestamp timestamp, context string",
    ).repartition(4)
    factory = partial(_fake_factory, str(tmp_path))

    n = index_to_qdrant(
        df, "memories", "http://fake:6333", dim=2, batch_size=10,
        client_factory=factory, models=FakeModels,
    )
    assert n == 57

    # DDL: collection created once, every payload index issued
    ddl = [json.loads(p.read_text()) for p in (tmp_path / "ddl_log").iterdir()]
    assert [e for e in ddl if e["op"] == "create_collection"] == [
        {"op": "create_collection", "name": "memories",
         "vectors": {"size": 2, "distance": "Cosine"}}
    ]
    created = {e["field"] for e in ddl if e["op"] == "create_payload_index"}
    assert created == set(PAYLOAD_INDEXES)

    # Upserts: bounded batches, all ids exactly once, payload parity
    batches = [
        json.loads(p.read_text()) for p in (tmp_path / "upserts").iterdir()
    ]
    assert all(b["collection"] == "memories" for b in batches)
    assert all(len(b["points"]) <= 10 for b in batches)
    points = [p for b in batches for p in b["points"]]
    assert sorted(p["id"] for p in points) == [f"m{i:03d}" for i in range(57)]
    p0 = next(p for p in points if p["id"] == "m000")
    assert p0["vector"] == [0.0, 0.5]
    assert p0["payload"]["title"] == "title 0"
    assert p0["payload"]["tool"] == "observe"
    assert p0["payload"]["sequence_order"] == 0
    assert p0["payload"]["timestamp"] == "2026-01-01T12:00:00"  # isoformat
    assert "embedding" not in p0["payload"]  # vector split out
    assert "context" not in p0["payload"]  # None fields dropped

    # Idempotent re-run: same count reported, NO new DDL (index diff
    # sees everything present), ids unchanged
    n2 = index_to_qdrant(
        df, "memories", "http://fake:6333", dim=2, batch_size=10,
        client_factory=factory, models=FakeModels,
    )
    assert n2 == 57
    ddl2 = [json.loads(p.read_text()) for p in (tmp_path / "ddl_log").iterdir()]
    assert len(ddl2) == len(ddl)  # create-if-absent + diff issued nothing
    batches2 = [
        json.loads(p.read_text()) for p in (tmp_path / "upserts").iterdir()
    ]
    points2 = [p for b in batches2 for p in b["points"]]
    # id-keyed upsert semantics: the store would still hold each id once
    assert {p["id"] for p in points2} == {f"m{i:03d}" for i in range(57)}


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
