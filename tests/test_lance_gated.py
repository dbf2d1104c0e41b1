"""Exercise the gated Lance storage path with a fake ``lance`` module.

The container has no ``lance`` package (BASELINE.json's north rule names
Lance tables; sources/storage.py documents the parquet fallback), so these
tests stand in a minimal fake implementing the two entry points the gated
path uses — ``lance.write_dataset(table, uri, mode=...)`` and
``lance.dataset(uri).to_table()`` — and assert the storage layer routes
writes and reads through them with the documented layout (``*.lance`` URIs,
overwrite mode, epoch-dir roundtrip)."""

from __future__ import annotations

import os
import types

import pyarrow as pa
import pyarrow.parquet as pq

from spider_ray.sources import storage


class _FakeLance:
    """Parquet-backed stand-in for the lance module surface storage uses."""

    def __init__(self):
        self.write_calls: list[tuple[str, str]] = []
        self.read_calls: list[str] = []

    def write_dataset(self, table: pa.Table, uri: str, mode: str = "create"):
        self.write_calls.append((uri, mode))
        # real lance writes a directory; a single file is enough for the fake
        pq.write_table(table, uri)

    def dataset(self, uri: str):
        self.read_calls.append(uri)
        fake = self

        class _Ds:
            def to_table(self):
                return pq.read_table(uri)

        return _Ds()


def _patched(monkeypatch) -> _FakeLance:
    fake = _FakeLance()
    monkeypatch.setattr(storage, "lance", fake)
    monkeypatch.setattr(storage, "HAVE_LANCE", True)
    return fake


def test_write_table_routes_through_lance(tmp_path, monkeypatch):
    fake = _patched(monkeypatch)
    t = pa.table({"image_id": ["a", "b"], "caption": ["x", "y"]})
    uri = storage.write_table(t, str(tmp_path / "d"))
    assert uri.endswith(".lance")
    assert fake.write_calls == [(uri, "overwrite")]
    assert storage.read_table(str(tmp_path / "d")).equals(t)
    assert fake.read_calls == [uri]


def test_epoch_store_roundtrip_and_idempotent_rerun(tmp_path, monkeypatch):
    fake = _patched(monkeypatch)
    es = storage.EpochStore(str(tmp_path / "store"))
    t1 = pa.table({"url": ["u1", "u2"], "status": [200, 404]})
    es.write("pages", 0, t1)
    assert es.read("pages", 0).equals(t1)
    # idempotent re-run: the epoch dir is replaced wholesale, the second
    # write must land in a fresh dir (no stale first-attempt parts)
    t2 = pa.table({"url": ["u3"], "status": [200]})
    es.write("pages", 0, t2)
    assert es.read("pages", 0).equals(t2)
    assert all(uri.endswith(".lance") for uri, _ in fake.write_calls)
    assert all(mode == "overwrite" for _, mode in fake.write_calls)


def test_read_table_prefers_lance_parts_but_falls_back(tmp_path, monkeypatch):
    # dir with only parquet parts still reads under the fake lance gate
    d = tmp_path / "mixed"
    os.makedirs(d)
    t = pa.table({"k": [1, 2]})
    pq.write_table(t, str(d / "part-0.parquet"))
    _patched(monkeypatch)
    assert storage.read_table(str(d)).equals(t)
