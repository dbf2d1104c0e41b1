"""WebDataset-style tar-shard sink/source for training-data pipelines.

Large-scale image/text training jobs consume samples as sequentially-read
tar shards (the WebDataset convention: one ``{key}.{ext}`` payload member
plus one ``{key}.json`` metadata member per sample, ~10k samples per
shard) because a 100 TB corpus of millions of tiny files is unusable on
object storage, while a few thousand 256 MB tars stream at full
bandwidth. Reference-engine parity note: the reference stores scraped
binaries as individual download files (src/shared/download-utils.ts);
this module is the scale-path packaging of the same payloads.

Ray-Data-first shapes:

- **sink** — ``write_tar_shards`` is one ``map_batches`` with
  ``batch_size = samples_per_shard``: each task serializes ITS batch into
  one tar under a deterministic name derived from the first key (no
  driver traffic, no cross-task coordination, resumable — a re-run
  rewrites the same shard names idempotently). The returned manifest
  Dataset is one small row per shard (path, n_samples, n_bytes).
- **source** — ``read_tar_shards`` fans a task per shard path
  (``from_items`` over the manifest) and emits (key, payload, meta) rows;
  payloads stay ``binary`` columns end to end.

Tars are byte-deterministic: member mtime=0, uid=gid=0, empty
uname/gname, members ordered by key — identical inputs give identical
shard bytes on every run/engine, so shard-level checksums are stable.
"""

from __future__ import annotations

import io
import json
import os
import tarfile

import pyarrow as pa


def _det_tarinfo(name: str, size: int) -> tarfile.TarInfo:
    info = tarfile.TarInfo(name=name)
    info.size = size
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    return info


def write_tar_shards(
    ds,
    out_dir: str,
    key_col: str,
    payload_col: str,
    meta_cols: tuple[str, ...] = (),
    ext: str = "bin",
    samples_per_shard: int = 1024,
    prefix: str = "shard",
):
    """Write ``ds`` as WebDataset-style tar shards; returns the manifest
    Dataset (shard, n_samples, n_bytes) — the only rows that ever reach
    the driver if collected. Payload column must be binary/string; keys
    are stringified and zero-padded into member names so tar order is
    lexicographic = key order."""
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        keys = [str(k) for k in batch.column(key_col).to_pylist()]
        payloads = batch.column(payload_col).to_pylist()
        metas = {c: batch.column(c).to_pylist() for c in meta_cols}
        width = max(16, max((len(k) for k in keys), default=0))
        order = sorted(range(len(keys)), key=lambda i: keys[i].zfill(width))
        first = keys[order[0]].zfill(width) if order else "empty"
        path = os.path.join(out_dir, f"{prefix}-{first}.tar")
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for i in order:
                key = keys[i].zfill(width)
                payload = payloads[i]
                if isinstance(payload, str):
                    payload = payload.encode("utf-8")
                payload = payload or b""
                tar.addfile(
                    _det_tarinfo(f"{key}.{ext}", len(payload)),
                    io.BytesIO(payload),
                )
                meta = json.dumps(
                    {c: metas[c][i] for c in meta_cols},
                    sort_keys=True,
                    default=str,
                ).encode("utf-8")
                tar.addfile(_det_tarinfo(f"{key}.json", len(meta)), io.BytesIO(meta))
        data = buf.getvalue()
        with open(path, "wb") as f:
            f.write(data)
        return pa.table(
            {
                "shard": pa.array([path], pa.string()),
                "n_samples": pa.array([len(keys)], pa.int64()),
                "n_bytes": pa.array([len(data)], pa.int64()),
            }
        )

    return ds.map_batches(
        write_batch, batch_size=samples_per_shard, batch_format="pyarrow"
    )


def read_tar_shards(shard_paths: list[str], ext: str = "bin"):
    """Shard paths → Dataset of (key, payload, meta) rows; one read task
    per shard (each task streams one tar sequentially — the access
    pattern tar shards exist for)."""
    import ray

    def read_shard(batch: pa.Table) -> pa.Table:
        keys: list[str] = []
        payloads: list[bytes] = []
        metas: list[str] = []
        for path in batch.column("path").to_pylist():
            samples: dict[str, dict] = {}
            with tarfile.open(path, mode="r") as tar:
                for member in tar.getmembers():
                    stem, _, kind = member.name.rpartition(".")
                    blob = tar.extractfile(member).read()
                    samples.setdefault(stem, {})[kind] = blob
            for stem in sorted(samples):
                keys.append(stem)
                payloads.append(samples[stem].get(ext, b""))
                metas.append(
                    samples[stem].get("json", b"{}").decode("utf-8")
                )
        return pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "meta": pa.array(metas, pa.string()),
            }
        )

    paths = ray.data.from_items([{"path": p} for p in sorted(shard_paths)])
    return paths.map_batches(read_shard, batch_size=1, batch_format="pyarrow")
