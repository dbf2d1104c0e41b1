"""WebDataset tar-shard sink/source: byte-exact round-trip, shard
determinism, meta preservation (sources/webdataset.py)."""

import hashlib
import json
import os

import pyarrow as pa
import ray

from spider_ray.sources.webdataset import read_tar_shards, write_tar_shards


def _images_like_table(n=50):
    payloads = [
        bytes([i % 256, 0, 255, (i * 7) % 256]) * (i + 1) for i in range(n)
    ]
    return pa.table(
        {
            "image_id": pa.array(range(n), pa.int64()),
            "bytes": pa.array(payloads, pa.binary()),
            "caption": pa.array([f"cap {i}" for i in range(n)], pa.string()),
        }
    )


def _write(tbl, out_dir, **kw):
    ds = ray.data.from_arrow(tbl).repartition(4)
    manifest = write_tar_shards(
        ds,
        out_dir,
        key_col="image_id",
        payload_col="bytes",
        meta_cols=("caption",),
        ext="img",
        samples_per_shard=16,
        **kw,
    ).to_pandas()
    return manifest


def test_roundtrip_binary_payloads_and_meta(ray_session, tmp_path):
    tbl = _images_like_table()
    manifest = _write(tbl, str(tmp_path / "shards"))
    assert manifest["n_samples"].sum() == tbl.num_rows

    rows = (
        read_tar_shards(sorted(manifest["shard"]), ext="img")
        .to_pandas()
        .assign(image_id=lambda d: d["key"].astype(int))
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert rows["image_id"].tolist() == list(range(tbl.num_rows))
    orig = tbl.column("bytes").to_pylist()
    assert [bytes(p) for p in rows["payload"]] == orig
    metas = [json.loads(m) for m in rows["meta"]]
    assert [m["caption"] for m in metas] == tbl.column("caption").to_pylist()


def test_shards_are_byte_deterministic(ray_session, tmp_path):
    tbl = _images_like_table()
    m1 = _write(tbl, str(tmp_path / "a"))
    m2 = _write(tbl, str(tmp_path / "b"))

    def digests(manifest):
        out = {}
        for p in manifest["shard"]:
            with open(p, "rb") as f:
                out[os.path.basename(p)] = hashlib.md5(f.read()).hexdigest()
        return out

    assert digests(m1) == digests(m2)
