"""Hive-partitioned parquet sink: purity, idempotent re-run, manifest
accounting (sources/storage.write_partitioned)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from spider_ray.sources.storage import write_partitioned


def _tbl(n=60):
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "lang": pa.array([["en", "de", "fr"][i % 3] for i in range(n)]),
            "text": pa.array([f"doc {i}" for i in range(n)]),
        }
    )


def _run(out_dir):
    ds = ray.data.from_arrow(_tbl()).repartition(4)
    return write_partitioned(
        ds, out_dir, key_col="lang", filename_col="doc_id"
    ).to_pandas()


def test_partition_purity_and_manifest(ray_session, tmp_path):
    out = str(tmp_path / "sink")
    manifest = _run(out)
    assert manifest["rows"].sum() == 60
    for lang in ("en", "de", "fr"):
        part_dir = os.path.join(out, f"lang={lang}")
        files = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
        assert files
        got = pa.concat_tables(
            pq.read_table(os.path.join(part_dir, f)) for f in files
        )
        assert set(got.column("lang").to_pylist()) == {lang}
    all_ids = sorted(
        i
        for p in manifest["path"]
        for i in pq.read_table(p).column("doc_id").to_pylist()
    )
    assert all_ids == list(range(60))


def test_rerun_is_idempotent(ray_session, tmp_path):
    out = str(tmp_path / "sink")
    m1 = _run(out)
    m2 = _run(out)
    assert sorted(m1["path"]) == sorted(m2["path"])
    # same file set on disk, no strays accumulated
    files = {
        os.path.join(r, f)
        for r, _, fs in os.walk(out)
        for f in fs
        if f.endswith(".parquet")
    }
    assert files == set(m2["path"])
