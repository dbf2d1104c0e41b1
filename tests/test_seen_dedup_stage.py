"""Direct coverage of the sharded seen-set client + DedupStage."""

import numpy as np
import pyarrow as pa

from spider_ray.state.seen import ShardedSeen


def _cand(hashes):
    n = len(hashes)
    return pa.table(
        {
            "url": pa.array([f"http://x.test/{h}" for h in hashes], pa.string()),
            "url_hash": pa.array(hashes, pa.uint64()),
        }
    )


def test_sharded_seen_client(ray_session):
    seen = ShardedSeen.create(n_shards=4, capacity_per_shard=4096, exact=True)
    keys = np.array([10, 11, 12, 10, 13], dtype=np.uint64)
    first = seen.check_and_add(keys)
    assert first.tolist() == [True, True, True, False, True]
    assert seen.probe(np.array([10, 99], dtype=np.uint64)).tolist() == [True, False]
    stats = seen.stats()  # probe() is non-mutating and doesn't count
    assert stats["dedup_checks"] == 5 and stats["n_items"] == 4
    # snapshot / restore round-trip
    snap = seen.snapshot_table()
    seen2 = ShardedSeen.create(n_shards=4, capacity_per_shard=4096, exact=True)
    seen2.restore_table(snap)
    assert not seen2.check_and_add(np.array([10, 11], dtype=np.uint64)).any()


def test_dedup_stage_batch(ray_session):
    from spider_ray.stages.dedup import DedupStage

    seen = ShardedSeen.create(n_shards=2, capacity_per_shard=4096, exact=True)
    stage = DedupStage(seen, use_bloom=True, bloom_capacity=4096)
    out1 = stage(_cand([1, 2, 3, 2]))
    assert sorted(out1.column("url_hash").to_pylist()) == [1, 2, 3]
    out2 = stage(_cand([2, 3, 4]))  # bloom short-circuits 2 and 3
    assert out2.column("url_hash").to_pylist() == [4]
    assert stage(_cand([])).num_rows == 0
