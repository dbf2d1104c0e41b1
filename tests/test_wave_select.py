"""The two wave-selection implementations (numpy fast path vs Ray Data
groupby/sort path) must pick identical waves."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from spider_ray.pipelines.crawl import wave_select_arrow, wave_select_dataset


def _frontier(n=500, hosts=5, seed=3):
    rng = np.random.default_rng(seed)
    prio = rng.integers(0, 1000, n) / 1000.0
    return pa.table(
        {
            "url": pa.array([f"http://h{i % hosts}.test/p/{i}" for i in range(n)]),
            "url_hash": pa.array(
                rng.integers(0, 2**63, n, dtype=np.uint64), pa.uint64()
            ),
            "host": pa.array([f"h{i % hosts}.test" for i in range(n)]),
            "priority": pa.array(prio, pa.float64()),
            "depth": pa.array([0] * n, pa.int32()),
            "attempts": pa.array([0] * n, pa.int32()),
        }
    )


@pytest.mark.parametrize("wave_k,cap", [(100, 10), (50, 1000), (10_000, 3)])
def test_wave_paths_equivalent(ray_session, wave_k, cap):
    frontier = _frontier()
    wave_a, deferred_a = wave_select_arrow(frontier, wave_k, cap)
    wave_b, _deferred_b = wave_select_dataset(
        ray.data.from_arrow(frontier), wave_k, cap
    )
    a = wave_a.select(["url", "priority"]).to_pydict()
    b = wave_b.select(["url", "priority"]).to_pydict()
    assert a == b
    assert wave_a.num_rows + deferred_a.num_rows == frontier.num_rows


def test_wave_budget_and_cap_respected():
    frontier = _frontier(n=200, hosts=4)
    wave, deferred = wave_select_arrow(frontier, wave_k=30, max_per_host=5)
    assert wave.num_rows == 20  # 4 hosts × cap 5 < budget 30
    import collections

    per = collections.Counter(wave.column("host").to_pylist())
    assert max(per.values()) <= 5
    # wave is in (priority desc, hash asc) order
    prio = wave.column("priority").to_pylist()
    hashes = wave.column("url_hash").to_pylist()
    keys = list(zip([-p for p in prio], hashes))
    assert keys == sorted(keys)
