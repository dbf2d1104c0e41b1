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


@pytest.mark.parametrize("wave_k", [10, 100, 499, 500, 5000])
def test_runset_cut_equals_materialized_cut(wave_k):
    """The LSM sorted-run frontier must cut EXACTLY the same wave, in the
    same order, as the materialized numpy cut — including across multiple
    runs with duplicated priorities (boundary ties)."""
    from spider_ray.pipelines.crawl import RunSet, wave_select_arrow

    frontier = _frontier(n=500, hosts=5)
    # split into 3 uneven runs to exercise the multi-run merge
    rs = RunSet()
    for lo, hi in ((0, 50), (50, 300), (300, 500)):
        assert rs.add_table(frontier.slice(lo, hi - lo))
    wave_rs, leftover = rs.cut(wave_k)
    wave_np, deferred_np = wave_select_arrow(frontier, wave_k, 10**9)
    assert wave_rs.select(["url", "priority"]).to_pydict() == \
        wave_np.select(["url", "priority"]).to_pydict()
    assert leftover.count == deferred_np.num_rows
    # leftover rows are exactly the complement
    got = set(wave_rs.column("url").to_pylist())
    left_urls = set(leftover.to_table().column("url").to_pylist())
    assert got | left_urls == set(frontier.column("url").to_pylist())
    assert not (got & left_urls)


def test_runset_iterated_cuts_match_full_order():
    """Cut-k repeatedly (re-adding nothing) must walk the full frontier in
    exact global order — the crawl's epoch sequence."""
    from spider_ray.pipelines.crawl import RunSet, wave_select_arrow

    frontier = _frontier(n=300, hosts=4, seed=9)
    full_order, _ = wave_select_arrow(frontier, 10**9, 10**9)
    rs = RunSet()
    assert rs.add_table(frontier)
    walked = []
    while rs.count:
        wave, rs = rs.cut(37)
        walked.extend(wave.column("url").to_pylist())
    assert walked == full_order.column("url").to_pylist()


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


def test_host_cap_vectorized_matches_sequential_reference():
    """The vectorized host-cap cut equals the sequential scan it
    replaced: walk rows in wave order, take while host count < cap and
    budget remains."""
    import collections

    import numpy as np
    import pyarrow as pa

    from spider_ray.pipelines.crawl import wave_select_arrow

    rng = np.random.default_rng(17)
    n = 500
    frontier = pa.table(
        {
            "url": [f"u{i}" for i in range(n)],
            "url_hash": pa.array(
                rng.integers(0, 2**63 - 1, n, dtype=np.int64), pa.int64()
            ),
            "host": pa.array([f"h{int(h)}" for h in rng.integers(0, 7, n)]),
            "priority": pa.array(
                rng.integers(0, 1000, n).astype(np.float64) / 1000.0
            ),
        }
    )
    for wave_k, cap in [(50, 3), (200, 10), (500, 2), (10, 1)]:
        wave, deferred = wave_select_arrow(frontier, wave_k, cap)
        # reference sequential scan over the same total order
        prio = frontier.column("priority").to_numpy()
        hashes = frontier.column("url_hash").to_numpy().astype(np.uint64)
        order = np.lexsort((hashes, -prio))
        hosts = frontier.column("host").to_pylist()
        counts = collections.defaultdict(int)
        take = []
        budget = wave_k
        for pos in order:
            if budget == 0:
                break
            if counts[hosts[pos]] < cap:
                counts[hosts[pos]] += 1
                take.append(pos)
                budget -= 1
        expected = [frontier.column("url")[i].as_py() for i in take]
        assert wave.column("url").to_pylist() == expected, (wave_k, cap)
        assert wave.num_rows + deferred.num_rows == n


def test_wave_select_arrow_null_host(ray_session):
    """A null host must behave as an ordinary politeness key (ADVICE r3):
    the capped cut over a frontier with None hosts equals the cut over
    the identical frontier with None replaced by a sentinel string."""
    frontier = _frontier(n=200, hosts=4)
    host = frontier.column("host").to_pylist()
    for i in range(0, len(host), 7):
        host[i] = None
    with_null = frontier.set_column(
        frontier.schema.get_field_index("host"), "host",
        pa.array(host, pa.string()),
    )
    with_sentinel = frontier.set_column(
        frontier.schema.get_field_index("host"), "host",
        pa.array(["" if h is None else h for h in host], pa.string()),
    )
    wave_a, deferred_a = wave_select_arrow(with_null, 60, 5)
    wave_b, _ = wave_select_arrow(with_sentinel, 60, 5)
    assert wave_a.select(["url", "priority"]).to_pydict() == \
        wave_b.select(["url", "priority"]).to_pydict()
    assert wave_a.num_rows + deferred_a.num_rows == with_null.num_rows
