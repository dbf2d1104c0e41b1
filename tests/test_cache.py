"""Persistent TTL cache (state.cache.FileCache) — cache.ts:6-46 semantics:
TTL expiry with an injectable clock, header-varied keys
(index.spec.ts:120-146), and cross-process reuse (README.md:554-557
"cached fetch ~5 ms, re-runs skip fetched work")."""

import pyarrow as pa

from spider_ray.sources.fixtures import MockWebConfig, page_url
from spider_ray.stages.fetch import FetchStage
from spider_ray.state.cache import FileCache


class FakeClock:
    def __init__(self, now=1_000_000):
        self.now = now

    def __call__(self):
        return self.now


def test_ttl_expiry_with_injected_clock(tmp_path):
    clock = FakeClock()
    cache = FileCache(str(tmp_path / "c"), clock=clock)
    cache.set("simple:abc", {"x": 1, "blob": b"\x00\xff"}, ttl_ms=5000)
    assert cache.get("simple:abc") == {"x": 1, "blob": b"\x00\xff"}
    clock.now += 4999
    assert cache.get("simple:abc") is not None
    clock.now += 2
    assert cache.get("simple:abc") is None  # expired (cache.ts:20-23)
    # no-TTL entries never expire
    cache.set("simple:def", {"y": 2})
    clock.now += 10**9
    assert cache.get("simple:def") == {"y": 2}


def test_cache_varies_by_headers(tmp_path):
    """Two stages with different headers must not share entries over the
    same persistent dir (index.spec.ts:120-146)."""
    web = MockWebConfig(n_pages=10)
    root = str(tmp_path / "c")
    url = page_url(0, web)
    a = FetchStage(web_config=web, cache_dir=root, headers={"X-K": "1"})
    b = FetchStage(web_config=web, cache_dir=root, headers={"X-K": "2"})
    a(pa.table({"url": [url]}))
    out_b = b(pa.table({"url": [url]}))
    assert out_b.column("cache_hit").to_pylist() == [False]  # miss: key differs
    out_b2 = b(pa.table({"url": [url]}))
    assert out_b2.column("cache_hit").to_pylist() == [True]


def test_cross_process_reuse(tmp_path):
    """A FRESH stage (new process analogue: empty LRU) hits the persistent
    backend and skips the fetch."""
    web = MockWebConfig(n_pages=10)
    root = str(tmp_path / "c")
    url = page_url(3, web)
    first = FetchStage(web_config=web, cache_dir=root)
    first(pa.table({"url": [url]}))
    assert first.stats()["fetches"] == 1
    fresh = FetchStage(web_config=web, cache_dir=root)
    out = fresh(pa.table({"url": [url]}))
    assert out.column("cache_hit").to_pylist() == [True]
    assert fresh.stats()["fetches"] == 0  # no network on the re-run
    # content round-trips bytes intact through the JSON envelope
    row_first = first(pa.table({"url": [url]}))
    assert out.column("content").to_pylist() == row_first.column("content").to_pylist()


def test_expired_entry_refetches(tmp_path):
    web = MockWebConfig(n_pages=10)
    clock = FakeClock()
    url = page_url(5, web)
    a = FetchStage(
        web_config=web, cache_dir=str(tmp_path / "c"),
        cache_ttl_ms=1000, cache_clock=clock, cache_size=0,  # force pcache path
    )
    a(pa.table({"url": [url]}))
    clock.now += 2000
    out = a(pa.table({"url": [url]}))
    assert out.column("cache_hit").to_pylist() == [False]
    assert a.stats()["fetches"] == 2
