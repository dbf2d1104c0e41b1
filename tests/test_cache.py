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


def test_crawl_rerun_hits_persistent_cache(ray_session, tmp_path):
    """Reference resume-via-cache semantics (README.md:554-557): a second
    crawl over the same universe with a shared persistent cache dir serves
    fetches from the cache (fetches counted in lineage drop to ~0)."""
    from spider_ray.pipelines.crawl import CrawlConfig, run_crawl
    from spider_ray.sources.fixtures import seed_urls
    from spider_ray.sources.storage import EpochStore

    web = MockWebConfig(n_pages=90, n_hosts=7, img_every=5)
    cache_dir = str(tmp_path / "rcache")
    base = dict(
        seeds=seed_urls(web, every=30), web=web, wave_k=10_000,
        exact_seen=True, fetch_concurrency=2, fetch_cache_dir=cache_dir,
    )
    run_crawl(CrawlConfig(out_dir=str(tmp_path / "c1"), **base))
    run_crawl(CrawlConfig(out_dir=str(tmp_path / "c2"), **base))

    def fetch_count(out):
        lin = EpochStore(out).read_all("lineage").to_pandas()
        return int(lin[lin["stage"] == "fetch"]["fetches"].sum())

    first, second = fetch_count(str(tmp_path / "c1")), fetch_count(str(tmp_path / "c2"))
    assert first > 0
    assert second == 0, (first, second)  # every fetch served from cache
    # results identical either way
    a = EpochStore(str(tmp_path / "c1")).read_all("order").to_pydict()
    b = EpochStore(str(tmp_path / "c2")).read_all("order").to_pydict()
    assert a == b
