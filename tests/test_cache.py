"""Persistent TTL cache (state.cache) — cache.ts:6-46 semantics over BOTH
provider backends (types.ts:177-186 CacheProviderConfig file|s3): TTL expiry
with an injectable clock, header-varied keys (index.spec.ts:120-146), and
cross-process reuse (README.md:554-557 "cached fetch ~5 ms, re-runs skip
fetched work")."""

import pyarrow as pa
import pytest

from spider_ray.sources.fixtures import MockWebConfig, page_url
from spider_ray.stages.fetch import FetchStage
from spider_ray.state.cache import (
    FakeS3Client,
    FileCache,
    S3ObjectCache,
    make_cache,
)


class FakeClock:
    def __init__(self, now=1_000_000):
        self.now = now

    def __call__(self):
        return self.now


def _make(provider, tmp_path, clock=None, client=None):
    if provider == "file":
        return FileCache(str(tmp_path / "c"), clock=clock)
    return S3ObjectCache("bkt", client=client or FakeS3Client(), clock=clock)


@pytest.mark.parametrize("provider", ["file", "s3"])
def test_ttl_expiry_with_injected_clock(tmp_path, provider):
    clock = FakeClock()
    cache = _make(provider, tmp_path, clock=clock)
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


def test_make_cache_provider_dispatch(tmp_path):
    """CacheManager.init dispatch (cache.ts:25-45): s3 config → object-store
    backend; default → file; s3 without bucket rejected."""
    f = make_cache(str(tmp_path / "c"))
    assert isinstance(f, FileCache)
    s = make_cache(None, {"provider": "s3", "bucket": "b", "client": FakeS3Client()})
    assert isinstance(s, S3ObjectCache)
    assert s.prefix == "cache/"  # default prefix (cache.ts:34)
    with pytest.raises(ValueError):
        make_cache(None, {"provider": "s3"})
    with pytest.raises(ValueError):
        make_cache(None)


def test_s3_cache_key_layout_matches_file_backend(tmp_path):
    """Object keys mirror the file layout (namespace/2-char-shard/digest)
    so a cache migrates between providers by object copy."""
    client = FakeS3Client()
    cache = S3ObjectCache("bkt", prefix="cache/", client=client)
    cache.set("simple:deadbeef01", {"v": 1})
    (bucket, key), = client.objects.keys()
    assert bucket == "bkt"
    assert key == "cache/simple/de/deadbeef01"
    fc = FileCache(str(tmp_path / "c"))
    assert fc._path("simple:deadbeef01").endswith("c/simple/de/deadbeef01")
    # hostile key components are sanitized the same way
    assert S3ObjectCache("bkt")._key("../evil:../../x") == "cache/evil/x/x"


def test_fetch_stage_over_s3_provider():
    """FetchStage wired with the CacheProviderConfig-equivalent dict: two
    stages sharing one fake bucket behave like the shared-file-dir case —
    second stage hits the cache without fetching."""
    web = MockWebConfig(n_pages=10)
    client = FakeS3Client()
    provider = {"provider": "s3", "bucket": "ci-cache", "client": client}
    url = page_url(4, web)
    a = FetchStage(web_config=web, cache_provider=provider)
    a(pa.table({"url": [url]}))
    assert a.stats()["fetches"] == 1
    assert client.objects  # envelope landed in the bucket
    b = FetchStage(web_config=web, cache_provider=provider)
    out = b(pa.table({"url": [url]}))
    assert out.column("cache_hit").to_pylist() == [True]
    assert b.stats()["fetches"] == 0


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
