"""Adapter parity matrix + browser-expansion + crawl4ai + env config —
mirrors the reference's adapter test strategy (src/index.spec.ts,
src/scrapers/scrapers.spec.ts, src/env-config.test.ts)."""

import pyarrow as pa
import pytest

from spider_ray.config import DEFAULT_TIMEOUT_MS, FetchOptions, load_env_config
from spider_ray.sources.fixtures import MockWebConfig, page_url
from spider_ray.stages.fetch import FetchStage
from spider_ray.stages.parse import parse_links_batch

CFG = MockWebConfig(n_pages=120, n_hosts=7, with_expandables=True)


def _wave(urls):
    n = len(urls)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "depth": pa.array([0] * n, pa.int32()),
            "attempts": pa.array([0] * n, pa.int32()),
        }
    )


def _links_of(adapter, i, cfg=CFG, **kw):
    stage = FetchStage(web_config=cfg, adapter=adapter, **kw)
    pages = parse_links_batch(stage(_wave([page_url(i, cfg)])))
    return pages, [l["href"] for l in pages.column("links").to_pylist()[0]]


@pytest.mark.parametrize("adapter", ["simple", "dom", "crawlee", "crawl4ai", "tree"])
def test_adapter_parity_absolute_links(adapter):
    # same page → all adapters produce absolute, deduped links incl. the
    # standard out-links (index.spec.ts:70-99 parity matrix)
    pages, hrefs = _links_of(adapter, 1)
    assert all(h.startswith("http://") for h in hrefs)
    assert len(hrefs) == len(set(hrefs))
    from spider_ray.sources.fixtures import out_link_ids

    for target in out_link_ids(1, CFG.n_pages):
        assert page_url(target, CFG) in hrefs
    assert pages.column("strategy_spider").to_pylist() == [adapter]


def test_unsupported_adapter_rejected():
    with pytest.raises(ValueError):
        FetchStage(adapter="scroll")  # reserved-but-rejected name


def test_expansion_reveals_hidden_link_browser_only():
    i = 5  # 5 % 11 == 5 → expandable page
    hidden = page_url((7 * i + 11) % CFG.n_pages, CFG)
    _, simple_hrefs = _links_of("simple", i)
    assert hidden not in simple_hrefs  # static fetch can't see it
    pages, crawlee_hrefs = _links_of("crawlee", i)
    assert hidden in crawlee_hrefs  # expansion revealed it
    assert pages.column("interaction_count").to_pylist() == [1]

    tree_pages, tree_hrefs = _links_of("tree", i)
    assert hidden in tree_hrefs
    assert tree_pages.column("strategy_type").to_pylist() == ["tree"]
    assert tree_pages.column("confidence").to_pylist() == [0.9]
    # non-expandable page → tree confidence 0.5 (tree.ts:340)
    t2, _ = _links_of("tree", 1)
    assert t2.column("confidence").to_pylist() == [0.5]


def test_tree_cache_varies_by_custom_selectors():
    stage_a = FetchStage(web_config=CFG, adapter="tree")
    stage_b = FetchStage(web_config=CFG, adapter="tree", custom_selectors=[".x"])
    url = page_url(1, CFG)
    stage_a(_wave([url]))
    key_a = next(iter(stage_a.cache))
    stage_b(_wave([url]))
    key_b = next(iter(stage_b.cache))
    assert key_a != key_b  # tree.ts:110 — selectors vary the cache key


def test_browser_cache_key_varies_by_launch_options():
    """crawlee.ts:46-66 / tree.ts:101-121: every browser launch option
    that can change the rendered page varies the cache key — headless,
    userAgent, stealth, executablePath, and each cloak knob — while a
    repeat with identical options keys identically."""
    url = page_url(1, CFG)
    base = dict(web_config=CFG, adapter="crawlee")
    key0 = FetchStage(**base).cache_key(url)
    assert FetchStage(**base).cache_key(url) == key0  # deterministic
    variants = [
        dict(headless=False),
        dict(user_agent="UA/2"),
        dict(stealth=True),
        dict(executable_path="/opt/chromium"),
        dict(cloak={"humanize": True}),
        dict(cloak={"executablePath": "/opt/cloak-chromium"}),
        dict(cloak={"autoUpdate": False}),
    ]
    keys = [FetchStage(**base, **v).cache_key(url) for v in variants]
    assert len({key0, *keys}) == 1 + len(variants)  # all distinct
    # the same options on the non-browser adapter do NOT vary its key
    # (simple.ts keys only on url+headers)
    s0 = FetchStage(web_config=CFG, adapter="simple").cache_key(url)
    s1 = FetchStage(
        web_config=CFG, adapter="simple", stealth=True, headless=False
    ).cache_key(url)
    assert s0 == s1


def test_browser_executable_path_resolution(monkeypatch):
    """browser-runner.ts:102-123 + env-config.test.ts:60-97: explicit
    path (trimmed) wins; env fallbacks in declared order; stealth passes
    includeEnvironment=False so the environment never leaks into a
    stealth browser's identity (crawlee.ts:52-55)."""
    from spider_ray.stages.fetch import resolve_browser_executable_path

    monkeypatch.delenv("HAVE_SPIDER_BROWSER_EXECUTABLE_PATH", raising=False)
    monkeypatch.delenv("PLAYWRIGHT_CHROMIUM_EXECUTABLE_PATH", raising=False)
    assert resolve_browser_executable_path() is None
    monkeypatch.setenv("PLAYWRIGHT_CHROMIUM_EXECUTABLE_PATH", "/usr/bin/chromium")
    assert resolve_browser_executable_path() == "/usr/bin/chromium"
    monkeypatch.setenv("HAVE_SPIDER_BROWSER_EXECUTABLE_PATH", " /opt/spider/chromium ")
    assert resolve_browser_executable_path() == "/opt/spider/chromium"
    assert (
        resolve_browser_executable_path("  /custom/chromium  ")
        == "/custom/chromium"
    )
    assert resolve_browser_executable_path(include_environment=False) is None

    # cache-key consequence: env var varies a NON-stealth browser's key
    # but not a stealth one's
    url = page_url(1, CFG)
    monkeypatch.delenv("HAVE_SPIDER_BROWSER_EXECUTABLE_PATH", raising=False)
    monkeypatch.delenv("PLAYWRIGHT_CHROMIUM_EXECUTABLE_PATH", raising=False)
    plain_before = FetchStage(web_config=CFG, adapter="crawlee").cache_key(url)
    stealth_before = FetchStage(
        web_config=CFG, adapter="crawlee", stealth=True
    ).cache_key(url)
    monkeypatch.setenv("HAVE_SPIDER_BROWSER_EXECUTABLE_PATH", "/opt/spider/chromium")
    assert FetchStage(web_config=CFG, adapter="crawlee").cache_key(url) != plain_before
    assert (
        FetchStage(web_config=CFG, adapter="crawlee", stealth=True).cache_key(url)
        == stealth_before
    )


def test_browser_options_isolate_persistent_cache(tmp_path):
    """Two stages sharing one persistent cache dir but differing in a
    cloak knob must not serve each other's cached renders."""
    url = page_url(1, CFG)
    a = FetchStage(web_config=CFG, adapter="crawlee", cache_dir=str(tmp_path))
    a(_wave([url]))
    assert a.fetches == 1
    same = FetchStage(web_config=CFG, adapter="crawlee", cache_dir=str(tmp_path))
    same(_wave([url]))
    assert same.fetches == 0  # identical options → persistent hit
    other = FetchStage(
        web_config=CFG,
        adapter="crawlee",
        cache_dir=str(tmp_path),
        cloak={"humanize": True},
    )
    other(_wave([url]))
    assert other.fetches == 1  # cloak varies the key → miss


def test_crawl4ai_markdown_and_service_links():
    pages, hrefs = _links_of("crawl4ai", 1)
    assert pages.column("markdown").to_pylist()[0].startswith("# Page 1")
    links = pages.column("links").to_pylist()[0]
    # quirk: crawl4ai service links carry no rel/target/classes metadata
    assert all(l["rel"] is None and l["classes"] is None for l in links)
    assert len(hrefs) >= 3


def test_crawl4ai_fallback_to_parser():
    # i % 13 == 4 → service returns empty link lists → parser fallback
    pages, hrefs = _links_of("crawl4ai", 4)
    from spider_ray.sources.fixtures import out_link_ids

    for target in out_link_ids(4, CFG.n_pages):
        assert page_url(target, CFG) in hrefs
    # fallback path used the full parser → metadata present on first link
    links = pages.column("links").to_pylist()[0]
    assert links[0]["title"] is not None or links[0]["text"]


def test_env_config_merge_user_wins():
    env = {
        "HAVE_SPIDER_TIMEOUT": "5000",
        "HAVE_SPIDER_USER_AGENT": "env-agent",
        "HAVE_SPIDER_MAX_REQUESTS": "9",
    }
    merged = load_env_config(FetchOptions(user_agent="user-agent"), env=env)
    assert merged.timeout == 5000  # env fills unset
    assert merged.user_agent == "user-agent"  # user wins
    assert merged.max_requests == 9
    # defaults when neither set
    assert load_env_config(env={}).timeout == DEFAULT_TIMEOUT_MS
    # malformed env ignored
    assert load_env_config(env={"HAVE_SPIDER_TIMEOUT": "xx"}).timeout == DEFAULT_TIMEOUT_MS
