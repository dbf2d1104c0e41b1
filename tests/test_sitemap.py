"""Sitemap parsing + seed-discovery stage (sitemaps.org protocol)."""

import pyarrow as pa
import ray

from spider_ray.functions.sitemap import parse_sitemap
from spider_ray.sources.fixtures import MockWeb, MockWebConfig, page_url
from spider_ray.stages.sitemap_seeds import SitemapStage, sitemap_seed_frontier

CFG = MockWebConfig(n_pages=60, n_hosts=7, with_sitemaps=True)


def test_parse_urlset_fields_and_tolerance():
    xml = """<?xml version="1.0"?>
    <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <url><loc>http://a.test/1</loc><lastmod>2026-01-01</lastmod>
           <changefreq>daily</changefreq><priority>0.8</priority></url>
      <url><loc> http://a.test/2 </loc></url>
      <url><priority>0.5</priority></url>
    </urlset>"""
    got = parse_sitemap(xml)
    assert got["sitemaps"] == []
    assert got["urls"][0] == {
        "loc": "http://a.test/1", "lastmod": "2026-01-01",
        "changefreq": "daily", "priority": "0.8",
    }
    # whitespace trimmed, missing optionals None
    assert got["urls"][1]["loc"] == "http://a.test/2"
    assert got["urls"][1]["priority"] is None
    # loc-less entries dropped
    assert len(got["urls"]) == 2
    # priorities stay literal strings (no float round-trip)
    assert isinstance(got["urls"][0]["priority"], str)


def test_parse_sitemapindex_and_malformed():
    xml = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <sitemap><loc>http://a.test/sitemap-0.xml</loc></sitemap>
      <sitemap><loc>http://a.test/sitemap-1.xml</loc></sitemap>
    </sitemapindex>"""
    got = parse_sitemap(xml)
    assert got["urls"] == []
    assert got["sitemaps"] == [
        "http://a.test/sitemap-0.xml", "http://a.test/sitemap-1.xml",
    ]
    assert parse_sitemap("not xml <<<") == {"urls": [], "sitemaps": []}
    assert parse_sitemap("<html></html>") == {"urls": [], "sitemaps": []}


def test_stage_explodes_host_inventory():
    """Index recursion covers both shards; every host page appears
    exactly once with its closed-form priority."""
    stage = SitemapStage(web_config=CFG)
    rows = stage.urls_for_host("h2.test")
    expect = [page_url(i, CFG) for i in range(2, CFG.n_pages, CFG.n_hosts)]
    assert sorted(r["loc"] for r in rows) == sorted(expect)
    by_loc = {r["loc"]: r for r in rows}
    assert by_loc[page_url(2, CFG)]["priority"] == "0.7"  # 0.(5 + 2%5)
    assert by_loc[page_url(2, CFG)]["lastmod"] == "2026-01-01"
    # sitemaps disabled → no inventory
    assert SitemapStage(
        web_config=MockWebConfig(n_pages=60, n_hosts=7)
    ).urls_for_host("h2.test") == []


def test_sitemap_seed_frontier_dataset(ray_session):
    out = pa.concat_tables(
        [
            pa.table(b)
            for b in sitemap_seed_frontier(CFG).iter_batches(
                batch_format="pyarrow"
            )
        ]
    )
    # the whole universe is declared across the 7 hosts, exactly once
    assert sorted(out.column("url").to_pylist()) == sorted(
        page_url(i, CFG) for i in range(CFG.n_pages)
    )
    assert set(out.column("lastmod").to_pylist()) == {"2026-01-01"}


def test_robots_sitemap_directive_discovery():
    """h2.test announces a NON-conventional sitemap path via its robots
    Sitemap: line and 404s /sitemap.xml — discovery must read robots.
    Hosts without an announcement fall back to the convention."""
    stage = SitemapStage(web_config=CFG)
    assert stage._sitemap_roots("h2.test") == ["http://h2.test/inventory.xml"]
    # a host with no robots Sitemap line (sitemaps off) → convention
    plain = SitemapStage(web_config=MockWebConfig(n_pages=60, n_hosts=7))
    assert plain._sitemap_roots("h2.test") == ["http://h2.test/sitemap.xml"]
    # full inventory still discovered through the announced path
    rows = stage.urls_for_host("h2.test")
    expect = [page_url(i, CFG) for i in range(2, CFG.n_pages, CFG.n_hosts)]
    assert sorted(r["loc"] for r in rows) == sorted(expect)
    # the conventional path really is dead on h2 (no double counting)
    resp = MockWeb(CFG).resolve("http://h2.test/sitemap.xml")
    assert resp.status == 404


def test_parse_sitemap_roundtrip_property():
    """Property: any urlset built from generated entries parses back to
    exactly those entries (trimmed), regardless of field presence."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    field = st.one_of(st.none(), st.text(
        alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
        min_size=1, max_size=20,
    ).map(lambda s: s.strip()).filter(lambda s: s))
    loc = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789:/._-", min_size=1,
        max_size=40,
    )
    entry = st.fixed_dictionaries(
        {"loc": loc, "lastmod": field, "changefreq": field, "priority": field}
    )

    @given(st.lists(entry, max_size=10))
    @settings(max_examples=50, deadline=None)
    def check(entries):
        from xml.sax.saxutils import escape

        parts = []
        for e in entries:
            fields = "".join(
                f"<{k}>{escape(v)}</{k}>"
                for k, v in e.items()
                if v is not None
            )
            parts.append(f"<url>{fields}</url>")
        xml = (
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            + "".join(parts)
            + "</urlset>"
        )
        got = parse_sitemap(xml)
        assert got["sitemaps"] == []
        assert got["urls"] == entries

    check()


def test_crawl_seeded_from_sitemaps(ray_session, tmp_path):
    """A crawl seeded from the sitemap inventory covers the universe in
    ONE epoch (every page is a seed) — the discovery-free fast path."""
    from spider_ray.pipelines.crawl import CrawlConfig, run_crawl
    from spider_ray.sources.storage import EpochStore

    seeds = sorted(
        pa.concat_tables(
            [
                pa.table(b)
                for b in sitemap_seed_frontier(CFG).iter_batches(
                    batch_format="pyarrow"
                )
            ]
        )
        .column("url")
        .to_pylist()
    )
    config = CrawlConfig(
        out_dir=str(tmp_path / "smcrawl"), seeds=seeds, web=CFG,
        wave_k=10_000, exact_seen=True, fetch_concurrency=2,
    )
    result = run_crawl(config)
    order = EpochStore(config.out_dir).read_all("order")
    # every /p/ page is a seed → all fetched in epoch 0; the only later
    # work is the images those pages link to
    page_epochs = [
        e
        for e, u in zip(
            order.column("epoch").to_pylist(), order.column("url").to_pylist()
        )
        if "/p/" in u
    ]
    assert len(page_epochs) == CFG.n_pages and set(page_epochs) == {0}
    n_images = len(range(0, CFG.n_pages, CFG.img_every))
    assert result.pages_fetched == CFG.n_pages + n_images
