import pyarrow.compute as pc
import pytest

from spider_ray.functions.links import LinkFilterConfig
from spider_ray.pipelines.scrape import (
    PlatformAdapter,
    PlatformRegistry,
    explode_links_batch,
    filter_links_stage,
    find_document_links,
    scrape_document,
    scrape_index,
)
from spider_ray.sources.fixtures import MockWebConfig, image_url, page_url

CFG = MockWebConfig(n_pages=60, n_hosts=7)


def test_scrape_index_dataset(ray_session):
    out = scrape_index([page_url(0, CFG), page_url(1, CFG)], web_config=CFG,
                       concurrency=1).to_pandas()
    assert len(out) == 2
    assert (out["status"] == 200).all()
    assert (out["link_count"] > 0).all()
    assert (out["strategy_type"] == "basic").all()
    assert (out["confidence"] == 1.0).all()


def test_scrape_document_dataset(ray_session):
    out = scrape_document([page_url(2, CFG)], web_config=CFG, concurrency=1).to_pandas()
    assert out.iloc[0]["strategy"] == "html-extraction"
    assert out.iloc[0]["title"] == "Page 2"
    assert out.iloc[0]["mime_type"] == "text/html"


def test_explode_and_filter_links(ray_session):
    pages = scrape_index([page_url(0, CFG)], web_config=CFG, concurrency=1)
    links = pages.map_batches(explode_links_batch, batch_format="pyarrow")
    all_links = links.to_pandas()
    assert (all_links["page_url"] == page_url(0, CFG)).all()
    filtered = links.map_batches(
        filter_links_stage(LinkFilterConfig(url_contains=["/img/"])),
        batch_format="pyarrow",
    ).to_pandas()
    assert list(filtered["href"]) == [image_url(0, CFG)]
    # caption text preserved on the filtered row
    assert filtered.iloc[0]["text"].startswith("caption for image 0")


def test_find_document_links_distinct(ray_session):
    cfg = MockWebConfig(n_pages=60, with_detector_pages=True)
    # page 3 (3 % 17 == 3) links /download/minutes/?wpdmdl=3 — not a doc ext;
    # use extensions including the image formats to prove the filter+distinct
    out = find_document_links(
        [page_url(0, cfg), page_url(5, cfg), page_url(0, cfg)],
        web_config=cfg,
        extensions=(".png", ".jpg"),
    ).to_pandas()
    assert sorted(out["href"]) == sorted({image_url(0, cfg), image_url(5, cfg)})


def test_adapter_context_binds_one_spider(ray_session):
    from spider_ray.pipelines.scrape import create_adapter_context

    ctx = create_adapter_context(web_config=CFG, adapter="simple")
    html = ctx.fetch_page(page_url(0, CFG))
    assert html is not None and "Page 0" in html
    assert ctx.fetch_page("http://h0.test/missing") is None
    out = ctx.scrape_index([page_url(0, CFG)], concurrency=1).to_pandas()
    assert out.iloc[0]["strategy_spider"] == "simple"


def test_platform_registry_two_phase():
    reg = PlatformRegistry()
    fetches = []

    def fetch_html(url):
        fetches.append(url)
        return "<html>wpdm-download-link</html>"

    reg.register(
        PlatformAdapter(
            type="wordpress", name="WordPress", priority=100,
            detect_url=lambda u: {"confidence": "high"} if "/wp/" in u else None,
            detect_html=lambda u, h: {"confidence": "medium"} if "wpdm" in h else None,
            fetch=lambda src, ctx: [{"item": 1}],
        )
    )
    reg.register(
        PlatformAdapter(
            type="civicweb", name="CivicWeb", priority=50,
            detect_url=lambda u: {"confidence": "high"} if "civicweb" in u else None,
            detect_html=lambda u, h: None,
            fetch=lambda src, ctx: [{"item": 2}],
        )
    )
    # URL phase: priority order (civicweb=50 first), no fetch needed
    hit = reg.detect("http://x.civicweb.net/a", fetch_html)
    assert hit["type"] == "civicweb" and fetches == []
    # HTML phase: exactly one fetch
    hit2 = reg.detect("http://y.test/page", fetch_html)
    assert hit2["type"] == "wordpress" and len(fetches) == 1
    # preset type short-circuits
    assert reg.resolve({"url": "u", "type": "civicweb"}, fetch_html)["type"] == "civicweb"
    # fallback
    assert reg.detect("http://z.test/q", lambda u: None, fallback_type="wordpress")["type"] == "wordpress"
    # duplicate registration rejected
    with pytest.raises(ValueError):
        reg.register(PlatformAdapter(type="wordpress", name="dup", fetch=lambda s, c: []))
    # unresolved → ValidationError-style failure
    with pytest.raises(ValueError):
        reg.fetch_items({"url": "http://unknown.test"}, None, lambda u: None)
