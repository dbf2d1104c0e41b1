"""Browser download capture + dedupeDownloads — mirrors the reference's
crawlee download test (index.spec.ts:156-174) and the composite-key dedup
(browser-runner.ts:204-222): a page triggering 3 raw download events (one
an exact duplicate) yields a ``downloads`` list column with 2 entries;
scrapeDocument's 3-way branch turns downloads[0] into the direct-download
record (scrapeDocument.ts:258-281)."""

import pyarrow as pa

from spider_ray.functions.downloads import dedupe_downloads, download_key
from spider_ray.sources.fixtures import MockWebConfig, downloads_for, page_url
from spider_ray.stages.fetch import FetchStage
from spider_ray.stages.parse import to_documents_batch


def test_dedupe_downloads_composite_key():
    a = {"url": "u", "filename": "f.pdf", "content_type": "application/pdf"}
    b = dict(a)
    c = {"url": "u", "filename": "f.pdf", "content_type": "text/plain"}
    d = {"url": "u", "filename": None, "content_type": None}
    out = dedupe_downloads([a, b, c, d])
    assert out == [a, c, d]  # dup dropped, first wins
    assert download_key(d) == "u\0\0"


def test_browser_adapter_captures_deduped_downloads():
    cfg = MockWebConfig(n_pages=60, with_downloads=True)
    stage = FetchStage(web_config=cfg, adapter="crawlee")
    url = page_url(4, cfg)  # 4 % 9 == 4 → download-bearing page
    out = stage(pa.table({"url": [url]}))
    dls = out.column("downloads").to_pylist()[0]
    assert len(dls) == 2  # 3 raw events, duplicate pdf collapsed
    assert dls[0]["filename"] == "doc4.pdf"
    assert dls[0]["content"] == b"%PDF-1.4 fixture download 4"
    assert dls[1]["filename"] == "notes4.txt"
    # raw fixture really contained the duplicate
    assert len(downloads_for(4, cfg)) == 3


def test_simple_adapter_surfaces_no_downloads():
    cfg = MockWebConfig(n_pages=60, with_downloads=True)
    stage = FetchStage(web_config=cfg, adapter="simple")
    out = stage(pa.table({"url": [page_url(4, cfg)]}))
    assert out.column("downloads").to_pylist() == [None]


def test_documents_branch_prefers_downloads_first():
    cfg = MockWebConfig(n_pages=60, with_downloads=True)
    stage = FetchStage(web_config=cfg, adapter="tree")
    pages = stage(pa.table({"url": [page_url(4, cfg), page_url(5, cfg)]}))
    docs = to_documents_batch(pages).to_pylist()
    by_url = {d["url"]: d for d in docs}
    rec = by_url[page_url(4, cfg)]
    assert rec["strategy"] == "direct-download"
    assert rec["is_download"] is True
    assert rec["filename"] == "doc4.pdf"
    assert rec["file_content"] == b"%PDF-1.4 fixture download 4"
    assert rec["is_pdf"] is True
    # page without downloads stays on the html-extraction branch
    assert by_url[page_url(5, cfg)]["strategy"] == "html-extraction"
