"""Detector chain conformance — fixture expectations mirror the reference's
corpus tests (src/scrapeDocument.test.ts:21-95) and FIXTURES.md §4."""

from spider_ray.functions.detectors import (
    detect_document_url,
    extract_civicweb_document_url,
    extract_docushare_document_url,
    extract_wordpress_download_url,
)

WP_URL = "http://town.test/download/meeting-minutes/"
WP_HTML = '<div class="wpdm-download-link"><a href="/download/minutes/?wpdmdl=12345">Download</a></div>'


def test_wordpress_wpdmdl_link():
    out = detect_document_url(WP_URL, WP_HTML)
    assert out is not None
    assert out.url == "http://town.test/download/minutes/?wpdmdl=12345"
    assert out.type == "application/pdf"
    assert out.is_pdf is True
    assert out.strategy == "wordpress-pdf-link"


def test_wordpress_loop_guard():
    # URL already has wpdmdl → skip detection (detectors.ts:40-47)
    assert (
        extract_wordpress_download_url(
            "http://town.test/download/minutes/?wpdmdl=12345", WP_HTML
        )
        is None
    )


def test_wordpress_pdf_fallback_and_entities():
    html = '<span class="wpdm_view_count">7</span><a href="/files/report&amp;v=2.pdf">r</a>'
    out = extract_wordpress_download_url("http://town.test/page", html)
    assert out == "http://town.test/files/report&v=2.pdf"


def test_wordpress_requires_markers():
    assert extract_wordpress_download_url("http://town.test/page", "<a href='/x.pdf'>x</a>") is None


def test_civicweb():
    url = "http://town.civicweb.net/filepro/documents/?preview=991"
    html = '<a href="/filepro/document/991/Agenda.pdf">Agenda</a>'
    out = detect_document_url(url, html)
    assert out.strategy == "civicweb-pdf-link"
    assert out.url == "http://town.civicweb.net/filepro/document/991/Agenda.pdf"
    # preview page without a pdf link → falls through whole chain
    assert detect_document_url(url, "<p>nothing</p>") is None


def test_docushare_pdf_and_office():
    url = "http://docs.test/docushare/dsweb/Services/x"
    html = '<a href="/dsweb/Get/Document-771/Minutes.pdf">m</a>'
    out = detect_document_url(url, html)
    assert out.strategy == "docushare-doc-link"
    assert out.is_pdf is True
    assert out.url == "http://docs.test/dsweb/Get/Document-771/Minutes.pdf"

    html2 = '<a href="/dsweb/ServicesLib/Document-88/Budget.xlsx">b</a>'
    out2 = detect_document_url("http://docs.test/p", "DocuShare" + html2)
    assert out2.is_pdf is False
    assert out2.type == "application/octet-stream"
    assert out2.url == "http://docs.test/dsweb/ServicesLib/Document-88/Budget.xlsx"


def test_docushare_markers_without_link():
    assert extract_docushare_document_url("http://docs.test/p", "DocuShare only") is None


def test_chain_order_first_match_wins():
    # page matching both WordPress and DocuShare markers → WordPress wins
    url = "http://town.test/download/x/"
    html = 'DocuShare <a href="/a.pdf">a</a>'
    out = detect_document_url(url, html)
    assert out.strategy == "wordpress-pdf-link"


def test_normal_page_no_detection():
    assert detect_document_url("http://x.test/p", "<html><body>hi</body></html>") is None
