"""Document-platform detectors — ordered first-match chain.

Reproduces the reference's detector semantics exactly
(src/scrapeDocument/detectors.ts:30-193):

- WordPress Download Manager (WPDM): loop guard when the request URL already
  carries ``wpdmdl=``; page qualifies via ``/download/`` in URL or
  ``wpdm-download-link`` / ``wpdm_view_count`` markers; first
  ``wpdmdl=\\d+`` href wins, else first ``.pdf`` href.
- CivicWeb: ``/filepro/documents/?preview=`` pages (or civicweb.net +
  ``/filepro/documents``); extract ``/filepro/document/\\d+/….pdf``.
- DocuShare: URL or HTML markers; three prioritized href patterns for
  ``Document-\\d+`` office-document links.

Chain order is WordPress → CivicWeb → DocuShare, first hit wins
(detectors.ts:142-193). The chain is a plain list so platform plugins can
extend it (SURVEY.md §2.9).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable

from .urls import make_absolute_url

_WPDM_LINK_RE = re.compile(r"href=[\"']([^\"']*wpdmdl=\d+[^\"']*)[\"']", re.IGNORECASE)
_PDF_LINK_RE = re.compile(r"href=[\"']([^\"']*\.pdf[^\"']*)[\"']", re.IGNORECASE)
_CIVICWEB_DOC_RE = re.compile(
    r"href=[\"'](/filepro/document/\d+/[^\"']+\.pdf)[\"']", re.IGNORECASE
)
_DOCUSHARE_RES = [
    re.compile(
        r"href=[\"'](/dsweb/Get/Document-\d+/[^\"']+\.(pdf|doc|docx|xls|xlsx|ppt|pptx))[\"']",
        re.IGNORECASE,
    ),
    re.compile(
        r"href=[\"'](/dsweb/ServicesLib/Document-\d+/[^\"']+\.(pdf|doc|docx|xls|xlsx|ppt|pptx))[\"']",
        re.IGNORECASE,
    ),
    re.compile(
        r"href=[\"'](/[^\"']*(?:docushare|dsweb)[^\"']+\.(pdf|doc|docx|xls|xlsx|ppt|pptx))[\"']",
        re.IGNORECASE,
    ),
]


@dataclass
class DetectorResult:
    url: str
    type: str
    is_pdf: bool
    strategy: str


def extract_wordpress_download_url(url: str, html: str) -> str | None:
    if "wpdmdl=" in url:
        return None  # loop guard (detectors.ts:40-47)
    is_wpdm_page = (
        "/download/" in url
        or "wpdm-download-link" in html
        or "wpdm_view_count" in html
    )
    if not is_wpdm_page:
        return None
    m = _WPDM_LINK_RE.search(html)
    if m:
        return make_absolute_url(m.group(1), url)
    m = _PDF_LINK_RE.search(html)
    if m:
        return make_absolute_url(m.group(1), url)
    return None


def extract_civicweb_document_url(url: str, html: str) -> str | None:
    is_preview = "/filepro/documents/?preview=" in url or (
        "civicweb.net" in url and "/filepro/documents" in url
    )
    if not is_preview:
        return None
    m = _CIVICWEB_DOC_RE.search(html)
    return make_absolute_url(m.group(1), url) if m else None


def extract_docushare_document_url(url: str, html: str) -> str | None:
    is_docushare = (
        "/docushare/dsweb/" in url
        or "DocuShare" in url
        or "DocuShare" in html
        or "/dsweb/Get/" in html
        or "/dsweb/ServicesLib/" in html
    )
    if not is_docushare:
        return None
    for pattern in _DOCUSHARE_RES:
        m = pattern.search(html)
        if m:
            return make_absolute_url(m.group(1), url)
    return None


def _wordpress_detector(url: str, html: str) -> DetectorResult | None:
    out = extract_wordpress_download_url(url, html)
    if out:
        return DetectorResult(out, "application/pdf", True, "wordpress-pdf-link")
    return None


def _civicweb_detector(url: str, html: str) -> DetectorResult | None:
    out = extract_civicweb_document_url(url, html)
    if out:
        return DetectorResult(out, "application/pdf", True, "civicweb-pdf-link")
    return None


def _docushare_detector(url: str, html: str) -> DetectorResult | None:
    out = extract_docushare_document_url(url, html)
    if not out:
        return None
    is_pdf = out.lower().endswith(".pdf")
    return DetectorResult(
        out,
        "application/pdf" if is_pdf else "application/octet-stream",
        is_pdf,
        "docushare-doc-link",
    )


# Ordered chain — extension point: append custom detectors.
DETECTOR_CHAIN: list[Callable[[str, str], DetectorResult | None]] = [
    _wordpress_detector,
    _civicweb_detector,
    _docushare_detector,
]


def detect_document_url(url: str, html: str) -> DetectorResult | None:
    """First-match over the ordered detector chain (detectors.ts:181-193)."""
    for detector in DETECTOR_CHAIN:
        result = detector(url, html)
        if result:
            return result
    return None
