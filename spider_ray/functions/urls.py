"""URL scalar functions: resolution, normalization, canonicalization, hashing.

Reproduces the reference's URL semantics:
- ``resolve_href`` — src/shared/links.ts:9-15 (absolutize, passthrough on
  parse failure)
- ``split_classes`` — src/shared/links.ts:4-7
- ``normalize_download_page_url`` — src/scrapeDocument.ts:129-148
- ``decode_html_entities`` / ``make_absolute_url`` —
  src/scrapeDocument/detectors.ts:13-28
- ``is_valid_url`` — the admission gate every adapter applies
  (src/adapters/simple.ts:54-62)

plus the engine-side additions: ``canonicalize_url`` (the seen-set key) and
``url_hash64`` (md5-derived uint64 partition key; md5 so the DuckDB oracle
can reproduce it with ``md5(url)``).
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import urljoin, urlsplit, urlunsplit

_FILE_PATH_RE = re.compile(r"\.[a-z0-9]{2,8}$", re.IGNORECASE)
_DEFAULT_PORTS = {"http": "80", "https": "443"}


def resolve_href(href: str, base_url: str) -> str:
    """Absolutize ``href`` against ``base_url``; passthrough on failure."""
    if href.startswith(("http://", "https://")):
        return href  # already absolute — urljoin would return it unchanged
    try:
        out = urljoin(base_url, href)
        return out if out else href
    except ValueError:
        return href


def split_classes(value: str | None) -> list[str] | None:
    """Whitespace-split a class attribute; None when empty/absent."""
    if value is None:
        return None
    classes = [c for c in value.split() if c.strip()]
    return classes if classes else None


def decode_html_entities(value: str) -> str:
    """Decode the 5 entities the reference decodes (detectors.ts:13-20)."""
    return (
        value.replace("&amp;", "&")
        .replace("&quot;", '"')
        .replace("&#039;", "'")
        .replace("&lt;", "<")
        .replace("&gt;", ">")
    )


def make_absolute_url(url: str, base_url: str) -> str:
    """Entity-decode then absolutize, falling back to the decoded string."""
    decoded = decode_html_entities(url)
    try:
        out = urljoin(base_url, decoded)
        return out if out else decoded
    except ValueError:
        return decoded


def normalize_download_page_url(url: str) -> str:
    """Append ``/`` to ``/download/``-style page URLs that are not file paths.

    Mirrors src/scrapeDocument.ts:129-148: only when the URL contains
    ``/download/``, has no query, doesn't already end with ``/`` and whose
    path does not look like a file (extension of 2-8 alnum chars).
    """
    try:
        path = urlsplit(url).path
        looks_like_file = bool(_FILE_PATH_RE.search(path))
    except ValueError:
        looks_like_file = bool(_FILE_PATH_RE.search(url.split("?")[0] or url))
    if (
        "/download/" in url
        and "?" not in url
        and not url.endswith("/")
        and not looks_like_file
    ):
        return url + "/"
    return url


_VALID_FAST_RE = re.compile(r"^https?://[^/?#]+")


def is_valid_url(url: str | None) -> bool:
    """Admission filter: non-empty http(s) URL with a host."""
    if not url:
        return False
    if _VALID_FAST_RE.match(url):  # fast path: scheme + nonempty netloc
        return True
    try:
        parts = urlsplit(url)
    except ValueError:
        return False
    return parts.scheme in ("http", "https") and bool(parts.netloc)


# already-canonical shape: lowercase host, no port/query/fragment, has path
_CANONICAL_FAST_RE = re.compile(r"^https?://[a-z0-9.\-]+/[^#?]*$")


def canonicalize_url(url: str) -> str:
    """Canonical form used for the seen-set key and cache identity.

    Lowercase scheme+host, strip default ports and fragments, resolve the
    reference's download-page normalization, collapse empty path to ``/``.
    Query strings are preserved (they select distinct resources, e.g.
    ``?wpdmdl=``).
    """
    if _CANONICAL_FAST_RE.match(url):
        # fast path: only the download-page normalization can still apply
        return (
            normalize_download_page_url(url) if "/download/" in url else url
        )
    try:
        scheme, netloc, path, query, _frag = urlsplit(url)
    except ValueError:
        return url
    scheme = scheme.lower()
    netloc = netloc.lower()
    if ":" in netloc:
        host, _, port = netloc.rpartition(":")
        if _DEFAULT_PORTS.get(scheme) == port:
            netloc = host
    if not path:
        path = "/"
    out = urlunsplit((scheme, netloc, path, query, ""))
    return normalize_download_page_url(out)


_HOST_FAST_RE = re.compile(r"^https?://([a-z0-9.\-]+)[/?#]")


def host_of(url: str) -> str:
    """Host (netloc without port) of a URL; '' when unparsable."""
    m = _HOST_FAST_RE.match(url)
    if m:
        return m.group(1)
    try:
        netloc = urlsplit(url).netloc.lower()
    except ValueError:
        return ""
    return netloc.rpartition(":")[0] if ":" in netloc else netloc


def url_hash64(canonical_url: str) -> int:
    """uint64 partition/dedup key: first 8 bytes of md5(canonical URL).

    md5 (not sha256) so conformance oracles can recompute it in SQL:
    DuckDB ``('0x' || substr(md5(url), 1, 16))::UBIGINT``.
    """
    return int.from_bytes(
        hashlib.md5(canonical_url.encode("utf-8")).digest()[:8], "big"
    )


def url_hash_hex(canonical_url: str) -> str:
    """Hex form of url_hash64 (16 chars) — SQL: substr(md5(url),1,16)."""
    return hashlib.md5(canonical_url.encode("utf-8")).hexdigest()[:16]
