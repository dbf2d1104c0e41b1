"""Real-HTTP resolver behind the FetchStage ``_fetch_one`` seam.

Reproduces the reference SimpleAdapter's network contract
(src/adapters/simple.ts:34-154) with the stdlib only (no aiohttp in this
container):

- default header set incl. a bot user agent (simple.ts:64-75),
  caller headers win;
- redirects followed manually, composed up to ``max_redirects=5``
  (simple.ts:94-102 ``maxRedirections: 5``), and the FINAL URL after the
  redirect chain is reported (simple.ts:115-120) — the adapter-parity
  quirk that distinguishes 'simple' from 'dom';
- ``status >= 400`` is NOT an exception: it resolves to a response row the
  engine turns into an error row (simple.ts:104-109 NetworkError ⇒
  SURVEY.md §4 "failures are data");
- per-request timeout, default 30 s (types.ts:126-130);
- binary payloads (images, PDFs) come back as ``body_bytes`` with a
  filename from Content-Disposition (download-utils.ts:80-113).

One ``HttpResolver`` instance lives per fetch actor (connection reuse via
a per-(scheme,host) ``http.client`` connection pool held in actor state —
SURVEY.md §2.4 ST1/ST2 amortization), so ``FetchStage(resolver=...)``
drives real crawls with zero changes to the batch pipeline. Tests run it
against a local ``http.server`` fixture (tests/test_http_adapter.py), the
reference's own test pattern (testdata/local-server.ts:73-331).
"""

from __future__ import annotations

import http.client
import re
import urllib.parse

from ..sources.fixtures import MockResponse

DEFAULT_TIMEOUT_S = 30.0  # types.ts:126-130 default 30000 ms
DEFAULT_USER_AGENT = "Mozilla/5.0 (compatible; SpiderRay/1.0; +spider-ray-bot)"
_REDIRECT_STATUSES = {301, 302, 303, 307, 308}
_FILENAME_RE = re.compile(r'filename\s*=\s*"?([^";]+)"?', re.IGNORECASE)


def default_headers(user_agent: str | None = None, extra: dict | None = None) -> dict:
    """Default header set (simple.ts:64-75); caller headers override."""
    headers = {
        "User-Agent": user_agent or DEFAULT_USER_AGENT,
        "Accept": "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8",
        "Accept-Language": "en-US,en;q=0.5",
    }
    if extra:
        headers.update(extra)
    return headers


class HttpResolver:
    """url → MockResponse-shaped record over real HTTP (stdlib client)."""

    def __init__(
        self,
        timeout_s: float = DEFAULT_TIMEOUT_S,
        user_agent: str | None = None,
        headers: dict | None = None,
        max_redirects: int = 5,
    ):
        self.timeout_s = timeout_s
        self.headers = default_headers(user_agent, headers)
        self.max_redirects = max_redirects
        self._conns: dict[tuple[str, str], http.client.HTTPConnection] = {}

    def _conn(self, scheme: str, netloc: str) -> http.client.HTTPConnection:
        key = (scheme, netloc)
        conn = self._conns.get(key)
        if conn is None:
            cls = (
                http.client.HTTPSConnection
                if scheme == "https"
                else http.client.HTTPConnection
            )
            conn = cls(netloc, timeout=self.timeout_s)
            self._conns[key] = conn
        return conn

    def _get_once(self, url: str) -> tuple[int, dict, bytes]:
        parts = urllib.parse.urlsplit(url)
        conn = self._conn(parts.scheme, parts.netloc)
        path = parts.path or "/"
        if parts.query:
            path += "?" + parts.query
        try:
            conn.request("GET", path, headers=self.headers)
            resp = conn.getresponse()
            body = resp.read()
            return resp.status, {k.lower(): v for k, v in resp.getheaders()}, body
        except (http.client.HTTPException, OSError):
            # stale kept-alive connection → one reconnect attempt
            conn.close()
            self._conns.pop((parts.scheme, parts.netloc), None)
            conn = self._conn(parts.scheme, parts.netloc)
            conn.request("GET", path, headers=self.headers)
            resp = conn.getresponse()
            body = resp.read()
            return resp.status, {k.lower(): v for k, v in resp.getheaders()}, body

    def resolve(self, url: str, attempts: int = 0) -> MockResponse:
        current = url
        try:
            for _hop in range(self.max_redirects + 1):
                status, headers, body = self._get_once(current)
                if status in _REDIRECT_STATUSES and "location" in headers:
                    current = urllib.parse.urljoin(current, headers["location"])
                    continue
                break
            else:  # redirect chain exceeded max_redirects
                return MockResponse(
                    url, current, 599, "text/plain", content="too many redirects"
                )
        except OSError as exc:
            return MockResponse(url, url, 599, "text/plain", content=str(exc))
        ctype = headers.get("content-type", "application/octet-stream").split(";")[0].strip()
        filename = None
        disposition = headers.get("content-disposition")
        if disposition:
            m = _FILENAME_RE.search(disposition)
            if m:
                filename = m.group(1)
        is_text = ctype.startswith("text/") or ctype in (
            "application/xhtml+xml", "application/xml", "application/json",
        )
        if is_text and filename is None:
            return MockResponse(
                url, current, status, ctype,
                content=body.decode("utf-8", "replace"),
            )
        return MockResponse(
            url, current, status, ctype, content=None, body_bytes=body,
            filename=filename,
        )

    def close(self) -> None:
        for conn in self._conns.values():
            conn.close()
        self._conns.clear()
