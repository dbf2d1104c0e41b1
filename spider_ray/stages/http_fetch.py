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
        crawl4ai_url: str | None = None,
        crawl4ai_headless: bool = True,
        crawl4ai_wait_until: str = "networkidle",
    ):
        self.timeout_s = timeout_s
        self.user_agent = user_agent
        self.headers = default_headers(user_agent, headers)
        self.max_redirects = max_redirects
        # remote crawl4ai service base URL (crawl4ai.ts:150-156: explicit
        # config wins over the adapter default); None → the crawl4ai seam
        # reports no service and FetchStage falls back to the raw HTML
        self.crawl4ai_url = crawl4ai_url
        self.crawl4ai_headless = crawl4ai_headless
        self.crawl4ai_wait_until = crawl4ai_wait_until
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

    def crawl4ai(self, url: str) -> dict | None:
        """Fetch ``url`` through a remote crawl4ai service over real
        sockets — the reference's POST contract (crawl4ai.ts:186-242):

        - request body ``{urls: [url], browser_config: {headless,
          user_agent?}, crawler_config: {type: 'CrawlerRunConfig',
          params: {wait_until}}}`` to ``{crawl4ai_url}/crawl``;
        - HTTP ≥ 400, invalid JSON, and ``success: false`` are
          NetworkErrors (raised as ``ConnectionError`` — FetchStage turns
          them into error rows, the "failures are data" contract);
        - array responses take the first element (the service answers one
          entry per requested URL);
        - ``cleaned_html`` preferred over ``html``; final URL from the
          service result; internal links before external, href-only.

        Returns the seam dict (cleaned_html, markdown, links, url) or
        ``None`` when no service is configured."""
        import json

        if not self.crawl4ai_url:
            return None
        body = {
            "urls": [url],
            "browser_config": {
                "headless": self.crawl4ai_headless,
                **({"user_agent": self.user_agent} if self.user_agent else {}),
            },
            "crawler_config": {
                "type": "CrawlerRunConfig",
                "params": {"wait_until": self.crawl4ai_wait_until},
            },
        }
        endpoint = self.crawl4ai_url.rstrip("/") + "/crawl"
        parts = urllib.parse.urlsplit(endpoint)
        payload = json.dumps(body).encode("utf-8")
        headers = dict(self.headers)
        headers["Content-Type"] = "application/json"
        headers["Content-Length"] = str(len(payload))
        try:
            conn = self._conn(parts.scheme, parts.netloc)
            try:
                conn.request("POST", parts.path or "/", body=payload, headers=headers)
                resp = conn.getresponse()
                status, text = resp.status, resp.read().decode("utf-8", "replace")
            except (http.client.HTTPException, OSError):
                conn.close()
                self._conns.pop((parts.scheme, parts.netloc), None)
                conn = self._conn(parts.scheme, parts.netloc)
                conn.request("POST", parts.path or "/", body=payload, headers=headers)
                resp = conn.getresponse()
                status, text = resp.status, resp.read().decode("utf-8", "replace")
        except OSError as exc:
            raise ConnectionError(
                f"Cannot connect to crawl4ai server at {self.crawl4ai_url}: {exc}"
            ) from exc
        if status >= 400:
            raise ConnectionError(f"Crawl4ai server returned HTTP {status}")
        try:
            result = json.loads(text)
        except ValueError as exc:
            raise ConnectionError(
                "Invalid JSON response from crawl4ai server"
            ) from exc
        if isinstance(result, list):
            result = result[0] if result else {}
        if not result.get("success"):
            raise ConnectionError(
                f"Crawl4ai failed: {result.get('error_message') or 'Unknown error'}"
            )
        links = result.get("links") or {}

        def hrefs(side: str) -> list[str]:
            out = []
            for item in links.get(side) or []:
                href = item.get("href") if isinstance(item, dict) else item
                if href:
                    out.append(href)
            return out

        return {
            "url": result.get("url") or url,
            "cleaned_html": result.get("cleaned_html") or result.get("html") or "",
            "markdown": result.get("markdown"),
            "links": {"internal": hrefs("internal"), "external": hrefs("external")},
        }

    def close(self) -> None:
        for conn in self._conns.values():
            conn.close()
        self._conns.clear()
