"""Real-HTTP adapter parity against a local http.server fixture.

Mirrors the reference's fixture-server integration tests
(testdata/local-server.ts:73-331 + index.spec.ts adapter matrix): the same
assertions that run over MockWeb run here over real sockets — absolute
links with metadata, redirect composition with final-URL rewrite (simple)
vs request-URL (dom), status-gate error rows, binary downloads with
Content-Disposition filenames, and cache behavior via the request counter.
"""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pytest

from spider_ray.stages.fetch import FetchStage
from spider_ray.stages.http_fetch import DEFAULT_USER_AGENT, HttpResolver

HOME_HTML = """<html><body>
<a href="/relative" title="rel">Relative</a>
<a href="/relative">dup</a>
<a href="http://external.example/x" rel="nofollow">External</a>
<a href="#anchor">Anchor</a>
<a href="">empty</a>
</body></html>"""

PDF_BYTES = b"%PDF-1.4 fixture body"


class _Handler(BaseHTTPRequestHandler):
    server_version = "Fixture/1.0"

    def log_message(self, *args):  # quiet
        pass

    def _send(self, status, ctype, body: bytes, extra=None):
        self.send_response(status)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        for k, v in (extra or {}).items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        self.server.request_count += 1
        path = self.path
        if path == "/":
            self._send(200, "text/html; charset=utf-8", HOME_HTML.encode())
        elif path == "/relative":
            self._send(200, "text/html", b"<html><a href='/'>home</a></html>")
        elif path == "/redirect":
            self.send_response(302)
            self.send_header("Location", "/redirect2")
            self.end_headers()
        elif path == "/redirect2":
            self.send_response(301)
            self.send_header("Location", "/final")
            self.end_headers()
        elif path == "/final":
            self._send(200, "text/html", b"<html>landed</html>")
        elif path == "/loop":
            self.send_response(302)
            self.send_header("Location", "/loop")
            self.end_headers()
        elif path == "/missing":
            self._send(404, "text/html", b"gone")
        elif path == "/download/file.pdf":
            self._send(
                200, "application/pdf", PDF_BYTES,
                {"Content-Disposition": 'attachment; filename="file.pdf"'},
            )
        elif path == "/svc-fail":
            self._send(200, "text/html", b"<html>page ok, service will fail</html>")
        elif path == "/vary":
            ua = self.headers.get("User-Agent", "")
            self._send(200, "text/plain", f"ua={ua}".encode())
        else:
            self._send(404, "text/plain", b"not found")

    def do_POST(self):
        """/crawl — mock of the remote crawl4ai rendering service, the
        reference fixture route (testdata/local-server.ts:225-280): echoes
        the browser/crawler config into the cleaned_html and answers with
        service links (internal relative, external absolute)."""
        import json

        self.server.request_count += 1
        if self.path != "/crawl":
            self._send(404, "text/plain", b"not found")
            return
        length = int(self.headers.get("Content-Length", "0"))
        payload = json.loads(self.rfile.read(length) or b"{}")
        self.server.last_crawl_request = payload
        target = (payload.get("urls") or [None])[0] or "/"
        if target.endswith("/svc-fail"):
            body = json.dumps({"success": False, "error_message": "boom"})
            self._send(200, "application/json", body.encode())
            return
        from urllib.parse import urlsplit

        parts = urlsplit(target)
        origin = f"{parts.scheme}://{parts.netloc}"
        bc = payload.get("browser_config") or {}
        wait = ((payload.get("crawler_config") or {}).get("params") or {}).get(
            "wait_until", "unset"
        )
        cleaned = (
            "<html><body>"
            f'<p id="crawl-user-agent">{bc.get("user_agent", "none")}</p>'
            f'<p id="crawl-headless">{str(bc.get("headless"))}</p>'
            f'<p id="crawl-wait-until">{wait}</p>'
            '<a href="/relative" title="Crawl relative">Crawl Relative</a>'
            "</body></html>"
        )
        body = json.dumps(
            {
                "success": True,
                "url": target,
                "cleaned_html": cleaned,
                "markdown": "# Crawl4ai Fixture",
                "links": {
                    "internal": [
                        {"href": "/relative", "text": "Crawl Relative",
                         "title": "Crawl relative"}
                    ],
                    "external": [{"href": f"{origin}/external",
                                  "text": "Crawl External"}],
                },
            }
        )
        self._send(200, "application/json", body.encode())


@pytest.fixture(scope="module")
def fixture_server():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    server.request_count = 0
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield server, base
    server.shutdown()


def test_simple_follows_redirects_and_rewrites_final_url(fixture_server):
    _, base = fixture_server
    resolver = HttpResolver()
    resp = resolver.resolve(f"{base}/redirect")
    assert resp.status == 200
    assert resp.final_url == f"{base}/final"  # simple.ts:115-120
    assert "landed" in resp.content
    resolver.close()


def test_redirect_cap_five(fixture_server):
    _, base = fixture_server
    resolver = HttpResolver()
    resp = resolver.resolve(f"{base}/loop")
    assert resp.status == 599  # bounded (simple.ts:100 maxRedirections: 5)
    resolver.close()


def test_status_gate_is_data_not_exception(fixture_server):
    _, base = fixture_server
    stage = FetchStage(adapter="simple", resolver=HttpResolver(), cache_enabled=False)
    out = stage(pa.table({"url": [f"{base}/missing", f"{base}/"]}))
    rows = {u: (s, e) for u, s, e in zip(
        out.column("url").to_pylist(),
        out.column("status").to_pylist(),
        out.column("error").to_pylist(),
    )}
    assert rows[f"{base}/missing"][0] == 404
    assert rows[f"{base}/missing"][1].startswith("NetworkError")
    assert rows[f"{base}/"] == (200, None)


def test_link_extraction_matches_mockweb_semantics(fixture_server):
    """Adapter-parity: absolutized hrefs, first-wins dedup, falsy-href and
    metadata rules — identical assertions to the MockWeb tests
    (index.spec.ts:70-99)."""
    from spider_ray.stages.parse import parse_links_batch

    _, base = fixture_server
    stage = FetchStage(adapter="simple", resolver=HttpResolver(), cache_enabled=False)
    out = parse_links_batch(stage(pa.table({"url": [f"{base}/"]})))
    links = out.column("links").to_pylist()[0]
    hrefs = [l["href"] for l in links]
    assert hrefs == [
        f"{base}/relative",
        "http://external.example/x",
        f"{base}/#anchor",
    ]
    assert links[0]["title"] == "rel"
    assert links[1]["rel"] == "nofollow"


def test_dom_adapter_keeps_request_url(fixture_server):
    _, base = fixture_server
    stage = FetchStage(adapter="dom", resolver=HttpResolver(), cache_enabled=False)
    out = stage(pa.table({"url": [f"{base}/redirect"]}))
    # dom.ts:129-132: the request URL is kept even after redirects
    assert out.column("final_url").to_pylist() == [f"{base}/redirect"]
    assert out.column("status").to_pylist() == [200]


def test_binary_download_with_filename(fixture_server):
    _, base = fixture_server
    resolver = HttpResolver()
    resp = resolver.resolve(f"{base}/download/file.pdf")
    assert resp.body_bytes == PDF_BYTES
    assert resp.filename == "file.pdf"
    assert resp.content_type == "application/pdf"
    resolver.close()


def test_default_headers_sent_and_overridable(fixture_server):
    _, base = fixture_server
    resp = HttpResolver().resolve(f"{base}/vary")
    assert resp.content == f"ua={DEFAULT_USER_AGENT}"
    resp2 = HttpResolver(user_agent="custom-bot/2").resolve(f"{base}/vary")
    assert resp2.content == "ua=custom-bot/2"


def test_crawl4ai_service_roundtrip_over_sockets(fixture_server):
    """The adapter POSTs the reference's /crawl contract and consumes the
    service answer: cleaned_html wins, markdown surfaces, service links
    (internal before external) are absolutized and first-wins deduped
    (crawl4ai.ts:186-258 over local-server.ts:225-280)."""
    server, base = fixture_server
    stage = FetchStage(
        adapter="crawl4ai",
        resolver=HttpResolver(crawl4ai_url=base, user_agent="c4-bot/1"),
        cache_enabled=False,
    )
    out = stage(pa.table({"url": [f"{base}/final"]}))
    assert out.column("status").to_pylist() == [200]
    assert out.column("markdown").to_pylist() == ["# Crawl4ai Fixture"]
    content = out.column("content").to_pylist()[0]
    assert 'id="crawl-user-agent">c4-bot/1' in content
    assert 'id="crawl-headless">True' in content
    links = out.column("links").to_pylist()[0]
    assert [l["href"] for l in links] == [f"{base}/relative", f"{base}/external"]
    # the POST body matched the reference request shape
    req = server.last_crawl_request
    assert req["urls"] == [f"{base}/final"]
    assert req["browser_config"]["headless"] is True
    assert req["browser_config"]["user_agent"] == "c4-bot/1"
    assert req["crawler_config"]["params"]["wait_until"] == "networkidle"


def test_crawl4ai_service_failure_is_error_row(fixture_server):
    """success:false from the service → NetworkError row, not an
    exception out of the batch (crawl4ai.ts:235-241)."""
    _, base = fixture_server
    stage = FetchStage(
        adapter="crawl4ai", resolver=HttpResolver(crawl4ai_url=base),
        cache_enabled=False,
    )
    out = stage(pa.table({"url": [f"{base}/svc-fail"]}))
    assert out.column("status").to_pylist() == [599]
    err = out.column("error").to_pylist()[0]
    assert err.startswith("NetworkError") and "boom" in err


def test_crawl4ai_unreachable_server_is_error_row(fixture_server):
    _, base = fixture_server
    stage = FetchStage(
        adapter="crawl4ai",
        resolver=HttpResolver(crawl4ai_url="http://127.0.0.1:9", timeout_s=0.5),
        cache_enabled=False,
    )
    out = stage(pa.table({"url": [f"{base}/final"]}))
    assert out.column("status").to_pylist() == [599]
    assert "Cannot connect to crawl4ai server" in out.column("error").to_pylist()[0]


def test_crawl4ai_config_varies_cache_key(fixture_server):
    """index.spec.ts:206-237: the crawl4ai cache key varies with
    (serverUrl, headless, userAgent, waitUntil) — a config change misses
    the cache and re-hits the service; the same config hits."""
    server, base = fixture_server
    from spider_ray.functions.cachekey import create_cache_key

    def key_for(stage):
        parts = {
            "adapter": stage.adapter,
            "customSelectors": stage.custom_selectors or None,
            "crawl4aiConfig": [
                stage.web.crawl4ai_url, stage.web.crawl4ai_headless,
                stage.web.user_agent, stage.web.crawl4ai_wait_until,
            ],
        }
        return create_cache_key(stage.adapter, f"{base}/final", [parts])

    s1 = FetchStage(adapter="crawl4ai", resolver=HttpResolver(crawl4ai_url=base))
    s2 = FetchStage(
        adapter="crawl4ai",
        resolver=HttpResolver(crawl4ai_url=base, crawl4ai_wait_until="load"),
    )
    assert key_for(s1) != key_for(s2)
    # same config twice: second call is a cache hit (no new service call)
    before = server.request_count
    s1(pa.table({"url": [f"{base}/final"]}))
    mid = server.request_count
    out = s1(pa.table({"url": [f"{base}/final"]}))
    assert server.request_count == mid > before
    assert out.column("cache_hit").to_pylist() == [True]
    # varied config: forced back to the service
    s2(pa.table({"url": [f"{base}/final"]}))
    assert server.request_count > mid


def test_cache_skips_network(fixture_server):
    """Request-counter assertion, the reference cache test pattern
    (index.spec.ts:101-118 over local-server request counts)."""
    server, base = fixture_server
    stage = FetchStage(adapter="simple", resolver=HttpResolver(), cache_enabled=True)
    before = server.request_count
    stage(pa.table({"url": [f"{base}/final"]}))
    mid = server.request_count
    out = stage(pa.table({"url": [f"{base}/final"]}))
    assert server.request_count == mid > before
    assert out.column("cache_hit").to_pylist() == [True]
