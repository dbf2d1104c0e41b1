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
        elif path == "/vary":
            ua = self.headers.get("User-Agent", "")
            self._send(200, "text/plain", f"ua={ua}".encode())
        else:
            self._send(404, "text/plain", b"not found")


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
