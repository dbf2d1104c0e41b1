from spider_ray.functions.urls import (
    canonicalize_url,
    decode_html_entities,
    host_of,
    is_valid_url,
    make_absolute_url,
    normalize_download_page_url,
    resolve_href,
    split_classes,
    url_hash64,
    url_hash_hex,
)


def test_resolve_href_absolutizes():
    assert resolve_href("/a/b", "http://x.test/c") == "http://x.test/a/b"
    assert resolve_href("b", "http://x.test/c/d") == "http://x.test/c/b"
    assert resolve_href("http://y.test/z", "http://x.test/") == "http://y.test/z"


def test_split_classes():
    assert split_classes("a  b\tc") == ["a", "b", "c"]
    assert split_classes("") is None
    assert split_classes(None) is None
    assert split_classes("   ") is None


def test_decode_html_entities():
    assert decode_html_entities("a&amp;b&quot;c&#039;d&lt;e&gt;f") == 'a&b"c\'d<e>f'


def test_make_absolute_url_decodes_then_resolves():
    # reference: detectors.ts:22-28 — entity-decode before URL resolution
    assert (
        make_absolute_url("/d?a=1&amp;b=2", "http://x.test/p")
        == "http://x.test/d?a=1&b=2"
    )


def test_normalize_download_page_url():
    # reference: scrapeDocument.ts:129-148
    assert (
        normalize_download_page_url("http://x.test/download/report")
        == "http://x.test/download/report/"
    )
    # already a file path → unchanged
    assert (
        normalize_download_page_url("http://x.test/download/report.pdf")
        == "http://x.test/download/report.pdf"
    )
    # has query → unchanged
    assert (
        normalize_download_page_url("http://x.test/download/report?x=1")
        == "http://x.test/download/report?x=1"
    )
    # already ends with / → unchanged
    assert (
        normalize_download_page_url("http://x.test/download/report/")
        == "http://x.test/download/report/"
    )
    # no /download/ → unchanged
    assert normalize_download_page_url("http://x.test/page") == "http://x.test/page"


def test_is_valid_url():
    assert is_valid_url("http://x.test/")
    assert is_valid_url("https://x.test/a?b=1")
    assert not is_valid_url("not a url")
    assert not is_valid_url("")
    assert not is_valid_url(None)
    assert not is_valid_url("ftp://x.test/")


def test_canonicalize_url():
    assert canonicalize_url("HTTP://X.Test:80/a#frag") == "http://x.test/a"
    assert canonicalize_url("https://x.test:443/") == "https://x.test/"
    assert canonicalize_url("https://x.test:8443/p") == "https://x.test:8443/p"
    assert canonicalize_url("http://x.test") == "http://x.test/"
    # download normalization folded into canonical form
    assert (
        canonicalize_url("http://x.test/download/doc")
        == "http://x.test/download/doc/"
    )


def test_url_hash64_matches_md5_prefix():
    import hashlib

    url = "http://x.test/a"
    expect = int(hashlib.md5(url.encode()).hexdigest()[:16], 16)
    assert url_hash64(url) == expect
    assert url_hash_hex(url) == hashlib.md5(url.encode()).hexdigest()[:16]


def test_host_of():
    assert host_of("http://A.Test:8080/x") == "a.test"
    assert host_of("http://b.test/x") == "b.test"
