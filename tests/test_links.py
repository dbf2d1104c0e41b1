from spider_ray.functions.links import (
    LinkFilterConfig,
    extract_html_links,
    filter_links,
    is_document_href,
)

BASE = "http://fx.test/page/"

HTML = """
<html><body>
  <a href="/abs/path" title="T" aria-label="AL" rel="nofollow" target="_blank"
     class="a b  c">  First link  </a>
  <a href="relative.html">Relative</a>
  <a href="/abs/path">duplicate of first</a>
  <a href="http://other.test/x">External</a>
  <a href="#">Anchor</a>
  <a href="/entity?a=1&amp;b=2">Entity</a>
  <a name="no-href">no href attr</a>
  <a href="/nested"><span>Nested <b>text</b></span></a>
</body></html>
"""


def test_extract_links_metadata_and_dedup():
    links = extract_html_links(HTML, BASE)
    hrefs = [l.href for l in links]
    # first-wins dedup by absolute href (links.ts:31-35)
    assert hrefs.count("http://fx.test/abs/path") == 1
    first = links[0]
    assert first.href == "http://fx.test/abs/path"
    assert first.text == "First link"
    assert first.title == "T"
    assert first.aria_label == "AL"
    assert first.rel == "nofollow"
    assert first.target == "_blank"
    assert first.classes == ["a", "b", "c"]
    # relative resolved against base
    assert "http://fx.test/page/relative.html" in hrefs
    # entity-encoded href decoded then resolved
    assert "http://fx.test/entity?a=1&b=2" in hrefs
    # nested text flattened + trimmed
    nested = next(l for l in links if l.href.endswith("/nested"))
    assert nested.text == "Nested text"
    # optional attrs null when absent
    rel_none = next(l for l in links if l.href.endswith("relative.html"))
    assert rel_none.title is None and rel_none.classes is None


def test_extract_links_malformed_html():
    assert extract_html_links("<a href='/x'>unclosed", BASE)[0].href == "http://fx.test/x"
    assert extract_html_links("", BASE) == []


def test_filter_links_union_include_then_excludes():
    links = extract_html_links(HTML, BASE)
    out = filter_links(
        links,
        LinkFilterConfig(url_contains=["abs"], text_contains=["external"]),
    )
    hrefs = {l.href for l in out}
    # union: href-contains OR text-contains (link-filter.ts:41-46)
    assert hrefs == {"http://fx.test/abs/path", "http://other.test/x"}
    out2 = filter_links(
        links,
        LinkFilterConfig(url_contains=["abs"], excludes=["path"]),
    )
    assert out2 == []


def test_filter_links_dedupe_case_semantics():
    # dedupe on exact original href; matching is case-insensitive
    from spider_ray.functions.links import Link

    links = [Link(href="http://x.test/Jobs/A", text="x"), Link(href="http://x.test/jobs/a", text="x")]
    out = filter_links(links, LinkFilterConfig(url_contains=["jobs"]))
    assert len(out) == 2  # distinct original hrefs survive


def test_is_document_href():
    assert is_document_href("http://x.test/a.PDF")
    assert is_document_href("http://x.test/a.docx")
    assert not is_document_href("http://x.test/a.html")
