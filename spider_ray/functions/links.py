"""Link extraction and filtering.

- ``extract_html_links`` reproduces the reference's cheerio-based extraction
  (src/shared/links.ts:17-48): select ``a[href]``, absolutize against the
  base URL, dedup by absolute href keeping FIRST occurrence, project 7
  metadata fields, ``text`` = trimmed descendant text ('' when empty).
- ``filter_links`` reproduces the declarative link filter
  (src/platform/link-filter.ts:24-66): include = union of urlContains /
  textContains (case-insensitive contains), then excludes drop on href or
  text, then dedupe on the exact original href.

Parsing uses the stdlib ``html.parser`` (no external HTML lib in the
container); per-row parsing runs inside ``map_batches`` so many pages parse
in parallel across the pool.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html import unescape
from html.parser import HTMLParser

from .urls import resolve_href, split_classes


@dataclass
class Link:
    href: str
    text: str = ""
    title: str | None = None
    aria_label: str | None = None
    rel: str | None = None
    target: str | None = None
    classes: list[str] | None = field(default=None)

    def as_dict(self) -> dict:
        return {
            "href": self.href,
            "text": self.text,
            "title": self.title,
            "aria_label": self.aria_label,
            "rel": self.rel,
            "target": self.target,
            "classes": self.classes,
        }


class _AnchorParser(HTMLParser):
    """Collects (attrs, descendant-text) for every <a href> element."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.anchors: list[tuple[dict, str]] = []
        self._stack: list[tuple[dict, list[str]]] = []  # open <a> elements

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag == "a":
            d = dict(attrs)
            if d.get("href") is not None:
                self._stack.append((d, []))

    def handle_endtag(self, tag: str) -> None:
        if tag == "a" and self._stack:
            attrs, chunks = self._stack.pop()
            self.anchors.append((attrs, "".join(chunks)))

    def handle_data(self, data: str) -> None:
        for _attrs, chunks in self._stack:
            chunks.append(data)

    def close(self) -> None:  # flush unclosed anchors
        super().close()
        while self._stack:
            attrs, chunks = self._stack.pop()
            self.anchors.append((attrs, "".join(chunks)))


def extract_html_links(html: str, base_url: str) -> list[Link]:
    """Extract <a href> links with metadata; first-wins dedup by abs href."""
    parser = _AnchorParser()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        return []
    seen: set[str] = set()
    links: list[Link] = []
    for attrs, text in parser.anchors:
        href = attrs.get("href")
        if href is None:
            continue
        absolute = resolve_href(unescape(href) if "&" in href else href, base_url)
        if absolute in seen:
            continue
        seen.add(absolute)
        links.append(
            Link(
                href=absolute,
                text=text.strip() or "",
                title=attrs.get("title"),
                aria_label=attrs.get("aria-label"),
                rel=attrs.get("rel"),
                target=attrs.get("target"),
                classes=split_classes(attrs.get("class")),
            )
        )
    return links


@dataclass
class LinkFilterConfig:
    """Declarative link filter (src/platform/link-filter.ts:4-13)."""

    url_contains: list[str] | None = None
    text_contains: list[str] | None = None
    excludes: list[str] | None = None
    dedupe: bool = True


def filter_links(links: list[Link], config: LinkFilterConfig | None = None) -> list[Link]:
    """Keep links matching include-union, drop excludes, dedupe exact href."""
    config = config or LinkFilterConfig()
    url_needles = [s.lower() for s in (config.url_contains or [])]
    text_needles = [s.lower() for s in (config.text_contains or [])]
    exclude_needles = [s.lower() for s in (config.excludes or [])]
    has_include = bool(url_needles or text_needles)
    seen: set[str] = set()
    result: list[Link] = []
    for link in links:
        href = (link.href or "").lower()
        text = (link.text or "").lower()
        if not href:
            continue
        if has_include:
            if not (
                any(n in href for n in url_needles)
                or any(n in text for n in text_needles)
            ):
                continue
        if any(n in href or n in text for n in exclude_needles):
            continue
        if config.dedupe:
            if link.href in seen:
                continue
            seen.add(link.href)
        result.append(link)
    return result


DOCUMENT_EXTENSIONS = (".pdf", ".doc", ".docx", ".txt", ".md", ".rtf")


def is_document_href(href: str, extensions: tuple[str, ...] = DOCUMENT_EXTENSIONS) -> bool:
    """Extension predicate from findDocumentLinks (src/scrapeDocument.ts:333-360)."""
    lowered = href.lower()
    return any(lowered.endswith(ext) for ext in extensions)
