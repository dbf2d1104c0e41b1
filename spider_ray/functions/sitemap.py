"""Sitemap parsing (sitemaps.org protocol) — seed discovery for crawls.

The reference engine has no sitemap support; this extends the crawl
family the way a production frontier needs: a site's declared URL
inventory (urlset) and shard index (sitemapindex) become frontier seed
rows with the site's own priority hints, instead of relying purely on
link discovery. Pure functions here; the distributed fetch/explode
lives in pipelines.crawl.SitemapStage.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET


def _local(tag: str) -> str:
    """Strip the XML namespace — sitemaps in the wild mix the canonical
    sitemaps.org namespace, no namespace, and stray prefixes."""
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap(xml_text: str) -> dict:
    """Parse one sitemap document into
    ``{"urls": [{loc, lastmod, changefreq, priority}], "sitemaps": [loc]}``.

    - ``<urlset>`` children populate ``urls`` (absent optional fields →
      None; values are kept as their literal strings — priority floats
      never round-trip through float()).
    - ``<sitemapindex>`` children populate ``sitemaps``.
    - Malformed XML or an unexpected root → both lists empty (seed
      discovery is an optimization; failures are tolerated like the
      detection-phase error contract).
    """
    out: dict = {"urls": [], "sitemaps": []}
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return out
    kind = _local(root.tag)
    if kind == "urlset":
        for el in root:
            if _local(el.tag) != "url":
                continue
            row = {"loc": None, "lastmod": None, "changefreq": None,
                   "priority": None}
            for child in el:
                name = _local(child.tag)
                if name in row:
                    row[name] = (child.text or "").strip() or None
            if row["loc"]:
                out["urls"].append(row)
    elif kind == "sitemapindex":
        for el in root:
            if _local(el.tag) != "sitemap":
                continue
            for child in el:
                if _local(child.tag) == "loc":
                    loc = (child.text or "").strip()
                    if loc:
                        out["sitemaps"].append(loc)
    return out
