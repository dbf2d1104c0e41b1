"""Dataset versions of the reference's public entry points.

- ``scrape_index``  — P1 (src/scrapeIndex.ts:64-87): URL list → pages with
  links + strategy/metrics columns.
- ``scrape_document`` — P2 (src/scrapeDocument.ts:249-320): URL list →
  normalized documents (3-way branch), with the URL normalization applied
  up front.
- ``find_document_links`` — P3 (src/scrapeDocument.ts:333-360): P1 →
  explode links → extension filter → distinct hrefs.
- ``filter_links_stage`` — the declarative platform link filter (F2) as a
  batch transform over exploded links.
- ``PlatformRegistry`` — P6 (src/platform/registry.ts): priority-ordered
  two-phase detection (detectUrl sweep, one shared fetch, detectHtml
  sweep, fallback), then routing rows to per-platform extractors.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import pyarrow as pa
import ray

from ..functions.links import LinkFilterConfig, filter_links as _filter_links, Link
from ..functions.urls import canonicalize_url, normalize_download_page_url
from ..sources.fixtures import MockWebConfig
from ..stages.fetch import FetchStage
from ..stages.parse import parse_links_batch, to_documents_batch


def _url_dataset(urls: list[str]) -> "ray.data.Dataset":
    table = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "depth": pa.array([0] * len(urls), pa.int32()),
            "attempts": pa.array([0] * len(urls), pa.int32()),
        }
    )
    return ray.data.from_arrow(table)


def scrape_index(
    urls: list[str],
    web_config: MockWebConfig | None = None,
    adapter: str = "simple",
    concurrency: int = 4,
    batch_size: int = 256,
):
    """pages Dataset with links extracted (default plan: basic+simple)."""
    return (
        _url_dataset(urls)
        .map_batches(
            FetchStage,
            fn_constructor_kwargs={"web_config": web_config, "adapter": adapter},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
        .map_batches(parse_links_batch, batch_format="pyarrow")
    )


def scrape_document(
    urls: list[str],
    web_config: MockWebConfig | None = None,
    adapter: str = "dom",  # reference default spider for documents (scrapeDocument.ts:185)
    concurrency: int = 4,
):
    """documents Dataset (direct-download / detector / text branches)."""
    normalized = [normalize_download_page_url(u) for u in urls]
    return scrape_index(
        normalized, web_config=web_config, adapter=adapter, concurrency=concurrency
    ).map_batches(to_documents_batch, batch_format="pyarrow")


def explode_links_batch(batch: pa.Table) -> pa.Table:
    """pages → one row per extracted link (page_url + 7 link fields)."""
    pages = batch.column("url").to_pylist()
    links_lists = batch.column("links").to_pylist()
    out = {
        "page_url": [], "href": [], "text": [], "title": [],
        "aria_label": [], "rel": [], "target": [], "classes": [],
    }
    for page, links in zip(pages, links_lists):
        for link in links or []:
            out["page_url"].append(page)
            for k in ("href", "text", "title", "aria_label", "rel", "target", "classes"):
                out[k].append(link.get(k))
    return pa.table(
        {
            "page_url": pa.array(out["page_url"], pa.string()),
            "href": pa.array(out["href"], pa.string()),
            "text": pa.array(out["text"], pa.string()),
            "title": pa.array(out["title"], pa.string()),
            "aria_label": pa.array(out["aria_label"], pa.string()),
            "rel": pa.array(out["rel"], pa.string()),
            "target": pa.array(out["target"], pa.string()),
            "classes": pa.array(out["classes"], pa.list_(pa.string())),
        }
    )


def filter_links_stage(config: LinkFilterConfig) -> Callable[[pa.Table], pa.Table]:
    """Batch transform applying the declarative filter at page scope
    (dedupe is per page, matching link-filter.ts:56-61)."""

    def apply(batch: pa.Table) -> pa.Table:
        import collections

        rows_by_page = collections.defaultdict(list)
        pylist = batch.to_pylist()
        for row in pylist:
            rows_by_page[row["page_url"]].append(row)
        keep_rows = []
        for page, rows in rows_by_page.items():
            links = [
                Link(
                    href=r["href"], text=r["text"] or "", title=r["title"],
                    aria_label=r["aria_label"], rel=r["rel"], target=r["target"],
                    classes=r["classes"],
                )
                for r in rows
            ]
            kept = _filter_links(links, config)
            kept_hrefs = {l.href for l in kept}
            seen = set()
            for r in rows:
                if r["href"] in kept_hrefs and r["href"] not in seen:
                    if config.dedupe:
                        seen.add(r["href"])
                    keep_rows.append(r)
        if not keep_rows:
            return batch.slice(0, 0)
        return pa.Table.from_pylist(keep_rows, schema=batch.schema)

    return apply


def find_document_links(
    urls: list[str],
    web_config: MockWebConfig | None = None,
    extensions: tuple[str, ...] = (".pdf", ".doc", ".docx", ".txt", ".md", ".rtf"),
    adapter: str = "simple",
):
    """Distinct document hrefs across the scraped pages (P3).

    Distinct is an exact global dedup: ``groupby(href)`` keep-first — the
    distributed analogue of ``[...new Set(documentLinks)]``
    (scrapeDocument.ts:359).
    """
    import pandas as pd

    pages = scrape_index(urls, web_config=web_config, adapter=adapter)
    links = pages.map_batches(explode_links_batch, batch_format="pyarrow")

    def ext_filter(batch: pa.Table) -> pa.Table:
        hrefs = batch.column("href").to_pylist()
        mask = [any(h.lower().endswith(e) for e in extensions) for h in hrefs]
        return batch.filter(pa.array(mask))

    def first(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values("page_url").head(1)[["href"]]

    return (
        links.map_batches(ext_filter, batch_format="pyarrow")
        .groupby("href")
        .map_groups(first, batch_format="pandas")
    )


@dataclass
class AdapterContext:
    """P7 (src/platform/context.ts:46-59): binds fetch_page / scrape_index
    to ONE configured spider so both detection phases and the platform
    extractor use the same adapter + options."""

    web_config: MockWebConfig | None
    adapter: str = "simple"
    # optional AI client handed through to adapter discover_options,
    # untyped to avoid a hard dep (platform/types.ts:50-52, context.ts:10)
    ai: object | None = None
    # optional structured logger (platform/types.ts:53-55)
    log: Callable | None = None

    def fetch_page(self, url: str) -> str | None:
        """One-off HTML fetch with the bound adapter (detection phase)."""
        from ..stages.fetch import FetchStage

        stage = FetchStage(web_config=self.web_config, adapter=self.adapter)
        resp = stage._fetch_one(url, 0)
        if resp["status"] >= 400 or resp["status"] == 0:
            return None
        return resp["content"]

    def scrape_index(self, urls: list[str], **kw):
        return scrape_index(
            urls, web_config=self.web_config, adapter=self.adapter, **kw
        )


def create_adapter_context(
    web_config: MockWebConfig | None = None, adapter: str = "simple"
) -> AdapterContext:
    return AdapterContext(web_config=web_config, adapter=adapter)


# ---------------------------------------------------------------------------
# Platform engine (P6) — registry, two-phase detection, routing
# ---------------------------------------------------------------------------

@dataclass
class PlatformAdapter:
    """Plugin contract (platform/types.ts:67-91)."""

    type: str
    name: str
    fetch: Callable  # (source_row, ctx) → list[dict] items
    priority: int = 200
    detect_url: Callable[[str], dict | None] | None = None
    detect_html: Callable[[str, str], dict | None] | None = None
    # optional per-source configuration discovery (folders, filters, …) —
    # platform/types.ts:84-88 discoverOptions?(url, ctx); receives the
    # AdapterContext so it can fetch pages / use ctx.ai
    discover_options: Callable[[str, "AdapterContext"], dict] | None = None


class PlatformRegistry:
    """Priority-ordered adapter registry with two-phase detection
    (platform/registry.ts:35-187): URL phase (no fetch) → ONE shared HTML
    fetch → HTML phase → fallback. Detector errors are logged + skipped."""

    def __init__(self):
        self._adapters: dict[str, PlatformAdapter] = {}

    def register(self, adapter: PlatformAdapter) -> None:
        if adapter.type in self._adapters:
            raise ValueError(f"adapter already registered: {adapter.type}")
        self._adapters[adapter.type] = adapter

    def unregister(self, type_: str) -> None:
        self._adapters.pop(type_, None)

    def adapters(self) -> list[PlatformAdapter]:
        return sorted(self._adapters.values(), key=lambda a: (a.priority, a.type))

    def detect(self, url: str, fetch_html: Callable[[str], str | None],
               fallback_type: str | None = None) -> dict | None:
        for adapter in self.adapters():
            if adapter.detect_url is None:
                continue
            try:
                hit = adapter.detect_url(url)
            except Exception:
                continue  # error-tolerant (registry.ts:98-104)
            if hit:
                return {"type": adapter.type, **hit}
        html = fetch_html(url)  # at most ONE fetch (registry.ts:106-116)
        if html is not None:
            for adapter in self.adapters():
                if adapter.detect_html is None:
                    continue
                try:
                    hit = adapter.detect_html(url, html)
                except Exception:
                    continue
                if hit:
                    return {"type": adapter.type, **hit}
        if fallback_type and fallback_type in self._adapters:
            return {"type": fallback_type, "confidence": "low"}
        return None

    def resolve(self, source: dict, fetch_html, fallback_type=None) -> dict | None:
        if source.get("type"):  # preset short-circuits (registry.ts:161-162)
            return {"type": source["type"], "confidence": "high"}
        return self.detect(source["url"], fetch_html, fallback_type)

    def discover_source_options(
        self, source: dict, ctx, fetch_html, fallback_type=None,
        resolved_type: str | None = None,
    ) -> dict:
        """Run the resolved adapter's optional ``discover_options`` hook
        (platform/types.ts:84-88): per-source configuration the adapter
        can infer from the site itself (folders, filters, pagination …).
        Returns the discovered dict merged UNDER the source — explicit
        source fields win, matching the preset-beats-detection philosophy
        (registry.ts:161-162). Hook errors are logged and tolerated (the
        detection-phase error contract, registry.ts:98-104): discovery is
        an optimization, never a gate.

        ``resolved_type`` lets a caller that already ran two-phase
        detection (fetch_items) pass its result in, so resolution — and
        its possible detect_html network fetch — runs once per source."""
        if resolved_type is None:
            resolved = self.resolve(source, fetch_html, fallback_type)
            if resolved is None:
                raise ValueError(
                    f"ValidationError: cannot resolve platform for {source}"
                )
            resolved_type = resolved["type"]
        adapter = self._adapters[resolved_type]
        if adapter.discover_options is None:
            return dict(source)
        try:
            discovered = adapter.discover_options(source["url"], ctx) or {}
        except Exception as exc:
            if getattr(ctx, "log", None):
                ctx.log(
                    "discoverOptions failed",
                    {"type": adapter.type, "error": str(exc)},
                )
            discovered = {}
        return {**discovered, **source}

    def fetch_items(
        self,
        source: dict,
        ctx,
        fetch_html,
        fallback_type=None,
        discover: bool = False,
    ) -> list[dict]:
        resolved = self.resolve(source, fetch_html, fallback_type)
        if resolved is None:
            raise ValueError(f"ValidationError: cannot resolve platform for {source}")
        adapter = self._adapters[resolved["type"]]
        if discover and adapter.discover_options is not None:
            source = self.discover_source_options(
                source, ctx, fetch_html, fallback_type,
                resolved_type=resolved["type"],
            )
        return adapter.fetch(source, ctx)
