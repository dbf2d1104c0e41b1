"""Download-info helpers (reference src/shared/download-utils.ts and
browser-runner download handling).

``dedupe_downloads`` reproduces the composite-key dedup the browser runner
applies before returning a page's downloads
(src/shared/browser-runner.ts:204-222): key = ``url\\0filename\\0contentType``
with missing parts as empty strings, FIRST occurrence wins.
"""

from __future__ import annotations


def download_key(d: dict) -> str:
    """Composite dedup key with NUL separator (browser-runner.ts:211-213)."""
    return "\0".join(
        [d.get("url") or "", d.get("filename") or "", d.get("content_type") or ""]
    )


def dedupe_downloads(downloads: list[dict] | None) -> list[dict] | None:
    if not downloads:
        return downloads
    seen: set[str] = set()
    out: list[dict] = []
    for d in downloads:
        key = download_key(d)
        if key in seen:
            continue
        seen.add(key)
        out.append(d)
    return out
