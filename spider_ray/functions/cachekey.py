"""Content-addressed cache keys: canonical-JSON + sha256.

Reproduces the reference's ``stableStringify`` + ``createCacheKey``
(src/shared/cache.ts:48-105): canonical JSON with sorted object keys,
dropped undefined entries, JS-style compact separators; key =
``namespace:sha256hex``. Namespaces used by the adapters:
``simple: dom: crawlee: crawl4ai: tree:``.

The same canonical-JSON machinery doubles as the engine's deterministic
config-identity hash (cache keys vary by adapter options, matching
src/adapters/crawlee.ts:46-66).
"""

from __future__ import annotations

import hashlib
import json
import math

_UNDEFINED = object()  # sentinel: the JS `undefined` (dropped from objects)

UNDEFINED = _UNDEFINED


def stable_stringify(value) -> str:
    """Canonical JSON mirroring cache.ts:62-105 (JS semantics)."""
    if value is _UNDEFINED:
        return "undefined"
    if value is None:
        return "null"
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (int, float)):
        if isinstance(value, float) and (math.isnan(value) or math.isinf(value)):
            return "null"  # JSON.stringify(NaN) === 'null'
        if isinstance(value, float) and value.is_integer():
            return str(int(value))  # JS numbers: 1.0 → "1"
        return json.dumps(value)
    if isinstance(value, str):
        return json.dumps(value, ensure_ascii=False)
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(stable_stringify(v) for v in value) + "]"
    if isinstance(value, dict):
        entries = sorted(
            ((k, v) for k, v in value.items() if v is not _UNDEFINED),
            key=lambda kv: kv[0],
        )
        return (
            "{"
            + ",".join(
                f"{json.dumps(str(k), ensure_ascii=False)}:{stable_stringify(v)}"
                for k, v in entries
            )
            + "}"
        )
    return json.dumps(str(value), ensure_ascii=False)


def create_cache_key(namespace: str, url: str, parts: list | None = None) -> str:
    """``namespace:sha256(canonicalJSON({parts, url}))`` (cache.ts:48-60)."""
    normalized = [
        stable_stringify(p) for p in (parts or []) if p is not _UNDEFINED
    ]
    signature = stable_stringify({"parts": normalized, "url": url})
    digest = hashlib.sha256(signature.encode("utf-8")).hexdigest()
    return f"{namespace}:{digest}"
