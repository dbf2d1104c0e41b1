"""Engine configuration resolution, including the reference's env merge.

Reproduces ``loadEnvConfig`` semantics (reference call sites
src/adapters/simple.ts:36-43 et al.; behavior spec src/env-config.test.ts):
``HAVE_SPIDER_{TIMEOUT,USER_AGENT,MAX_REQUESTS,CRAWL4AI_URL}`` environment
variables are merged UNDER user options — an explicitly passed option always
wins; env fills only unset fields. This is driver-side config resolution,
not a data-plane op (SURVEY.md §2.2 M21).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

DEFAULT_TIMEOUT_MS = 30_000  # types.ts:126-130
DEFAULT_CACHE_EXPIRY_MS = 300_000
DEFAULT_RATE_LIMIT_MS = 1_000  # tree.ts:20
CRAWL4AI_TIMEOUT_MS = 60_000  # crawl4ai.ts:146

_ENV_MAP = {
    "timeout": ("HAVE_SPIDER_TIMEOUT", int),
    "user_agent": ("HAVE_SPIDER_USER_AGENT", str),
    "max_requests": ("HAVE_SPIDER_MAX_REQUESTS", int),
    "crawl4ai_url": ("HAVE_SPIDER_CRAWL4AI_URL", str),
}


@dataclass
class FetchOptions:
    """The reference FetchOptions (types.ts:118-157) as a dataclass."""

    headers: dict[str, str] = field(default_factory=dict)
    timeout: int | None = None
    cache: bool = True
    cache_expiry: int = DEFAULT_CACHE_EXPIRY_MS
    user_agent: str | None = None
    max_requests: int | None = None
    crawl4ai_url: str | None = None


def load_env_config(options: FetchOptions | None = None,
                    env: dict | None = None) -> FetchOptions:
    """Merge HAVE_SPIDER_* env under the user's options (user wins)."""
    opts = options or FetchOptions()
    env = env if env is not None else os.environ
    for attr, (var, cast) in _ENV_MAP.items():
        if getattr(opts, attr) is None and var in env:
            try:
                setattr(opts, attr, cast(env[var]))
            except (TypeError, ValueError):
                pass  # malformed env values are ignored, not fatal
    if opts.timeout is None:
        opts.timeout = DEFAULT_TIMEOUT_MS
    return opts
