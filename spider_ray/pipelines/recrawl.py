"""Day-2 recrawl diff: change detection between two crawl runs.

A production frontier re-crawls pages and needs to know what changed —
the crawl-tier analogue of pipelines.dedup.dedup_against_reference
(day-2 dedup). Both runs' ``documents`` stores are fingerprinted with a
vectorized md5 over the extracted text, hash-partitioned on
``url_hash64`` and full-outer-joined bucket-by-bucket
(relational.bucketed_hash_join), so nothing but (key, url, md5) rows
cross the exchange and no side is ever driver-resident:

- ``added``     — url only in the new run (newly discovered)
- ``removed``   — url only in the old run (link rot / frontier drift)
- ``changed``   — both runs, different text fingerprint
- ``unchanged`` — both runs, identical fingerprint
- ``collision`` — the two sides' 64-bit keys matched but the URL
  strings differ (md5-prefix collision, ~n²/2⁶⁵ expected pairs; a
  second pass keyed on the full 128-bit digest resolves these — at
  10¹⁰ URLs that is a handful of rows, so the driver can do it)

No reference counterpart (the reference fetches one URL at a time and
has no run-to-run diffing); the TTL cache (src/shared/cache.ts) is its
only freshness notion.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.urls import url_hash64
from .relational import bucketed_hash_join


def _fingerprint(side: str):
    """(url, text) batches → (key:int64, url_<side>, md5_<side>)."""

    def fp(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        keys = np.fromiter(
            (url_hash64(u) for u in urls), dtype=np.uint64, count=len(urls)
        ).view(np.int64)
        digests = [
            hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts
        ]
        return pa.table(
            {
                "key": pa.array(keys, pa.int64()),
                f"url_{side}": pa.array(urls, pa.string()),
                f"md5_{side}": pa.array(digests, pa.string()),
            }
        )

    return fp


def recrawl_diff(old_dir: str, new_dir: str, n_buckets: int = 32):
    """Dataset of (url, change_type) across two crawl output dirs."""
    import ray.data

    old = ray.data.read_parquet(
        f"{old_dir}/documents", columns=["url", "text"]
    ).map_batches(_fingerprint("old"), batch_format="pyarrow")
    new = ray.data.read_parquet(
        f"{new_dir}/documents", columns=["url", "text"]
    ).map_batches(_fingerprint("new"), batch_format="pyarrow")
    joined = bucketed_hash_join(
        old,
        new,
        on="key",
        left_cols=["url_old", "md5_old"],
        right_cols=["url_new", "md5_new"],
        n_buckets=n_buckets,
        how="outer",
    )

    def classify(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # an all-one-sided bucket block types its absent side as `null`
        # (no string kernel for coalesce/not_equal) — cast up front
        uo = batch.column("url_old").cast(pa.string())
        un = batch.column("url_new").cast(pa.string())
        mo = batch.column("md5_old").cast(pa.string())
        mn = batch.column("md5_new").cast(pa.string())
        old_null = pc.is_null(uo).to_numpy(zero_copy_only=False)
        new_null = pc.is_null(un).to_numpy(zero_copy_only=False)
        url_diff = pc.fill_null(pc.not_equal(uo, un), False).to_numpy(
            zero_copy_only=False
        )
        md5_diff = pc.fill_null(pc.not_equal(mo, mn), False).to_numpy(
            zero_copy_only=False
        )
        kinds = np.select(
            [old_null, new_null, url_diff, md5_diff],
            ["added", "removed", "collision", "changed"],
            default="unchanged",
        )
        return pa.table(
            {
                "url": pc.coalesce(un, uo),
                "change_type": pa.array(kinds.tolist(), pa.string()),
            }
        )

    return joined.map_batches(classify, batch_format="pyarrow")
