"""Day-2 recrawl diff: change detection between two crawl runs.

A production frontier re-crawls pages and needs to know what changed —
the crawl-tier analogue of pipelines.dedup.dedup_against_reference
(day-2 dedup). Both runs' ``documents`` stores are fingerprinted with a
vectorized md5 over the extracted text, hash-partitioned on
``url_hash64 % n_buckets`` (identical URLs always co-locate) and
diffed bucket-by-bucket with a full-outer pandas merge **on the full
URL string** — so nothing but (bucket, url, md5) rows cross the
exchange, no side is ever driver-resident, and a 64-bit key collision
between two *different* URLs is harmless by construction: the colliding
pair lands in one bucket but stays two distinct merge keys, classifying
exactly as one ``added`` plus one ``removed`` row. (Earlier versions
joined on the 64-bit key itself and could only *label* such pairs
``collision``; diffing on the full string retires that class.)

- ``added``     — url only in the new run (newly discovered)
- ``removed``   — url only in the old run (link rot / frontier drift)
- ``changed``   — both runs, different text fingerprint
- ``unchanged`` — both runs, identical fingerprint

No reference counterpart (the reference fetches one URL at a time and
has no run-to-run diffing); the TTL cache (src/shared/cache.ts) is its
only freshness notion.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.urls import url_hash64


def _fingerprint(side: str, n_buckets: int):
    """(url, text) batches → (__bucket:int32, url, md5, __side)."""

    def fp(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        keys = np.fromiter(
            (url_hash64(u) for u in urls), dtype=np.uint64, count=len(urls)
        )
        digests = [
            hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts
        ]
        return pa.table(
            {
                "__bucket": pa.array(
                    (keys % n_buckets).astype(np.int32), pa.int32()
                ),
                "url": pa.array(urls, pa.string()),
                "md5": pa.array(digests, pa.string()),
                "__side": pa.array([side] * len(urls), pa.string()),
            }
        )

    return fp


def _diff_bucket(group: pd.DataFrame) -> pd.DataFrame:
    """Classify one bucket's (url, md5, __side) rows. Pure pandas —
    property-fuzzed against a brute-force oracle in tests/test_properties.py."""
    # one run fetches each URL at most once (the seen set), but a
    # store hand-built from multiple epochs may repeat a URL with
    # DIFFERENT text; intra-group row order depends on block arrival,
    # so a bare keep='first' would classify such a URL differently
    # run-to-run. Keep the lexicographically smallest md5 per URL —
    # arbitrary but deterministic for identical input stores.
    def _one_per_url(side: pd.DataFrame) -> pd.DataFrame:
        return (
            side[["url", "md5"]]
            .sort_values(["url", "md5"], kind="mergesort")
            .drop_duplicates("url")
        )

    l = _one_per_url(group[group["__side"] == "old"])
    r = _one_per_url(group[group["__side"] == "new"])
    m = l.merge(r, on="url", how="outer", suffixes=("_old", "_new"),
                indicator=True)
    kinds = np.select(
        [
            (m["_merge"] == "right_only").to_numpy(),
            (m["_merge"] == "left_only").to_numpy(),
            (m["md5_old"] != m["md5_new"]).to_numpy(),
        ],
        ["added", "removed", "changed"],
        default="unchanged",
    )
    return pd.DataFrame({"url": m["url"], "change_type": kinds})


def recrawl_diff(old_dir: str, new_dir: str, n_buckets: int = 32):
    """Dataset of (url, change_type) across two crawl output dirs."""
    import ray.data

    old = ray.data.read_parquet(
        f"{old_dir}/documents", columns=["url", "text"]
    ).map_batches(_fingerprint("old", n_buckets), batch_format="pyarrow")
    new = ray.data.read_parquet(
        f"{new_dir}/documents", columns=["url", "text"]
    ).map_batches(_fingerprint("new", n_buckets), batch_format="pyarrow")

    return (
        old.union(new)
        .groupby("__bucket")
        .map_groups(_diff_bucket, batch_format="pandas")
    )
