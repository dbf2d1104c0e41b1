"""Sketch operators: mergeable approximate aggregates for 100 TB scans.

KMV (k-minimum-values) distinct-count sketch — the classic mergeable
cardinality estimator (Bar-Yossef et al. 2002; the same family as
HyperLogLog but exactly mergeable by set-union of minima):

- per batch, hash the values (splitmix64 over the column) and keep the k
  smallest distinct hashes — a tiny partial state per (group, batch);
- partials MERGE by union + re-truncate to k (associative, commutative —
  safe in any shuffle/combine order);
- if the final sketch holds fewer than k hashes the count is EXACT
  (every distinct value is present); otherwise the estimator is
  ``(k - 1) / max_kth_normalized``.

The Ray shape is one ``map_batches`` producing one partial row per
(group, batch) then one small ``groupby().map_groups`` over partials —
the full column never shuffles (vs ``ds.unique``'s full exchange).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import _mix64

_MAX64 = float(2**64)


def _hash_values(values: list) -> np.ndarray:
    """Stable 64-bit hashes of arbitrary scalar values (via str encoding —
    deterministic across engines/runs, unlike Python hash())."""
    import hashlib

    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        digest = hashlib.md5(str(v).encode("utf-8")).digest()
        out[i] = int.from_bytes(digest[:8], "big")
    return out


def kmv_partials(
    batch: pa.Table, col: str, group_cols: list[str] | None = None, k: int = 1024
) -> pa.Table:
    """One sketch row per (group, batch): the k smallest distinct hashes."""
    df = batch.select([*(group_cols or []), col]).to_pandas()
    rows: list[dict] = []
    if group_cols:
        grouped = df.groupby(group_cols, sort=False)
    else:
        grouped = [((), df)]
    for key, g in grouped:
        hashes = np.unique(_hash_values(g[col].tolist()))
        mins = np.sort(hashes)[:k]
        row = {"__sketch": mins.tobytes()}
        if group_cols:
            key = key if isinstance(key, tuple) else (key,)
            row.update(dict(zip(group_cols, key)))
        rows.append(row)
    fields = [(c, df[c].dtype) for c in (group_cols or [])]
    out = pd.DataFrame(rows)
    for c, dt in fields:
        out[c] = out[c].astype(dt)
    return pa.Table.from_pandas(out, preserve_index=False)


def _merge_sketches(blobs: list[bytes], k: int) -> np.ndarray:
    merged = np.unique(
        np.concatenate([np.frombuffer(b, dtype=np.uint64) for b in blobs])
    )
    return merged[:k]


def kmv_estimate(sketch: np.ndarray, k: int) -> int:
    if len(sketch) < k:
        return int(len(sketch))  # exact: the sketch saw every distinct value
    kth = float(sketch[k - 1]) / _MAX64
    return int(round((k - 1) / kth))


def approx_distinct(
    ds, col: str, group_cols: list[str] | None = None, k: int = 1024
):
    """Approximate COUNT(DISTINCT col) [per group]: returns a pa.Table of
    (group..., approx_distinct). Exact whenever per-group cardinality < k,
    else within ~1/sqrt(k) relative error."""
    partials = ds.map_batches(
        lambda t: kmv_partials(t, col, group_cols, k), batch_format="pyarrow"
    )
    if not group_cols:
        blobs = [
            b
            for t in partials.to_arrow_refs()
            for b in _ray_get(t).column("__sketch").to_pylist()
        ]
        est = kmv_estimate(_merge_sketches(blobs, k), k) if blobs else 0
        return pa.table({"approx_distinct": pa.array([est], pa.int64())})

    def reduce_group(group: pd.DataFrame) -> pd.DataFrame:
        sketch = _merge_sketches(list(group["__sketch"]), k)
        out = group.head(1)[group_cols].copy()
        out["approx_distinct"] = kmv_estimate(sketch, k)
        return out

    merged = partials.groupby(group_cols).map_groups(
        reduce_group, batch_format="pandas"
    )
    return merged


def _ray_get(ref):
    import ray

    return ray.get(ref)
