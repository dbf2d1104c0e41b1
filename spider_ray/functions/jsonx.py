"""Vectorized JSON scalar extraction over Arrow string columns.

Semi-structured event payloads (the events table's ``props`` column) are
the normal shape of log data; at 100 TB a per-row ``json.loads`` is the
hot-loop anti-pattern. For flat scalar keys the extraction is a single
RE2 kernel call (``pyarrow.compute.extract_regex`` — zero Python per
row); ``strict=True`` re-parses ONLY the rows where the fast path found
no match (malformed/absent key) with ``json.loads`` to distinguish
null-key from null-value. Nested/array values need a real parser — use
the strict path wholesale for those payloads.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def extract_int(col: pa.ChunkedArray | pa.Array, key: str) -> pa.Array:
    """int64 value of a flat ``"key": <int>`` JSON member (null if absent
    or non-integer). RE2 has no lookahead, so the pattern captures the
    whole JSON number and floats/scientific forms are nulled before the
    cast — ``"k": 1e2`` must NOT fast-path to 1 (strict mode repairs it
    to 100 via a real parse)."""
    pat = rf'"{key}"\s*:\s*(?P<v>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)'
    m = pc.extract_regex(col, pattern=pat)
    vals = pc.struct_field(m, "v")
    # ≤18 digits always fits int64 — cast directly; 19-digit values
    # (every nanosecond epoch since 2001) MOSTLY fit but straddle the
    # int64 boundary, so parse that rare subset in Python with a bounds
    # check rather than nulling it or letting pc.cast raise mid-pipeline
    is_short = pc.match_substring_regex(vals, r"^-?\d{1,18}$")
    is_long = pc.match_substring_regex(vals, r"^-?\d{19}$")
    short = pc.if_else(
        pc.fill_null(is_short, False), vals, pa.scalar(None, pa.string())
    )
    out = pc.cast(short, pa.int64())
    long_mask = pc.fill_null(is_long, False).to_numpy(zero_copy_only=False)
    if long_mask.any():
        raw = vals.to_pylist()
        fixed = out.to_pylist()
        for i in np.flatnonzero(long_mask):
            v = int(raw[i])
            fixed[i] = v if -(1 << 63) <= v < (1 << 63) else None
        out = pa.array(fixed, pa.int64())
    return out


def extract_str(col: pa.ChunkedArray | pa.Array, key: str) -> pa.Array:
    """string value of a flat ``"key": "<str>"`` member (no unescaping of
    embedded ``\\"`` — use strict mode for payloads that need it)."""
    pat = rf'"{key}"\s*:\s*"(?P<v>[^"]*)"'
    m = pc.extract_regex(col, pattern=pat)
    return pc.struct_field(m, "v")


def with_json_int(
    ds,
    col: str,
    key: str,
    out_col: str | None = None,
    strict: bool = False,
):
    """Append ``out_col`` = int value of ``key`` inside the JSON column.
    Map-only; RE2 fast path, optional json.loads repair pass limited to
    the rows the regex missed."""
    out_col = out_col or key

    def add(batch: pa.Table) -> pa.Table:
        vals = extract_int(batch.column(col), key)
        if strict:
            mask = pc.is_null(vals).to_numpy(zero_copy_only=False)
            if mask.any():
                raw = batch.column(col).to_pylist()
                fixed = vals.to_pylist()
                for i in np.flatnonzero(mask):
                    try:
                        v = json.loads(raw[i]).get(key)
                    except (TypeError, ValueError):
                        v = None
                    # bool is an int subclass — a JSON true is NOT the
                    # integer 1 here; floats only when integral; clamp to
                    # the int64 range (pa.array raises otherwise)
                    if isinstance(v, bool):
                        out = None
                    elif isinstance(v, int):
                        out = v
                    elif isinstance(v, float) and v.is_integer():
                        out = int(v)
                    else:
                        out = None
                    if out is not None and not (-(1 << 63) <= out < (1 << 63)):
                        out = None
                    fixed[i] = out
                vals = pa.array(fixed, pa.int64())
        return batch.append_column(out_col, vals)

    return ds.map_batches(add, batch_format="pyarrow")
