"""Near-dup cluster resolution: pairs → connected components → keep set.

The dedup families (pipelines.dedup) emit candidate PAIRS; a real
training-data pipeline then needs one decision per document: keep or drop.
This module closes that loop:

- ``connected_components`` — union-find over the pair set. Pairs are the
  SMALL derived output (O(near-dups), not O(corpus)); running union-find
  driver-side over them is the standard shape (cf. BigQuery/Spark dedup
  pipelines that collect LSH edges before component labeling). For pair
  sets beyond driver memory, iterate label propagation over a Dataset —
  the chain-capped bucket generators in dedup.py guarantee the pair set
  stays O(corpus near-dups), so driver-side is the right default.
- ``drop_non_canonical`` — broadcast the (small) drop set once via
  ``ray.put`` and filter inside ``map_batches`` — no shuffle of the corpus.

Canonical member = min id per component (deterministic keep-first, the
same rule as exact_dedup / the reference's first-wins dedups).
"""

from __future__ import annotations

import pyarrow as pa


def connected_components(
    pairs: pa.Table, id_a: str = "id_a", id_b: str = "id_b"
) -> pa.Table:
    """(doc_id, canonical_id) for every doc appearing in ``pairs``;
    canonical_id = min id of its connected component."""
    a = pairs.column(id_a).to_pylist()
    b = pairs.column(id_b).to_pylist()
    parent: dict = {}

    def find(x):
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            # union by min — the canonical id wins the root
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            parent[hi] = lo

    for x, y in zip(a, b):
        union(x, y)
    members = sorted(parent)
    return pa.table(
        {
            "doc_id": pa.array(members),
            "canonical_id": pa.array([find(m) for m in members]),
        }
    )


def drop_set(components: pa.Table) -> set:
    """Ids to drop: every component member except its canonical one."""
    return {
        d for d, c in zip(
            components.column("doc_id").to_pylist(),
            components.column("canonical_id").to_pylist(),
        )
        if d != c
    }


def drop_non_canonical(ds, pairs: pa.Table, id_col: str = "doc_id"):
    """Filter the corpus Dataset down to near-dup-free rows: one broadcast
    of the small drop set (in the task closure), zero shuffles of the
    corpus. Works for integer AND string id columns (``pc.is_in``)."""
    import pyarrow.compute as pc

    drops = drop_set(connected_components(pairs))
    if not drops:
        return ds
    drop_arr = pa.array(sorted(drops))

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(batch.column(id_col), value_set=drop_arr))
        return batch.filter(pc.fill_null(mask, True))

    return ds.map_batches(keep, batch_format="pyarrow")
