"""Relational patterns used by the engine's table pipelines.

Three scale-conscious building blocks (ray_guide / SURVEY.md §4):

- **broadcast_join** — small dimension side shipped once via ``ray.put``;
  each batch merges against the broadcast pandas frame. No shuffle.
- **bucketed_hash_join** — both sides large: add ``bucket = hash(key) % B``
  to each side, tag the side, union, ``groupby(bucket)`` (ONE hash
  exchange), then an in-bucket pandas merge per group. B and skew handling
  are explicit; salt hot keys by raising B.
- **preagg_sum** — partial per-batch sums (one row per key per batch)
  before the small ``groupby().aggregate`` — the combiner pattern that
  keeps the wide shuffle tiny.

Monetary/float sums use integer cents where exactness matters (callers
pass already-integer columns).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def broadcast_join(ds, small_df: pd.DataFrame, on: str, take_cols: list[str]):
    """Left join ``ds`` against a broadcast small side, keeping take_cols."""
    ref = ray.put(small_df[[on, *take_cols]])

    def join_batch(batch: pd.DataFrame) -> pd.DataFrame:
        dim = ray.get(ref)
        return batch.merge(dim, on=on, how="left")

    return ds.map_batches(join_batch, batch_format="pandas")


def bucketed_hash_join(
    left_ds,
    right_ds,
    on: str,
    left_cols: list[str],
    right_cols: list[str],
    n_buckets: int = 32,
    how: str = "inner",
):
    """Partitioned hash join of two large Datasets on an int key.

    ``left_cols``/``right_cols`` are the non-key payload columns of each
    side (explicit — the tagged union null-fills the other side's columns,
    so the in-bucket merge must select per side). ``how`` is "inner",
    "left" (left-outer: unmatched left rows keep nulls on the right
    payload) or "outer" (full-outer: unmatched rows of BOTH sides
    survive). Outer semantics are correct per bucket because hash
    partitioning co-locates ALL rows of a key, so a row unmatched in its
    bucket is unmatched globally."""

    def _ensure_arrow(ds):
        """(ds, arrow schema) — pandas-block datasets get a zero-work
        pyarrow pass-through so the schema is a real pa.Schema."""
        base = getattr(ds.schema(), "base_schema", None)
        if isinstance(base, pa.Schema):
            return ds, base
        ds = ds.map_batches(lambda t: t, batch_format="pyarrow")
        return ds, getattr(ds.schema(), "base_schema", None)

    left_ds, l_schema = _ensure_arrow(left_ds)
    right_ds, r_schema = _ensure_arrow(right_ds)
    l_types = {c: l_schema.field(c).type for c in left_cols}
    r_types = {c: r_schema.field(c).type for c in right_cols}
    ordered = [on, *left_cols, *right_cols, "__bucket", "__side"]

    def make_tag(side: str, own: list[str], other_types: dict):
        # tagged union with EXPLICITLY typed null columns for the other
        # side, so every block shares one Arrow schema — pandas NaN
        # null-filling breaks for list-typed payload columns
        def add(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            keys = (
                batch.column(on).to_numpy(zero_copy_only=False).astype(np.int64)
                % n_buckets
            ).astype(np.int32)
            arrays = {on: batch.column(on)}
            for c in own:
                arrays[c] = batch.column(c)
            for c, t in other_types.items():
                arrays[c] = pa.nulls(n, t)
            arrays["__bucket"] = pa.array(keys)
            arrays["__side"] = pa.array([side] * n, pa.string())
            return pa.table({k: arrays[k] for k in ordered})

        return add

    left = left_ds.map_batches(make_tag("L", left_cols, r_types), batch_format="pyarrow")
    right = right_ds.map_batches(make_tag("R", right_cols, l_types), batch_format="pyarrow")
    both = left.union(right)

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["__side"] == "L"][[on, *left_cols]]
        r = group[group["__side"] == "R"][[on, *right_cols]]
        # merge even when one side is empty — stable schema for every bucket
        return l.merge(r, on=on, how=how)

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")


def asof_join(
    left_ds,
    right_ds,
    key: str,
    ts: str,
    left_cols: list[str],
    right_cols: list[str],
    n_buckets: int = 32,
):
    """As-of join: each left row picks the LATEST right row of the same
    key with right.ts <= left.ts (backward as-of — the time-series /
    point-in-time-correct lookup Ray Data lacks natively).

    Physical plan: both sides tagged into one hash exchange on
    ``hash(key) % n_buckets`` (the bucketed-join pattern), then a per-key
    sort + ``pd.merge_asof`` inside each group — state never crosses key
    boundaries, so the shape holds at any scale where one key's history
    fits a worker. Right-side ``ts`` is emitted as ``<ts>_right``.
    """

    def _ensure_arrow(ds):
        base = getattr(ds.schema(), "base_schema", None)
        if isinstance(base, pa.Schema):
            return ds
        return ds.map_batches(lambda t: t, batch_format="pyarrow")

    left_ds = _ensure_arrow(left_ds)
    right_ds = _ensure_arrow(right_ds)

    def tag(side: str):
        def add(batch: pa.Table) -> pa.Table:
            keys_np = (
                batch.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
                % n_buckets
            ).astype(np.int32)
            batch = batch.append_column("__bucket", pa.array(keys_np))
            return batch.append_column(
                "__side", pa.array([side] * batch.num_rows, pa.string())
            )

        return add

    lt = left_ds.map_batches(tag("L"), batch_format="pyarrow")
    rt = right_ds.map_batches(tag("R"), batch_format="pyarrow")

    # union needs one schema: project both sides onto the combined columns
    all_cols = [key, ts, *left_cols, *right_cols, "__bucket", "__side"]

    def project(own: list[str]):
        def run(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            arrays = {}
            for c in all_cols:
                if c in batch.column_names:
                    arrays[c] = batch.column(c)
                else:
                    arrays[c] = pa.nulls(n, _ASOF_TYPES[c])
            return pa.table(arrays)

        return run

    _ASOF_TYPES = {}
    for ds_, cols in ((lt, [key, ts, *left_cols, "__bucket", "__side"]),
                      (rt, [key, ts, *right_cols, "__bucket", "__side"])):
        sch = getattr(ds_.schema(), "base_schema", None)
        for c in cols:
            _ASOF_TYPES.setdefault(c, sch.field(c).type)
    both = lt.map_batches(project(left_cols), batch_format="pyarrow").union(
        rt.map_batches(project(right_cols), batch_format="pyarrow")
    )

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        out_cols = [key, ts, *left_cols, *right_cols, f"{ts}_right"]
        l = group[group["__side"] == "L"][[key, ts, *left_cols]].sort_values(
            ts, kind="mergesort"
        )
        r = group[group["__side"] == "R"][[key, ts, *right_cols]].sort_values(
            ts, kind="mergesort"
        )
        if l.empty:
            # typed empty block — an all-object empty frame breaks Ray Data
            # block schema unification against other buckets' typed blocks
            return pa.table(
                {
                    c: pa.array([], _ASOF_TYPES[ts] if c == f"{ts}_right" else _ASOF_TYPES[c])
                    for c in out_cols
                }
            ).to_pandas()
        r = r.assign(**{f"{ts}_right": r[ts]})
        merged = pd.merge_asof(l, r, on=ts, by=key, direction="backward")
        return merged[out_cols]

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")


def range_join_broadcast(
    ds,
    intervals: pd.DataFrame,
    key: str,
    ts: str,
    start: str = "start",
    end: str = "end",
    interval_cols: list[str] | None = None,
):
    """Range (interval-containment) join: each row of ``ds`` matches every
    interval of the same key with ``start <= ts <= end`` (inner join, one
    output row per match).

    The interval side is broadcast once via ``ray.put`` (dimension-sized —
    the common case for session windows / campaign periods / validity
    ranges); each batch fans out with a vectorized key merge and filters
    the containment predicate — no shuffle of the fact side at all. For
    fact-sized interval tables, bucket both sides by key (the
    bucketed_hash_join pattern) and apply the same per-group probe.
    """
    import ray

    interval_cols = interval_cols or [
        c for c in intervals.columns if c not in (key, start, end)
    ]
    ref = ray.put(
        intervals[[key, start, end, *interval_cols]].sort_values(
            [key, start], kind="mergesort"
        )
    )

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        dim = ray.get(ref)
        merged = batch.merge(dim, on=key, how="inner")
        mask = (merged[start] <= merged[ts]) & (merged[ts] <= merged[end])
        return merged[mask]

    return ds.map_batches(probe, batch_format="pandas")


def preagg_sum(ds, keys: list[str], sum_cols: list[str], count_alias: str | None = None):
    """sum/count per key with per-batch partial aggregation first.

    The combiner is pyarrow ``group_by`` — typed output matters beyond
    speed: a pandas combiner leaves string keys as dtype ``object`` and
    Ray's sort-aggregate over object blocks measured ~15× slower than
    over arrow string blocks (events_hour_agg 3.9 s → 0.25 s at sf0.1).
    Arrow also keeps NULL key groups (SQL GROUP BY semantics); pandas
    silently dropped them."""

    def partial(batch: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in sum_cols]
        if count_alias:
            aggs.append(([], "count_all"))
        g = batch.group_by(keys).aggregate(aggs)
        cols = {k: g.column(k) for k in keys}
        for c in sum_cols:
            cols[c] = g.column(f"{c}_sum")
        if count_alias:
            cols[count_alias] = g.column("count_all")
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    aggs = [Sum(c, alias_name=c) for c in sum_cols]
    if count_alias:
        aggs.append(Sum(count_alias, alias_name=count_alias))
    return partials.groupby(keys).aggregate(*aggs)


def semi_anti_join(ds, right_ds, on: str, anti: bool = False, right_on: str | None = None,
                   global_dedupe: bool = True, broadcast_key_limit: int = 100_000_000,
                   n_buckets: int = 64):
    """Semi join (EXISTS filter) or anti join (NOT EXISTS) of ``ds``
    against the distinct keys of ``right_ds``.

    The right side reduces to distinct keys with a per-batch ``unique``
    combiner before one small groupby exchange (only unique keys move).
    Two physical plans, chosen by distinct-key count:

    - **broadcast** (keys ≤ ``broadcast_key_limit``): the key column ships
      once via ``ray.put``; each left batch filters with ``pc.is_in`` —
      the fact side never shuffles. 10^8 int64 keys ≈ 0.8 GB.
    - **bucketed exchange** (beyond the limit — int64 keys only): left
      rows and right keys are tagged with ``hash(key) % n_buckets`` and
      unioned; one ``groupby(bucket)`` co-locates each left row with ALL
      right keys of its hash (same key ⇒ same bucket), so the per-bucket
      ``isin`` probe is globally correct. Only keys move for the right
      side; the left moves once — the same exchange a shuffle join pays.

    NULL keys follow EXISTS semantics in both plans (never match:
    dropped by semi, kept by anti). An EMPTY right side is legal: semi
    returns zero rows, anti returns ``ds`` unchanged."""
    import pyarrow.compute as pc

    r_on = right_on or on
    uniq = right_ds.map_batches(
        lambda t: pa.table({r_on: t.column(r_on).unique()}),
        batch_format="pyarrow",
    )
    if global_dedupe:
        # exact global distinct (one small exchange of unique keys)
        uniq = uniq.groupby(r_on).count()
    # else: per-batch-unique only — cross-batch duplicates merely inflate
    # the broadcast a little and is_in is insensitive to them; skips a
    # groupby when the right key is already (near-)unique, e.g. a PK
    uniq = uniq.materialize()
    n_keys = uniq.count()

    if n_keys == 0:
        # EXISTS over an empty set: nothing matches
        if anti:
            return ds
        return ds.map_batches(lambda t: t.slice(0, 0), batch_format="pyarrow")

    l_schema = getattr(ds.schema(), "base_schema", None)
    int_key = l_schema is not None and pa.types.is_integer(l_schema.field(on).type)
    if n_keys <= broadcast_key_limit or not int_key:
        # to_arrow_refs passes EMPTY pandas blocks through unconverted
        # (zero-column DataFrames with no .num_rows) — drop them; n_keys>0
        # guarantees at least one real arrow block survives
        key_tbl = pa.concat_tables(
            t
            for t in ray.get(uniq.to_arrow_refs())
            if isinstance(t, pa.Table) and t.num_rows
        )
        ref = ray.put(key_tbl.column(r_on).combine_chunks())

        def filt(batch: pa.Table) -> pa.Table:
            keys = ray.get(ref)
            mask = pc.fill_null(pc.is_in(batch.column(on), value_set=keys), False)
            return batch.filter(pc.invert(mask) if anti else mask)

        return ds.map_batches(filt, batch_format="pyarrow")

    # ---- bucketed tagged-union fallback (right key set too big to ship) --
    left_cols = [f.name for f in l_schema]
    ordered = ["__key", *left_cols, "__bucket", "__side"]
    l_types = {c: l_schema.field(c).type for c in left_cols}

    def _bucket_ids(col: pa.ChunkedArray | pa.Array) -> pa.Array:
        k = col.to_numpy(zero_copy_only=False)
        nulls = pd.isna(k)
        k = np.where(nulls, 0, k).astype(np.int64)
        return pa.array(((k % n_buckets + n_buckets) % n_buckets).astype(np.int32))

    def tag_left(batch: pa.Table) -> pa.Table:
        arrays = {"__key": batch.column(on).cast(pa.int64())}
        for c in left_cols:
            arrays[c] = batch.column(c)
        arrays["__bucket"] = _bucket_ids(batch.column(on))
        arrays["__side"] = pa.array(["L"] * batch.num_rows, pa.string())
        return pa.table({k: arrays[k] for k in ordered})

    def tag_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        arrays = {"__key": batch.column(r_on).cast(pa.int64())}
        for c in left_cols:
            arrays[c] = pa.nulls(n, l_types[c])
        arrays["__bucket"] = _bucket_ids(batch.column(r_on))
        arrays["__side"] = pa.array(["R"] * n, pa.string())
        return pa.table({k: arrays[k] for k in ordered})

    both = ds.map_batches(tag_left, batch_format="pyarrow").union(
        uniq.map_batches(tag_right, batch_format="pyarrow")
    )

    out_schema = pa.schema([(c, l_types[c]) for c in left_cols])

    def probe_bucket(group: pd.DataFrame) -> pa.Table:
        l = group[group["__side"] == "L"]
        rkeys = group.loc[group["__side"] == "R", "__key"]
        hit = l["__key"].isin(set(rkeys.tolist()))  # NaN keys → False
        keep = l[~hit] if anti else l[hit]
        # restore exact arrow types — the group block null-filled the other
        # side's columns, upcasting int payloads to float in pandas
        return pa.Table.from_pandas(
            keep[left_cols], schema=out_schema, preserve_index=False, safe=False
        )

    return both.groupby("__bucket").map_groups(probe_bucket, batch_format="pandas")


def rollup_sum(
    ds, keys: list[str], sum_col: str, alias: str, grouping: str = "rollup"
) -> pa.Table:
    """SQL ``GROUP BY ROLLUP(keys...)`` / ``CUBE(keys...)`` for an
    additive aggregate: ONE distributed partial-aggregate pass at the
    finest grouping level (preagg_sum — the only pass over the data),
    then every coarser grouping set re-aggregates the already-small
    finest-level table in arrow on the driver. Exact because sums
    re-aggregate losslessly; rolled-up key columns are NULL exactly as
    SQL emits them (pass integer value columns where hash-exactness
    matters, per module convention). ``grouping="rollup"`` unions the
    len(keys)+1 prefix levels; ``"cube"`` unions all 2^len(keys)
    subsets. Output: one pa.Table."""
    import itertools

    import pyarrow.compute as pc

    fine_ds = preagg_sum(ds, keys, [sum_col])
    parts = [
        t
        for t in fine_ds.iter_batches(batch_format="pyarrow")
        if t.num_rows
    ]
    if not parts:
        sch = getattr(ds.schema(), "base_schema", None)
        cols = {k: pa.array([], sch.field(k).type) for k in keys}
        cols[alias] = pa.array([], sch.field(sum_col).type)
        return pa.table(cols)
    fine = (
        pa.concat_tables([pa.table(t) for t in parts])
        .combine_chunks()
        .select([*keys, sum_col])
        .rename_columns([*keys, alias])
    )
    key_types = {k: fine.schema.field(k).type for k in keys}
    if grouping == "cube":
        subsets = [
            list(c)
            for r in range(len(keys) - 1, -1, -1)
            for c in itertools.combinations(keys, r)
        ]
    else:
        subsets = [keys[:depth] for depth in range(len(keys) - 1, -1, -1)]
    levels = [fine]
    for kept in subsets:
        if kept:
            g = fine.group_by(kept).aggregate([(alias, "sum")])
            sums = g.column(f"{alias}_sum").cast(fine.schema.field(alias).type)
            cols = {k: g.column(k) for k in kept}
        else:
            total = pc.sum(fine.column(alias))
            sums = pa.array([total.as_py()], fine.schema.field(alias).type)
            cols = {}
        n = len(sums)
        for k in keys:
            if k not in kept:
                cols[k] = pa.nulls(n, key_types[k])
        cols[alias] = sums
        levels.append(pa.table({c: cols[c] for c in [*keys, alias]}))
    return pa.concat_tables(levels).combine_chunks()
