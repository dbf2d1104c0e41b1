"""The end-to-end image+caption training-table pipeline.

Composes the engine's multimodal operators into the pipeline a real
training-data run executes after the crawl (everything Ray-Data-first,
every stage already individually oracle/pytest-gated):

    images (input-hint schema: image_id, bytes, w, h, fmt, caption, phash)
      → DecodeStats actor pool   (REAL decode; validates w/h/fmt/phash)
      → validity filter          (undecodable / mismatched rows dropped)
      → ImageEmbed actor pool    (histogram+moment embedding per image)
      → phash near-dup pairs     (16-bit band blocking, capped buckets)
      → union-find components    (pipelines.cluster)
      → drop non-canonical       (broadcast drop set, no corpus shuffle)
      → training table           (image_id, caption, w, h, fmt, phash,
                                  img_embedding)

Scale notes: the only wide operation is the near-dup ``groupby`` over
(band_id, band_val) keys — O(corpus) rows of 3 small columns; image bytes
never shuffle (decode/embed are map-only over the binary column; the final
table drops ``bytes`` — at 100 TB the payload stays in the source table,
referenced by image_id).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.images import DecodeStats, ImageEmbed
from .cluster import drop_non_canonical
from .dedup import hash_band_pairs


def image_training_table(
    images_ds,
    max_hamming: int = 3,
    decode_concurrency: int = 2,
    batch_size: int = 64,
):
    """images Dataset → deduped, embedded training-table Dataset."""
    decoded = images_ds.map_batches(
        DecodeStats,
        batch_size=batch_size,
        concurrency=decode_concurrency,
        batch_format="pyarrow",
    )

    def valid(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.is_valid(batch.column("dec_fmt")),
            pc.and_(
                pc.equal(batch.column("dec_w"), batch.column("w")),
                pc.equal(batch.column("dec_h"), batch.column("h")),
            ),
        )
        return batch.filter(pc.fill_null(ok, False))

    validated = decoded.map_batches(valid, batch_format="pyarrow")
    embedded = validated.map_batches(
        ImageEmbed,
        batch_size=batch_size,
        concurrency=decode_concurrency,
        batch_format="pyarrow",
    ).materialize()  # consumed twice: pair generation + final projection

    pairs = hash_band_pairs(
        embedded.map_batches(
            lambda t: t.select(["image_id", "dec_phash"]), batch_format="pyarrow"
        ),
        hash_col="dec_phash",
        id_col="image_id",
        max_hamming=max_hamming,
    )
    kept = drop_non_canonical(embedded, pairs, id_col="image_id")
    return kept.map_batches(
        lambda t: t.select(
            ["image_id", "caption", "w", "h", "fmt", "phash", "img_embedding"]
        ),
        batch_format="pyarrow",
    )


# Standard aspect-ratio ladder (SDXL-style bucketed training: group
# images by nearest aspect ratio so each micro-batch shares one
# resolution and no image is over-cropped).
ASPECT_LADDER = (0.25, 0.5, 0.75, 1.0, 4.0 / 3.0, 2.0, 4.0)


def aspect_bucket_batches(
    ds,
    id_col: str = "image_id",
    w_col: str = "w",
    h_col: str = "h",
    ratios: tuple = ASPECT_LADDER,
    batch_size: int = 8,
    n_ranges: int = 64,
):
    """Aspect-ratio bucketing + deterministic micro-batch assignment.

    Every row is assigned the ladder bucket minimizing |w/h - ratio|
    (ties → lower bucket index), then rows are ranked WITHIN their bucket
    by ``id_col`` and packed into fixed-size batches; trailing partial
    batches are marked ``kept = 0`` (dropped by the loader).

    Output: (id, bucket_id, seq, batch_idx, kept) — all int64, exact.

    Scale shape: per-bucket GLOBAL rank is the distributed-scan pattern
    (events.global_running_sum), generalized to one scan per bucket in a
    single pass: a map-only pass emits per-(id-range, bucket) counts
    (O(n_ranges x n_buckets) scalars — the only thing the driver ever
    holds), the driver prefix-sums offsets per bucket, and ONE range
    exchange lets each range task rank its rows vectorized (sort by
    (bucket, id), groupby-cumcount + broadcast offset). Buckets are few
    (~7) so hashing on bucket_id would put 1/7th of the corpus in one
    task's heap — the range exchange keeps partitions id-uniform
    regardless of bucket skew."""
    import numpy as np
    import pandas as pd

    ladder = np.asarray(ratios, dtype=np.float64)
    n_b = len(ladder)

    def assign(t: pa.Table) -> pa.Table:
        w = t.column(w_col).to_numpy(zero_copy_only=False).astype(np.float64)
        h = t.column(h_col).to_numpy(zero_copy_only=False).astype(np.float64)
        r = w / h
        b = np.abs(r[:, None] - ladder[None, :]).argmin(axis=1).astype(np.int32)
        return pa.table(
            {
                "id": t.column(id_col).cast(pa.int64()),
                "bucket_id": pa.array(b),
            }
        )

    rows = ds.map_batches(assign, batch_format="pyarrow")

    # pass 1: id bounds, then per-(range, bucket) count partials
    bt = pa.concat_tables(
        [
            pa.table(b)
            for b in rows.map_batches(
                lambda t: pa.table(
                    {
                        "lo": pa.array([pc.min(t.column("id")).as_py()], pa.int64()),
                        "hi": pa.array([pc.max(t.column("id")).as_py()], pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            ).iter_batches(batch_format="pyarrow")
        ]
        or [pa.schema([("lo", pa.int64()), ("hi", pa.int64())]).empty_table()]
    ).drop_null()
    empty = pa.schema(
        [
            ("id", pa.int64()),
            ("bucket_id", pa.int64()),
            ("seq", pa.int64()),
            ("batch_idx", pa.int64()),
            ("kept", pa.int64()),
        ]
    ).empty_table()
    if bt.num_rows == 0:
        import ray as _ray

        return _ray.data.from_arrow(empty)
    lo = pc.min(bt.column("lo")).as_py()
    hi = pc.max(bt.column("hi")).as_py()
    span = max(1, (hi - lo + n_ranges) // n_ranges)

    def tag(t: pa.Table) -> pa.Table:
        rid = (
            (t.column("id").to_numpy(zero_copy_only=False) - lo) // span
        ).astype(np.int32)
        return t.append_column("__range", pa.array(rid))

    def count_partial(t: pa.Table) -> pa.Table:
        rid = ((t.column("id").to_numpy(zero_copy_only=False) - lo) // span).astype(
            np.int64
        )
        b = t.column("bucket_id").to_numpy(zero_copy_only=False).astype(np.int64)
        key = rid * n_b + b
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "key": pa.array(uk, pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    parts = pa.concat_tables(
        [
            pa.table(b)
            for b in rows.map_batches(
                count_partial, batch_format="pyarrow"
            ).iter_batches(batch_format="pyarrow")
        ]
    )
    counts = np.zeros((n_ranges + 1, n_b), dtype=np.int64)
    keys = parts.column("key").to_numpy()
    np.add.at(
        counts, (keys // n_b, keys % n_b), parts.column("cnt").to_numpy()
    )
    # exclusive prefix over ranges, per bucket; bucket totals → full-batch cut
    offsets = np.cumsum(counts, axis=0) - counts  # (ranges+1, n_b)
    totals = counts.sum(axis=0)  # (n_b,)
    n_full = totals // batch_size

    import ray as _ray

    ref = _ray.put((offsets, n_full))

    def rank_range(group: pd.DataFrame) -> pa.Table:
        offs, nf = _ray.get(ref)
        rid = int(group["__range"].iloc[0])
        g = group.sort_values(["bucket_id", "id"], kind="mergesort")
        base = offs[rid][g["bucket_id"].to_numpy()]
        within = g.groupby("bucket_id", sort=False).cumcount().to_numpy()
        seq = base + within
        bidx = seq // batch_size
        kept = (bidx < nf[g["bucket_id"].to_numpy()]).astype(np.int64)
        return pa.table(
            {
                "id": pa.array(g["id"].to_numpy(), pa.int64()),
                "bucket_id": pa.array(
                    g["bucket_id"].to_numpy().astype(np.int64), pa.int64()
                ),
                "seq": pa.array(seq, pa.int64()),
                "batch_idx": pa.array(bidx, pa.int64()),
                "kept": pa.array(kept, pa.int64()),
            }
        )

    return (
        rows.map_batches(tag, batch_format="pyarrow")
        .groupby("__range")
        .map_groups(rank_range, batch_format="pandas")
    )
