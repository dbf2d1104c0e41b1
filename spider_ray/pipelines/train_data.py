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
