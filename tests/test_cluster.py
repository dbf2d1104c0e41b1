"""Near-dup cluster resolution (pipelines.cluster): union-find over pair
sets, canonical-min labeling, and the broadcast drop filter."""

import pandas as pd
import pyarrow as pa
import pytest

import ray

from spider_ray.pipelines.cluster import (
    connected_components,
    drop_non_canonical,
    drop_set,
)


def test_connected_components_min_canonical():
    pairs = pa.table(
        {
            "id_a": [1, 2, 7, 9, 20],
            "id_b": [2, 3, 8, 7, 21],
        }
    )
    comp = connected_components(pairs).to_pydict()
    labels = dict(zip(comp["doc_id"], comp["canonical_id"]))
    assert labels == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 9: 7, 20: 20, 21: 20}
    assert drop_set(connected_components(pairs)) == {2, 3, 8, 9, 21}


def test_chain_pairs_resolve_like_full_pairs():
    """The capped chain representation of a hot bucket must resolve to the
    same components as the all-pairs representation."""
    n = 200
    chain = pa.table({"id_a": list(range(n - 1)), "id_b": list(range(1, n))})
    comp = connected_components(chain).to_pydict()
    assert set(comp["canonical_id"]) == {0}


def test_drop_non_canonical_filters_dataset(ray_session):
    df = pd.DataFrame({"doc_id": range(10), "text": [f"t{i}" for i in range(10)]})
    pairs = pa.table({"id_a": [0, 4], "id_b": [3, 5]})
    out = drop_non_canonical(ray.data.from_pandas(df), pairs).to_pandas()
    assert sorted(out["doc_id"]) == [0, 1, 2, 4, 6, 7, 8, 9]  # 3 and 5 dropped
    # empty pair set → identity
    none = drop_non_canonical(
        ray.data.from_pandas(df), pa.table({"id_a": pa.array([], pa.int64()),
                                            "id_b": pa.array([], pa.int64())})
    ).to_pandas()
    assert len(none) == 10


def test_end_to_end_minhash_dedup(ray_session):
    """minhash pairs → components → keep set equals exact text dedup when
    duplicates are exact (the fixture case)."""
    texts = ["alpha beta gamma delta epsilon zeta"] * 3 + [
        "one two three four five six seven",
        "totally different content here now",
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = ray.data.from_pandas(df)
    from spider_ray.pipelines.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(ds, verify_threshold=0.99)
    kept = drop_non_canonical(ds, pairs).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 3, 4]


def test_image_training_table_end_to_end(ray_session):
    """Crawl-shaped images (incl. planted png/jpeg re-encodes of the same
    pixels) → decoded, validated, embedded, near-dup-deduped training
    table: one survivor per re-encode pair, embeddings attached, bytes
    dropped from the output."""
    import numpy as np
    import pyarrow as pa

    from spider_ray.functions.imagecodec import decode_image, encode_image, phash64
    from spider_ray.pipelines.dedup import _to_i64
    from spider_ray.pipelines.train_data import image_training_table
    from spider_ray.sources.fixtures import MockWebConfig, caption_for, image_pixels

    cfg = MockWebConfig(n_pages=100)
    rows = []
    for i in range(0, 40, 5):
        pixels = image_pixels(i, cfg)
        for fmt in ("png", "jpeg"):  # re-encode pair → near-dup
            data = encode_image(pixels, fmt)
            rows.append(
                {
                    "image_id": f"img-{i}-{fmt}",
                    "bytes": data,
                    "w": cfg.img_size, "h": cfg.img_size, "fmt": fmt,
                    "caption": caption_for(i, cfg),
                    "phash": _to_i64(phash64(decode_image(data))),
                }
            )
    # one corrupt row: must be dropped by validation, not crash the stage
    rows.append(
        {"image_id": "bad", "bytes": b"\x00garbage", "w": 1, "h": 1,
         "fmt": "png", "caption": "x", "phash": 0}
    )
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = image_training_table(ds, decode_concurrency=2, batch_size=8).to_pandas()
    # exactly one survivor per re-encode pair, corrupt row gone
    assert len(out) == 8
    assert set(out["image_id"]) == {f"img-{i}-jpeg" for i in range(0, 40, 5)} or all(
        out.groupby(out["image_id"].str.extract(r"img-(\d+)-")[0]).size() == 1
    )
    assert "bytes" not in out.columns
    assert all(len(v) == 20 for v in out["img_embedding"])
    assert (out["caption"].str.startswith("caption for image")).all()
