"""Distributed Lloyd k-means: cluster recovery on planted blobs,
bit-identical determinism across partitionings (pipelines/kmeans.py)."""

import numpy as np
import pyarrow as pa
import ray

from spider_ray.pipelines.kmeans import kmeans_assign, kmeans_fit


def _blobs():
    rng = np.random.default_rng(13)
    centers = np.array([[0.0, 0.0, 0.0], [10.0, 10.0, 0.0], [0.0, 10.0, 10.0]])
    vecs, labels = [], []
    for lab, c in enumerate(centers):
        pts = c + rng.normal(0, 0.3, size=(40, 3))
        vecs.extend(pts.tolist())
        labels.extend([lab] * 40)
    return pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float64())),
        }
    ), labels


def test_kmeans_recovers_planted_blobs(ray_session):
    tbl, labels = _blobs()
    ds = ray.data.from_arrow(tbl).repartition(5)
    centroids, inertia_q = kmeans_fit(ds, k=3, n_iter=8)
    out = (
        kmeans_assign(ds, centroids)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    # each planted blob maps to exactly one fitted cluster, all 3 used
    mapping = {}
    for lab, cl in zip(labels, out["cluster"]):
        mapping.setdefault(lab, set()).add(int(cl))
    assert all(len(s) == 1 for s in mapping.values())
    assert len({next(iter(s)) for s in mapping.values()}) == 3
    # centroids near the planted centers (within noise)
    planted = np.array([[0, 0, 0], [10, 10, 0], [0, 10, 10]], dtype=float)
    for c in planted:
        assert np.min(np.linalg.norm(centroids - c, axis=1)) < 0.5
    assert inertia_q > 0


def test_kmeans_bit_identical_across_partitionings(ray_session):
    tbl, _ = _blobs()
    c1, i1 = kmeans_fit(ray.data.from_arrow(tbl).repartition(2), k=3, n_iter=5)
    c2, i2 = kmeans_fit(ray.data.from_arrow(tbl).repartition(9), k=3, n_iter=5)
    assert np.array_equal(c1, c2)
    assert i1 == i2
