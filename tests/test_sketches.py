"""KMV distinct sketch: mergeability, exactness below k, bounded error
above k."""

import numpy as np
import pandas as pd
import pytest

import ray

from spider_ray.pipelines.sketches import (
    _merge_sketches,
    approx_distinct,
    kmv_estimate,
    kmv_partials,
)


def test_exact_below_k(ray_session):
    df = pd.DataFrame({"v": [f"val{i % 37}" for i in range(5000)]})
    ds = ray.data.from_pandas(df)
    out = approx_distinct(ds, "v", k=256).to_pydict()
    assert out["approx_distinct"] == [37]  # cardinality < k → exact


def test_grouped_exact_below_k(ray_session):
    rng = np.random.default_rng(2)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 5, 8000),
            "v": rng.integers(0, 200, 8000),
        }
    )
    ds = ray.data.from_pandas(df)
    out = approx_distinct(ds, "v", group_cols=["g"], k=512).to_pandas()
    expected = df.groupby("g")["v"].nunique()
    for _, row in out.iterrows():
        assert row["approx_distinct"] == expected[row["g"]]


def test_estimate_error_bounded_above_k(ray_session):
    n = 50_000
    df = pd.DataFrame({"v": np.arange(n)})  # all distinct, >> k
    ds = ray.data.from_pandas(df)
    k = 1024
    est = approx_distinct(ds, "v", k=k).to_pydict()["approx_distinct"][0]
    rel_err = abs(est - n) / n
    assert rel_err < 5 / np.sqrt(k), (est, rel_err)  # ~3% at k=1024


def test_merge_order_invariant():
    import pyarrow as pa

    rng = np.random.default_rng(7)
    values = [f"x{i}" for i in rng.integers(0, 3000, 10_000)]
    k = 128
    tables = [
        kmv_partials(pa.table({"v": values[i::4]}), "v", None, k) for i in range(4)
    ]
    blobs = [t.column("__sketch").to_pylist()[0] for t in tables]
    a = _merge_sketches(blobs, k)
    b = _merge_sketches(list(reversed(blobs)), k)
    assert np.array_equal(a, b)
    assert kmv_estimate(a, k) == kmv_estimate(b, k)


def test_approx_quantiles_rank_error_bound(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from spider_ray.pipelines.sketches import approx_quantiles

    rng = np.random.default_rng(21)
    # heavy-tailed + ties: the adversarial shape for naive sampling
    data = np.concatenate(
        [rng.lognormal(0, 2, size=20_000), np.full(5_000, 3.0)]
    )
    tbl = pa.table({"v": pa.array(data, pa.float64())})
    ds = ray.data.from_arrow(tbl).repartition(17)
    m = 256
    out = approx_quantiles(ds, "v", qs=(0.1, 0.5, 0.9, 0.99), m=m).to_pandas()

    v_sorted = np.sort(data)
    n = len(data)
    for q, est in zip(out["q"], out["value"]):
        # rank of the estimate must be within 2N/m of the target rank
        lo = np.searchsorted(v_sorted, est, side="left")
        hi = np.searchsorted(v_sorted, est, side="right")
        target = q * n
        err = min(abs(target - lo), abs(target - hi))
        assert err <= 2 * n / m, (q, est, err, n / m)
