"""Unit tests for graph.pagerank, textops.doc_frequency,
events.exact_quantiles, events.stratified_sample (oracle parity for each
is in test_oracle_parity via the driver contract)."""

import hashlib
from collections import Counter

import numpy as np
import pyarrow as pa
import ray


def _ds(table):
    return ray.data.from_arrow(table)


def test_pagerank_matches_power_iteration(ray_session):
    from spider_ray.pipelines.graph import dedup_edges, pagerank

    rng = np.random.default_rng(3)
    n = 40
    src = np.repeat(np.arange(n), 3)
    dst = rng.integers(0, n, size=3 * n)
    edges_tbl = pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    nodes_tbl = pa.table({"node": pa.array(np.arange(n), pa.int64())})

    ranks = (
        pagerank(dedup_edges(_ds(edges_tbl)), _ds(nodes_tbl), n_nodes=n, n_iter=5)
        .to_pandas()
        .sort_values("node")
    )

    # dense power iteration reference
    E = set(zip(src.tolist(), dst.tolist()))
    deg = Counter(s for s, _ in E)
    r = np.full(n, 1.0 / n)
    for _ in range(5):
        nxt = np.full(n, 0.15 / n)
        for s, d in E:
            nxt[d] += 0.85 * r[s] / deg[s]
        r = nxt
    got = ranks["rank_q"].to_numpy() / float(1 << 40)
    # fixed-point grid 2^-40 — per-iteration quantization compounds ≤ a few
    # grid steps; far finer than the ppb grid the oracle gate uses
    np.testing.assert_allclose(got, r, atol=5e-11, rtol=0)
    # mass conservation: no dangling nodes in this graph → sums to 1
    assert abs(got.sum() - 1.0) < 1e-8


def test_doc_frequency_matches_counter(ray_session):
    from spider_ray.pipelines.textops import doc_frequency

    texts = [
        "the cat sat", "the the dog", "", "cat! cat? dog-9", "UPPER upper",
    ] * 7  # several batches' worth when batch size is small
    tbl = pa.table({"text": pa.array(texts, pa.string())})
    out = doc_frequency(_ds(tbl)).to_pandas().set_index("token")

    import re

    tf, df = Counter(), Counter()
    for t in texts:
        toks = re.findall(r"[a-z0-9]+", t.lower())
        tf.update(toks)
        df.update(set(toks))
    assert set(out.index) == set(tf)
    for tok in tf:
        assert out.loc[tok, "total_tf"] == tf[tok], tok
        assert out.loc[tok, "doc_freq"] == df[tok], tok


def test_exact_quantiles_inverted_cdf(ray_session):
    from spider_ray.pipelines.events import exact_quantiles

    rng = np.random.default_rng(11)
    vals = rng.normal(0, 5, 501)
    tbl = pa.table(
        {
            "g": pa.array(["a"] * 300 + ["b"] * 201, pa.string()),
            "v": pa.array(vals, pa.float64()),
        }
    )
    out = (
        exact_quantiles(_ds(tbl), "g", "v", qs=(0.5, 0.95))
        .to_pandas()
        .set_index("g")
    )
    for g, lo, hi in (("a", 0, 300), ("b", 300, 501)):
        seg = vals[lo:hi]
        assert out.loc[g, "q50"] == np.quantile(seg, 0.5, method="inverted_cdf")
        assert out.loc[g, "q95"] == np.quantile(seg, 0.95, method="inverted_cdf")
        # discrete quantiles are actual data values
        assert out.loc[g, "q50"] in seg


def test_stratified_sample_deterministic_k_per_group(ray_session):
    from spider_ray.pipelines.events import stratified_sample

    tbl = pa.table(
        {
            "g": pa.array([f"g{i % 3}" for i in range(200)], pa.string()),
            "id": pa.array(range(200), pa.int64()),
        }
    )
    a = stratified_sample(_ds(tbl), "g", "id", k=4).to_pandas()
    b = stratified_sample(_ds(tbl), "g", "id", k=4).to_pandas()
    a = a.sort_values(["g", "id"]).reset_index(drop=True)
    b = b.sort_values(["g", "id"]).reset_index(drop=True)
    assert a.equals(b)
    assert (a.groupby("g").size() == 4).all()
    # matches the md5-order definition exactly
    for g, grp in a.groupby("g"):
        ids = [i for i in range(200) if f"g{i % 3}" == g]
        expect = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:4]
        assert sorted(grp["id"].tolist()) == sorted(expect)


def test_connected_components_random_graph(ray_session):
    from spider_ray.pipelines.graph import connected_components

    # random forest of chains + isolated nodes; reference = pure-python DSU
    rng = np.random.default_rng(11)
    n = 300
    src = rng.integers(0, n, size=150)
    dst = rng.integers(0, n, size=150)
    edges_tbl = pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    nodes_tbl = pa.table({"node": pa.array(np.arange(n), pa.int64())})

    out = (
        connected_components(
            _ds(edges_tbl).repartition(6), _ds(nodes_tbl), contraction=2
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(src.tolist(), dst.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-label per component
    members: dict[int, list[int]] = {}
    for i in range(n):
        members.setdefault(find(i), []).append(i)
    expect = {i: min(members[find(i)]) for i in range(n)}
    assert out["node"].tolist() == list(range(n))
    assert out["component"].tolist() == [expect[i] for i in range(n)]


def test_tfidf_topk_matches_bruteforce(ray_session):
    import re
    from spider_ray.pipelines.textops import doc_frequency, tfidf_topk

    texts = [
        "apple banana apple cherry",
        "banana banana date",
        "cherry date elderberry fig grape",
        "apple apple apple",
        "",
    ]
    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    df_tbl = pa.concat_tables(ray.get(doc_frequency(_ds(tbl)).to_arrow_refs()))
    out = (
        tfidf_topk(_ds(tbl), n_docs=n, df_table=df_tbl, k=2)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )

    df = Counter()
    for t in texts:
        df.update(set(re.findall(r"[a-z0-9]+", t.lower())))
    for doc_id, t in enumerate(texts):
        tf = Counter(re.findall(r"[a-z0-9]+", t.lower()))
        scored = sorted(
            ((-(c * n * 1_000_000 // df[w]), w, c) for w, c in tf.items())
        )[:2]
        got = out[out["doc_id"] == doc_id]
        assert got["token"].tolist() == [w for _, w, _ in scored]
        assert got["score"].tolist() == [-s for s, _, _ in scored]
        assert got["rank"].tolist() == list(range(1, len(scored) + 1))


def test_triangle_count_known_graphs(ray_session):
    import pandas as pd

    from spider_ray.pipelines.graph import triangle_count

    def tc(edges):
        ds = ray.data.from_pandas(
            pd.DataFrame(
                {"src": [e[0] for e in edges], "dst": [e[1] for e in edges]}
            )
        )
        return triangle_count(ds)

    # K4: C(4,3) = 4 triangles; direction/duplicates/self-loops ignored
    k4 = [(i, j) for i in range(4) for j in range(4) if i != j]
    assert tc(k4 + [(0, 0), (1, 1)]) == 4
    # 5-cycle: none
    assert tc([(i, (i + 1) % 5) for i in range(5)]) == 0
    # two triangles sharing an edge
    assert tc([(0, 1), (1, 2), (2, 0), (1, 3), (3, 2)]) == 2


def test_triangle_count_matches_bruteforce(ray_session):
    from itertools import combinations

    import numpy as np
    import pandas as pd

    from spider_ray.pipelines.graph import triangle_count

    rng = np.random.default_rng(7)
    n = 40
    src, dst = [], []
    for i, j in combinations(range(n), 2):
        if rng.random() < 0.15:
            src.append(i)
            dst.append(j)
    adj = {(a, b) for a, b in zip(src, dst)}
    expected = sum(
        1
        for a, b, c in combinations(range(n), 3)
        if (a, b) in adj and (b, c) in adj and (a, c) in adj
    )
    ds = ray.data.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    assert triangle_count(ds) == expected


def test_triangle_count_rejects_wide_ids(ray_session):
    import pandas as pd
    import pytest as _pytest

    from spider_ray.pipelines.graph import triangle_count

    ds = ray.data.from_pandas(
        pd.DataFrame({"src": [1 << 33], "dst": [2]})
    )
    with _pytest.raises(Exception, match="2\\^32"):
        triangle_count(ds)


def test_triangle_count_degenerate_inputs(ray_session):
    import pandas as pd

    from spider_ray.pipelines.graph import triangle_count

    assert triangle_count(
        ray.data.from_pandas(pd.DataFrame({"src": [1], "dst": [2]}))
    ) == 0
    # self-loops only -> empty undirected set (empty-schema guard)
    assert triangle_count(
        ray.data.from_pandas(pd.DataFrame({"src": [3, 4], "dst": [3, 4]}))
    ) == 0


def test_graph_stats_degenerate_inputs(ray_session):
    import pandas as pd

    from spider_ray.pipelines.graph import (
        degree_assortativity_sums,
        global_clustering,
    )

    loops = ray.data.from_pandas(pd.DataFrame({"src": [3, 4], "dst": [3, 4]}))
    assert global_clustering(loops) == (0, 0)
    assert degree_assortativity_sums(loops) == {
        "m": 0, "sx": 0, "sy": 0, "sxy": 0, "sxx": 0, "syy": 0,
    }
    one = ray.data.from_pandas(pd.DataFrame({"src": [1], "dst": [2]}))
    tri, triples = global_clustering(one)
    assert (tri, triples) == (0, 0)
    s = degree_assortativity_sums(one)
    assert s["m"] == 2 and s["sx"] == s["sy"] == 2
