"""Training-data operator tests over the driver testdata tables."""

import numpy as np
import pyarrow.parquet as pq
import pytest

import ray

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def docs_ds(ray_session):
    return ray.data.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture()
def emb_ds(ray_session):
    return ray.data.read_parquet(f"{SF}/embeddings.parquet")


def test_exact_dedup_matches_pandas(docs_ds):
    from spider_ray.pipelines.dedup import exact_dedup

    out = exact_dedup(docs_ds).to_pandas()
    raw = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    expected = raw.sort_values("doc_id").drop_duplicates("text", keep="first")
    assert sorted(out["doc_id"]) == sorted(expected["doc_id"])


def test_minhash_lsh_finds_exact_dupes(docs_ds):
    from spider_ray.pipelines.dedup import minhash_lsh_pairs

    raw = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    pairs = minhash_lsh_pairs(docs_ds, verify_threshold=0.99).to_pandas()
    # every exact-duplicate text pair must be found (jaccard 1.0)
    dup_groups = raw.groupby("text")["doc_id"].apply(list)
    expected_pairs = set()
    for ids in dup_groups:
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                expected_pairs.add((ids[i], ids[j]))
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    missing = expected_pairs - got
    assert not missing, f"minhash missed exact dupes: {sorted(missing)[:5]}"


def test_simhash_finds_exact_dupes(docs_ds):
    from spider_ray.pipelines.dedup import simhash_pairs

    raw = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    pairs = simhash_pairs(docs_ds).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    dup_groups = raw.groupby("text")["doc_id"].apply(list)
    for ids in dup_groups:
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                assert (ids[i], ids[j]) in got
    # all reported pairs have hamming ≤ 3
    assert (pairs["hamming"] <= 3).all()


def test_embedding_neardup_recovers_self_similarity(emb_ds, ray_session):
    from spider_ray.pipelines.dedup import embedding_neardup_pairs

    raw = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    # append a perturbed copy of vec 0 → a known near-dup pair
    import pandas as pd

    v0 = np.array(raw.iloc[0]["embedding"], dtype=np.float32)
    clone = v0 + 0.001
    extra = pd.DataFrame(
        {"vec_id": [999999], "embedding": [clone.tolist()], "label": [0]}
    )
    ds = ray.data.from_pandas(pd.concat([raw, extra], ignore_index=True))
    pairs = embedding_neardup_pairs(ds, threshold=0.999).to_pandas()
    assert ((pairs["id_a"] == 0) & (pairs["id_b"] == 999999)).any()


def test_minhash_hot_bucket_is_linear(ray_session):
    """1000 identical docs → one maximally hot LSH bucket in every band.
    The capped pair generator must emit the O(n) chain (cluster stays
    connected), not C(1000,2)≈500k pairs."""
    import pandas as pd

    import pyarrow as pa

    from spider_ray.pipelines.dedup import minhash_lsh_pairs

    n = 1000
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(n)), "text": ["same boilerplate text"] * n})
    )
    pairs = minhash_lsh_pairs(ds, verify_threshold=0.99).to_pandas()
    # chain connectivity: union-find over pairs must yield ONE cluster
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        parent[find(int(a))] = find(int(b))
    assert len({find(i) for i in range(n)}) == 1
    assert len(pairs) <= 4 * n, f"hot bucket exploded: {len(pairs)} pairs"
    assert (pairs["jaccard"] == 1.0).all()


def test_simhash_hot_bucket_is_linear(ray_session):
    import pyarrow as pa

    from spider_ray.pipelines.dedup import simhash_pairs

    n = 500
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(n)), "text": ["same boilerplate text"] * n})
    )
    pairs = simhash_pairs(ds).to_pandas()
    assert len(pairs) <= 4 * n
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    # the id-sorted chain is present → cluster connected
    assert all((i, i + 1) in got for i in range(n - 1))


def test_embedding_neardup_planted_and_hot_bucket(ray_session):
    """Planted exact copies are always recovered; a pathological
    all-identical input stays O(n) via the chain fallback."""
    import pandas as pd

    from spider_ray.pipelines.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(5)
    base = rng.standard_normal((300, 16))
    ids = list(range(300)) + [10_000 + i for i in range(0, 300, 25)]
    vecs = [v for v in base] + [base[i] for i in range(0, 300, 25)]
    ds = ray.data.from_pandas(
        pd.DataFrame({"vec_id": ids, "embedding": [v.tolist() for v in vecs]})
    )
    pairs = embedding_neardup_pairs(ds, threshold=0.999).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    for i in range(0, 300, 25):
        assert (i, 10_000 + i) in got, f"planted dup {i} missing"
    # hot bucket: 2000 identical vectors
    n = 2000
    same = pd.DataFrame(
        {"vec_id": list(range(n)), "embedding": [[1.0, 2.0, 3.0, 4.0]] * n}
    )
    hot = embedding_neardup_pairs(
        ray.data.from_pandas(same), threshold=0.99, max_bucket=256
    ).to_pandas()
    assert len(hot) <= 4 * n, f"identical-vector bucket exploded: {len(hot)}"
    got = set(zip(hot["id_a"], hot["id_b"]))
    assert all((i, i + 1) in got for i in range(n - 1))  # chain connectivity


def test_brute_force_topk_matches_numpy(emb_ds):
    from spider_ray.pipelines.ann import brute_force_topk

    raw = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    mat = np.stack(raw["embedding"].to_numpy()).astype(np.float64)
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    q = matn[0]
    sims = matn @ q
    order = np.lexsort((raw["vec_id"].to_numpy(), -sims))[:10]
    expected = raw["vec_id"].to_numpy()[order].tolist()

    out = brute_force_topk(emb_ds, mat[0], k=10).to_pandas()
    assert out[out["query_id"] == 0].sort_values("rank")["vec_id"].tolist() == expected


def test_ivf_topk_recall_and_physical_pruning(emb_ds, tmp_path):
    """VERDICT r2 next #4: the IVF index must PHYSICALLY prune I/O — the
    probed-cell row count (what actually gets read) must be a strict
    subset of the corpus — while holding a recall bound vs brute force."""
    from spider_ray.pipelines.ann import IvfIndex, brute_force_topk, build_ivf_index

    raw = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    mat = np.stack(raw["embedding"].to_numpy()).astype(np.float64)
    queries = mat[:5]
    exact = brute_force_topk(emb_ds, queries, k=10).to_pandas()

    index = build_ivf_index(emb_ds, str(tmp_path / "ivf"), n_cells=8)
    assert index.total_rows == len(raw)
    # reload from disk — the layout is the contract, not the object
    index = IvfIndex(str(tmp_path / "ivf"))
    approx_tbl, stats = index.topk(queries, k=10, n_probe=4)
    approx = approx_tbl.to_pandas()

    # physical pruning: probed cells hold strictly fewer rows than the
    # corpus, and no more than ~2x the ideal n_probe/n_cells fraction
    # (cells are unevenly sized); the union covers 5 queries
    assert 0 < stats["scanned_rows"] < stats["total_rows"]
    assert stats["cells_probed"] < stats["n_cells"]

    recalls = []
    for q in range(5):
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6, recalls


def test_ivf_single_query_scans_probe_fraction(emb_ds, tmp_path):
    """With ONE query the scanned fraction must not exceed the probed
    share of cells by more than skew allows."""
    from spider_ray.pipelines.ann import build_ivf_index

    raw = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    mat = np.stack(raw["embedding"].to_numpy()).astype(np.float64)
    index = build_ivf_index(emb_ds, str(tmp_path / "ivf1"), n_cells=16)
    _, stats = index.topk(mat[:1], k=10, n_probe=4)
    frac = stats["scanned_rows"] / stats["total_rows"]
    assert stats["cells_probed"] <= 4
    assert frac < 0.75, frac  # 4/16 ideal; generous skew allowance


def test_phash_band_pairs_find_reencodes(ray_session):
    import numpy as np
    import pyarrow as pa

    from spider_ray.functions.imagecodec import decode_image, encode_image, phash64
    from spider_ray.pipelines.dedup import hash_band_pairs
    from spider_ray.sources.fixtures import MockWebConfig, image_pixels

    from spider_ray.pipelines.dedup import _to_i64

    cfg = MockWebConfig(n_pages=100)
    rows = []
    for i in range(0, 50, 5):
        pixels = image_pixels(i, cfg)
        for fmt in ("png", "jpeg"):
            ph = phash64(decode_image(encode_image(pixels, fmt)))
            rows.append({"image_id": f"img-{i}-{fmt}", "phash": _to_i64(ph)})
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    pairs = hash_band_pairs(ds, "phash", "image_id", max_hamming=3).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    for i in range(0, 50, 5):
        pair = tuple(sorted([f"img-{i}-png", f"img-{i}-jpeg"]))
        assert pair in got, f"re-encode pair missing for {i}"
    assert (pairs["hamming"] <= 3).all()


def test_text_analysis_pipeline(docs_ds):
    from spider_ray.pipelines.textops import analyze

    out = analyze(docs_ds).to_pandas()
    assert {"n_tokens", "lang_pred", "quality", "fingerprint", "n_words"} <= set(out.columns)
    raw = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    row = out[out["doc_id"] == 0].iloc[0]
    assert row["n_tokens"] == len(raw.iloc[0]["text"].split())
    assert 0.0 <= row["quality"] <= 1.0


def test_image_stages(ray_session):
    import pyarrow as pa

    from spider_ray.sources.fixtures import MockWeb, MockWebConfig
    from spider_ray.stages.images import DecodeStats, ImageEmbed, Resize

    cfg = MockWebConfig(n_pages=40)
    web = MockWeb(cfg)
    rows = [web.expected_image_row(i) for i in range(0, 40, 5)]
    table = pa.Table.from_pylist(rows)
    ds = ray.data.from_arrow(table)
    out = (
        ds.map_batches(DecodeStats, batch_size=4, concurrency=2, batch_format="pyarrow")
        .map_batches(Resize, fn_constructor_kwargs={"out_h": 8, "out_w": 8},
                     batch_size=4, concurrency=2, batch_format="pyarrow")
        .map_batches(ImageEmbed, batch_size=4, concurrency=2, batch_format="pyarrow")
        .to_pandas()
    )
    assert (out["dec_w"] == cfg.img_size).all()
    assert out["dec_fmt"].isin(["png", "jpeg"]).all()
    assert out["thumb_bytes"].notna().all()
    assert all(len(v) == ImageEmbed.DIM for v in out["img_embedding"])
    # decode-stats phash equals the stored phash (same decoded pixels)
    assert (out["dec_phash"] == out["phash"]).all()


def test_dedup_against_reference_drops_seen_hashes(ray_session):
    import pyarrow as pa
    import ray

    from spider_ray.pipelines.dedup import dedup_against_reference

    tbl = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "content_md5": pa.array(
                ["a", "b", "c", "a", None, "d"], pa.string()
            ),
        }
    )
    out = (
        dedup_against_reference(ray.data.from_arrow(tbl), ["a", "c"])
        .to_pandas()
        .sort_values("doc_id")
    )
    # 'a' (twice) and 'c' dropped; NULL hash is kept (never matches)
    assert out["doc_id"].tolist() == [1, 4, 5]


def test_dedup_against_reference_sharded_matches_broadcast(ray_session):
    """Force broadcast_limit=0 so the sharded seen-actor plan runs; the
    keep-set must equal the broadcast plan's, for both array-form and
    Dataset-form references (full md5-hex keys, realistic prefixes)."""
    import hashlib as _hl

    import pyarrow as pa
    import ray

    from spider_ray.pipelines.dedup import dedup_against_reference

    all_hashes = [_hl.md5(str(i).encode()).hexdigest() for i in range(300)]
    ref_list = all_hashes[:120]  # first 120 already in the "lake"
    tbl = pa.table(
        {
            "doc_id": pa.array(range(300), pa.int64()),
            "content_md5": pa.array(all_hashes, pa.string()),
        }
    )
    new_ds = ray.data.from_arrow(tbl).repartition(5)
    expected = sorted(range(120, 300))

    broadcast = dedup_against_reference(new_ds, ref_list).to_pandas()
    assert sorted(broadcast["doc_id"]) == expected

    sharded = dedup_against_reference(
        new_ds, ref_list, broadcast_limit=0, n_shards=3
    ).to_pandas()
    assert sorted(sharded["doc_id"]) == expected

    ref_ds = ray.data.from_arrow(
        pa.table({"content_md5": pa.array(ref_list, pa.string())})
    ).repartition(4)
    sharded_ds = dedup_against_reference(
        new_ds, ref_ds, broadcast_limit=0, n_shards=3
    ).to_pandas()
    assert sorted(sharded_ds["doc_id"]) == expected
    # Dataset reference through the broadcast plan too (small-lake case)
    broadcast_ds = dedup_against_reference(new_ds, ref_ds).to_pandas()
    assert sorted(broadcast_ds["doc_id"]) == expected


def test_ngram_counts_min_count_pruning(ray_session):
    import pyarrow as pa
    import ray
    from collections import Counter

    from spider_ray.pipelines.textops import ngram_counts

    texts = ["a b c a b", "b c a b", "x y"] * 4
    tbl = pa.table({"text": pa.array(texts, pa.string())})
    out = (
        ngram_counts(ray.data.from_arrow(tbl).repartition(3), n=2, min_count=5)
        .to_pandas()
        .set_index("ngram")["count"]
        .to_dict()
    )
    ref = Counter()
    for t in texts:
        toks = t.split()
        ref.update(" ".join(toks[i : i + 2]) for i in range(len(toks) - 1))
    expect = {k: v for k, v in ref.items() if v >= 5}
    assert out == expect


def test_neardup_keepset_distributed_matches_driver(ray_session):
    """VERDICT r2 next #2: at an inflated dup rate the distributed
    contraction path (pairs → graph.connected_components →
    semi_anti_join) must produce exactly the keep set of the driver
    union-find path."""
    import pandas as pd
    import pyarrow as pa

    from spider_ray.pipelines.cluster import drop_non_canonical
    from spider_ray.pipelines.dedup import minhash_lsh_pairs

    # 40 clusters of 5 identical docs + 100 singletons → 40×C(5,2) pairs
    texts, ids = [], []
    for c in range(40):
        for m in range(5):
            ids.append(c * 10 + m)
            texts.append(f"cluster {c} boilerplate text repeated enough to shingle")
    for s in range(100):
        ids.append(10_000 + s)
        texts.append(f"unique document number {s} with its own distinct words {s*7}")
    docs = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    pairs = minhash_lsh_pairs(docs, verify_threshold=0.9).materialize()
    assert pairs.count() > 0

    corpus = ray.data.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    kept_driver = sorted(
        drop_non_canonical(corpus, pairs, driver_pair_limit=10**9).to_pandas()["doc_id"]
    )
    kept_dist = sorted(
        drop_non_canonical(corpus, pairs, driver_pair_limit=0).to_pandas()["doc_id"]
    )
    assert kept_driver == kept_dist
    # every cluster keeps exactly its min id; singletons all survive
    expected = sorted([c * 10 for c in range(40)] + [10_000 + s for s in range(100)])
    assert kept_dist == expected


def test_nonsingleton_pairs_invariant_to_bucket_count(ray_session):
    """The single-exchange bucket plan yields the same pair set at any
    ``n_buckets`` (same key ⇒ same bucket, so the ≥2 filter and pairs_of
    see every group whole), including n_buckets=1 (everything co-located)
    and more buckets than keys."""
    import pandas as pd
    import pyarrow as pa

    from spider_ray.pipelines.dedup import _nonsingleton_group_pairs

    rows = pa.table(
        {
            "band_id": pa.array([0, 0, 0, 1, 1, 1, 1, 2], pa.int32()),
            "band_hash": pa.array(["a", "a", "b", "c", "c", "c", "d", "e"]),
            "doc_id": pa.array([1, 2, 3, 4, 5, 6, 7, 8], pa.int64()),
        }
    )
    schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])

    def pairs_of(group):
        s = sorted(set(group["doc_id"].tolist()))
        if len(s) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        import numpy as np

        ia, ib = np.triu_indices(len(s), k=1)
        return pd.DataFrame({"id_a": [s[i] for i in ia], "id_b": [s[i] for i in ib]})

    ds = ray.data.from_arrow(rows).repartition(3)
    want = {(1, 2), (4, 5), (4, 6), (5, 6)}
    for n_buckets in (1, 3, 64):
        got = _nonsingleton_group_pairs(
            ds, ["band_id", "band_hash"], pairs_of, schema, n_buckets=n_buckets
        ).to_pandas()
        assert set(zip(got["id_a"], got["id_b"])) == want


def test_nonsingleton_pairs_invariant_to_input_blocking(ray_session):
    """Same rows, different input block splits ⇒ same pair set.

    Regression for the pandas categorize/NUL pitfall: the bucket tag joins
    key columns with "\\0" and pd.factorize truncates object strings at the
    first NUL, so with categorize=True the same (band_id, band_val) key got
    a batch-dependent bucket — groups straddling batches split and their
    pairs vanished. Keys here are chosen so several share a pre-NUL prefix
    ("0" + NUL + ...) and each group's members land in different input
    blocks."""
    import pandas as pd
    import pyarrow as pa

    from spider_ray.pipelines.dedup import _nonsingleton_group_pairs

    # 30 groups of 2 members; member i of group g sits at row g + i*30 so
    # any contiguous split separates the two members of every group
    n_groups = 30
    band_id = pa.array([0] * (2 * n_groups), pa.int32())
    band_val = pa.array(list(range(n_groups)) * 2, pa.int32())
    doc_id = pa.array(
        [g * 2 for g in range(n_groups)] + [g * 2 + 1 for g in range(n_groups)],
        pa.int64(),
    )
    rows = pa.table({"band_id": band_id, "band_val": band_val, "doc_id": doc_id})
    schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])

    def pairs_of(group):
        s = sorted(set(group["doc_id"].tolist()))
        if len(s) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        import numpy as np

        ia, ib = np.triu_indices(len(s), k=1)
        return pd.DataFrame({"id_a": [s[i] for i in ia], "id_b": [s[i] for i in ib]})

    want = {(g * 2, g * 2 + 1) for g in range(n_groups)}
    for nblocks in (1, 4, 10):
        ds = ray.data.from_arrow(rows).repartition(nblocks)
        got = _nonsingleton_group_pairs(
            ds, ["band_id", "band_val"], pairs_of, schema
        ).to_pandas()
        assert set(zip(got["id_a"], got["id_b"])) == want, nblocks


def test_simhash_paths_bit_identical():
    """The small-vocab count-matmul path and the gather/cumsum path must
    produce identical hashes; single-text calls always take the matmul
    path, a high-vocab batch takes the gather path."""
    import numpy as np

    from spider_ray.pipelines.dedup import simhash64_batch

    rng = np.random.default_rng(11)
    synth = [
        " ".join(f"w{rng.integers(0, 50_000)}" for _ in range(60))
        for _ in range(200)
    ]
    via_batch = simhash64_batch(synth)  # vocab≈12k vs 12k tokens → gather path
    singles = np.array(
        [simhash64_batch([s])[0] for s in synth], dtype=np.uint64
    )  # 60-token texts → matmul path
    assert (via_batch == singles).all()
    # chunk invariance across the greedy splitter
    thirds = np.concatenate(
        [simhash64_batch(synth[i : i + 67]) for i in range(0, len(synth), 67)]
    )
    assert (via_batch == thirds).all()


def test_duplicate_window_stats_edges(ray_session):
    """Docs shorter than k report (0,0); within-doc window repeats count
    once; a window shared by two docs is duplicated for both."""
    import ray.data as rd

    from spider_ray.pipelines.dedup import duplicate_window_stats

    shared = "a b c d e f g h"           # one 8-token window
    rows = [
        {"doc_id": 1, "text": shared + " x y z"},       # windows incl. shared
        {"doc_id": 2, "text": "p q " + shared},         # shares that window
        {"doc_id": 3, "text": "too short"},             # < k tokens -> (0,0)
        {"doc_id": 4, "text": shared + " " + shared},   # self-repeat only
        {"doc_id": 5, "text": "u v w x y z aa bb cc"},  # unique windows
    ]
    out = (
        duplicate_window_stats(rd.from_items(rows), k=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[3].tolist() == [0, 0]
    # doc1: tokens=11 -> 4 windows, doc2: 10 -> 3 windows, all distinct
    assert out.loc[1, "n_windows"] == 4 and out.loc[2, "n_windows"] == 3
    # the shared window is duplicated for 1, 2 AND 4 (4 contains it too)
    assert out.loc[1, "n_dup_windows"] >= 1
    assert out.loc[2, "n_dup_windows"] >= 1
    # doc4 = shared+shared: 17 tokens -> 10 positions, self-repeats collapse
    assert out.loc[4, "n_windows"] < 10
    assert out.loc[5].tolist() == [2, 0]


def test_nonsingleton_rows_filter(ray_session):
    import ray.data as rd

    from spider_ray.pipelines.dedup import _nonsingleton_rows

    rows = [{"k": i % 3, "v": i} for i in range(9)] + [{"k": 99, "v": 100}]
    kept = _nonsingleton_rows(rd.from_items(rows), ["k"]).to_pandas()
    assert len(kept) == 9 and 99 not in set(kept["k"])


def test_edit_distance_pairs_matches_bruteforce(ray_session):
    from spider_ray.pipelines.dedup import _lev_le, edit_distance_pairs

    ds = ray.data.read_parquet(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    out = (
        edit_distance_pairs(ds, id_col="c_custkey", str_col="c_name", max_d=1)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    raw = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    names = dict(zip(raw["c_custkey"], raw["c_name"]))
    keys = sorted(names)
    expected = [
        (a, b, _lev_le(names[a], names[b], 1))
        for i, a in enumerate(keys)
        for b in keys[i + 1 :]
        if _lev_le(names[a], names[b], 1) <= 1
    ]
    got = list(zip(out["id_a"], out["id_b"], out["dist"]))
    assert got == expected


def test_edit_distance_pairs_bucketed_join_path(ray_session):
    """Force the large-candidate path (driver_cand_limit=0) and check it
    matches the driver semi-join fast path, including insert/delete pairs."""
    import pandas as pd

    from spider_ray.pipelines.dedup import edit_distance_pairs

    rows = pd.DataFrame(
        {
            "doc_id": list(range(8)),
            "text": [
                "alpha", "alpah", "alpha1", "alph",
                "beta", "betta", "", "x",
            ],
        }
    )
    ds = ray.data.from_pandas(rows)
    fast = (
        edit_distance_pairs(ds, max_d=1)
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )
    forced = (
        edit_distance_pairs(ds, max_d=1, driver_cand_limit=0)
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )
    assert fast.values.tolist() == forced.values.tolist()
    got = set(zip(fast["id_a"], fast["id_b"], fast["dist"]))
    assert (0, 2, 1) in got  # insertion
    assert (0, 3, 1) in got  # deletion
    assert (4, 5, 1) in got  # insertion mid-word
    # the empty string (id 6) is within distance 1 only of 1-char strings:
    # its sole pair is with "x" (id 7)
    assert (6, 7, 1) in got
    assert not any(
        (a == 6 or b == 6) and {a, b} != {6, 7} for a, b, _ in got
    )


def test_edit_distance_pairs_empty_and_d2(ray_session):
    import pandas as pd

    from spider_ray.pipelines.dedup import edit_distance_pairs

    lone = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [1, 2], "text": ["abcdef", "zzzzzz"]})
    )
    out = edit_distance_pairs(lone, max_d=1)
    assert out.count() == 0
    assert [f.name for f in out.schema().base_schema] == [
        "id_a", "id_b", "dist",
    ]

    d2 = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["abcdef", "abXYef", "abcdef!?"]})
    )
    got = sorted(
        edit_distance_pairs(d2, max_d=2).to_pandas().itertuples(index=False)
    )
    assert [(r[0], r[1], r[2]) for r in got] == [(1, 2, 2), (1, 3, 2)]


def test_pq_recall_vs_bruteforce(ray_session, emb_ds):
    """PQ ADC top-10 must recover most of the exact cosine top-10, and
    beat what a degenerate 1-code codebook could (sanity floor)."""
    import numpy as np

    from spider_ray.pipelines.ann import (
        brute_force_topk,
        pq_encode,
        pq_topk,
        pq_train,
    )

    # the sf0.001 embeddings are iid-random (no cluster structure), the
    # hardest case for PQ set-recall; m=16 x 32 codes is deterministic
    # (fixed-point k-means) and lands at 0.62 mean recall@10
    books = pq_train(emb_ds, m=16, n_codes=32, n_iter=6)
    assert books.shape == (16, 32, 4)
    codes = pq_encode(emb_ds, books).materialize()
    raw = emb_ds.take_all()
    queries = np.stack(
        [np.asarray(r["embedding"], np.float64) for r in raw[:5]]
    )
    exact = brute_force_topk(emb_ds, queries, k=10).to_pandas()
    approx = pq_topk(codes, books, queries, k=10).to_pandas()
    recalls = []
    for q in range(5):
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.5, recalls
    # self-match: each query vector is row q of the dataset; PQ must put
    # it in its own top-10
    for q in range(5):
        a = approx[approx["query_id"] == q]
        assert raw[q]["vec_id"] in set(a["vec_id"])


def test_pq_encode_deterministic_across_blocking(ray_session, emb_ds):
    from spider_ray.pipelines.ann import pq_encode, pq_train

    books = pq_train(emb_ds, m=4, n_codes=8, n_iter=3)
    one = pq_encode(emb_ds, books).to_pandas().sort_values("vec_id")
    re = pq_encode(emb_ds.repartition(7), books).to_pandas().sort_values("vec_id")
    assert [list(c) for c in one["pq_code"]] == [list(c) for c in re["pq_code"]]


def test_minhash_batch_signatures_match_perdoc():
    """The batched reduceat signature path is bit-identical to the
    per-doc matmul path (incl. short-doc padding and empty text)."""
    import numpy as np

    from spider_ray.pipelines.dedup import (
        MinHasher,
        _mix64,
        shingle_hashes,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "abc",          # shorter than k -> padded single shingle
        "",             # empty -> padded single shingle
        "aaaaaaaaaaaa",  # heavy duplicate shingles
        "the quick brown fox jumps over the lazy dog!",
    ]
    k = 5
    hasher = MinHasher(num_perm=64)
    expected = np.stack(
        [hasher.signature(shingle_hashes(t, k)) for t in texts]
    )
    # batch path: replicate minhash_band_rows' concat construction
    enc = []
    for t in texts:
        raw = t.encode()
        if len(raw) < k:
            raw = raw + b"\0" * (k - len(raw))
        enc.append(raw)
    lens = np.array([len(e) for e in enc])
    offs = np.concatenate([[0], np.cumsum(lens)])
    data = np.frombuffer(b"".join(enc), dtype=np.uint8)
    pw = [1]
    for _ in range(k - 1):
        pw.append((pw[-1] * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF)
    powers = np.array(pw[::-1], dtype=np.uint64)
    windows = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
    hashed = _mix64(windows @ powers)
    n_sh = lens - k + 1
    valid = np.concatenate(
        [np.arange(offs[j], offs[j] + n_sh[j]) for j in range(len(texts))]
    )
    starts = np.concatenate([[0], np.cumsum(n_sh)[:-1]])
    got = hasher.signatures_batch(hashed[valid], starts)
    assert np.array_equal(got, expected)


def test_ivfpq_recall_pruning_and_compression(ray_session, emb_ds, tmp_path):
    """IVF-PQ: probed-path reads are pruned AND compressed (m bytes per
    vector, no raw floats in the index files); recall holds vs brute
    force at full probe."""
    import os

    import numpy as np

    from spider_ray.pipelines.ann import (
        IvfPqIndex,
        brute_force_topk,
        build_ivfpq_index,
    )

    raw = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    mat = np.stack(raw["embedding"].to_numpy()).astype(np.float64)
    queries = mat[:5]
    exact = brute_force_topk(emb_ds, queries, k=10).to_pandas()

    index = build_ivfpq_index(
        emb_ds, str(tmp_path / "ivfpq"), n_cells=8, m=16, n_codes=32
    )
    # reload from disk — the layout is the contract
    index = IvfPqIndex(str(tmp_path / "ivfpq"))
    assert index.total_rows == len(raw)

    # no raw vectors in the cell files
    cell_dirs = os.listdir(str(tmp_path / "ivfpq" / "cells"))
    f = next(
        os.path.join(str(tmp_path / "ivfpq" / "cells"), d, p)
        for d in cell_dirs
        for p in os.listdir(os.path.join(str(tmp_path / "ivfpq" / "cells"), d))
        if p.endswith(".parquet")
    )
    cols = pq.read_schema(f).names
    assert "embedding" not in cols and "pq_code" in cols

    # partial probe physically prunes
    _, stats = index.topk(queries, k=10, n_probe=3)
    assert 0 < stats["scanned_rows"] < stats["total_rows"]
    assert stats["bytes_per_vec"] == 16

    # full probe ≈ plain PQ: decent recall on iid-random vectors
    approx, stats_full = index.topk(queries, k=10, n_probe=8)
    assert stats_full["scanned_rows"] == stats_full["total_rows"]
    approx = approx.to_pandas()
    recalls = []
    for q in range(5):
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.4, recalls
    # self-match at full probe
    for q in range(5):
        assert raw.iloc[q]["vec_id"] in set(
            approx[approx["query_id"] == q]["vec_id"]
        )


def test_minhash_band_rows_chunk_invariant():
    """Band rows are identical whether the block fits one byte-budget
    segment or is forced through many (monkeypatched tiny budget)."""
    import pyarrow as pa

    import spider_ray.pipelines.dedup as D

    texts = ["doc %d " % i + "lorem ipsum dolor sit amet " * (i % 7 + 1)
             for i in range(40)]
    batch = pa.table({"doc_id": list(range(40)), "text": texts})
    hasher = D.MinHasher(num_perm=64)
    one = D.minhash_band_rows(batch, hasher)
    # different segment boundaries via block slicing — same per-doc values
    parts = [
        D.minhash_band_rows(batch.slice(i, 8), hasher) for i in range(0, 40, 8)
    ]
    many = pa.concat_tables(parts)
    assert one.column("band_hash").to_pylist() == many.column("band_hash").to_pylist()
    assert one.column("doc_id").to_pylist() == many.column("doc_id").to_pylist()


def test_minhash_similarity_join_cross_side_only(ray_session):
    import pandas as pd

    from spider_ray.pipelines.dedup import minhash_similarity_join

    base = "the quick brown fox jumps over the lazy dog again and again"
    left = pd.DataFrame(
        {
            "doc_id": [10, 11, 12],
            "text": [base, "left-side only text nothing alike", base + "!"],
        }
    )
    right = pd.DataFrame(
        {
            "doc_id": [20, 21],
            "text": [base, "right side unrelated content entirely"],
        }
    )
    out = (
        minhash_similarity_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            verify_threshold=0.8,
        )
        .to_pandas()
        .sort_values(["left_id", "right_id"])
    )
    got = set(zip(out["left_id"], out["right_id"]))
    # both near-identical left docs match the right copy; ids decode to
    # the ORIGINAL key spaces and every pair is cross-side
    assert got == {(10, 20), (12, 20)}
    assert (out["jaccard"] >= 0.8).all()


def test_consensus_neardup_guard_and_votes(ray_session):
    import pandas as pd

    from spider_ray.pipelines.dedup import consensus_neardup_pairs

    df = pd.DataFrame(
        {
            "image_id": ["a", "b", "c"],
            # a~b: identical in all three hashes; a~c: close in one only
            "h1": [10, 10, 10],
            "h2": [7, 7, 1 << 40],
            "h3": [99, 99, 1 << 50],
        }
    )
    ds = ray.data.from_pandas(df)
    out = (
        consensus_neardup_pairs(ds, ["h1", "h2", "h3"], max_hamming=3)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
    )
    got = {(a, b): v for a, b, v in zip(out["id_a"], out["id_b"], out["votes"])}
    assert got == {("a", "b"): 3}  # one-vote pairs (a,c)/(b,c) excluded
    with pytest.raises(ValueError, match="max_hamming"):
        consensus_neardup_pairs(ds, ["h1"], max_hamming=4)


def test_chain_fallback_logs_once():
    """When a bucket exceeds MAX_BUCKET_ALL_PAIRS the degradation to
    chain pairs must be surfaced via a log line (once per process) so
    exactness loss is interpretable in oracle comparisons (ADVICE r3)."""
    import logging

    from spider_ray.pipelines import dedup as dd

    dd._chain_fallback_logged = False
    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    h = Capture()
    logger = logging.getLogger("spider_ray.pipelines.dedup")
    logger.addHandler(h)
    try:
        dd._bucket_pair_indices(dd.MAX_BUCKET_ALL_PAIRS)  # below cap: silent
        assert records == []
        dd._bucket_pair_indices(dd.MAX_BUCKET_ALL_PAIRS + 1)
        dd._bucket_pair_indices(dd.MAX_BUCKET_ALL_PAIRS + 5)  # logged once
        assert len(records) == 1 and "chain pairs" in records[0]
    finally:
        logger.removeHandler(h)
        dd._chain_fallback_logged = False


def test_ivf_quantizer_sample_unbiased_on_sorted_layout(ray_session, tmp_path):
    """VERDICT r3 next #5: quantizer training must hash-thin uniformly.
    On a cluster-sorted layout (all of cluster 0 first — the 100-TB
    sorted/clustered parquet case) a head sample (the old
    ``ds.limit(n)``) sees ONE cluster; the uniform sample must span
    (nearly) all of them, and the built index must hold recall for
    queries from every cluster."""
    import pandas as pd
    import ray

    from spider_ray.pipelines.ann import (
        _uniform_sample_matrix,
        brute_force_topk,
        build_ivf_index,
    )

    rng = np.random.default_rng(11)
    n_clusters, per, d = 8, 300, 16
    centers = np.eye(n_clusters, d) * 10.0
    mats, labels = [], []
    for c in range(n_clusters):  # cluster-sorted: all of c before c+1
        mats.append(centers[c] + rng.normal(0, 0.05, (per, d)))
        labels.extend([c] * per)
    mat = np.vstack(mats)
    n = len(mat)
    df = pd.DataFrame(
        {"vec_id": range(n), "embedding": [row for row in mat]}
    )
    ds = ray.data.from_pandas(df).repartition(16)

    sample_size = 256  # ≈ one cluster — head sampling sees ONLY cluster 0
    head = np.stack(df["embedding"].to_numpy()[:sample_size])
    head_clusters = set(np.argmax(head @ centers.T, axis=1).tolist())
    assert head_clusters == {0}, "fixture no longer demonstrates head bias"

    sample = _uniform_sample_matrix(ds, "vec_id", "embedding", sample_size)
    seen = set(np.argmax(sample @ centers.T, axis=1).tolist())
    assert len(seen) >= n_clusters - 1, f"uniform sample spans {seen}"

    queries = centers + rng.normal(0, 0.05, (n_clusters, d))
    exact = brute_force_topk(ds, queries, k=10).to_pandas()
    index = build_ivf_index(
        ds, str(tmp_path / "ivf_sorted"), n_cells=8, sample_size=sample_size
    )
    approx, stats = index.topk(queries[:4], k=10, n_probe=2)
    approx = approx.to_pandas()
    assert 0 < stats["scanned_rows"] < stats["total_rows"]
    recalls = []
    for q in range(4):
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.9, recalls
