"""Day-2 recrawl diff: change detection between two crawl runs."""

import pyarrow as pa
import ray

from spider_ray.pipelines.crawl import CrawlConfig, run_crawl
from spider_ray.pipelines.recrawl import recrawl_diff
from spider_ray.sources.fixtures import MockWebConfig, seed_urls


def _crawl(tmp_path, name, cfg):
    config = CrawlConfig(
        out_dir=str(tmp_path / name), seeds=seed_urls(cfg, every=20),
        web=cfg, wave_k=10_000, exact_seen=True, fetch_concurrency=2,
    )
    run_crawl(config)
    return config.out_dir


def _collect(ds) -> dict:
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    return dict(zip(t.column("url").to_pylist(), t.column("change_type").to_pylist()))


def test_recrawl_diff_changed_unchanged(ray_session, tmp_path):
    """Same universe, bumped content version: exactly the i%10==0 pages
    are 'changed'; every other page and every image is 'unchanged'."""
    base = dict(n_pages=60, n_hosts=7, img_every=5)
    old = _crawl(tmp_path, "v0", MockWebConfig(**base))
    new = _crawl(tmp_path, "v1", MockWebConfig(**base, content_version=1))
    got = _collect(recrawl_diff(old, new))
    assert got, "diff produced nothing"
    assert set(got.values()) <= {"changed", "unchanged"}
    for url, kind in got.items():
        if "/p/" in url:
            i = int(url.rsplit("/", 1)[1])
            assert kind == ("changed" if i % 10 == 0 else "unchanged"), url
        else:
            assert kind == "unchanged", url  # image bytes identical
    assert sum(k == "changed" for k in got.values()) > 0


def test_recrawl_diff_disjoint_runs(ray_session, tmp_path):
    """Fully disjoint URL sets: every join bucket is one-sided, which
    types the absent side's columns as `null` in some block layouts —
    the classify stage must survive that (regression: coalesce had no
    (null, string) kernel)."""
    import os

    import pyarrow.parquet as pq_mod

    for name, urls in (("old", ["http://a.test/1", "http://a.test/2"]),
                       ("new", ["http://b.test/9"])):
        d = tmp_path / name / "documents" / "epoch=0"
        os.makedirs(d)
        pq_mod.write_table(
            pa.table({"url": pa.array(urls, pa.string()),
                      "text": pa.array(["t"] * len(urls), pa.string())}),
            str(d / "part-0.parquet"),
        )
    got = _collect(recrawl_diff(str(tmp_path / "old"), str(tmp_path / "new")))
    assert got == {
        "http://a.test/1": "removed",
        "http://a.test/2": "removed",
        "http://b.test/9": "added",
    }


def test_recrawl_diff_added_removed(ray_session, tmp_path):
    """Different universes (the BFS closure shifts with n_pages):
    added/removed must equal the exact set difference of the two runs'
    document URL sets, and the swap of sides mirrors it."""
    from spider_ray.sources.storage import EpochStore

    old = _crawl(tmp_path, "small", MockWebConfig(n_pages=40, n_hosts=7))
    new = _crawl(tmp_path, "big", MockWebConfig(n_pages=61, n_hosts=7))
    old_urls = set(EpochStore(old).read_all("documents").column("url").to_pylist())
    new_urls = set(EpochStore(new).read_all("documents").column("url").to_pylist())
    assert new_urls - old_urls  # the grown closure adds URLs; the swap
    # below covers the 'removed' direction with the same data
    got = _collect(recrawl_diff(old, new))
    assert set(got) == old_urls | new_urls
    assert {u for u, k in got.items() if k == "added"} == new_urls - old_urls
    assert {u for u, k in got.items() if k == "removed"} == old_urls - new_urls
    assert not any(k == "collision" for k in got.values())
    # swapped sides mirror added <-> removed, everything else equal
    got_rev = _collect(recrawl_diff(new, old))
    mirror = {"added": "removed", "removed": "added"}
    assert got_rev == {u: mirror.get(k, k) for u, k in got.items()}


def test_recrawl_diff_one_bucket_no_collision_class(ray_session, tmp_path):
    """Distinct URLs co-located in ONE bucket (the worst case a 64-bit
    key collision can produce) classify exactly as added+removed: the
    in-bucket merge keys on the full URL string, so the old key-join
    'collision' label is structurally impossible."""
    import os

    import pyarrow.parquet as pq_mod

    for name, rows in (
        ("old", [("http://a.test/x", "same"), ("http://a.test/y", "old")]),
        ("new", [("http://a.test/y", "new"), ("http://b.test/z", "same")]),
    ):
        d = tmp_path / name / "documents" / "epoch=0"
        os.makedirs(d)
        pq_mod.write_table(
            pa.table({"url": pa.array([r[0] for r in rows], pa.string()),
                      "text": pa.array([r[1] for r in rows], pa.string())}),
            str(d / "part-0.parquet"),
        )
    got = _collect(
        recrawl_diff(str(tmp_path / "old"), str(tmp_path / "new"), n_buckets=1)
    )
    assert got == {
        "http://a.test/x": "removed",
        "http://a.test/y": "changed",
        "http://b.test/z": "added",
    }


def test_recrawl_diff_duplicate_url_deterministic(ray_session, tmp_path):
    """A multi-epoch store can hold the same URL twice with DIFFERENT
    text. Intra-bucket row order depends on block arrival, so the diff
    must not let pandas keep='first' pick the winner — the per-URL
    representative is the lexicographically smallest md5, which is
    order-independent: both file orders classify identically."""
    import hashlib
    import os

    import pyarrow.parquet as pq_mod

    url = "http://dup.test/page"
    md5 = lambda t: hashlib.md5(t.encode()).hexdigest()  # noqa: E731
    # pick texts so min-md5 differs from the old side's fingerprint
    texts = sorted(["alpha", "bravo"], key=md5)
    old_text = texts[1]  # old holds the LARGER-md5 text
    expected = "changed"  # min-md5 of the new dups != md5(old_text)

    def write_store(name, rows_per_file):
        d = tmp_path / name / "documents" / "epoch=0"
        os.makedirs(d)
        for i, rows in enumerate(rows_per_file):
            pq_mod.write_table(
                pa.table({
                    "url": pa.array([r[0] for r in rows], pa.string()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }),
                str(d / f"part-{i}.parquet"),
            )
        return str(tmp_path / name)

    old = write_store("old", [[(url, old_text)]])
    got = {}
    for order in ("fwd", "rev"):
        files = [[(url, texts[0])], [(url, texts[1])]]
        if order == "rev":
            files.reverse()
        new = write_store(f"new_{order}", files)
        got[order] = _collect(recrawl_diff(old, new, n_buckets=1))[url]
    assert got["fwd"] == got["rev"] == expected
