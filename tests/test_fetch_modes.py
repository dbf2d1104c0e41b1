"""Pool-mode and dataset-mode crawls must produce identical results."""

from dataclasses import replace

from spider_ray.pipelines.crawl import CrawlConfig, run_crawl
from spider_ray.sources.fixtures import MockWebConfig, seed_urls
from spider_ray.sources.storage import EpochStore


def test_pool_and_dataset_modes_equivalent(ray_session, tmp_path):
    cfg = MockWebConfig(n_pages=120, n_hosts=7, img_every=5)
    base = CrawlConfig(
        out_dir=str(tmp_path / "pool"),
        seeds=seed_urls(cfg, every=30),
        web=cfg,
        wave_k=10_000,
        exact_seen=True,
        fetch_concurrency=2,
        fetch_mode="pool",
    )
    pool_res = run_crawl(base)
    ds_res = run_crawl(
        replace(base, out_dir=str(tmp_path / "dataset"), fetch_mode="dataset")
    )
    a = EpochStore(base.out_dir)
    b = EpochStore(str(tmp_path / "dataset"))
    assert a.read_all("order").to_pydict() == b.read_all("order").to_pydict()
    ia = a.read_all("images").sort_by("image_id")
    ib = b.read_all("images").sort_by("image_id")
    assert ia.equals(ib)
    assert pool_res.seen_size == ds_res.seen_size
    assert pool_res.pages_fetched == ds_res.pages_fetched
    # pages partitions may differ in file layout but not in content
    pa_ = a.read_all("pages").sort_by("url").select(["url", "status", "link_count"])
    pb_ = b.read_all("pages").sort_by("url").select(["url", "status", "link_count"])
    assert pa_.to_pydict() == pb_.to_pydict()  # values (nullability may differ)
