"""End-to-end crawl conformance: BFS-closure equality, deterministic
ordering, politeness invariance, resume-from-checkpoint equivalence, and the
per-row image gates (decoded-pixel PSNR + caption equality)."""

import numpy as np
import pyarrow.compute as pc
import pytest

from spider_ray.functions.imagecodec import decode_image, psnr
from spider_ray.pipelines.crawl import CrawlConfig, run_crawl
from spider_ray.sources.fixtures import (
    MockWeb,
    MockWebConfig,
    caption_for,
    image_pixels,
    image_url,
    out_link_ids,
    page_url,
    seed_urls,
)
from spider_ray.sources.storage import EpochStore


def bfs_oracle(cfg: MockWebConfig, seeds_every: int):
    """Independent closed-form BFS over the fixture graph: url → depth."""
    n = cfg.n_pages
    depth = {}
    level = sorted(set(i for i in range(0, n, seeds_every)))
    d = 0
    img_depth = {}
    while level:
        nxt = set()
        for i in level:
            if i in depth:
                continue
            depth[i] = d
            for j in out_link_ids(i, n):
                if j not in depth:
                    nxt.add(j)
            if i % cfg.img_every == 0 and image_url(i, cfg) not in img_depth:
                img_depth[image_url(i, cfg)] = d + 1
        level = sorted(j for j in nxt if j not in depth)
        d += 1
    urls = {page_url(i, cfg): dd for i, dd in depth.items()}
    # an image is fetched at (discovering page depth)+1 unless a page at a
    # shallower depth also links it (each image is linked only by its own page)
    urls.update(img_depth)
    return urls


@pytest.fixture(scope="module")
def small_crawl(ray_session, tmp_path_factory):
    cfg = MockWebConfig(n_pages=150, n_hosts=7, img_every=5)
    out = str(tmp_path_factory.mktemp("crawl"))
    config = CrawlConfig(
        out_dir=out,
        seeds=seed_urls(cfg, every=30),
        web=cfg,
        wave_k=10_000,
        exact_seen=True,
        use_bloom=False,
        fetch_concurrency=2,
        dedup_concurrency=2,
    )
    result = run_crawl(config)
    return cfg, config, result


def test_crawl_matches_bfs_closure(small_crawl):
    cfg, config, result = small_crawl
    store = EpochStore(config.out_dir)
    order = store.read_all("order")
    fetched = dict(
        zip(order.column("url").to_pylist(), order.column("epoch").to_pylist())
    )
    oracle = bfs_oracle(cfg, seeds_every=30)
    assert set(fetched) == set(oracle), (
        f"missing={set(oracle) - set(fetched)} extra={set(fetched) - set(oracle)}"
    )
    # wave epochs ≡ BFS depths (unbounded politeness budget)
    mismatches = {u: (fetched[u], oracle[u]) for u in oracle if fetched[u] != oracle[u]}
    assert not mismatches, mismatches
    assert result.pages_fetched == len(oracle)
    assert result.seen_size == len(oracle)


def test_crawl_order_fully_deterministic(small_crawl, tmp_path):
    cfg, config, _ = small_crawl
    from dataclasses import replace

    config2 = replace(config, out_dir=str(tmp_path / "rerun"))
    run_crawl(config2)
    a = EpochStore(config.out_dir).read_all("order").to_pydict()
    b = EpochStore(config2.out_dir).read_all("order").to_pydict()
    assert a == b


def test_within_wave_order_is_priority_then_hash(small_crawl):
    _, config, _ = small_crawl
    order = EpochStore(config.out_dir).read("order", 1)
    prio = order.column("priority").to_pylist()
    hashes = order.column("url_hash").to_pylist()
    keys = list(zip([-p for p in prio], hashes))
    assert keys == sorted(keys)


def test_images_gate_psnr_and_caption(small_crawl):
    cfg, config, result = small_crawl
    store = EpochStore(config.out_dir)
    images = store.read_all("images")
    assert images.num_rows == result.images_written > 0
    web = MockWeb(cfg)
    for row in images.to_pylist():
        i = int(row["image_id"].rsplit("/", 1)[1].split(".")[0])
        expected = web.expected_image_row(i)
        assert row["caption"] == caption_for(i, cfg)  # caption equality
        assert row["bytes"] == expected["bytes"]
        assert row["phash"] == expected["phash"]
        decoded = decode_image(row["bytes"])
        source = image_pixels(i, cfg)
        if row["fmt"] == "png":
            assert np.array_equal(decoded, source)  # lossless exact
        else:
            assert psnr(source, decoded) >= 40.0  # lossy gate


def test_politeness_cap_defers_but_preserves_seen_set(ray_session, tmp_path):
    cfg = MockWebConfig(n_pages=150, n_hosts=7, img_every=5)
    config = CrawlConfig(
        out_dir=str(tmp_path / "polite"),
        seeds=seed_urls(cfg, every=30),
        web=cfg,
        wave_k=10_000,
        max_per_host_per_wave=2,  # hot-host splitting kicks in
        max_epochs=200,
        exact_seen=True,
        fetch_concurrency=2,
    )
    result = run_crawl(config)
    oracle = bfs_oracle(cfg, seeds_every=30)
    order = EpochStore(config.out_dir).read_all("order")
    assert set(order.column("url").to_pylist()) == set(oracle)
    # budget respected: ≤2 fetches per host per epoch
    import collections

    per = collections.Counter(
        zip(order.column("epoch").to_pylist(),
            [u.split("/")[2] for u in order.column("url").to_pylist()])
    )
    assert max(per.values()) <= 2
    assert result.epochs > len(set(oracle.values()))  # deferral stretched epochs


def test_resume_equivalence(ray_session, tmp_path):
    cfg = MockWebConfig(n_pages=120, n_hosts=7)
    seeds = seed_urls(cfg, every=40)
    full_cfg = CrawlConfig(
        out_dir=str(tmp_path / "full"), seeds=seeds, web=cfg, wave_k=10_000,
        exact_seen=True, fetch_concurrency=2,
    )
    full = run_crawl(full_cfg)

    # interrupted run: stop after 2 epochs, then resume to completion
    part_cfg = CrawlConfig(
        out_dir=str(tmp_path / "part"), seeds=seeds, web=cfg, wave_k=10_000,
        exact_seen=True, fetch_concurrency=2, max_epochs=2,
    )
    run_crawl(part_cfg)
    from dataclasses import replace

    resumed = run_crawl(replace(part_cfg, max_epochs=64), resume=True)
    a = EpochStore(full_cfg.out_dir).read_all("order").to_pydict()
    b = EpochStore(part_cfg.out_dir).read_all("order").to_pydict()
    assert a == b  # identical crawl order across interrupt+resume
    assert resumed.seen_size + 0 == full.seen_size
    ia = EpochStore(full_cfg.out_dir).read_all("images")
    ib = EpochStore(part_cfg.out_dir).read_all("images")
    assert ia.sort_by("image_id").equals(ib.sort_by("image_id"))


def test_resume_with_checkpoint_interval(ray_session, tmp_path):
    """K>1 checkpointing: resume replays ≤K-1 epochs idempotently and the
    final state equals an uninterrupted run."""
    from dataclasses import replace

    cfg = MockWebConfig(n_pages=120, n_hosts=7)
    seeds = seed_urls(cfg, every=40)
    base = CrawlConfig(
        out_dir=str(tmp_path / "full"), seeds=seeds, web=cfg, wave_k=10_000,
        exact_seen=True, fetch_concurrency=2, checkpoint_interval=3,
    )
    full = run_crawl(base)
    part_cfg = replace(base, out_dir=str(tmp_path / "part"), max_epochs=4)
    run_crawl(part_cfg)
    resumed = run_crawl(replace(part_cfg, max_epochs=64), resume=True)
    a = EpochStore(base.out_dir).read_all("order").to_pydict()
    b = EpochStore(part_cfg.out_dir).read_all("order").to_pydict()
    assert a == b
    assert resumed.seen_size == full.seen_size
    ia = EpochStore(base.out_dir).read_all("images").sort_by("image_id")
    ib = EpochStore(part_cfg.out_dir).read_all("images").sort_by("image_id")
    assert ia.equals(ib)


def test_pipelined_crawl_same_set_and_totals(ray_session, tmp_path):
    """Split-wave pipelining (pipeline_waves=True) fetches the SAME page
    set with the same totals as barrier mode — only the (epoch, seq)
    assignment may shift (speculated rows head their wave). Also pinned:
    pipelined runs are deterministic run-to-run."""
    from dataclasses import replace

    cfg = MockWebConfig(n_pages=150, n_hosts=7, img_every=5)
    seeds = seed_urls(cfg, every=30)
    base = CrawlConfig(
        out_dir=str(tmp_path / "barrier"), seeds=seeds, web=cfg, wave_k=25,
        exact_seen=True, fetch_concurrency=2, fetch_mode="pool",
    )
    barrier = run_crawl(base)
    pipe_cfg = replace(base, out_dir=str(tmp_path / "pipe"), pipeline_waves=True)
    piped = run_crawl(pipe_cfg)
    a = EpochStore(base.out_dir).read_all("order")
    b = EpochStore(pipe_cfg.out_dir).read_all("order")
    assert set(a.column("url").to_pylist()) == set(b.column("url").to_pylist())
    assert piped.pages_fetched == barrier.pages_fetched
    assert piped.seen_size == barrier.seen_size
    assert piped.images_written == barrier.images_written
    pa_pages = EpochStore(base.out_dir).read_all("pages")
    pb_pages = EpochStore(pipe_cfg.out_dir).read_all("pages")
    # depth is excluded: discovery depth depends on which parent fetches
    # first, which is order-dependent for ANY wave_k < frontier (barrier
    # mode included); pipelining shifts order within that same class
    cols = ["url", "status", "content_type"]
    assert (
        pa_pages.select(cols).sort_by("url").to_pydict()
        == pb_pages.select(cols).sort_by("url").to_pydict()
    )
    # speculation actually engaged: some wave's head (speculated) rows break
    # the global (priority desc, hash) order the barrier mode guarantees —
    # or at minimum the epoch assignment diverged from barrier mode
    def _violates_global_sort(order):
        by_epoch = {}
        for e, p, h in zip(
            order.column("epoch").to_pylist(),
            order.column("priority").to_pylist(),
            order.column("url_hash").to_pylist(),
        ):
            by_epoch.setdefault(e, []).append((-p, h))
        return any(keys != sorted(keys) for keys in by_epoch.values())

    assert _violates_global_sort(b) or a.to_pydict() != b.to_pydict()
    # determinism: a second pipelined run reproduces the exact order
    pipe2 = replace(base, out_dir=str(tmp_path / "pipe2"), pipeline_waves=True)
    run_crawl(pipe2)
    assert b.to_pydict() == EpochStore(pipe2.out_dir).read_all("order").to_pydict()


def test_pipelined_resume_completes_universe(ray_session, tmp_path):
    """Resume of an interrupted pipelined crawl: checkpoints taken while
    speculation is in flight include the speculated rows (_spec_view), so
    the resumed crawl completes the exact universe. Pipelined resume
    preserves the fetched SET and totals, not (epoch, seq)."""
    from dataclasses import replace

    cfg = MockWebConfig(n_pages=150, n_hosts=7, img_every=5)
    seeds = seed_urls(cfg, every=30)
    full_cfg = CrawlConfig(
        out_dir=str(tmp_path / "full"), seeds=seeds, web=cfg, wave_k=25,
        exact_seen=True, fetch_concurrency=2, fetch_mode="pool",
        pipeline_waves=True, checkpoint_interval=1,
    )
    full = run_crawl(full_cfg)
    part_cfg = replace(full_cfg, out_dir=str(tmp_path / "part"), max_epochs=3)
    run_crawl(part_cfg)
    resumed = run_crawl(replace(part_cfg, max_epochs=64), resume=True)
    a = EpochStore(full_cfg.out_dir).read_all("order")
    b = EpochStore(part_cfg.out_dir).read_all("order")
    assert set(a.column("url").to_pylist()) == set(b.column("url").to_pylist())
    assert resumed.seen_size == full.seen_size
    ia = EpochStore(full_cfg.out_dir).read_all("images")
    ib = EpochStore(part_cfg.out_dir).read_all("images")
    assert ia.sort_by("image_id").equals(ib.sort_by("image_id"))


def test_error_rows_and_retry(ray_session, tmp_path):
    cfg = MockWebConfig(n_pages=60, n_hosts=7, with_errors=True)
    config = CrawlConfig(
        out_dir=str(tmp_path / "errs"), seeds=seed_urls(cfg, every=10),
        web=cfg, wave_k=10_000, exact_seen=True, fetch_concurrency=2,
        retry_max_attempts=1,
    )
    run_crawl(config)
    store = EpochStore(config.out_dir)
    pages = store.read_all("pages")
    statuses = dict(
        zip(pages.column("url").to_pylist(), pages.column("status").to_pylist())
    )
    # flaky page (13 % 29 == 13) was 503 then refetched OK
    flaky = page_url(13, cfg)
    if flaky in statuses:
        rows = pages.filter(pc.equal(pages.column("url"), flaky))
        got = sorted(rows.column("status").to_pylist())
        assert got == [200, 503]
    # 404 rows recorded as errors, never retried
    gone = page_url(11, cfg)
    if gone in statuses:
        rows = pages.filter(pc.equal(pages.column("url"), gone))
        assert rows.column("status").to_pylist() == [404]
        assert rows.column("error").to_pylist()[0].startswith("NetworkError")


def test_robots_respected_end_to_end(ray_session, tmp_path):
    """respect_robots: /private/ URLs are discovered but never fetched."""
    cfg = MockWebConfig(n_pages=80, n_hosts=7, with_private=True)
    config = CrawlConfig(
        out_dir=str(tmp_path / "robots"), seeds=seed_urls(cfg, every=20),
        web=cfg, wave_k=10_000, exact_seen=True, fetch_concurrency=2,
        respect_robots=True,
    )
    run_crawl(config)
    order = EpochStore(config.out_dir).read_all("order")
    fetched = order.column("url").to_pylist()
    assert fetched, "crawl fetched nothing"
    assert not any("/private/" in u for u in fetched)
    # pages outside /private/ still crawled normally
    assert any("/p/" in u for u in fetched)


def test_crawl_delay_keep_matches_reference_loop():
    """The vectorized Crawl-delay keep-mask (crawl_delay_keep) must be
    row-identical to the per-row loop it replaced — including null
    hosts, which never carry a robots directive and must ALWAYS be kept
    (pandas groupby drops NaN keys, so a bare rank<cap would silently
    defer such rows every wave forever)."""
    import itertools
    import random

    from spider_ray.pipelines.crawl import crawl_delay_keep

    def reference(hosts, caps):
        keep, used = [], {}
        for h in hosts:
            cap = caps.get(h)
            if cap is None:
                keep.append(True)
                continue
            k = used.get(h, 0)
            keep.append(k < cap)
            if k < cap:
                used[h] = k + 1
        return keep

    rng = random.Random(7)
    universe = ["a.test", "b.test", "c.test", None, ""]
    for trial in range(200):
        n = rng.randrange(0, 25)
        hosts = [rng.choice(universe) for _ in range(n)]
        caps = {
            h: rng.choice([None, 0, 1, 2, 5])
            for h in ["a.test", "b.test", "c.test", ""]
            if rng.random() < 0.8
        }
        got = crawl_delay_keep(hosts, caps).tolist()
        assert got == reference(hosts, caps), (hosts, caps)
    # the exact regression: a null host in a capped wave is kept
    assert crawl_delay_keep(
        ["a.test", None, "a.test"], {"a.test": 1}
    ).tolist() == [True, True, False]


def test_crawl_delay_budgets_end_to_end(ray_session, tmp_path):
    """A host declaring Crawl-delay gets floor(period/delay) fetches per
    wave while other hosts run at the full budget; the throttled host's
    overflow defers to later waves, not oblivion (the crawl still
    completes its reachable universe)."""
    import collections

    cfg = MockWebConfig(n_pages=80, n_hosts=7, crawl_delay_s=15.0)
    config = CrawlConfig(
        out_dir=str(tmp_path / "delay"), seeds=seed_urls(cfg, every=20),
        web=cfg, wave_k=10_000, exact_seen=True, fetch_concurrency=2,
        respect_robots=True, politeness_wave_period_s=60.0,
        max_per_host_per_wave=1000, max_epochs=64,
    )
    result = run_crawl(config)
    order = EpochStore(config.out_dir).read_all("order")
    per_epoch_host = collections.Counter()
    for epoch, url in zip(
        order.column("epoch").to_pylist(), order.column("url").to_pylist()
    ):
        host = url.split("://", 1)[1].split("/", 1)[0]
        per_epoch_host[(epoch, host)] += 1
    h1 = {k: v for k, v in per_epoch_host.items() if k[1] == "h1.test"}
    others = {k: v for k, v in per_epoch_host.items() if k[1] != "h1.test"}
    assert h1, "throttled host never fetched"
    assert max(h1.values()) <= 4  # floor(60/15)
    assert max(others.values()) > 4  # untouched hosts beat the delay cap
    # deferred rows eventually fetched: every h1 page in the BFS universe
    h1_total = sum(h1.values())
    assert h1_total >= 80 // 7  # at least its share of /p/ pages
    assert result.pages_fetched == order.num_rows


def test_lineage_metrics_recorded(small_crawl):
    _, config, result = small_crawl
    lineage = EpochStore(config.out_dir).read_all("lineage")
    fetch_rows = lineage.filter(pc.equal(lineage.column("stage"), "fetch"))
    assert sum(fetch_rows.column("rows_in").to_pylist()) == result.pages_fetched
    dedup_rows = lineage.filter(pc.equal(lineage.column("stage"), "dedup"))
    assert sum(dedup_rows.column("dedup_checks").to_pylist()) > 0
    total_hits = sum(dedup_rows.column("dedup_hits").to_pylist())
    assert total_hits == result.dedup_hits
