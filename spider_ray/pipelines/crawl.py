"""The distributed crawl: wave-based URL-frontier scheduler over Ray Data.

This is the flagship pipeline — the north rule's "distributed URL-frontier +
fetch scheduler". Per wave (epoch):

1. **Wave cut** — deterministic priority cut of the frontier: per-host
   politeness cap (hot-host skew splitting: a hot host's overflow is
   deferred, other hosts fill the wave — SURVEY.md §4) then global
   ``sort(priority desc, url_hash asc) . limit(wave_k)``. The total order
   tie-break on ``url_hash`` is what makes crawl ordering reproducible
   under parallelism (reference ordering = caller order + priority chains,
   SURVEY.md §2.7 O6).
2. **Fetch** — ``map_batches(FetchStage, concurrency=N)`` actor pool
   (adapter parity, cache, error rows).
3. **Parse/extract** — links, candidates, documents, images as stateless
   ``map_batches`` transforms.
4. **Dedup** — candidates through ``DedupStage`` (bloom pre-filter + sharded
   cuckoo/exact seen actors) → next frontier; batched RPCs to hash-owned
   shards instead of an all-to-all shuffle.
5. **Checkpoint** — pages/images/documents/order/lineage/frontier/seen
   written per epoch (EpochStore); an interrupted crawl resumes from the
   last completed epoch exactly (kill-and-resume test in tests/).

Scale notes: each wave materializes at most ``wave_k`` pages (the streaming
unit — sized so a wave fits aggregate cluster memory); the frontier itself
lives in the epoch store, not on the driver. Wave selection has two
equivalent implementations — a numpy fast path for frontiers that fit one
block, and a Ray Data ``groupby(host)/sort`` path for frontiers beyond
driver memory (``wave_select_dataset``); both are deterministic and
property-tested for equality.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..functions.urls import canonicalize_url, host_of, url_hash64
from ..schemas import FRONTIER_SCHEMA, LINEAGE_SCHEMA
from ..sources.fixtures import MockWeb, MockWebConfig
from ..sources.storage import EpochStore
from ..stages.dedup import DedupStage
from ..stages.fetch import FetchStage
from ..stages.parse import (
    extract_candidates_batch,
    images_from_pages_batch,
    parse_links_batch,
    priority_of,
    to_documents_batch,
)
from ..state.politeness import PolitenessPool
from ..state.seen import ShardedSeen

_FIXED_EPOCH_MS = 1_700_000_000_000


@dataclass
class CrawlConfig:
    out_dir: str
    seeds: list[str]
    web: MockWebConfig = field(default_factory=MockWebConfig)
    adapter: str = "simple"
    n_seen_shards: int = 4
    seen_capacity_per_shard: int = 1 << 20
    exact_seen: bool = True  # conformance default; False → cuckoo-only at scale
    use_bloom: bool = False  # conformance default; True → bloom pre-filter
    wave_k: int = 1_000_000
    max_per_host_per_wave: int = 1_000_000_000
    max_epochs: int = 64
    max_depth: int | None = None
    fetch_concurrency: int = 4
    fetch_num_cpus: float = 1.0  # per-worker CPU reservation (fractional →
    # worker count can track num_cpus exactly while service actors co-fit)
    fetch_batch_size: int = 512
    dedup_concurrency: int = 2
    retry_max_attempts: int = 1
    respect_robots: bool = False
    driver_wave_threshold: int = 200_000  # frontier rows above this → Dataset path
    keep_page_content: bool = False  # drop big HTML from the pages sink by default
    # 'pool'   — persistent fetch actors reused across waves (amortizes
    #            stateful setup the way a browser pool must; fast for the
    #            many-small-wave regime)
    # 'dataset'— ds.map_batches(FetchStage) per wave (streaming backpressure
    #            + spill; right for huge waves)
    # 'auto'   — dataset when the wave exceeds dataset_wave_threshold rows
    fetch_mode: str = "auto"
    dataset_wave_threshold: int = 20_000

    def key(self) -> str:
        payload = asdict(self)
        return json.dumps(payload, sort_keys=True, default=str)


_PAGE_SLIM_COLS = [
    "url", "final_url", "url_hash", "host", "depth", "status", "content_type",
    "filename", "fetched_at", "cache_hit", "strategy_type", "strategy_spider",
    "confidence", "duration_ms", "link_count", "interaction_count", "complete",
    "error",
]


def _process_pages(pages: pa.Table, keep_content: bool) -> dict:
    """Full page rows → the four wave products (all per-row work happens
    here, INSIDE the worker — the driver only concatenates)."""
    candidates = extract_candidates_batch(pages)
    images = images_from_pages_batch(pages)
    documents = to_documents_batch(pages, include_html=keep_content)
    slim_cols = list(_PAGE_SLIM_COLS)
    if keep_content:
        slim_cols += ["content", "body_bytes"]
    return {
        "pages": pages.select(slim_cols),
        "candidates": candidates,
        "images": images,
        "documents": documents,
    }


@ray.remote
class FetchWorker:
    """Persistent fetch+parse+extract actor reused across waves.

    Ray Data's ``map_batches`` builds a fresh actor pool per execution; the
    wave loop runs one execution per epoch, so for the stateful fetch stage
    (session/browser/cache — reference tears its browser down per URL,
    browser-runner.ts:335-338) we keep ONE pool alive for the whole crawl
    and feed it wave slices round-robin. Everything per-row (fetch, link
    parse, candidate hashing, document assembly, image decode) runs here;
    the driver sees only slim columnar results. The Dataset path remains
    for waves big enough to need streaming backpressure
    (CrawlConfig.fetch_mode).
    """

    def __init__(self, web_config, adapter: str):
        self.stage = FetchStage(web_config=web_config, adapter=adapter)

    def process(self, batch: pa.Table, keep_content: bool) -> dict:
        pages = parse_links_batch(self.stage(batch))
        return _process_pages(pages, keep_content)

    def stats(self) -> dict:
        return self.stage.stats()


@dataclass
class CrawlResult:
    out_dir: str
    epochs: int
    pages_fetched: int
    images_written: int
    dedup_checks: int
    dedup_hits: int
    seen_size: int


# ---------------------------------------------------------------------------
# Wave selection (deterministic politeness cap + priority cut)
# ---------------------------------------------------------------------------

def wave_select_arrow(
    frontier: pa.Table, wave_k: int, max_per_host: int
) -> tuple[pa.Table, pa.Table]:
    """Numpy wave cut: returns (wave, deferred). Total order:
    (priority desc, url_hash asc); per-host rank cap applied in that order."""
    if frontier.num_rows == 0:
        return frontier, frontier
    prio = frontier.column("priority").to_numpy()
    hashes = frontier.column("url_hash").to_numpy()
    order = np.lexsort((hashes, -prio))  # primary: -priority, tie: hash
    hosts = np.asarray(frontier.column("host").to_pylist(), dtype=object)[order]
    # rank of each row within its host, in wave order
    import collections

    counts: dict = collections.defaultdict(int)
    take = np.zeros(len(order), dtype=bool)
    budget = wave_k
    for pos, h in enumerate(hosts):
        if budget == 0:
            break
        if counts[h] < max_per_host:
            counts[h] += 1
            take[pos] = True
            budget -= 1
    wave_idx = order[take]
    deferred_idx = order[~take]
    return frontier.take(pa.array(wave_idx)), frontier.take(pa.array(deferred_idx))


def wave_select_dataset(
    frontier_ds: "ray.data.Dataset", wave_k: int, max_per_host: int
):
    """Ray Data wave cut for frontiers beyond driver memory.

    Shuffle plan: ``groupby(host)`` (hash exchange on the politeness key) →
    per-host top-``max_per_host`` by (priority, hash) → global
    ``sort(priority desc)`` → ``limit(wave_k)``. The deferred set is the
    anti-set (frontier minus wave), computed by hash semi-join inside
    map_batches against the broadcast wave-hash set (the wave is ≤ wave_k
    rows — small side).
    """
    import pandas as pd

    def per_host_cap(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(
            ["priority", "url_hash"], ascending=[False, True], kind="mergesort"
        )
        return group.head(max_per_host)

    capped = frontier_ds.groupby("host").map_groups(per_host_cap, batch_format="pandas")
    wave = capped.sort(["priority", "url_hash"], descending=[True, False]).limit(wave_k)
    wave_table = pa.Table.from_pandas(
        wave.to_pandas(), preserve_index=False
    )
    taken = set(wave_table.column("url_hash").to_pylist())
    taken_ref = ray.put(taken)

    def anti(batch: pa.Table) -> pa.Table:
        seen_set = ray.get(taken_ref)
        mask = [h not in seen_set for h in batch.column("url_hash").to_pylist()]
        return batch.filter(pa.array(mask))

    deferred = frontier_ds.map_batches(anti, batch_format="pyarrow")
    return wave_table, deferred


# ---------------------------------------------------------------------------
# Frontier helpers
# ---------------------------------------------------------------------------

def frontier_from_seeds(seeds: list[str]) -> pa.Table:
    rows = []
    for url in seeds:
        canonical = canonicalize_url(url)
        rows.append(
            {
                "url": canonical,
                "url_hash": url_hash64(canonical),
                "host": host_of(canonical),
                "priority": priority_of(canonical),
                "depth": 0,
                "discovered_at": _FIXED_EPOCH_MS,
                "parent_url_hash": None,
                "attempts": 0,
                "anchor_text": None,
            }
        )
    return pa.Table.from_pylist(rows, schema=FRONTIER_SCHEMA)


def _empty_frontier() -> pa.Table:
    return FRONTIER_SCHEMA.empty_table()


# ---------------------------------------------------------------------------
# The crawl driver loop
# ---------------------------------------------------------------------------

def run_crawl(config: CrawlConfig, resume: bool = False) -> CrawlResult:
    """Run (or resume) a crawl to completion; everything checkpointed per
    epoch. Ray must already be initialized by the caller."""
    store = EpochStore(config.out_dir)
    seen = ShardedSeen.create(
        n_shards=config.n_seen_shards,
        capacity_per_shard=config.seen_capacity_per_shard,
        exact=config.exact_seen,
    )
    from ..state.bloom import BloomFilter

    # driver-side bloom pre-filter over *confirmed-seen* keys: repeat
    # duplicates skip the shard RPC entirely (lossy-in-the-safe-direction:
    # an FP can only suppress a duplicate probe after the key was confirmed
    # seen... except hash collisions at the configured 1e-3 rate — bit-exact
    # conformance runs therefore set use_bloom=False)
    bloom = (
        BloomFilter(config.seen_capacity_per_shard * config.n_seen_shards, 0.001)
        if config.use_bloom
        else None
    )
    politeness = PolitenessPool.create(
        n_actors=max(1, config.n_seen_shards // 2),
        budget_per_wave=config.max_per_host_per_wave,
    )
    web = MockWeb(config.web)
    # cap the pool to schedulable CPUs — an over-requested actor never
    # schedules and its round-robin slices would hang the wave forever
    avail_cpus = float(ray.cluster_resources().get("CPU", config.fetch_concurrency))
    reserved = 0.1 * config.n_seen_shards + 0.5  # shards + politeness + slack
    max_workers = max(1, int((avail_cpus - reserved) / max(0.1, config.fetch_num_cpus)))
    pool_n = max(1, min(config.fetch_concurrency, max_workers))
    fetch_pool = [
        FetchWorker.options(num_cpus=config.fetch_num_cpus).remote(
            config.web, config.adapter
        )
        for _ in range(pool_n)
    ]

    start_epoch = 0
    manifest = store.manifest()
    if resume and manifest["completed_epochs"]:
        last = store.last_epoch()
        seen.restore_table(store.read("seen", last))
        frontier = store.read("frontier", last)
        start_epoch = last + 1
    else:
        frontier = frontier_from_seeds(config.seeds)
        unseen = seen.check_and_add(
            frontier.column("url_hash").to_numpy().astype(np.uint64)
        )
        frontier = frontier.filter(pa.array(unseen))

    pages_fetched = 0
    images_written = 0
    epoch = start_epoch

    while frontier.num_rows > 0 and epoch < config.max_epochs:
        politeness.begin_wave()
        wave, deferred = wave_select_arrow(
            frontier, config.wave_k, config.max_per_host_per_wave
        )
        if config.respect_robots:
            hosts = wave.column("host").to_pylist()
            urls = wave.column("url").to_pylist()
            politeness.ensure_robots(hosts, web.robots_txt)
            allowed = politeness.allowed(hosts, urls)
            wave = wave.filter(pa.array(allowed))
        if wave.num_rows == 0:
            if deferred.num_rows == 0:
                break
            # everything admissible this wave was robots-filtered; advance
            frontier = deferred
            epoch += 1
            continue

        # ---- fetch + parse + extract (distributed, one pass) ------------
        products = _fetch_wave(wave, config, fetch_pool)
        if products is None or products["pages"].num_rows == 0:
            break
        pages_table = products["pages"]
        pages_fetched += pages_table.num_rows

        write_refs = [store.write_async("pages", epoch, pages_table)]
        images = products["images"]
        if images.num_rows:
            write_refs.append(store.write_async("images", epoch, images))
            images_written += images.num_rows
        documents = products["documents"]
        if documents.num_rows:
            write_refs.append(store.write_async("documents", epoch, documents))

        # ---- crawl order (epoch, seq) -----------------------------------
        order_table = pa.table(
            {
                "epoch": pa.array([epoch] * wave.num_rows, pa.int32()),
                "seq": pa.array(range(wave.num_rows), pa.int32()),
                "url": wave.column("url"),
                "url_hash": wave.column("url_hash"),
                "depth": wave.column("depth"),
                "priority": wave.column("priority"),
            }
        )
        write_refs.append(store.write_async("order", epoch, order_table))

        # ---- candidates → dedup → next frontier -------------------------
        stats_before = seen.stats()
        candidates = products["candidates"]
        if config.max_depth is not None:
            candidates = candidates.filter(
                pc.less_equal(candidates.column("depth"), config.max_depth)
            )
        fresh_table = _dedup_candidates(candidates, seen, config, bloom)

        # ---- retries: 5xx rows re-enqueue with attempts+1 ----------------
        retry_rows = _retry_rows(pages_table, wave, config.retry_max_attempts)

        next_frontier_parts = [t for t in (deferred, fresh_table, retry_rows) if t.num_rows]
        frontier = (
            pa.concat_tables(
                [t.select(FRONTIER_SCHEMA.names).cast(FRONTIER_SCHEMA) for t in next_frontier_parts]
            )
            if next_frontier_parts
            else _empty_frontier()
        )

        # ---- lineage + checkpoint ---------------------------------------
        stats_after = seen.stats()
        write_refs.append(store.write_async(
            "lineage",
            epoch,
            _lineage_table(
                epoch,
                pages_table,
                candidates.num_rows,
                fresh_table.num_rows,
                stats_before,
                stats_after,
                n_partitions=config.n_seen_shards,
            ),
        ))
        write_refs.append(store.write_async("frontier", epoch, frontier))
        write_refs.append(store.write_async("seen", epoch, seen.snapshot_table()))
        ray.get(write_refs)  # epoch barrier: all tables durable before the mark
        store.mark_epoch_complete(epoch, config.key())
        epoch += 1

    store.mark_done()
    final_stats = seen.stats()
    return CrawlResult(
        out_dir=config.out_dir,
        epochs=epoch - start_epoch,
        pages_fetched=pages_fetched,
        images_written=images_written,
        dedup_checks=final_stats["dedup_checks"],
        dedup_hits=final_stats["dedup_hits"],
        seen_size=final_stats["n_items"],
    )


def parse_candidates(pages_table: pa.Table) -> pa.Table:
    return extract_candidates_batch(pages_table)


def _collect_tables(ds) -> pa.Table | None:
    import ray as _ray

    refs = ds.to_arrow_refs()
    tables = [t for t in _ray.get(refs) if t.num_rows]
    return pa.concat_tables(tables) if tables else None


def _fetch_wave(wave: pa.Table, config: CrawlConfig, fetch_pool: list) -> dict | None:
    """Fetch+parse+extract one wave → {pages (slim), candidates, images,
    documents}. Pool mode: slice the wave round-robin over the persistent
    actors (deterministic: results concatenated in slice order). Dataset
    mode: ``map_batches(FetchStage)`` with streaming execution, then one
    distributed derivation pass per product over the materialized blocks."""
    use_dataset = config.fetch_mode == "dataset" or (
        config.fetch_mode == "auto" and wave.num_rows > config.dataset_wave_threshold
    )
    keep = config.keep_page_content
    if use_dataset:
        pages_full = (
            ray.data.from_arrow(wave)
            .map_batches(
                FetchStage,
                fn_constructor_kwargs={
                    "web_config": config.web,
                    "adapter": config.adapter,
                },
                batch_format="pyarrow",
                batch_size=config.fetch_batch_size,
                concurrency=config.fetch_concurrency,
            )
            .map_batches(parse_links_batch, batch_format="pyarrow")
            .materialize()
        )
        slim_cols = list(_PAGE_SLIM_COLS) + (["content", "body_bytes"] if keep else [])
        products = {
            "pages": _collect_tables(
                pages_full.map_batches(
                    lambda t: t.select(slim_cols), batch_format="pyarrow"
                )
            ),
            "candidates": _collect_tables(
                pages_full.map_batches(extract_candidates_batch, batch_format="pyarrow")
            ),
            "images": _collect_tables(
                pages_full.map_batches(images_from_pages_batch, batch_format="pyarrow")
            ),
            "documents": _collect_tables(
                pages_full.map_batches(
                    lambda t: to_documents_batch(t, include_html=keep),
                    batch_format="pyarrow",
                )
            ),
        }
    else:
        # adaptive slice size: at least ~4 slices per worker so small waves
        # still saturate the pool, capped at fetch_batch_size
        bs = max(
            32,
            min(
                config.fetch_batch_size,
                -(-wave.num_rows // (len(fetch_pool) * 4)),
            ),
        )
        slices = [wave.slice(o, bs) for o in range(0, wave.num_rows, bs)]
        refs = [
            fetch_pool[i % len(fetch_pool)].process.remote(s, keep)
            for i, s in enumerate(slices)
        ]
        parts = ray.get(refs)
        if not parts:
            return None
        products = {
            key: pa.concat_tables([p[key] for p in parts])
            for key in ("pages", "candidates", "images", "documents")
        }
    if products["pages"] is None:
        return None
    from ..schemas import DOCUMENTS_SCHEMA, IMAGES_SCHEMA

    empties = {
        "candidates": FRONTIER_SCHEMA,
        "images": IMAGES_SCHEMA,
        "documents": DOCUMENTS_SCHEMA,
    }
    for key, schema in empties.items():
        if products[key] is None:
            products[key] = schema.empty_table()
    return products


def _dedup_candidates(
    candidates: pa.Table, seen: ShardedSeen, config: CrawlConfig, bloom=None
) -> pa.Table:
    """Admit unseen candidates. Small sets: direct sharded RPC fan-out from
    the driver (already parallel across shard actors), with an optional
    driver-held bloom short-circuiting repeat duplicates. Large sets: a
    ``map_batches(DedupStage)`` task pool so probing itself distributes."""
    if candidates.num_rows == 0:
        return _empty_frontier()
    if candidates.num_rows <= config.driver_wave_threshold:
        keys = candidates.column("url_hash").to_numpy().astype(np.uint64)
        if bloom is not None:
            need = ~bloom.contains_many(keys)
            unseen = np.zeros(len(keys), dtype=bool)
            if need.any():
                unseen[need] = seen.check_and_add(keys[need])
                bloom.add_many(keys[need])
        else:
            unseen = seen.check_and_add(keys)
        return candidates.filter(pa.array(unseen))
    dedup = DedupStage(seen, use_bloom=config.use_bloom)
    fresh = (
        ray.data.from_arrow(candidates)
        .map_batches(
            dedup,
            batch_format="pyarrow",
            batch_size=8192,
            concurrency=config.dedup_concurrency,
        )
        .materialize()
    )
    batches = list(fresh.iter_batches(batch_size=8192, batch_format="pyarrow"))
    return pa.concat_tables(batches) if batches else _empty_frontier()


def _retry_rows(pages_table: pa.Table, wave: pa.Table, max_attempts: int) -> pa.Table:
    status = pages_table.column("status")
    retryable = pc.and_(
        pc.greater_equal(status, 500), pc.less(status, 600)
    )
    if not pc.any(retryable).as_py():
        return _empty_frontier()
    failed = pages_table.filter(retryable)
    failed_hashes = set(failed.column("url_hash").to_pylist())
    mask = [
        (h in failed_hashes) and ((a or 0) < max_attempts)
        for h, a in zip(
            wave.column("url_hash").to_pylist(), wave.column("attempts").to_pylist()
        )
    ]
    rows = wave.filter(pa.array(mask))
    if rows.num_rows == 0:
        return _empty_frontier()
    attempts = pc.add(rows.column("attempts"), 1).cast(pa.int32())
    return rows.set_column(
        rows.schema.get_field_index("attempts"), "attempts", attempts
    )


def _lineage_table(
    epoch: int,
    pages_table: pa.Table,
    candidates_n: int,
    fresh_n: int,
    stats_before: dict,
    stats_after: dict,
    n_partitions: int,
) -> pa.Table:
    """Per-partition lineage rows (partition = url_hash % n_partitions)."""
    part_ids = (
        pages_table.column("url_hash").to_numpy().astype(np.uint64)
        % np.uint64(n_partitions)
    ).astype(np.int64)
    cache_hits = pages_table.column("cache_hit").to_numpy(zero_copy_only=False)
    statuses = pages_table.column("status").to_numpy()
    rows = []
    for p in range(n_partitions):
        mask = part_ids == p
        rows.append(
            {
                "epoch": epoch,
                "partition_id": p,
                "stage": "fetch",
                "rows_in": int(mask.sum()),
                "rows_out": int(mask.sum()),
                "fetches": int(mask.sum() - cache_hits[mask].sum()),
                "cache_hits": int(cache_hits[mask].sum()),
                "dedup_checks": None,
                "dedup_hits": None,
                "errors": int((statuses[mask] >= 400).sum()),
                "wall_ms": None,
            }
        )
    rows.append(
        {
            "epoch": epoch,
            "partition_id": -1,
            "stage": "dedup",
            "rows_in": candidates_n,
            "rows_out": fresh_n,
            "fetches": None,
            "cache_hits": None,
            "dedup_checks": stats_after["dedup_checks"] - stats_before["dedup_checks"],
            "dedup_hits": stats_after["dedup_hits"] - stats_before["dedup_hits"],
            "errors": None,
            "wall_ms": None,
        }
    )
    return pa.Table.from_pylist(rows, schema=LINEAGE_SCHEMA)
