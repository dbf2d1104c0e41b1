"""DedupStage — candidate URLs vs the sharded seen set.

A ``map_batches`` actor-pool stage: each actor holds (a) handles to the
authoritative seen-shard actors and (b) a local Bloom pre-filter caching
keys this actor has already *confirmed seen*, so repeat duplicates skip the
shard RPC entirely (north rule: "bloom pre-filter"). The authoritative
probe is ``ShardedSeen.check_and_add`` — atomic per shard, exactly-once
admission (see state/seen.py).

Bloom caveat (documented, by design): a Bloom false positive on the
*pre-filter* would wrongly drop a never-seen URL without consulting the
shards (~0.1% at the configured fp rate). Acceptable for a 10^10-URL crawl
(real crawlers tolerate it); conformance runs set ``use_bloom=False`` for
bit-exact seen sets.

Mutation warning: this stage mutates global state; run it on a wave that
executes exactly once (the crawl loop materializes each wave) — a lazily
re-executed Dataset would double-probe (idempotent for membership, but
metrics would double-count).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state.bloom import BloomFilter
from ..state.seen import ShardedSeen


class DedupStage:
    def __init__(
        self,
        seen: ShardedSeen,
        use_bloom: bool = True,
        bloom_capacity: int = 1 << 20,
    ):
        self.seen = seen
        self.bloom = BloomFilter(bloom_capacity, fp_rate=0.001) if use_bloom else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        keys = batch.column("url_hash").to_numpy().astype(np.uint64)
        if self.bloom is not None:
            maybe_seen = self.bloom.contains_many(keys)
            need_probe = ~maybe_seen
        else:
            need_probe = np.ones(len(keys), dtype=bool)
        unseen = np.zeros(len(keys), dtype=bool)
        if need_probe.any():
            unseen[need_probe] = self.seen.check_and_add(keys[need_probe])
            if self.bloom is not None:
                # cache every probed key locally: it is now definitely seen
                self.bloom.add_many(keys[need_probe])
        return batch.filter(pa.array(unseen))
