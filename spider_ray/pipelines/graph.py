"""Link-graph operators over (src, dst) edge Datasets.

The crawl produces a web graph (pages → outlinks, pipelines/crawl.py
lineage); these operators consume it as a first-class Dataset. All shapes
are iterative-shuffle: ranks live as a Dataset keyed by node, each
iteration is one bucketed hash join (edges ⋈ ranks on src — a single
exchange, relational.bucketed_hash_join) plus one groupby-sum on dst.
Nothing ever materializes the graph on the driver; at 256 nodes / 10^10
edges each iteration streams edge blocks against the hash-partitioned
rank table, which is the standard distributed-PageRank layout.

Per-iteration ``materialize()`` keeps the lineage one-iteration deep
(the distributed analogue of checkpointing ranks between supersteps);
without it the lazy plan re-executes all prior iterations per consumer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .relational import bucketed_hash_join


def dedup_edges(edges_ds):
    """Distinct (src, dst) pairs — groupby-count then drop the count (one
    hash exchange; no driver materialization)."""
    agg = edges_ds.groupby(["src", "dst"]).count()
    return agg.map_batches(
        lambda t: t.select(["src", "dst"]), batch_format="pyarrow"
    )


def out_degrees(edges_ds):
    """(src, deg) — out-degree per source node."""
    agg = edges_ds.groupby("src").count()
    return agg.map_batches(
        lambda t: t.rename_columns(["src", "deg"]), batch_format="pyarrow"
    )


def pagerank(
    edges_ds,
    nodes_ds,
    n_nodes: int,
    n_iter: int = 5,
    damping: float = 0.85,
    n_buckets: int = 32,
):
    """Fixed-iteration PageRank: rank' = (1-d)/n + d·Σ_in rank/deg.

    ``edges_ds``: distinct (src:int64, dst:int64); ``nodes_ds``: (node)
    one row per node (teleport base — nodes with no in-links still get
    (1-d)/n). Dangling mass (nodes with no out-links) is dropped, the
    plain power-iteration formulation the SQL oracle mirrors. Returns a
    Dataset (node, rank) after ``n_iter`` supersteps."""
    deg = out_degrees(edges_ds)
    edges_deg = bucketed_hash_join(
        edges_ds, deg, on="src", left_cols=["dst"], right_cols=["deg"],
        n_buckets=n_buckets,
    ).materialize()

    r0 = 1.0 / n_nodes

    def init_ranks(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch.column("node"),
                "rank": pa.array(
                    np.full(batch.num_rows, r0, dtype=np.float64), pa.float64()
                ),
            }
        )

    ranks = nodes_ds.map_batches(init_ranks, batch_format="pyarrow").materialize()
    teleport = (1.0 - damping) / n_nodes

    def base_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "part": pa.array(
                    np.full(batch.num_rows, teleport, dtype=np.float64),
                    pa.float64(),
                ),
            }
        )

    base = nodes_ds.map_batches(base_rows, batch_format="pyarrow").materialize()

    def contribs(batch: pa.Table) -> pa.Table:
        rank = batch.column("rank").to_numpy(zero_copy_only=False)
        degv = batch.column("deg").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "node": batch.column("dst"),
                "part": pa.array(damping * rank / degv, pa.float64()),
            }
        )

    for _ in range(n_iter):
        joined = bucketed_hash_join(
            edges_deg, ranks, on="src", left_cols=["dst", "deg"],
            right_cols=["rank"], n_buckets=n_buckets,
        )
        flow = joined.map_batches(contribs, batch_format="pyarrow")
        summed = flow.union(base).groupby("node").sum("part")
        ranks = summed.map_batches(
            lambda t: t.rename_columns(["src", "rank"]), batch_format="pyarrow"
        ).materialize()

    return ranks.map_batches(
        lambda t: t.rename_columns(["node", "rank"]), batch_format="pyarrow"
    )
