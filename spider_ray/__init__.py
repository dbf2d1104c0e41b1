"""spider_ray — a Ray-Data-native distributed crawl / data-processing engine.

A from-scratch re-implementation of the capabilities of happyvertical/spider
(reference at /root/reference, TypeScript single-URL scraping library) as a
distributed URL-frontier + fetch scheduler built on ray.data.Dataset:

- frontier / pages / documents / images tables as Datasets of Arrow blocks
- fetch adapters as stateful actor-pool ``map_batches`` stages
- link extraction / detectors / filters as vectorized batch transforms
- a sharded bloom+cuckoo URL-seen set held in named actors
- per-host politeness token buckets
- wave-based priority scheduling with deterministic ordering
- epoch checkpointing with per-partition lineage records

plus the training-data operators a 100 TB pipeline needs (dedup families,
ANN search, text analysis, multimodal column plumbing).

Nothing here calls ``ray.init``/``ray.shutdown`` — sessions are owned by the
caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
