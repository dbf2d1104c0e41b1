"""Distributed mutable state: bloom/cuckoo filters, seen shards, politeness.

These are the pieces the Dataset API genuinely can't express (shared mutable
membership state and per-host token budgets) — held in named Ray actors and
checkpointed to the epoch store each wave (SURVEY.md §4).
"""
