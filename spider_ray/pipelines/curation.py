"""Training-data curation operators.

Three families a 100-TB text-curation pipeline needs beyond dedup:

- **repetition_signals** — Gopher-style repetition quality metrics per
  document (duplicate-n-gram and top-n-gram counts, as exact integers so
  a SQL oracle can value-hash them). Rahimi et al. / Gopher (Rae et al.
  2021, §A1.1) filter documents whose text is dominated by repeated
  n-grams; we emit the raw counts and leave thresholding to the caller.
- **decontaminate** — benchmark decontamination: flag corpus documents
  that share any word n-gram with a (small) benchmark/eval set, the
  standard guard against train/test leakage (GPT-3 appendix C uses
  13-gram overlap; the n is a parameter here). The benchmark side is a
  broadcast small side: collected once, ``ray.put`` once, probed inside
  every ``map_batches`` task — never a shuffle join.
- **regex_count** — vectorized per-row regex occurrence counts
  (PII-shaped scans: emails, phone numbers, IPs, …) via Arrow's RE2
  kernel ``pc.count_substring_regex`` — zero Python per row, and RE2 is
  the same engine DuckDB's ``regexp_extract_all`` uses, so oracles agree
  on dialect.

All three are map-only (no shuffle): they scale with read bandwidth.

Scale bounds, stated: ``bench_ngram_set`` materializes the benchmark
n-gram set on the driver. Benchmarks are eval sets (10^2–10^6 documents,
≤ ~10^7 distinct grams ≈ hundreds of MB as strings) — the small side by
construction. For a pathological benchmark beyond that, shard the grams
by hash and probe via the same sharded-membership actors the
incremental-dedup path uses (state/seen.py ShardedSeen); the per-batch
probe below is already batched, so only the set construction changes.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import pyarrow.compute as pc
import ray


def _words(text: str | None) -> list[str]:
    """Whitespace tokens with SQL semantics: DuckDB's
    ``regexp_split_to_array(trim(text), '\\s+')`` yields ``['']`` for an
    empty-after-trim string, never ``[]`` — mirror that exactly so the
    integer counts value-hash against the oracle."""
    stripped = (text or "").strip()
    return stripped.split() if stripped else [""]


def repetition_signals_batch(
    batch: pa.Table, text_col: str = "text"
) -> pa.Table:
    """Per-document repetition counts, all int64:

    n_words, n_bigrams, n_distinct_bigrams, top_bigram_cnt (occurrences
    of the most frequent word bigram), n_3grams, dup3_cnt (word 3-gram
    occurrences beyond the first of each distinct 3-gram).

    Fractions (Gopher's dup-n-gram char fraction etc.) are one divide
    away; integers keep the oracle comparison exact."""
    cols = {
        "n_words": [], "n_bigrams": [], "n_distinct_bigrams": [],
        "top_bigram_cnt": [], "n_3grams": [], "dup3_cnt": [],
    }
    for text in batch.column(text_col).to_pylist():
        w = _words(text)
        bigrams = [w[i] + " " + w[i + 1] for i in range(len(w) - 1)]
        c = Counter(bigrams)
        g3 = (
            [" ".join(w[i : i + 3]) for i in range(len(w) - 2)]
            if len(w) >= 3
            else []
        )
        cols["n_words"].append(len(w))
        cols["n_bigrams"].append(len(bigrams))
        cols["n_distinct_bigrams"].append(len(c))
        cols["top_bigram_cnt"].append(max(c.values()) if c else 0)
        cols["n_3grams"].append(len(g3))
        cols["dup3_cnt"].append(len(g3) - len(set(g3)))
    for name, vals in cols.items():
        batch = batch.append_column(name, pa.array(vals, pa.int64()))
    return batch


def repetition_signals(ds, text_col: str = "text"):
    """Dataset → Dataset with the six repetition-count columns appended."""
    return ds.map_batches(
        lambda t: repetition_signals_batch(t, text_col),
        batch_format="pyarrow",
    )


def _doc_ngrams(text: str | None, n: int) -> set[str]:
    w = _words(text)
    if len(w) < n:
        return set()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def bench_ngram_set(bench_ds, n: int = 4, text_col: str = "text") -> frozenset[str]:
    """Distinct word n-grams of the benchmark dataset, collected to the
    driver (the small side — see module docstring for the bound). Each
    batch contributes its distinct grams only, so the collect moves
    O(distinct) strings, not O(occurrences)."""
    def batch_grams(t: pa.Table) -> pa.Table:
        grams: set[str] = set()
        for text in t.column(text_col).to_pylist():
            grams |= _doc_ngrams(text, n)
        return pa.table({"gram": pa.array(sorted(grams), pa.string())})

    parts = bench_ds.map_batches(batch_grams, batch_format="pyarrow")
    out: set[str] = set()
    for b in parts.iter_batches(batch_format="pyarrow"):
        out.update(b.column("gram").to_pylist())
    return frozenset(out)


def decontaminate(
    ds,
    bench_grams: frozenset[str],
    n: int = 4,
    text_col: str = "text",
):
    """Append ``contaminated`` (int64 0/1): 1 iff the document shares at
    least one word n-gram with the benchmark set. Broadcast probe: the
    gram set crosses the cluster once via ``ray.put``; each task reads
    the shared object-store copy (zero per-batch reshipping)."""
    ref = ray.put(bench_grams)

    def probe(batch: pa.Table) -> pa.Table:
        bench = ray.get(ref)
        flags = [
            1 if not _doc_ngrams(text, n).isdisjoint(bench) else 0
            for text in batch.column(text_col).to_pylist()
        ]
        return batch.append_column(
            "contaminated", pa.array(flags, pa.int64())
        )

    return ds.map_batches(probe, batch_format="pyarrow")


def regex_count(ds, patterns: dict[str, str], text_col: str = "text"):
    """Append one int64 count column per named RE2 pattern — fully
    vectorized (``pc.count_substring_regex``, Arrow C++): no Python per
    row. PII-shaped defaults live in ``PII_PATTERNS``."""

    def scan(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        for name, pat in patterns.items():
            counts = pc.count_substring_regex(col, pattern=pat)
            batch = batch.append_column(name, counts.cast(pa.int64()))
        return batch

    return ds.map_batches(scan, batch_format="pyarrow")


# RE2-compatible PII-shaped scan patterns (also valid in DuckDB, which
# uses RE2 for regexp_extract_all — oracle dialect-identical).
PII_PATTERNS = {
    "email_n": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4_n": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone_n": r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
    "ssn_shaped_n": r"\b\d{3}-\d{2}-\d{4}\b",
}


def redact_patterns(
    ds,
    patterns: dict[str, str] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """PII redaction (the C4/Dolma-style scrub): each named pattern's
    matches are replaced by its ``<NAME>`` placeholder, in declared
    order, and the total replacement count is reported per document.
    Map-only and fully vectorized — ``pc.count_substring_regex`` +
    ``pc.replace_substring_regex`` are Arrow C++ RE2 kernels, no Python
    per row, so the stage streams at decompression speed and never
    shuffles. Pattern application is sequential (a later pattern sees
    earlier placeholders), mirrored exactly by the nested
    ``regexp_replace(..., 'g')`` chain in the SQL oracle (DuckDB is also
    RE2 — dialect-identical patterns).

    Output: (id, redacted_text, n_redactions)."""
    pats = patterns if patterns is not None else REDACT_PATTERNS

    def scrub(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch.column(text_col), "")
        total = pa.array([0] * batch.num_rows, pa.int64())
        for name, pat in pats.items():
            counts = pc.count_substring_regex(col, pattern=pat)
            total = pc.add(total, counts.cast(pa.int64()))
            col = pc.replace_substring_regex(
                col, pattern=pat, replacement=f"<{name}>"
            )
        return pa.table(
            {
                id_col: batch.column(id_col),
                "redacted_text": col,
                "n_redactions": total,
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow")


# redaction order matters (a later pattern scans the already-redacted
# text); SSN-shaped before the looser phone shape so 123-45-6789 never
# half-matches as a phone number
REDACT_PATTERNS = {
    "EMAIL": PII_PATTERNS["email_n"],
    "IPV4": PII_PATTERNS["ipv4_n"],
    "SSN": PII_PATTERNS["ssn_shaped_n"],
    "PHONE": PII_PATTERNS["phone_n"],
}


def pack_documents(ds, id_col: str = "doc_id", seq_len: int = 512,
                   text_col: str = "text"):
    """Sequence packing for training-data assembly: documents ordered by
    ``id_col`` are laid head-to-tail into fixed-length token windows;
    each document is assigned the pack (context window) its FIRST token
    lands in — ``pack_id = tokens_before // seq_len`` where
    ``tokens_before`` is the global exclusive running token total.

    The global running total is the distributed-scan operator
    (pipelines.events.global_running_sum): per-range totals prefix-sum on
    the driver (O(ranges) scalars), rows take ONE range exchange. Token
    counts use ``functions.text.token_count`` (= DuckDB
    ``len(regexp_split_to_array(trim(text), '\\s+'))``).

    Output: (id, n_tokens, pack_id) — int64, SQL-oracle-exact."""
    from ..functions.text import token_count
    from .events import global_running_sum

    def tokens(batch: pa.Table) -> pa.Table:
        n = [token_count(t or "") for t in batch.column(text_col).to_pylist()]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": pa.array(n, pa.int64()),
            }
        )

    counted = ds.map_batches(tokens, batch_format="pyarrow")
    scanned = global_running_sum(counted, order_col=id_col,
                                 value_col="n_tokens", out_col="cum")

    def assign(batch: pa.Table) -> pa.Table:
        cum = batch.column("cum").to_numpy(zero_copy_only=False)
        nt = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": batch.column("n_tokens"),
                "pack_id": pa.array((cum - nt) // seq_len, pa.int64()),
            }
        )

    return scanned.map_batches(assign, batch_format="pyarrow")


def _md5_bucket(values: list, resolution: int) -> list[int]:
    """Deterministic md5-prefix bucket in [0, resolution) per key — the
    same rule events.hash_sample_mask uses, widened to 8 hex chars so
    fraction thresholds are granular; DuckDB replica:
    ``('0x' || substr(md5(v::VARCHAR), 1, 8))::BIGINT % resolution``."""
    from .events import md5_prefix_mod

    return md5_prefix_mod(values, 4, resolution).tolist()


def split_assign(
    ds,
    key_col: str,
    fractions: dict[str, float] | None = None,
    resolution: int = 10_000,
):
    """Deterministic train/val/test (or any named-fraction) split: each
    row's md5-bucket lands in one of the cumulative-threshold slices, so
    the assignment is stable across runs, engines and partitionings —
    the property a reproducible dataset release needs. Map-only."""
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    names = list(fractions)
    cuts = []
    acc = 0.0
    for name in names:
        acc += fractions[name]
        cuts.append(int(round(acc * resolution)))
    cuts[-1] = resolution  # absorb float residue: last slice closes the ring

    def assign(batch: pa.Table) -> pa.Table:
        b = _md5_bucket(batch.column(key_col).to_pylist(), resolution)
        labels = []
        for v in b:
            for name, cut in zip(names, cuts):
                if v < cut:
                    labels.append(name)
                    break
        return batch.append_column("split", pa.array(labels, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def weighted_mixture(
    ds,
    group_col: str,
    key_col: str,
    rates: dict[str, float],
    resolution: int = 10_000,
):
    """Domain-mixing sampler: keep a row iff its md5-bucket falls below
    its group's rate threshold — per-source sampling rates in one
    map-only pass (the training-mixture reweighting shape: downsample
    over-represented sources, keep the rest). Unknown groups drop.
    Deterministic: the kept set is a pure function of (key, rates)."""
    thresholds = {g: int(round(r * resolution)) for g, r in rates.items()}

    def keep(batch: pa.Table) -> pa.Table:
        b = _md5_bucket(batch.column(key_col).to_pylist(), resolution)
        groups = batch.column(group_col).to_pylist()
        mask = [
            v < thresholds.get(g, 0) for v, g in zip(b, groups)
        ]
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def normalize_text(ds, text_col: str = "text", out_col: str = "norm_text"):
    """Canonical text normalization for dedup/tokenization pre-passes:
    lowercase → collapse whitespace runs to single spaces → trim. Fully
    Arrow-native (utf8_lower / replace_substring_regex / trim — RE2,
    matching DuckDB's dialect), zero Python per row, map-only."""

    def norm(batch: pa.Table) -> pa.Table:
        col = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(
                pc.utf8_lower(batch.column(text_col)),
                pattern=r"\s+",
                replacement=" ",
            )
        )
        return batch.append_column(out_col, col)

    return ds.map_batches(norm, batch_format="pyarrow")
