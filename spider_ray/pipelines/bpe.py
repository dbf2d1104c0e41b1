"""Distributed BPE (byte-pair-encoding) vocabulary learning + encoding.

Classic Sennrich-style BPE re-expressed Ray-Data-first. The key scale
observation: BPE never needs the corpus after the first pass — it
operates on the aggregated UNIQUE-WORD frequency table (O(vocab) rows,
~10^7-10^8 at 100 TB, vs O(corpus) occurrences), exactly like the
doc_frequency combiner. Each merge round is one partial-pair-count
combiner (`map_batches` Counter → one row per distinct pair per block)
followed by a small `groupby(pair).sum` shuffle and a per-block top-1 +
tiny driver reduce — the same broadcast-model / integer-partial-sum loop
shape as pipelines/kmeans.py. Encoding broadcasts the learned merge
ranks once (`ray.put`) and memoizes per unique word inside each batch.

Reference scope note: the reference engine (happyvertical/spider) has no
tokenizer training; this extends the training-data operator family the
same way dedup/ANN do.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

_WORD_RE = re.compile(r"[a-z0-9]+")

_EOW = "</w>"

_MERGES_SCHEMA = pa.schema(
    [
        ("rank", pa.int64()),
        ("a", pa.string()),
        ("b", pa.string()),
        ("cnt", pa.int64()),
    ]
)


def _word_symbols(word: str) -> list[str]:
    """Initial symbol sequence: one symbol per char + end-of-word mark."""
    return list(word) + [_EOW]


def _apply_merge(sym: list[str], a: str, b: str, ab: str) -> list[str]:
    """Left-to-right non-overlapping replacement of adjacent (a, b)."""
    out: list[str] = []
    i, n = 0, len(sym)
    while i < n:
        if i < n - 1 and sym[i] == a and sym[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def tokenize_column(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized `_WORD_RE.findall(t.lower())` over a whole column:
    Arrow C++ kernels only (utf8_lower → split on the complement class →
    flatten → drop empties), zero Python per row. Splitting on
    ``[^a-z0-9]+`` yields exactly the ``[a-z0-9]+`` matches plus empty
    edge fragments, which are filtered. Nulls vanish at list_flatten,
    matching the Python path's ``if t`` guard.

    Byte-exact with CPython ``str.lower()``: U+0130 (İ) is the ONLY
    unconditional multi-char lowercase mapping in Unicode SpecialCasing
    (→ ``i`` + combining dot U+0307, which CPython applies but Arrow's
    utf8proc simple mapping does not), so it is pre-expanded; the other
    CPython special case (Greek final-sigma context rule) never yields
    ``[a-z0-9]`` output and cannot affect token extraction."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.replace_substring(col, "İ", "i̇")
    toks = pc.split_pattern_regex(pc.utf8_lower(col), "[^a-z0-9]+")
    flat = pc.list_flatten(toks)
    return flat.filter(pc.not_equal(flat, ""))


def word_frequency_table(ds, text_col: str = "text"):
    """(word, n) over the corpus — combiner-then-small-shuffle, one row
    per distinct word per block crosses the exchange. Tokenization is
    the vectorized kernel path (tokenize_column); the Sennrich twin
    bpe_train_naive keeps the independent Python `_WORD_RE` tokenizer,
    so the trainer equality gates also pin the two tokenizers equal."""

    def partial(batch: pa.Table) -> pa.Table:
        vc = tokenize_column(batch.column(text_col)).value_counts()
        out = pa.table(
            {
                "word": vc.field("values").cast(pa.string()),
                "n": vc.field("counts").cast(pa.int64()),
            }
        )
        return out.sort_by("word")

    return ds.map_batches(partial, batch_format="pyarrow").groupby("word").sum("n")


def _pair_partial(batch: pa.Table) -> pa.Table:
    """Per-block partial pair counts over the symbolized word table."""
    c: Counter = Counter()
    ns = batch.column("n").to_pylist()
    for sym, n in zip(batch.column("sym").to_pylist(), ns):
        for i in range(len(sym) - 1):
            c[(sym[i], sym[i + 1])] += n
    keys = sorted(c)
    return pa.table(
        {
            "a": pa.array([k[0] for k in keys], pa.string()),
            "b": pa.array([k[1] for k in keys], pa.string()),
            "cnt": pa.array([c[k] for k in keys], pa.int64()),
        }
    )


def _block_top1(batch: pa.Table) -> pa.Table:
    """Per-block best pair (cnt desc, then lexicographic a, b) — shrinks
    the driver reduce to one row per block."""
    if batch.num_rows == 0:
        return batch
    df = batch.to_pandas()
    df = df.sort_values(
        ["sum(cnt)", "a", "b"], ascending=[False, True, True], kind="mergesort"
    )
    return pa.Table.from_pandas(df.head(1), preserve_index=False)


def bpe_train(
    ds,
    text_col: str = "text",
    num_merges: int = 64,
    min_freq: int = 2,
) -> pa.Table:
    """Learn ``num_merges`` BPE merges; returns (rank, a, b, cnt).

    Deterministic: ties on count break lexicographically on (a, b). One
    small shuffle per round over the pair-partial table; the word table
    stays distributed and is re-materialized per round (kmeans-style
    bounded lineage). Stops early when the best pair's count drops below
    ``min_freq``.
    """
    import ray

    words = word_frequency_table(ds, text_col)

    def symbolize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "sym": pa.array(
                    [
                        _word_symbols(w)
                        for w in batch.column("word").to_pylist()
                    ],
                    pa.list_(pa.string()),
                ),
                "n": batch.column("sum(n)").cast(pa.int64()),
            }
        )

    word_ds = words.map_batches(symbolize, batch_format="pyarrow").materialize()

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        partials = word_ds.map_batches(_pair_partial, batch_format="pyarrow")
        pair_counts = partials.groupby(["a", "b"]).sum("cnt")
        top_blocks = pair_counts.map_batches(
            _block_top1, batch_format="pyarrow"
        ).to_pandas()
        if top_blocks.empty:
            break
        top_blocks = top_blocks.sort_values(
            ["sum(cnt)", "a", "b"], ascending=[False, True, True],
            kind="mergesort",
        )
        a, b, cnt = (
            top_blocks.iloc[0]["a"],
            top_blocks.iloc[0]["b"],
            int(top_blocks.iloc[0]["sum(cnt)"]),
        )
        if cnt < min_freq:
            break
        merges.append((rank, a, b, cnt))
        ab = a + b

        def apply(batch: pa.Table, a=a, b=b, ab=ab) -> pa.Table:
            return pa.table(
                {
                    "sym": pa.array(
                        [
                            _apply_merge(s, a, b, ab)
                            for s in batch.column("sym").to_pylist()
                        ],
                        pa.list_(pa.string()),
                    ),
                    "n": batch.column("n"),
                }
            )

        word_ds = word_ds.map_batches(apply, batch_format="pyarrow").materialize()

    if not merges:
        return _MERGES_SCHEMA.empty_table()
    return pa.table(
        {
            "rank": pa.array([m[0] for m in merges], pa.int64()),
            "a": pa.array([m[1] for m in merges], pa.string()),
            "b": pa.array([m[2] for m in merges], pa.string()),
            "cnt": pa.array([m[3] for m in merges], pa.int64()),
        }
    )


def bpe_train_naive(
    texts: list, num_merges: int, min_freq: int = 2
) -> list[tuple[int, str, str, int]]:
    """Single-process Sennrich reference: dict-of-tuples vocabulary, full
    pair recount every round, same (count desc, (a, b) asc) tie-break.
    The independent twin the distributed trainers are equality-gated
    against (tests/test_bpe.py and the bpe_vocab_pin driver query)."""
    wc: Counter = Counter()
    for t in texts:
        if t:
            wc.update(_WORD_RE.findall(t.lower()))
    vocab = {tuple(_word_symbols(w)): n for w, n in wc.items()}
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        pairs: Counter = Counter()
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += n
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_freq:
            break
        merges.append((rank, a, b, cnt))
        new_vocab: dict[tuple, int] = {}
        for sym, n in vocab.items():
            out = tuple(_apply_merge(list(sym), a, b, a + b))
            new_vocab[out] = new_vocab.get(out, 0) + n
        vocab = new_vocab
    return merges


class _BpeShard:
    """One shard of the unique-word table held in actor memory with a
    pair→word inverted index (the fastBPE/HF-tokenizers structure,
    distributed). ``apply_merge`` touches only the words that actually
    contain the merged pair — O(occurrences), not O(vocabulary) — and
    returns the exact pair-count deltas so the driver can maintain the
    global pair-count table incrementally."""

    def __init__(self):
        self.syms: list[list[str]] = []
        self.ns: list[int] = []
        # pair -> set of local word indices whose symbol seq contains it
        self.index: dict[tuple[str, str], set[int]] = {}
        # word -> local index: the word table is globally UNIQUE (it is
        # a groupby output), so a repeated word can only be a replayed
        # ingest block (Ray lineage re-execution of the routing task)
        self.word_ids: dict[str, int] = {}

    def ingest(self, words: list[str], ns: list[int]) -> dict:
        """Append words; return this batch's pair-count contribution.

        Idempotent under Ray Data task re-execution: a replayed block
        re-sends words this shard already holds — they are dropped from
        shard state, but their pair deltas are still returned so the
        reply is bit-identical to the original call (the driver consumes
        each logical output block exactly once either way)."""
        deltas: Counter = Counter()
        for w, n in zip(words, ns):
            sym = _word_symbols(w)
            for p in zip(sym, sym[1:]):
                deltas[p] += n
            if w in self.word_ids:
                # replayed block — already ingested. Only an exact task
                # replay may legally repeat a word (the word table is a
                # groupby output); a repeat with a DIFFERENT count would
                # mean the uniqueness contract broke upstream, and
                # silently dropping it would let the driver's pair table
                # diverge from shard state — fail loudly instead.
                if self.ns[self.word_ids[w]] != n:
                    raise RuntimeError(
                        f"BPE shard re-ingest of {w!r} with count {n} != "
                        f"held {self.ns[self.word_ids[w]]}: word table "
                        "is not unique — not a task replay"
                    )
                continue
            wi = len(self.syms)
            self.word_ids[w] = wi
            self.syms.append(sym)
            self.ns.append(n)
            for p in set(zip(sym, sym[1:])):
                self.index.setdefault(p, set()).add(wi)
        return dict(deltas)

    def apply_merge(self, a: str, b: str) -> dict:
        """Merge (a, b) → a+b in every word containing the pair; return
        exact pair-count deltas (weighted by word frequency)."""
        ab = a + b
        deltas: Counter = Counter()
        affected = list(self.index.get((a, b), ()))
        for wi in affected:
            old = self.syms[wi]
            n = self.ns[wi]
            new = _apply_merge(old, a, b, ab)
            oldc = Counter(zip(old, old[1:]))
            newc = Counter(zip(new, new[1:]))
            for p, c in newc.items():
                d = c - oldc.get(p, 0)
                if d:
                    deltas[p] += d * n
            for p, c in oldc.items():
                if p not in newc:
                    deltas[p] -= c * n
                    s = self.index.get(p)
                    if s is not None:
                        s.discard(wi)
                        if not s:
                            del self.index[p]
            for p in newc.keys() - oldc.keys():
                self.index.setdefault(p, set()).add(wi)
            self.syms[wi] = new
        return dict(deltas)


def effective_num_shards(
    n_words: int, num_shards: int, max_words_per_shard: int
) -> int:
    """Memory guard for the indexed trainer's actor pool: each shard
    holds its words' symbol lists + pair→word inverted index in actor
    heap (~100 B/word), so a skewed or huge vocabulary must widen the
    pool rather than OOM one actor.  Returns the requested pool size or
    ceil(n_words / max_words_per_shard), whichever is larger (never 0)."""
    return max(num_shards, -(-int(n_words) // max_words_per_shard) or 1)


def bpe_train_indexed(
    ds,
    text_col: str = "text",
    num_merges: int = 64,
    min_freq: int = 2,
    num_shards: int = 8,
    max_words_per_shard: int = 4_000_000,
) -> pa.Table:
    """``bpe_train`` with identical output but O(touched occurrences)
    per merge instead of two full dataset passes + a shuffle per merge —
    the r3-verdict scale fix for the 32k-merge case.

    Shape: the corpus collapses once into the unique-word frequency
    table (the only O(corpus) pass); words hash-shard by md5 into a
    fixed actor pool holding symbol sequences + a pair→word inverted
    index; the driver keeps the global pair-count table (≲ tens of MB —
    distinct SYMBOL pairs, not occurrences) with a lazy-deletion
    max-heap keyed (-cnt, a, b) so ties still break lexicographically.
    Each merge round is one actor broadcast + exact count deltas back —
    milliseconds, vs seconds per round for the recount path, and the
    per-round data volume is O(pairs touched by the merge), independent
    of corpus size. 32k merges ≈ minutes of driver loop instead of 32k
    distributed shuffles.

    Why not top-M batched merges instead (the other candidate fix):
    exactness-preserving batching degenerates to M≈1 on natural text —
    after merging ('t','h') the brand-new pair ('th','e') immediately
    outranks every remaining candidate, so any sound batch-validity
    bound cuts the batch at the first merge. The inverted index attacks
    the real cost (per-round work), not the round count.

    Deterministic and bit-identical to ``bpe_train`` / the naive
    reference at any parallelism (equality-gated in tests/test_bpe.py
    and externally by the ``bpe_vocab_pin`` driver query)."""
    import hashlib
    import heapq

    import ray

    # materialize the (small) unique-word table so the count below and
    # the routed ingest read the same computed blocks — the O(corpus)
    # collapse still runs exactly once
    words = word_frequency_table(ds, text_col).materialize()
    # bound per-shard residency by widening the pool instead of OOMing
    # one actor on a skewed corpus (see effective_num_shards)
    num_shards = effective_num_shards(
        words.count(), num_shards, max_words_per_shard
    )
    # num_cpus=0: the shards are memory-resident indexes that work in
    # short bursts; reserving whole CPUs for them would deadlock small
    # clusters against the ingest map_batches tasks they must overlap
    shards = [
        ray.remote(num_cpus=0)(_BpeShard).remote() for _ in range(num_shards)
    ]
    try:
        def route(batch: pa.Table) -> pa.Table:
            """Hash-route this block's words to their shards, fold the
            shards' pair-count contributions into one partial table."""
            ws = batch.column("word").to_pylist()
            ns = batch.column("sum(n)").to_pylist()
            by_shard: list[tuple[list, list]] = [
                ([], []) for _ in range(num_shards)
            ]
            for w, n in zip(ws, ns):
                s = int.from_bytes(
                    hashlib.md5(w.encode()).digest()[:4], "little"
                ) % num_shards
                by_shard[s][0].append(w)
                by_shard[s][1].append(int(n))
            refs = [
                shards[s].ingest.remote(by_shard[s][0], by_shard[s][1])
                for s in range(num_shards)
                if by_shard[s][0]
            ]
            c: Counter = Counter()
            for d in ray.get(refs):
                c.update(d)
            keys = sorted(c)
            return pa.table(
                {
                    "a": pa.array([k[0] for k in keys], pa.string()),
                    "b": pa.array([k[1] for k in keys], pa.string()),
                    "cnt": pa.array([c[k] for k in keys], pa.int64()),
                }
            )

        counts: Counter = Counter()
        for part in words.map_batches(
            route, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            for a, b, c in zip(
                part.column("a").to_pylist(),
                part.column("b").to_pylist(),
                part.column("cnt").to_pylist(),
            ):
                counts[(a, b)] += c

        heap = [(-c, a, b) for (a, b), c in counts.items()]
        heapq.heapify(heap)
        merges: list[tuple[int, str, str, int]] = []
        for rank in range(num_merges):
            best = None
            while heap:
                negc, a, b = heapq.heappop(heap)
                if counts.get((a, b), 0) == -negc:
                    best = (a, b, -negc)
                    break
                # stale lazy-heap entry: the live count (if any) has its
                # own fresher entry pushed on update
            if best is None or best[2] < min_freq:
                break
            a, b, cnt = best
            merges.append((rank, a, b, cnt))
            deltas: Counter = Counter()
            for d in ray.get([s.apply_merge.remote(a, b) for s in shards]):
                deltas.update(d)
            for p, d in deltas.items():
                nc = counts.get(p, 0) + d
                if nc <= 0:
                    counts.pop(p, None)
                else:
                    counts[p] = nc
                    heapq.heappush(heap, (-nc, p[0], p[1]))
    finally:
        for s in shards:
            ray.kill(s)

    if not merges:
        return _MERGES_SCHEMA.empty_table()
    return pa.table(
        {
            "rank": pa.array([m[0] for m in merges], pa.int64()),
            "a": pa.array([m[1] for m in merges], pa.string()),
            "b": pa.array([m[2] for m in merges], pa.string()),
            "cnt": pa.array([m[3] for m in merges], pa.int64()),
        }
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first BPE segmentation of one word."""
    sym = _word_symbols(word)
    while len(sym) > 1:
        best_rank, best_pair = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (sym[i], sym[i + 1])
        if best_pair is None:
            break
        sym = _apply_merge(sym, best_pair[0], best_pair[1], "".join(best_pair))
    return sym


def bpe_encode(
    ds,
    merges: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Per-document BPE token count + distinct-piece count under the
    learned merges. The merge-rank dict is shipped once via ``ray.put``
    and read zero-copy in every task; per-batch encoding memoizes on
    unique words (batch word duplication factor is high in real text).
    Output: (id, bpe_tokens, distinct_pieces)."""
    import ray

    ranks = {
        (a, b): r
        for r, a, b in zip(
            merges.column("rank").to_pylist(),
            merges.column("a").to_pylist(),
            merges.column("b").to_pylist(),
        )
    }
    ranks_ref = ray.put(ranks)

    def encode(batch: pa.Table) -> pa.Table:
        rk = ray.get(ranks_ref)
        memo: dict[str, list[str]] = {}
        n_tokens: list[int] = []
        n_pieces: list[int] = []
        for t in batch.column(text_col).to_pylist():
            words = _WORD_RE.findall(t.lower()) if t else []
            total = 0
            pieces: set[str] = set()
            for w in words:
                enc = memo.get(w)
                if enc is None:
                    enc = encode_word(w, rk)
                    memo[w] = enc
                total += len(enc)
                pieces.update(enc)
            n_tokens.append(total)
            n_pieces.append(len(pieces))
        return pa.table(
            {
                id_col: batch.column(id_col),
                "bpe_tokens": pa.array(n_tokens, pa.int64()),
                "distinct_pieces": pa.array(n_pieces, pa.int64()),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")
