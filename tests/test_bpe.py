"""BPE vocabulary learning vs an independent single-process reference."""

import re
from collections import Counter

import pandas as pd
import pytest

import ray

SF = "/root/testdata/sf0.001"


def _ref_bpe(texts, num_merges, min_freq=2):
    """Naive Sennrich-style reference: dict-of-tuples corpus, full pair
    recount every round, same tie-break (count desc, then (a, b) asc)."""
    wc: Counter = Counter()
    for t in texts:
        wc.update(re.findall(r"[a-z0-9]+", (t or "").lower()))
    vocab = {tuple(list(w) + ["</w>"]): n for w, n in wc.items()}
    merges = []
    for rank in range(num_merges):
        pairs: Counter = Counter()
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_freq:
            break
        merges.append((rank, a, b, cnt))
        new_vocab = {}
        for sym, n in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def test_bpe_train_matches_reference(ray_session):
    from spider_ray.pipelines.bpe import bpe_train

    texts = (
        pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])["text"]
        .head(40)
        .tolist()
    )
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts}))
    got = bpe_train(ds, num_merges=24).to_pylist()
    expected = _ref_bpe(texts, 24)
    assert [(m["rank"], m["a"], m["b"], m["cnt"]) for m in got] == expected


def test_bpe_train_blocking_invariant(ray_session):
    """Same merges regardless of input block layout."""
    from spider_ray.pipelines.bpe import bpe_train

    texts = ["the cat sat on the mat", "the cats sat", "a mat that sat"] * 5
    one = ray.data.from_pandas(pd.DataFrame({"text": texts}))
    many = ray.data.from_pandas(
        [pd.DataFrame({"text": [t]}) for t in texts]
    )
    assert (
        bpe_train(one, num_merges=12).to_pylist()
        == bpe_train(many, num_merges=12).to_pylist()
    )


def test_bpe_train_indexed_matches_reference(ray_session):
    """The actor-sharded incremental trainer (inverted pair→word index,
    driver lazy-heap) is bit-identical to both the recount path and the
    naive single-process reference — including count ties, min_freq
    early-stop, and repeated-symbol pairs like ('a','a')."""
    from spider_ray.pipelines.bpe import bpe_train, bpe_train_indexed

    texts = (
        pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])["text"]
        .head(40)
        .tolist()
    )
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts}))
    indexed = bpe_train_indexed(ds, num_merges=24, num_shards=3).to_pylist()
    assert [
        (m["rank"], m["a"], m["b"], m["cnt"]) for m in indexed
    ] == _ref_bpe(texts, 24)
    assert indexed == bpe_train(ds, num_merges=24).to_pylist()


def test_bpe_train_indexed_edge_corpora(ray_session):
    """Shard-count invariance + tricky corpora: overlapping repeated
    symbols ('aaaa'), ties broken lexicographically, min_freq stop."""
    from spider_ray.pipelines.bpe import bpe_train_indexed

    corpora = [
        ["aaaa aaaa aa", "aaa baab"] * 3,
        ["xy xy yx yx"] * 4,          # count ties -> (x,y) before (y,x)
        ["solo"],                      # everything below min_freq
        [],                            # empty corpus
    ]
    for texts in corpora:
        expected = _ref_bpe(texts, 16)
        for num_shards in (1, 4):
            got = bpe_train_indexed(
                ray.data.from_pandas(pd.DataFrame({"text": texts}))
                if texts
                else ray.data.from_items([{"text": ""}]),
                num_merges=16,
                num_shards=num_shards,
            ).to_pylist()
            assert [
                (m["rank"], m["a"], m["b"], m["cnt"]) for m in got
            ] == expected, (texts, num_shards)


def test_bpe_encode_roundtrip(ray_session):
    """Encoding with the learned merges: greedy segmentation reconstructs
    each word, and fully-merged training words collapse to one piece."""
    from spider_ray.pipelines.bpe import bpe_train, encode_word

    texts = ["low lower lowest", "low low low newer newest"] * 4
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts}))
    merges = bpe_train(ds, num_merges=40, min_freq=1)
    ranks = {
        (a, b): r
        for r, a, b in zip(
            merges.column("rank").to_pylist(),
            merges.column("a").to_pylist(),
            merges.column("b").to_pylist(),
        )
    }
    for w in ["low", "lower", "newest"]:
        enc = encode_word(w, ranks)
        assert "".join(enc) == w + "</w>"
    # 'low' occurs 5x/line — plenty of merges to collapse it fully
    assert encode_word("low", ranks) == ["low</w>"]
    # unseen word still segments (falls back to chars where no merge applies)
    enc = encode_word("zzq", ranks)
    assert "".join(enc) == "zzq</w>"


def test_bpe_encode_counts(ray_session):
    from spider_ray.pipelines.bpe import bpe_encode, bpe_train, encode_word

    df = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["low lower", "newest newest low"]}
    )
    ds = ray.data.from_pandas(df)
    merges = bpe_train(ds, num_merges=20, min_freq=1)
    out = (
        bpe_encode(ds, merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ranks = {
        (a, b): r
        for r, a, b in zip(
            merges.column("rank").to_pylist(),
            merges.column("a").to_pylist(),
            merges.column("b").to_pylist(),
        )
    }
    exp = []
    for _, row in df.iterrows():
        words = re.findall(r"[a-z0-9]+", row["text"].lower())
        encs = [encode_word(w, ranks) for w in words]
        exp.append(
            (
                row["doc_id"],
                sum(len(e) for e in encs),
                len({p for e in encs for p in e}),
            )
        )
    got = list(
        zip(out["doc_id"], out["bpe_tokens"], out["distinct_pieces"])
    )
    assert got == exp


def test_bpe_shard_ingest_replay_idempotent():
    """Ray Data may re-execute a routing task on lineage reconstruction,
    re-sending a block the shard already ingested. The shard must drop
    the repeated words from its state but return bit-identical pair
    deltas, so the driver's one-consume-per-logical-block accounting
    stays exact either way (ADVICE r4, bpe.py _BpeShard.ingest)."""
    from spider_ray.pipelines.bpe import _BpeShard

    words, ns = ["low", "lower", "new"], [5, 2, 3]
    fresh = _BpeShard()
    first = fresh.ingest(words, ns)
    replayed = fresh.ingest(words, ns)  # same block, re-executed task
    assert replayed == first  # reply bit-identical to the original call
    # state not duplicated: one entry per unique word
    assert len(fresh.syms) == len(words)
    assert sorted(fresh.word_ids) == sorted(words)

    # merges after a replay behave exactly as with a single ingest
    clean = _BpeShard()
    clean.ingest(words, ns)
    assert fresh.apply_merge("l", "o") == clean.apply_merge("l", "o")
    assert fresh.apply_merge("lo", "w") == clean.apply_merge("lo", "w")
    assert [s for s in fresh.syms] == [s for s in clean.syms]


def test_bpe_shard_reingest_different_count_raises():
    """A repeated word is only legal as an exact task replay; a repeat
    with a different count means the unique-word-table contract broke
    upstream, and silently dropping it would desync the driver's pair
    table from shard state — the shard fails loudly instead."""
    import pytest

    from spider_ray.pipelines.bpe import _BpeShard

    shard = _BpeShard()
    shard.ingest(["low"], [5])
    with pytest.raises(RuntimeError, match="not a task replay"):
        shard.ingest(["low"], [7])


def test_effective_num_shards_guard():
    """The memory guard widens the pool when the unique-word table would
    exceed max_words_per_shard per actor, never shrinks a requested
    pool, and never returns 0 (VERDICT r4 item 6)."""
    from spider_ray.pipelines.bpe import effective_num_shards

    # small vocab: the requested pool wins
    assert effective_num_shards(10_000_000, 8, 4_000_000) == 8
    # large vocab: ceil(100M / 4M) = 25 shards > the requested 8
    assert effective_num_shards(100_000_000, 8, 4_000_000) == 25
    # exact multiple: no off-by-one widening
    assert effective_num_shards(32_000_000, 8, 4_000_000) == 8
    assert effective_num_shards(32_000_001, 8, 4_000_000) == 9
    # empty corpus: still at least one shard
    assert effective_num_shards(0, 1, 4_000_000) == 1


def test_bpe_indexed_widened_pool_still_exact(ray_session):
    """A vocabulary that overflows max_words_per_shard distributes over
    the auto-widened pool and the merge table stays bit-identical to
    the single-shard run and the naive reference — the guard changes
    placement only, never results."""
    from spider_ray.pipelines.bpe import (
        bpe_train_indexed,
        effective_num_shards,
        word_frequency_table,
    )

    texts = ["the cat sat on the mat", "the cats sat", "a mat that sat"] * 4
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts}))
    n_unique = word_frequency_table(ds).count()
    assert n_unique > 2  # the cap below really forces a widened pool
    assert effective_num_shards(n_unique, 1, 2) == -(-n_unique // 2)

    widened = bpe_train_indexed(
        ds, num_merges=12, num_shards=1, max_words_per_shard=2
    ).to_pylist()
    assert widened == bpe_train_indexed(
        ds, num_merges=12, num_shards=1
    ).to_pylist()
    assert [
        (m["rank"], m["a"], m["b"], m["cnt"]) for m in widened
    ] == _ref_bpe(texts, 12)
