"""Text-analysis pipelines over a documents Dataset (doc_id, text, ...).

Thin, vectorizable ``map_batches`` wrappers around functions.text:
language-ID, quality scoring, token counting, fingerprinting, stats.
Regexes compile once per actor/worker via module import — no per-batch
setup.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.text import (
    bpe_ish_token_count,
    fingerprint64,
    lang_id,
    quality_score,
    text_stats,
    token_count,
)


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    return batch.append_column(
        "n_tokens", pa.array([token_count(t) for t in texts], pa.int64())
    ).append_column(
        "n_bpe_tokens", pa.array([bpe_ish_token_count(t) for t in texts], pa.int64())
    )


def text_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    stats = [text_stats(t) for t in texts]
    for name, typ in (
        ("n_chars_actual", pa.int64()),
        ("n_words", pa.int64()),
        ("mean_word_len", pa.float64()),
        ("alpha_ratio", pa.float64()),
        ("upper_ratio", pa.float64()),
        ("digit_ratio", pa.float64()),
    ):
        key = "n_chars" if name == "n_chars_actual" else name
        batch = batch.append_column(name, pa.array([s[key] for s in stats], typ))
    return batch


def lang_quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    return batch.append_column(
        "lang_pred", pa.array([lang_id(t) for t in texts], pa.string())
    ).append_column(
        "quality", pa.array([quality_score(t) for t in texts], pa.float64())
    )


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    from .dedup import _to_i64

    texts = batch.column(text_col).to_pylist()
    fps = [_to_i64(fingerprint64(t)) for t in texts]
    return batch.append_column("fingerprint", pa.array(fps, pa.int64()))


def analyze(ds, text_col: str = "text"):
    """All analyses in one pass (single map_batches — one traversal)."""
    def all_batch(batch: pa.Table) -> pa.Table:
        batch = token_count_batch(batch, text_col)
        batch = text_stats_batch(batch, text_col)
        batch = lang_quality_batch(batch, text_col)
        return fingerprint_batch(batch, text_col)

    return ds.map_batches(all_batch, batch_format="pyarrow")
