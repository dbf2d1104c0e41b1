"""Curation operators: repetition signals, decontamination, regex scans."""

import pyarrow as pa
import ray

from spider_ray.pipelines.curation import (
    PII_PATTERNS,
    bench_ngram_set,
    decontaminate,
    regex_count,
    repetition_signals,
)


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array(rows, pa.string()),
            }
        )
    )


def _collect(ds) -> pa.Table:
    return pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )


def _by_id(table: pa.Table) -> dict:
    rows = table.to_pylist()
    return {r["doc_id"]: r for r in rows}


def test_repetition_signals_counts(ray_session):
    ds = _docs(
        [
            "a b a b a b",          # heavy bigram repetition
            "one two three four",   # all distinct
            "x",                    # too short for any n-gram
            "",                     # empty → the single '' token
        ]
    )
    out = _by_id(_collect(repetition_signals(ds)))
    r0 = out[0]
    # "a b a b a b": bigrams = [a b, b a, a b, b a, a b] → top count 3
    assert (r0["n_words"], r0["n_bigrams"], r0["n_distinct_bigrams"]) == (6, 5, 2)
    assert r0["top_bigram_cnt"] == 3
    # 3-grams: [a b a, b a b, a b a, b a b] → 4 total, 2 distinct → 2 dups
    assert (r0["n_3grams"], r0["dup3_cnt"]) == (4, 2)
    r1 = out[1]
    assert (r1["top_bigram_cnt"], r1["dup3_cnt"]) == (1, 0)
    r2 = out[2]
    assert (r2["n_words"], r2["n_bigrams"], r2["n_3grams"]) == (1, 0, 0)
    r3 = out[3]  # '' → [''] single token, SQL split semantics
    assert (r3["n_words"], r3["n_bigrams"], r3["top_bigram_cnt"]) == (1, 0, 0)


def test_decontaminate_flags_shared_ngram(ray_session):
    bench_ds = _docs(["the quick brown fox jumps"])
    bench = bench_ngram_set(bench_ds, n=4)
    # 4-grams of a 5-word doc: 2 grams
    assert bench == {
        "the quick brown fox",
        "quick brown fox jumps",
    }
    corpus = _docs(
        [
            "i saw the quick brown fox yesterday",  # contains bench 4-gram
            "the quick red fox jumps high",          # no shared 4-gram
            "tiny",                                  # too short
        ]
    )
    out = _by_id(_collect(decontaminate(corpus, bench, n=4)))
    assert out[0]["contaminated"] == 1
    assert out[1]["contaminated"] == 0
    assert out[2]["contaminated"] == 0


def test_decontaminate_empty_benchmark(ray_session):
    corpus = _docs(["anything at all goes here"])
    out = decontaminate(corpus, frozenset(), n=4).take_all()
    assert out[0]["contaminated"] == 0


def test_regex_count_pii_patterns(ray_session):
    import re

    rows = [
        "contact bob@example.com or alice@test.org today",
        "server at 10.0.0.1 and 192.168.1.254 responded",
        "call 555-123-4567 or 555 987 6543",
        "ssn 123-45-6789 leaked",
        "clean text with no sensitive content",
    ]
    got = _by_id(_collect(regex_count(_docs(rows), PII_PATTERNS)))
    assert got[0]["email_n"] == 2
    assert got[1]["ipv4_n"] == 2
    assert got[2]["phone_n"] == 2
    assert got[3]["ssn_shaped_n"] == 1
    assert all(
        got[4][k] == 0 for k in ("email_n", "ipv4_n", "phone_n", "ssn_shaped_n")
    )
    # cross-check the vectorized kernel against Python re on every row
    for i, text in enumerate(rows):
        for name, pat in PII_PATTERNS.items():
            assert got[i][name] == len(re.findall(pat, text)), (i, name)


def test_global_running_sum_matches_serial(ray_session):
    import numpy as np

    from spider_ray.pipelines.events import global_running_sum

    rng = np.random.default_rng(7)
    ids = rng.permutation(1000).astype("int64")  # unordered input blocks
    vals = rng.integers(1, 50, size=1000).astype("int64")
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(ids), "v": pa.array(vals)})
    ).repartition(7)
    out = (
        _collect(global_running_sum(ds, "k", "v", n_ranges=5, out_col="cum"))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    order = np.argsort(ids)
    expect = np.cumsum(vals[order])
    assert (out["cum"].to_numpy() == expect).all()
    assert out["cum"].iloc[-1] == vals.sum()


def test_pack_documents_assignment(ray_session):
    from spider_ray.pipelines.curation import pack_documents

    # 3 docs × 4 tokens, seq_len 6: starts at 0, 4, 8 → packs 0, 0, 1
    docs = _docs(["a b c d", "e f g h", "i j k l"])
    out = _by_id(_collect(pack_documents(docs, id_col="doc_id", seq_len=6)))
    assert [out[i]["n_tokens"] for i in range(3)] == [4, 4, 4]
    assert [out[i]["pack_id"] for i in range(3)] == [0, 0, 1]


def test_split_assign_deterministic_and_total(ray_session):
    from spider_ray.pipelines.curation import split_assign

    docs = _docs(["text %d" % i for i in range(400)])
    out = _collect(split_assign(docs, key_col="doc_id")).to_pandas()
    assert len(out) == 400
    counts = out["split"].value_counts().to_dict()
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts.get("val", 0)  # 90/5/5 shape
    # deterministic: a second run assigns identically
    again = _collect(split_assign(docs, key_col="doc_id")).to_pandas()
    assert (out.sort_values("doc_id")["split"].to_numpy()
            == again.sort_values("doc_id")["split"].to_numpy()).all()


def test_weighted_mixture_rates(ray_session):
    import pyarrow.compute as pc

    from spider_ray.pipelines.curation import weighted_mixture

    n = 600
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "source": pa.array(
                ["keep_all", "half", "drop"][:1] * 0
                + [("keep_all", "half", "drop")[i % 3] for i in range(n)],
                pa.string(),
            ),
        }
    )
    ds = ray.data.from_arrow(tbl)
    out = _collect(
        weighted_mixture(
            ds, group_col="source", key_col="doc_id",
            rates={"keep_all": 1.0, "half": 0.5},  # 'drop' absent → rate 0
        )
    ).to_pandas()
    per = out["source"].value_counts().to_dict()
    assert per.get("keep_all") == n // 3          # rate 1.0 keeps everything
    assert "drop" not in per                       # unknown group drops
    assert 0.3 * (n // 3) < per.get("half", 0) < 0.7 * (n // 3)


def test_redact_patterns_pii_defaults(ray_session):
    """Default REDACT_PATTERNS scrub: placeholders in, counts right,
    SSN-shaped matched before the looser phone shape, nulls safe."""
    from spider_ray.pipelines.curation import redact_patterns

    docs = _docs(
        [
            "mail a@b.io or c.d+x@e.co.uk now",
            "host 10.0.0.1 ssn 123-45-6789 phone 555-123-4567",
            "clean text",
            None,
        ]
    )
    out = _by_id(_collect(redact_patterns(docs)))
    assert out[0]["redacted_text"] == "mail <EMAIL> or <EMAIL> now"
    assert out[0]["n_redactions"] == 2
    assert (
        out[1]["redacted_text"]
        == "host <IPV4> ssn <SSN> phone <PHONE>"
    )
    assert out[1]["n_redactions"] == 3
    assert out[2]["redacted_text"] == "clean text"
    assert out[2]["n_redactions"] == 0
    assert out[3]["redacted_text"] == "" and out[3]["n_redactions"] == 0


def test_normalize_text_kernels(ray_session):
    from spider_ray.pipelines.curation import normalize_text

    docs = _docs(["  The   QUICK\tbrown\nfox  ", "", "a  b"])
    out = _by_id(_collect(normalize_text(docs)))
    assert out[0]["norm_text"] == "the quick brown fox"
    assert out[1]["norm_text"] == ""
    assert out[2]["norm_text"] == "a b"
