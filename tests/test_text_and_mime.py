from spider_ray.functions.cachekey import UNDEFINED, create_cache_key, stable_stringify
from spider_ray.functions.mime import infer_content_type, is_download_error, is_pdf_file
from spider_ray.functions.text import (
    bpe_ish_token_count,
    extract_html_metadata,
    fingerprint64,
    lang_id,
    looks_like_pdf,
    quality_score,
    strip_html_to_text,
    text_stats,
    token_count,
)


def test_strip_html_to_text():
    html = "<html><script>var x=1;</script><style>.a{}</style><body><p>Hello  <b>world</b></p></body></html>"
    assert strip_html_to_text(html) == "Hello world"


def test_extract_html_metadata():
    html = "<head><title> My Title </title><meta name=\"description\" content=\"Desc here\"></head>"
    meta = extract_html_metadata(html)
    assert meta["title"] == "My Title"
    assert meta["description"] == "Desc here"
    assert extract_html_metadata("<p>none</p>") == {"title": None, "description": None}


def test_looks_like_pdf():
    assert looks_like_pdf("http://x.test/a.pdf", "")
    assert looks_like_pdf("http://x.test/a", "%PDF-1.4 ...")
    assert not looks_like_pdf("http://x.test/a", "<html>")


def test_stable_stringify_matches_js_semantics():
    # sorted keys, dropped undefined, compact separators (cache.ts:62-105)
    assert stable_stringify({"b": 1, "a": [True, None]}) == '{"a":[true,null],"b":1}'
    assert stable_stringify({"x": UNDEFINED, "y": "s"}) == '{"y":"s"}'
    assert stable_stringify(1.0) == "1"
    assert stable_stringify(1.5) == "1.5"


def test_create_cache_key_shape_and_determinism():
    k1 = create_cache_key("simple", "http://x.test/", [{"headers": {"b": "2", "a": "1"}}])
    k2 = create_cache_key("simple", "http://x.test/", [{"headers": {"a": "1", "b": "2"}}])
    assert k1 == k2  # key order canonicalized
    assert k1.startswith("simple:") and len(k1.split(":")[1]) == 64
    assert k1 != create_cache_key("dom", "http://x.test/", [{"headers": {"a": "1", "b": "2"}}])
    assert k1 != create_cache_key("simple", "http://x.test/", [{"headers": {"a": "1"}}])


def test_infer_content_type():
    assert infer_content_type("A.PDF") == "application/pdf"
    assert infer_content_type("x.tar") == "application/x-tar"
    assert infer_content_type("noext") == "application/octet-stream"
    assert infer_content_type(None) == "application/octet-stream"


def test_pdf_and_download_error_predicates():
    assert is_pdf_file("x.Pdf")
    assert not is_pdf_file("x.doc")
    assert is_download_error("blah Download is starting blah")
    assert is_download_error("net::ERR_ABORTED")
    assert not is_download_error("ok")


def test_token_counts():
    assert token_count("a b  c") == 3
    assert token_count("  ") == 1  # matches SQL regexp_split_to_array on ''
    assert bpe_ish_token_count("Hello world, it's 42!") > 4


def test_text_stats_and_quality():
    s = text_stats("Ab c1")
    assert s["n_chars"] == 5 and s["n_words"] == 2
    assert 0 <= quality_score("the quick brown fox jumps over whatever dog") <= 1


def test_lang_id_heuristic():
    assert lang_id("the cat and the dog went over the bridge") == "en"
    assert lang_id("") == "und"


def test_fingerprint_deterministic_and_local():
    a = fingerprint64("hello world this is a document " * 10)
    assert a == fingerprint64("hello world this is a document " * 10)
    assert isinstance(a, int)


def test_c4_quality_flags_every_bit(ray_session):
    import pyarrow as pa
    import ray

    from spider_ray.pipelines.textops import c4_quality_flags

    good = "the quick brown fox jumps over to all lazy dogs " * 3
    texts = {
        0: good,
        1 | 32: "the cat sat on a mat",                # <20 words, mean<3
        2: good + " " + "x" * 60,                      # long word
        # 20 two-char words, no stopword → bits 4 and 32
        4 | 32: "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk jj ii hh gg",
        16: good + " {",                               # code brace
        8 | 16: good + " {javascript}",                # both
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(list(texts.values()), pa.string()),
        }
    )
    out = (
        c4_quality_flags(ray.data.from_arrow(tbl))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["flags"].tolist() == list(texts.keys())
    assert out["keep"].tolist() == [f == 0 for f in texts.keys()]


def test_jsonx_fast_and_strict_paths(ray_session):
    import pandas as pd
    import pyarrow as pa

    import ray

    from spider_ray.functions.jsonx import extract_int, extract_str, with_json_int

    col = pa.chunked_array([pa.array([
        '{"k": 87, "s": "hi"}',
        '{"s":"x","k":-3}',
        '{"nope": 1}',
        'not json at all',
        None,
        '{"k": 1e2}',  # scientific float: regex misses, strict parses
    ])])
    vals = extract_int(col, "k").to_pylist()
    assert vals == [87, -3, None, None, None, None]
    assert extract_str(col, "s").to_pylist()[:2] == ["hi", "x"]

    ds = ray.data.from_pandas(
        pd.DataFrame({"props": col.to_pylist(), "i": range(6)})
    )
    fast = with_json_int(ds, "props", "k").to_pandas().sort_values("i")
    assert fast["k"].tolist()[:2] == [87, -3]
    strict = (
        with_json_int(ds, "props", "k", strict=True).to_pandas().sort_values("i")
    )
    got = [None if pd.isna(v) else int(v) for v in strict["k"]]
    # strict repairs the scientific-notation row, leaves the rest null
    assert got == [87, -3, None, None, None, 100]


def test_jsonx_int64_boundary():
    """19-digit integers parse when they fit int64; only true overflow
    nulls (every ns epoch since 2001 is 19 digits — must not be lost)."""
    import pyarrow as pa

    from spider_ray.functions.jsonx import extract_int

    col = pa.chunked_array([pa.array([
        '{"k": 1650000000000000000}',
        '{"k": 9223372036854775807}',   # int64 max
        '{"k": 9223372036854775808}',   # max + 1
        '{"k": -9223372036854775808}',  # int64 min
        '{"k": 123456789012345678901234}',
        '{"k": 5}',
    ])])
    assert extract_int(col, "k").to_pylist() == [
        1650000000000000000,
        9223372036854775807,
        None,
        -9223372036854775808,
        None,
        5,
    ]
