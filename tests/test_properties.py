"""Property-based tests (hypothesis) for the deterministic core functions."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from spider_ray.functions.links import extract_html_links
from spider_ray.functions.urls import (
    canonicalize_url,
    host_of,
    is_valid_url,
    resolve_href,
    url_hash64,
)
from spider_ray.state.bloom import BloomFilter
from spider_ray.state.cuckoo import CuckooFilter

_hostchars = st.text(alphabet=string.ascii_lowercase + string.digits, min_size=1, max_size=8)
# no "." — dot-segment normalization (..) is urljoin's business, not ours
_pathchars = st.text(
    alphabet=string.ascii_letters + string.digits + "/-_", min_size=0, max_size=24
)


@st.composite
def urls(draw):
    host = draw(_hostchars)
    path = draw(_pathchars)
    scheme = draw(st.sampled_from(["http", "https"]))
    suffix = draw(st.sampled_from(["", "#frag", "?q=1", ":8080/x"]))
    return f"{scheme}://{host}.test/{path}{suffix}"


@given(urls())
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(url):
    once = canonicalize_url(url)
    assert canonicalize_url(once) == once  # canonical form is a fixpoint
    assert is_valid_url(once)
    assert host_of(once)  # canonical urls always carry a host
    assert 0 <= url_hash64(once) < 2**64


@given(urls(), _pathchars)
@settings(max_examples=200, deadline=None)
def test_resolve_absolute_passthrough_and_relative_joins(base, rel):
    # absolute hrefs pass through untouched
    assert resolve_href(base, "http://other.test/") == base
    # relative hrefs resolve onto the base host
    resolved = resolve_href(rel.lstrip("/") or "x", base)
    assert resolved.startswith(("http://", "https://"))


@given(
    st.lists(
        st.tuples(_pathchars, st.text(max_size=12, alphabet=string.printable.replace("<", "").replace(">", "").replace("&", ""))),
        min_size=0,
        max_size=8,
    )
)
@settings(max_examples=100, deadline=None)
def test_extract_links_dedup_and_absolute(pairs):
    # "/x" prefix guarantees a single leading slash (p may start with "/",
    # and "//…" would be protocol-relative — correct urljoin semantics but
    # not what this invariant is about)
    html = "".join(f'<a href="/x{p}">{t}</a>' for p, t in pairs)
    links = extract_html_links(html, "http://b.test/base/")
    hrefs = [l.href for l in links]
    assert len(hrefs) == len(set(hrefs))  # first-wins dedup invariant
    assert all(h.startswith("http://b.test/") for h in hrefs)
    # every distinct href from the input survives
    distinct_inputs = {f"http://b.test/x{p}" for p, _ in pairs}
    assert set(hrefs) == distinct_inputs


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=1, max_size=300, unique=True))
@settings(max_examples=50, deadline=None)
def test_filters_have_no_false_negatives(keys):
    import numpy as np

    arr = np.array(keys, dtype=np.uint64)
    bf = BloomFilter(max(1024, len(arr) * 2), 0.01)
    bf.add_many(arr)
    assert bf.contains_many(arr).all()
    cf = CuckooFilter(max(1024, len(arr) * 2))
    assert cf.add_many(arr) == len(arr)
    assert cf.contains_many(arr).all()
