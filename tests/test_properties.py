"""Property-based tests (hypothesis) for the pure kernels: URL
canonicalization, the cuckoo filter's no-false-negative contract, and the
selector compiler's path/selector round trip."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

_label = st.from_regex(r"[a-z][a-z0-9\-]{0,8}", fullmatch=True)
_tag = st.from_regex(r"[a-z][a-z0-9]{0,5}", fullmatch=True)


@st.composite
def _urls(draw):
    scheme = draw(st.sampled_from(["http", "https"]))
    host = ".".join(draw(st.lists(_label, min_size=1, max_size=3)))
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = "/" + "/".join(draw(st.lists(_label, max_size=3)))
    q = draw(st.lists(
        st.tuples(_label, st.integers(0, 99)), max_size=4))
    query = "&".join(f"{k}={v}" for k, v in q)
    frag = draw(st.sampled_from(["", "#top", "#x-1"]))
    return (f"{scheme}://{host}{port}{path}"
            + (f"?{query}" if query else "") + frag)


@given(_urls())
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(url):
    from upton_ray.urlops import canonicalize_url as c

    once = c(url)
    assert c(once) == once, (url, once, c(once))
    assert "#" not in once                      # fragment always dropped


@given(_urls(), _urls())
@settings(max_examples=100, deadline=None)
def test_canonicalize_query_order_insensitive(u1, u2):
    from urllib.parse import urlsplit, urlunsplit

    from upton_ray.urlops import canonicalize_url as c

    s = urlsplit(u1)
    parts = s.query.split("&") if s.query else []
    shuffled = "&".join(reversed(parts))
    assert c(u1) == c(urlunsplit(
        (s.scheme, s.netloc, s.path, shuffled, s.fragment)))


@given(st.lists(st.text(alphabet="abcdefghij:/._", min_size=1, max_size=24),
                min_size=1, max_size=300, unique=True),
       st.integers(16, 256))
@settings(max_examples=50, deadline=None)
def test_cuckoo_never_false_negative(urls, capacity):
    """Whatever the load factor (spill path included), every added key must
    test positive — a false negative means a permanent refetch loop."""
    from upton_ray.seen import Cuckoo, _hash2

    c = Cuckoo(capacity=capacity)
    arr = np.asarray(urls, dtype=object)
    h1, h2 = _hash2(arr)
    c.add(h1, h2)
    assert c.contains(h1, h2).all()
    deleted = c.delete(h1, h2)
    assert deleted.all()


@st.composite
def _kind_paths(draw):
    """A kind path plus CSS/XPath selectors DERIVED from it (so a match is
    guaranteed by construction)."""
    segs = []
    for _ in range(draw(st.integers(1, 4))):
        tag = draw(_tag)
        cls = draw(st.sampled_from(["", ".aa", ".bb-cc"]))
        ordinal = draw(st.sampled_from(["", "[2]", "[13]"]))
        segs.append(f"{tag}{cls}{ordinal}")
    return "/".join(segs), segs


@given(_kind_paths())
@settings(max_examples=150, deadline=None)
def test_selector_derived_from_path_matches(path_segs):
    from upton_ray.selector import match_kind

    path, segs = path_segs
    tags = [s.split(".")[0].split("[")[0] for s in segs]
    # descendant CSS over the tags
    assert match_kind(path, " ".join(tags)), (path, tags)
    # child-combinator CSS (segments are adjacent by construction)
    assert match_kind(path, " > ".join(tags)), path
    # XPath child axis, rooted and unrooted
    assert match_kind(path, "/" + "/".join(tags)), path
    assert match_kind(path, "//" + "/".join(tags)), path
    # last tag alone as a descendant selector
    assert match_kind(path, tags[-1]), path


@given(_kind_paths(), _tag)
@settings(max_examples=150, deadline=None)
def test_selector_wrong_final_tag_never_matches(path_segs, other):
    from upton_ray.selector import match_kind

    path, segs = path_segs
    last = segs[-1].split(".")[0].split("[")[0]
    if other == last or any(other == s.split(".")[0].split("[")[0]
                            for s in segs):
        return
    assert not match_kind(path, other), (path, other)


@given(st.lists(st.text(alphabet="0123456789abcdef", min_size=32,
                        max_size=32), min_size=1, max_size=200),
       st.integers(min_value=10, max_value=22),
       st.integers(min_value=1, max_value=6))
@settings(max_examples=60, deadline=None)
def test_bloom_never_false_negative(fp_hexes, log_m, k):
    """The snapshot-dedup bloom can produce false positives but NEVER a
    false negative, for any md5-hex input set, any power-of-two size,
    any probe count — a false negative would silently DROP a genuinely
    new document."""
    from upton_ray.datapipe import _bloom_hashes, _bloom_set, _bloom_test

    bm = np.zeros((1 << log_m) // 8, np.uint8)
    h1, h2 = _bloom_hashes(fp_hexes)
    _bloom_set(bm, h1, h2, k)
    assert _bloom_test(bm, h1, h2, k).all()


@given(st.lists(st.integers(min_value=-2**62, max_value=2**62),
                min_size=1, max_size=100))
@settings(max_examples=40, deadline=None)
def test_snapshot_split_stable_and_bounded(ids):
    """The snapshot split law is deterministic across calls/orderings and
    lands in [0, modulus) — the old/new partition of a corpus must never
    depend on batch boundaries."""
    from upton_ray.datapipe import _snapshot_splits

    a = np.array(ids, np.int64)
    s1 = _snapshot_splits(a)
    s2 = _snapshot_splits(a[::-1].copy())[::-1]
    assert np.array_equal(s1, s2)
    assert ((s1 >= 0) & (s1 < 10)).all()
