"""Property-based tests (hypothesis) for the pure operator layer — the
reference has no randomized testing (SURVEY.md §5); these pin the algebraic
contracts the distributed engine relies on. No Ray session needed."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from upton_ray.frontier import HostScheduler
from upton_ray.seen import Cuckoo, _hash2
from upton_ray.urlops import resolve_url
from upton_ray.datapipe import rolling_kgram_hashes, winnow

SETTINGS = dict(max_examples=40, deadline=None)

host = st.from_regex(r"[a-z]{1,8}\.(test|example)", fullmatch=True)
path_seg = st.from_regex(r"[A-Za-z0-9_\-]{1,10}", fullmatch=True)


@given(h=host, segs=st.lists(path_seg, min_size=0, max_size=4))
@settings(**SETTINGS)
def test_resolve_absolute_passthrough(h, segs):
    url = "http://" + h + "/" + "/".join(segs)
    assert resolve_url(url, "http://base.test/x") == url


@given(h=host, seg=path_seg, rel=path_seg)
@settings(**SETTINGS)
def test_resolve_idempotent_under_rejoin(h, seg, rel):
    base = f"http://{h}/{seg}/"
    once = resolve_url(rel, base)
    assert resolve_url(once, base) == once, "resolved URLs are fixed points"


@given(urls=st.lists(st.from_regex(r"http://h[0-9]{1,3}\.test/[a-z0-9]{1,12}",
                                   fullmatch=True),
                     min_size=1, max_size=200, unique=True),
       n_del=st.integers(min_value=0, max_value=50))
@settings(**SETTINGS)
def test_cuckoo_no_false_negatives_under_churn(urls, n_del):
    c = Cuckoo(capacity=4096)
    arr = np.asarray(urls, dtype=object)
    h1, h2 = _hash2(arr)
    c.add(h1, h2)
    k = min(n_del, len(urls))
    if k:
        c.delete(h1[:k], h2[:k])
    if k < len(urls):
        assert c.contains(h1[k:], h2[k:]).all(), \
            "surviving members must always test positive"


@given(text=st.text(alphabet="abcdefgh ", min_size=1, max_size=200),
       w=st.integers(min_value=2, max_value=6))
@settings(**SETTINGS)
def test_winnowing_coverage_guarantee(text, w):
    h = rolling_kgram_hashes(text, k=4)
    sel = set(winnow(h, w).tolist())
    if len(h) >= w:
        wins = np.lib.stride_tricks.sliding_window_view(h, w)
        assert all(any(int(v) in sel for v in win) for win in wins), \
            "every w-window must contribute a fingerprint"
    else:
        assert sel, "short docs still fingerprint"


@given(counts=st.lists(st.integers(min_value=1, max_value=20),
                       min_size=1, max_size=8))
@settings(**SETTINGS)
def test_edf_order_respects_per_host_spacing(counts):
    """order_batch's simulated schedule never places two fetches of one host
    closer than its delay allows relative to other hosts' queue pressure:
    concretely, between consecutive fetches of host i there are either >= 1
    other-host fetches or no other host has work left."""
    urls = np.array([f"http://h{i}.test/p{j}"
                     for i, n in enumerate(counts) for j in range(n)],
                    dtype=object)
    sched = HostScheduler(crawl_delay=1.0)
    order = sched.order_batch(urls)
    assert sorted(order.tolist()) == list(range(len(urls)))
    hosts = [u.split("//")[1].split("/")[0] for u in urls[order]]
    remaining = {f"h{i}.test": n for i, n in enumerate(counts)}
    prev = None
    for h in hosts:
        remaining[h] -= 1
        if h == prev:   # back-to-back same host only if it's the sole host left
            assert all(v == 0 for k, v in remaining.items() if k != h), \
                "same host scheduled back-to-back while others had work"
        prev = h
