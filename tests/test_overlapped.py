"""Overlapped streaming crawl: identical output to the barriered round loop,
with politeness leased from the shared pacer instead of a host-affinity
shuffle."""

import copy

import ray

from upton_ray.engine import Crawler
from upton_ray.scenarios import scenario_configs


def _rows(res):
    t = res.records_table()
    return list(zip(t["instance_index"].to_pylist(),
                    t["pagination_index"].to_pylist(),
                    t["row_no"].to_pylist(),
                    [tuple(r) for r in t["record"].to_pylist()]))


def _compare(name, ray_session, fixture_web):
    cfg = scenario_configs()[name]
    base = Crawler(copy.deepcopy(cfg), fixture_web).crawl()
    over = Crawler(copy.deepcopy(cfg), fixture_web).crawl_overlapped()
    assert _rows(over) == _rows(base), f"{name}: overlapped output differs"


def test_overlapped_matches_basic(ray_session, fixture_web):
    _compare("basic", ray_session, fixture_web)


def test_overlapped_matches_paginated(ray_session, fixture_web):
    _compare("paginated", ray_session, fixture_web)


def test_overlapped_matches_paginated_error(ray_session, fixture_web):
    _compare("paginated_error", ray_session, fixture_web)


def test_overlapped_synth_corpus_and_politeness(ray_session, tmp_path):
    from upton_ray import sinks, synth
    from upton_ray.config import CrawlConfig

    p = synth.ScaleParams(n_hosts=6, pages_per_host=20, links_per_page=5,
                          spans_per_page=8, media_fraction=0.25,
                          zipf_alpha=0.3, seed=5)
    corpus = str(tmp_path / "corpus")
    sinks.write_web(synth.scale_web(p, parallelism=4), corpus, num_buckets=4)
    delay = 0.001

    def cfg():
        return CrawlConfig(
            index_selector="section#river section h1 a",
            extractor="css:h1.article-title",
            paginated=True, pagination_param="p", pagination_max_pages=1000,
            sleep_time_between_requests=delay, real_sleep=True,
            max_sleep=0.002, debug=True, index_debug=True,
            num_seen_shards=2, fetch_concurrency=2, fetch_batch_size=64)

    seeds = [(h, synth.index_url(p, h), "section#river section h1 a")
             for h in range(p.n_hosts)]
    c1 = Crawler(cfg(), ("parquet", corpus, 4), seeds=seeds)
    base = _rows(c1.crawl())
    c1.shutdown()

    c2 = Crawler(cfg(), ("parquet", corpus, 4), seeds=seeds)
    over = c2.crawl_overlapped()
    assert _rows(over) == base

    # global politeness: every network fetch — index pages (incl. the empty
    # terminator) AND instances — consumed a pacer token, and each host's
    # busy window spans its full budget (windows never overlap, so the
    # wall-clock rate is bounded by 1/delay regardless of workers)
    assert c2.pacer is not None
    _, granted, _ = ray.get(c2.pacer.state.remote())
    spans = ray.get(c2.pacer.spans.remote())
    n_fetches = sum(p.n_articles(h) + p.n_index_pages(h) + 1
                    for h in range(p.n_hosts))
    assert sum(granted.values()) == n_fetches
    for h, g in granted.items():
        first, last = spans[h]
        assert (last - first) >= g * delay - 1e-6, \
            "busy window shorter than the politeness budget"
    c2.shutdown()


def test_overlapped_continuations_consume_pacer_tokens(ray_session):
    """Instance-continuation fetches in overlapped mode also lease from the
    shared budget (no politeness bypass on the sequential path)."""
    from upton_ray.config import CrawlConfig

    span = [{"kind": "body/h1.article-title", "text": "t",
             "media_ref": "", "offset": 0}]
    web = {"http://s.test/index": [
               {"kind": "section#river/section/h1/a", "text": "x",
                "media_ref": "http://s.test/a.html", "offset": 0}],
           "http://s.test/a.html": span,
           "http://s.test/a_page_1.html": span}
    cfg = CrawlConfig(
        index_url="http://s.test/index",
        index_selector="section#river section h1 a",
        extractor="css:h1.article-title",
        next_instance_page_url=lambda url, i: url.replace(
            ".html", f"_page_{i}.html") if i <= 1 and "_page_" not in url
            else "",
        sleep_time_between_requests=0.001, real_sleep=True, max_sleep=0.002,
        debug=True, index_debug=True, num_seen_shards=1, fetch_concurrency=1)
    c = Crawler(cfg, web)
    res = c.crawl_overlapped()
    t = res.records_table()
    assert t.num_rows == 2   # instance + its continuation page
    assert c.pacer is not None
    _, granted, _ = ray.get(c.pacer.state.remote())
    # index page, instance fetch AND continuation fetch each consumed a token
    assert granted.get("s.test", 0) == 3
    c.shutdown()
