"""End-to-end conformance: the distributed engine must reproduce the
sequential oracle's observable trace on every scenario — crawl order
(index list + record order), extracted values, URL-seen set, sleep counts."""

import os

import pytest

from upton_ray.engine import Crawler
from upton_ray.oracle import UptonOracle
from upton_ray.scenarios import scenario_configs
from upton_ray.synth import BASE, HEADLINES

CFGS = scenario_configs()

CONFORMANCE = ["basic", "relative", "list", "table", "paginated",
               "paginated_error", "paginated_sleeps", "dedup_stash",
               "nocache_refetch", "instance_error", "continuation",
               "sitemap"]


@pytest.mark.parametrize("name", CONFORMANCE)
def test_scenario_matches_oracle(name, ray_session, fixture_web):
    import copy

    cfg = CFGS[name]
    oracle = UptonOracle(copy.deepcopy(cfg), fixture_web).scrape()
    res = Crawler(cfg, fixture_web).crawl(trace=True)

    assert res.documents() == oracle.documents, f"{name}: documents differ"
    if cfg.url_array is None:
        assert res.index_urls == oracle.index_urls, f"{name}: index order differs"
    assert res.fetched_urls == oracle.seen, f"{name}: URL-seen set differs"
    assert res.sleeps == oracle.sleeps, f"{name}: sleep count differs"


def test_robots_blocks_without_fetch(ray_session, fixture_web):
    cfg = CFGS["robots"]
    res = Crawler(cfg, fixture_web).crawl(trace=True)
    # sixfacts blocked -> empty record, never fetched, no sleep for it
    assert res.documents() == [HEADLINES["webinar"], "", HEADLINES["prosecutor"], ""]
    assert BASE + "sixfacts.html" not in res.fetched_urls
    m = res.metrics.to_pylist()[0]
    assert m["robots_blocked"] == 1


def test_csv_sink_matches_oracle_rows(ray_session, fixture_web, tmp_path):
    import csv

    from upton_ray import sinks

    for name in ("basic", "table", "list"):
        cfg = CFGS[name]
        oracle = UptonOracle(cfg, fixture_web)
        expected = oracle.scrape_to_rows()
        res = Crawler(cfg, fixture_web).crawl(trace=True)
        f = tmp_path / f"{name}.csv"
        sinks.write_csv(res.records, str(f))
        with open(f, newline="") as fh:
            got = [row for row in csv.reader(fh)]
        exp = [[str(c) for c in row] for row in expected]
        assert got == exp, name


def test_checkpoint_resume_skips_fetches(ray_session, fixture_web, tmp_path):
    import copy

    stash = str(tmp_path / "stash")
    cfg = copy.deepcopy(CFGS["basic"])
    cfg.stash_folder = stash
    cfg.index_debug = True

    r1 = Crawler(cfg, fixture_web).crawl(trace=True)
    assert r1.sleeps == 5
    assert os.path.exists(os.path.join(stash, "seen.parquet"))
    assert os.path.exists(os.path.join(stash, "lineage.json"))

    # resume: a fresh crawler over the same stash refetches NOTHING
    cfg2 = copy.deepcopy(cfg)
    r2 = Crawler(cfg2, fixture_web).crawl(trace=True)
    assert r2.documents() == r1.documents()
    assert r2.sleeps == 0, "resume must hit the stash, not the network"
    assert r2.fetched_urls == set()


def test_lazy_records_dataset(ray_session, fixture_web):
    """trace=False returns a lazy Dataset; consuming it yields sorted records."""
    cfg = CFGS["basic"]
    res = Crawler(cfg, fixture_web).crawl(trace=False)
    t = res.records_table()
    assert t.num_rows == 4
    assert t["record"].to_pylist()[0] == [HEADLINES["webinar"]]


def test_seen_set_survives_large_batches(ray_session):
    """Stash fetch-once across many duplicate URLs and batches."""
    import numpy as np

    from upton_ray.seen import SeenSet

    s = SeenSet(num_shards=4)
    urls = [f"http://h{i % 50}.org/p{i % 200}" for i in range(1000)]
    new1 = s.check_and_add(urls)
    assert new1.sum() == len(set(urls))
    new2 = s.check_and_add(urls)
    assert new2.sum() == 0
    assert s.size() == len(set(urls))
    assert s.contains(np.array(["http://h0.org/p0", "http://nope.org/x"],
                               dtype=object)).tolist() == [True, False]


def test_canonicalize_seen_merges_query_orderings(ray_session):
    """Opt-in canonical seen keys: ?a=1&b=2 and ?b=2&a=1 share one fetch;
    reference default keeps them distinct (upton_downloader_spec: distinct
    query strings are distinct cache keys)."""
    span = [{"kind": "html body h1.article-title", "text": "t",
             "media_ref": "", "offset": 0}]
    web = {"http://h.test/p?a=1&b=2": span, "http://h.test/p?b=2&a=1": span}
    urls = list(web)

    from upton_ray.config import CrawlConfig

    for canon, expected_fetches in ((False, 2), (True, 1)):
        cfg = CrawlConfig(url_array=urls, extractor="css:h1.article-title",
                          sleep_time_between_requests=0,
                          canonicalize_seen=canon, num_seen_shards=2,
                          fetch_concurrency=2)
        res = Crawler(cfg, web).crawl(trace=True)
        m = res.metrics.to_pylist()[0]
        assert m["fetched"] == expected_fetches, f"canonicalize_seen={canon}"
        assert res.records_table().num_rows == 2, "rows always kept"


def test_custom_index_successor_hook(ray_session):
    """P1 override (subclass hook upton.rb:149): a path-based pagination
    successor replaces the query-param scheme entirely."""
    from upton_ray.config import CrawlConfig
    from upton_ray.engine import Crawler
    from upton_ray.synth import _sp

    def link(href, i):
        return _sp("section#river/section/h1/a", f"t{href}", href, i)

    web = {
        "http://s.test/page/1.html": [link("http://s.test/a.html", 0)],
        "http://s.test/page/2.html": [link("http://s.test/b.html", 0)],
        # page/3 missing -> empty fetch terminates the chain
        "http://s.test/a.html": [_sp("h1.article-title", "A", "", 0)],
        "http://s.test/b.html": [_sp("h1.article-title", "B", "", 0)],
    }
    cfg = CrawlConfig(
        index_url="http://s.test/page/1.html",
        index_selector="section#river section h1 a",
        extractor="css:h1.article-title",
        next_index_page_url=lambda url, i: f"http://s.test/page/{i}.html",
        sleep_time_between_requests=0,
        num_seen_shards=1, fetch_concurrency=1)
    c = Crawler(cfg, web)
    try:
        res = c.crawl(trace=True)
        assert res.documents() == ["A", "B"]
        assert "http://s.test/page/2.html" in res.fetched_urls
    finally:
        c.shutdown()


def test_distributed_instance_index_equals_collected(ray_session, tmp_path):
    """The distributed prefix-sum path (index_offset_collect_limit=0) must
    assign IDENTICAL instance indices to the collect-and-broadcast path —
    the ordering golden every crawl gate depends on."""
    from upton_ray import sinks, synth
    from upton_ray.config import CrawlConfig

    p = synth.ScaleParams(n_hosts=6, pages_per_host=30, links_per_page=5,
                          spans_per_page=8, media_fraction=0.25,
                          zipf_alpha=0.3, seed=11)
    corpus = str(tmp_path / "corpus")
    sinks.write_web(synth.scale_web(p, parallelism=4), corpus, num_buckets=4)

    def cfg():
        return CrawlConfig(
            index_selector="section#river section h1 a",
            extractor="css:h1.article-title",
            paginated=True, pagination_param="p", pagination_max_pages=1000,
            sleep_time_between_requests=0, debug=True, index_debug=True,
            num_seen_shards=2, fetch_concurrency=2, fetch_batch_size=64)

    seeds = [(h, synth.index_url(p, h), "section#river section h1 a")
             for h in range(p.n_hosts)]

    def rows(c):
        t = c.crawl().records_table()
        return list(zip(t["instance_index"].to_pylist(),
                        t["instance_url"].to_pylist(),
                        [tuple(r) for r in t["record"].to_pylist()]))

    c1 = Crawler(cfg(), ("parquet", corpus, 4), seeds=seeds)
    base = rows(c1)
    c1.shutdown()

    cfg2 = cfg()
    cfg2.index_offset_collect_limit = 0    # force the distributed path
    c2 = Crawler(cfg2, ("parquet", corpus, 4), seeds=seeds)
    dist = rows(c2)
    c2.shutdown()
    assert dist == base
    assert len(base) == sum(p.n_articles(h) for h in range(p.n_hosts))
