"""The sequential oracle must reproduce the reference RSpec golden outputs
exactly (spec/upton_spec.rb) — this validates the conformance target itself."""

from upton_ray.config import CrawlConfig
from upton_ray.oracle import UptonOracle
from upton_ray.scenarios import scenario_configs
from upton_ray.synth import (BASE, EAST_TIMOR_HEADER, EAST_TIMOR_ROWS,
                             HEADLINES, MOST_COMMENTED, fixture_web)

WEB = fixture_web()
CFGS = scenario_configs()


def run(name):
    return UptonOracle(CFGS[name], WEB).scrape()


def test_basic_golden():
    r = run("basic")
    assert r.documents == [HEADLINES["webinar"], "", HEADLINES["prosecutor"],
                           HEADLINES["sixfacts"]]
    # index order is DOM order (Q1: empty-headline page kept positionally)
    assert r.index_urls == [BASE + "webinar.html", BASE + "discussion.html",
                            BASE + "prosecutor.html", BASE + "sixfacts.html"]


def test_relative_golden():
    assert run("relative").documents == [HEADLINES["prosecutor"]]


def test_list_golden():
    assert run("list").documents == [MOST_COMMENTED]


def test_table_golden():
    exp = [EAST_TIMOR_HEADER + ["1", "2", "3", "4"], []] + EAST_TIMOR_ROWS
    assert run("table").documents == [exp]


def test_paginated_golden():
    r = run("paginated")
    assert r.documents == [HEADLINES["webinar"], HEADLINES["prosecutor"],
                           HEADLINES["sixfacts"]]
    # Q4: the bare seed URL is never fetched in paginated mode
    assert BASE + "propublica_search.html" not in r.seen
    assert BASE + "propublica_search.html?p=3" in r.seen  # empty page IS fetched


def test_paginated_error_terminates():
    r = run("paginated_error")
    assert r.documents == [HEADLINES["webinar"], HEADLINES["prosecutor"]]
    assert BASE + "propublica_search.html?p=3" not in r.seen


def test_sleep_accounting():
    # one sleep per network fetch incl. the empty ?p=3 (spec/upton_spec.rb:198-228)
    assert run("paginated_sleeps").sleeps == 3


def test_stash_fetch_once():
    r = run("dedup_stash")
    assert len(r.fetch_log) == 2 and r.sleeps == 2
    assert r.documents == [HEADLINES["webinar"], HEADLINES["sixfacts"],
                           HEADLINES["webinar"]]


def test_nocache_refetches():
    r = run("nocache_refetch")
    assert len(r.fetch_log) == 2 and r.sleeps == 2


def test_instance_error_empty_record():
    r = run("instance_error")
    assert r.documents == [HEADLINES["webinar"], "", "", HEADLINES["sixfacts"]]


def test_continuation_depth2():
    r = run("continuation")
    # page 1 real, page 2 = successor URL not in web -> empty; depth capped at 2
    assert r.documents == [HEADLINES["webinar"], ""]


def test_csv_rows_explode_tables():
    o = UptonOracle(CFGS["table"], WEB)
    rows = o.scrape_to_rows()
    assert rows[0] == EAST_TIMOR_HEADER + ["1", "2", "3", "4"]
    assert rows[1] == []
    assert rows[2:] == EAST_TIMOR_ROWS
