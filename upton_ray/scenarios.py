"""Conformance scenarios: the reference RSpec suite's five end-to-end crawls
(+ fault-injection variants) as CrawlConfig factories over the fixture web.

Used by the pytest conformance suite (engine vs oracle) and by
``__ray_entry__.queries()``.
"""

from __future__ import annotations

from upton_ray.config import CrawlConfig
from upton_ray.synth import BASE

TABLE_SELECTOR = ('//table[contains(concat(" ", normalize-space(@class), " "),'
                  ' " wikitable ")][2]')


def scenario_configs() -> dict[str, CrawlConfig]:
    cfgs = _raw_configs()
    for c in cfgs.values():   # fixture webs are tiny: minimize actor footprint
        c.num_seen_shards = 2
        c.fetch_concurrency = 2
    return cfgs


def _raw_configs() -> dict[str, CrawlConfig]:
    return {
        # spec/upton_spec.rb:43-67
        "basic": CrawlConfig(
            index_url=BASE + "propublica.html",
            index_selector="section#river section h1 a",
            extractor="css:h1.article-title",
            sleep_time_between_requests=0),
        # spec/upton_spec.rb:69-102
        "relative": CrawlConfig(
            index_url=BASE + "propublica-relative.html",
            index_selector="section#river h1 a",
            extractor="css:h1.article-title",
            sleep_time_between_requests=0),
        # spec/upton_spec.rb:104-117
        "list": CrawlConfig(
            url_array=[BASE + "propublica.html"],
            extractor="list:#jamb.wNarrow #most-commented li a",
            sleep_time_between_requests=0),
        # spec/upton_spec.rb:119-133
        "table": CrawlConfig(
            url_array=[BASE + "easttimor.html"],
            extractor="table:" + TABLE_SELECTOR,
            sleep_time_between_requests=0),
        # spec/upton_spec.rb:139-171
        "paginated": CrawlConfig(
            index_url=BASE + "propublica_search.html",
            index_selector=".compact-list a.title-link",
            extractor="css:h1.article-title",
            paginated=True, pagination_param="p", pagination_max_pages=3,
            sleep_time_between_requests=0),
        # widened selector model: child combinators + attribute selectors on
        # the index, general XPath on the extractor — behavior-equal to
        # "basic" on this fixture web (same golden)
        "css_adv": CrawlConfig(
            index_url=BASE + "propublica.html",
            index_selector="section[id=river] > section > h1 > a",
            extractor="css://h1[contains(@class, 'article-title')]",
            sleep_time_between_requests=0),
        # quirk Q7: an HTTP-error index page terminates pagination
        "paginated_error": CrawlConfig(
            index_url=BASE + "propublica_search.html",
            index_selector=".compact-list a.title-link",
            extractor="css:h1.article-title",
            paginated=True, pagination_param="p", pagination_max_pages=3,
            status_overlay={BASE + "propublica_search.html?p=2": 500},
            sleep_time_between_requests=0),
        # sleep accounting (spec/upton_spec.rb:198-228): no-match selector,
        # caching off — exactly one sleep per index page fetch
        "paginated_sleeps": CrawlConfig(
            index_url=BASE + "propublica_search.html",
            index_selector=".nonexistent",
            paginated=True, pagination_param="p", pagination_max_pages=3,
            debug=False, index_debug=False,
            sleep_time_between_requests=1),
        # stash fetch-once: duplicate URLs in the list fetch a single time
        "dedup_stash": CrawlConfig(
            url_array=[BASE + "webinar.html", BASE + "sixfacts.html",
                       BASE + "webinar.html"],
            extractor="css:h1.article-title",
            sleep_time_between_requests=0),
        # caching disabled: duplicates refetch and re-sleep each time
        "nocache_refetch": CrawlConfig(
            url_array=[BASE + "webinar.html", BASE + "webinar.html"],
            extractor="css:h1.article-title", debug=False,
            sleep_time_between_requests=1),
        # instance-page 404: empty record kept positionally (M8)
        "instance_error": CrawlConfig(
            index_url=BASE + "propublica.html",
            index_selector="section#river section h1 a",
            extractor="css:h1.article-title",
            status_overlay={BASE + "prosecutor.html": 404},
            sleep_time_between_requests=0),
        # robots extension: block one instance host path
        "robots": CrawlConfig(
            index_url=BASE + "propublica.html",
            index_selector="section#river section h1 a",
            extractor="css:h1.article-title",
            respect_robots=True,
            robots={"www.example.com": ["/sixfacts"]},
            sleep_time_between_requests=0),
        # sitemap extension: two-level sitemap-index tree seeds the
        # frontier; one relative loc + one duplicate loc (stash dedup)
        "sitemap": CrawlConfig(
            sitemap_url=BASE + "sitemap_index.xml",
            extractor="css:h1.article-title",
            sleep_time_between_requests=0),
        # instance continuation (P4/Q5): stateless successor caps at depth 2
        "continuation": CrawlConfig(
            url_array=[BASE + "webinar.html"],
            extractor="css:h1.article-title",
            next_instance_page_url=lambda url, i: url.replace(
                ".html", f"_page_{i}.html") if i <= 1 else "",
            sleep_time_between_requests=0),
    }
