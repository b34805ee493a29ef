"""Deterministic synthetic webs (span-document corpora).

Two generators:

* :func:`fixture_web` — the reference RSpec fixture web
  (/root/reference/spec/data/*.html + stubs in spec/upton_spec.rb:44-153)
  re-encoded as interleaved text+media span documents per FIXTURES.md §1.
  This is the conformance corpus: golden outputs in :mod:`upton_ray.golden`.

* :func:`scale_web` / :func:`gen_page` — a seeded, parameterized synthetic
  web of many hosts for benchmarks.  ``gen_page(url)`` is a pure function of
  the URL, so the fetch stage can regenerate any page without storage and the
  distributed corpus writer produces byte-identical rows — both derive from
  the same deterministic content function (no RNG state).

Everything is seeded / parametric; no external data.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from upton_ray import schema

BASE = "http://www.example.com/"


def _sp(kind: str, text: str = "", media_ref: str = "", offset: int = 0) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def _page(*spans: tuple) -> list[dict]:
    """spans given as (kind, text, media_ref); offsets assigned in order."""
    return [_sp(k, t, m, i) for i, (k, t, m) in enumerate(spans)]


# ---------------------------------------------------------------- fixture web

HEADLINES = {
    "webinar": "Webinar: How to Use Prescriber Checkup to Power Your Reporting",
    "prosecutor": "A Prosecutor, a Wrongful Conviction and a Question of Justice",
    "sixfacts": "Six Facts Lost in the IRS Scandal",
}

MOST_COMMENTED = [
    "Six Facts Lost in the IRS Scandal",
    "How the IRS’s Nonprofit Division Got So Dysfunctional",
    "Sound, Fury and the IRS Mess",
    "The Most Important #Muckreads on Rape in the Military",
    "Congressmen to Hagel: Where Are the Missing War Records?",
    "As Need for New Flood Maps Rises, Congress and Obama Cut Funding",
    "A Prosecutor, a Wrongful Conviction and a Question of Justice",
    "A Prolonged Stay: The Reasons Behind the Slow Pace of Executions",
    "The Story Behind Our Hospital Interactive",
    "irs-test-charts-for-embedding",
]

EAST_TIMOR_HEADER = ["#", "Portrait", "Name(Birth–Death)", "Term of Office", "Party"]
EAST_TIMOR_ROWS = [
    ["", "Mari Alkatiri(b. 1949)", "20 May 2002", "26 June 2006[1]", "FRETILIN"],
    ["", "José Ramos-Horta(b. 1949)", "26 June 2006", "19 May 2007", "Independent"],
    ["", "Estanislau da Silva(b. 1952)", "19 May 2007", "8 August 2007", "FRETILIN"],
    ["", "Xanana Gusmão(b. 1946)", "8 August 2007", "Incumbent", "CNRT"],
]


def _article(slug_: str, headline: str | None) -> list[dict]:
    spans = [
        ("div#header/a", "ProPublica", "/"),
        ("media.img", "", f"assets/{slug_}-lede.jpg"),
    ]
    if headline is not None:
        spans.append(("h1.article-title", headline, ""))
    spans += [
        ("p", f"Body paragraph one of {slug_}.", ""),
        ("media.img", "", f"assets/{slug_}-chart.png"),
        ("p", f"Body paragraph two of {slug_}.", ""),
    ]
    return _page(*spans)


def _east_timor_spans() -> list[dict]:
    spans = [
        ("h1.firstHeading", "List of Prime Ministers of East Timor", ""),
        # decoy first wikitable — selector [2] must skip it
        ("table.wikitable[1]/tr[1]/th[1]", "Decoy", ""),
        ("table.wikitable[1]/tr[2]/td[1]", "should-not-appear", ""),
    ]
    for j, h in enumerate(EAST_TIMOR_HEADER, start=1):
        spans.append((f"table.wikitable[2]/tr[1]/th[{j}]", h, ""))
    for i, row in enumerate(EAST_TIMOR_ROWS, start=2):
        spans.append((f"table.wikitable[2]/tr[{i}]/th[1]", str(i - 1), ""))
        spans.append((f"table.wikitable[2]/tr[{i}]/td[1]", row[0], f"assets/pm{i - 1}.jpg"))
        for j, cell in enumerate(row[1:], start=2):
            spans.append((f"table.wikitable[2]/tr[{i}]/td[{j}]", cell, ""))
    spans.append(("p", "Footer text.", ""))
    return _page(*spans)


def fixture_web() -> dict[str, list[dict]]:
    """The RSpec fixture web as {url: spans}. Golden behavior notes:

    * propublica.html: 4 river links (relative hrefs, DOM order webinar,
      discussion, prosecutor, sixfacts — spec/upton_spec.rb:15-18) + the 10
      most-commented links (spec/upton_spec.rb:19-28).
    * discussion.html has NO h1.article-title (extraction yields "", quirk Q1).
    * propublica_search.html?p=1/?p=2 carry the paginated links; ?p=3 is an
      empty page (terminates pagination); the bare search URL is present but
      must never be fetched in paginated mode (quirk Q4).
    """
    river = [
        ("webinar.html", HEADLINES["webinar"]),
        ("discussion.html", "Discussion: Comment thread"),
        ("prosecutor.html", HEADLINES["prosecutor"]),
        ("sixfacts.html", HEADLINES["sixfacts"]),
    ]
    propublica = [("div#header/a", "ProPublica", "/"), ("media.img", "", "assets/logo.png")]
    for href, text in river:
        propublica.append(("section#river/section/h1/a", text, href))
        propublica.append(("section#river/section/p", f"Teaser for {href}", ""))
    for i, text in enumerate(MOST_COMMENTED):
        propublica.append(("#jamb.wNarrow/#most-commented/li/a", text, f"article/{i}.html"))
    propublica.append(("div#footer/a", "About", "about.html"))

    relative = [
        ("h2/a", "An unnecessary proof of concept but just for kicks", "iamnottobeselected.html"),
        ("section#river/h1/a", HEADLINES["prosecutor"], "prosecutor.html"),
    ]

    search_p1 = [
        (".compact-list/li.compact-item/a.title-link", HEADLINES["webinar"], "webinar.html"),
        ("media.img", "", "assets/search.png"),
        (".compact-list/li.compact-item/a.title-link", HEADLINES["prosecutor"], "prosecutor.html"),
    ]
    search_p2 = [
        (".compact-list/li.compact-item/a.title-link", HEADLINES["sixfacts"], "sixfacts.html"),
    ]

    web = {
        BASE + "propublica.html": _page(*propublica),
        BASE + "propublica-relative.html": _page(*relative),
        BASE + "webinar.html": _article("webinar", HEADLINES["webinar"]),
        BASE + "discussion.html": _article("discussion", None),
        BASE + "prosecutor.html": _article("prosecutor", HEADLINES["prosecutor"]),
        BASE + "sixfacts.html": _article("sixfacts", HEADLINES["sixfacts"]),
        BASE + "easttimor.html": _east_timor_spans(),
        BASE + "propublica_search.html": _page(*search_p1),
        BASE + "propublica_search.html?p=1": _page(*search_p1),
        BASE + "propublica_search.html?p=2": _page(*search_p2),
        BASE + "propublica_search.html?p=3": [],
        # sitemap extension fixtures (upton_ray/sitemap.py): a two-level
        # sitemap-index tree over the article pages. Kinds are the span
        # encoding of <urlset>/<sitemapindex> entries; sitemap_b's last loc
        # is RELATIVE (resolves against the sitemap URL, M2 semantics) and
        # repeats webinar.html (stash dedup: fetched once, kept per
        # position).
        BASE + "sitemap_index.xml": _page(
            ("sitemapindex/sitemap/loc", "", "sitemap_a.xml"),
            ("sitemapindex/sitemap/loc", "", BASE + "sitemap_b.xml")),
        BASE + "sitemap_a.xml": _page(
            ("urlset/url/loc", "", BASE + "webinar.html"),
            ("urlset/url/loc", "", BASE + "discussion.html")),
        BASE + "sitemap_b.xml": _page(
            ("urlset/url/loc", "", BASE + "prosecutor.html"),
            ("urlset/url/loc", "", BASE + "sixfacts.html"),
            ("urlset/url/loc", "", "webinar.html")),
    }
    return web


def web_table(web: dict[str, list[dict]]) -> pa.Table:
    return pa.table(
        {"doc_id": pa.array(list(web.keys()), pa.string()),
         "spans": schema.spans_array(list(web.values()))},
        schema=schema.WEB,
    )


# ----------------------------------------------------------------- scale web


@dataclass(frozen=True)
class ScaleParams:
    """Parameters of the seeded synthetic web (FIXTURES.md §7)."""

    n_hosts: int = 64
    pages_per_host: int = 200          # mean article count per host
    links_per_page: int = 20           # index links per index page
    spans_per_page: int = 24           # body spans per article
    media_fraction: float = 0.25
    zipf_alpha: float = 0.0            # 0 = uniform; >0 = hot hosts
    seed: int = 42
    scheme_host: str = "http://h{h}.synth.example"

    def host(self, h: int) -> str:
        return self.scheme_host.format(h=h)

    def n_articles(self, h: int) -> int:
        if self.zipf_alpha <= 0:
            return self.pages_per_host
        # deterministic zipf-ish skew, normalized so total ≈ n_hosts * pages_per_host
        w = (1.0 + h) ** -self.zipf_alpha
        z = sum((1.0 + i) ** -self.zipf_alpha for i in range(self.n_hosts)) / self.n_hosts
        return max(1, int(round(self.pages_per_host * w / z)))

    def n_index_pages(self, h: int) -> int:
        return (self.n_articles(h) + self.links_per_page - 1) // self.links_per_page


_WORDS = np.array(
    "the quick brown fox jumps over lazy dog crawl frontier ray data span media "
    "index page article host politeness robots scheduler shard bloom arrow".split()
)


def _mix(*xs: int) -> int:
    h = 0x9E3779B97F4A7C15
    for x in xs:
        h ^= (x + 0x9E3779B97F4A7C15 + (h << 6) + (h >> 2)) & 0xFFFFFFFFFFFFFFFF
        h &= 0xFFFFFFFFFFFFFFFF
    return h


def _text(seed: int, *xs: int, n: int = 8) -> str:
    h = _mix(seed, *xs)
    idx = [(h >> (7 * i)) % len(_WORDS) for i in range(n)]
    return " ".join(_WORDS[idx])


_ART_RE = re.compile(r"^http://h(\d+)\.synth\.example/a/(\d+)\.html$")
_IDX_RE = re.compile(r"^http://h(\d+)\.synth\.example/index\.html(?:\?p=(\d+))?$")
# sitemap tree over the scale web (upton_ray/sitemap.py): a global root
# (on host 0) lists every host's sitemap index, each host index lists its
# per-segment files, each file covers links_per_page articles — the same
# partitioning as index pages, so sitemap seeding reaches exactly the
# pages index-page crawling reaches.
_SM_ROOT_RE = re.compile(r"^http://h0\.synth\.example/sitemap_root\.xml$")
_SM_HOST_RE = re.compile(r"^http://h(\d+)\.synth\.example/sitemap\.xml$")
_SM_FILE_RE = re.compile(
    r"^http://h(\d+)\.synth\.example/sitemap-(\d+)\.xml$")


def index_url(p: ScaleParams, h: int) -> str:
    return f"{p.host(h)}/index.html"


def gen_page(p: ScaleParams, url: str) -> list[dict] | None:
    """Deterministically (re)generate the spans of any URL of the scale web.

    Pure function of (params, url): used both by the corpus writer and by the
    generator-mode fetch stage, so they always agree. Returns None for URLs
    outside the web (fetch maps those to an error/empty page).
    """
    m = _IDX_RE.match(url)
    if m:
        h, page = int(m.group(1)), int(m.group(2) or 1)
        if h >= p.n_hosts or page > p.n_index_pages(h):
            return []
        n_art = p.n_articles(h)
        lo = (page - 1) * p.links_per_page
        hi = min(lo + p.links_per_page, n_art)
        spans = [_sp("div#header/a", f"Host {h}", "/", 0)]
        off = 1
        for a in range(lo, hi):
            spans.append(_sp("section#river/section/h1/a",
                             _text(p.seed, h, a, 1, n=4), f"a/{a}.html", off))
            off += 1
        return spans
    if _SM_ROOT_RE.match(url):
        return [_sp("sitemapindex/sitemap/loc", "",
                    f"{p.host(h)}/sitemap.xml", h)
                for h in range(p.n_hosts)]
    m = _SM_HOST_RE.match(url)
    if m:
        h = int(m.group(1))
        if h >= p.n_hosts:
            return []
        return [_sp("sitemapindex/sitemap/loc", "",
                    f"{p.host(h)}/sitemap-{k}.xml", k)
                for k in range(p.n_index_pages(h))]
    m = _SM_FILE_RE.match(url)
    if m:
        h, k = int(m.group(1)), int(m.group(2))
        if h >= p.n_hosts or k >= p.n_index_pages(h):
            return []
        lo = k * p.links_per_page
        hi = min(lo + p.links_per_page, p.n_articles(h))
        return [_sp("urlset/url/loc", "", f"{p.host(h)}/a/{a}.html", a - lo)
                for a in range(lo, hi)]
    m = _ART_RE.match(url)
    if m:
        h, a = int(m.group(1)), int(m.group(2))
        if h >= p.n_hosts or a >= p.n_articles(h):
            return []
        spans = [_sp("h1.article-title", _text(p.seed, h, a, 2, n=6), "", 0)]
        n_media = int(p.spans_per_page * p.media_fraction)
        for i in range(1, p.spans_per_page):
            if i <= n_media:
                spans.append(_sp("media.img", "", f"assets/{h}-{a}-{i}.jpg", i))
            else:
                spans.append(_sp("p", _text(p.seed, h, a, 3 + i, n=10), "", i))
        return spans
    return None


def gen_pages_batch(p: ScaleParams, urls) -> pa.Table:
    """Batch page generation -> WEB-schema table (missing URLs -> empty spans)."""
    spans = [gen_page(p, u) or [] for u in urls]
    return pa.table(
        {"doc_id": pa.array(list(urls), pa.string()), "spans": schema.spans_array(spans)},
        schema=schema.WEB,
    )


def all_urls(p: ScaleParams) -> list[str]:
    """Every URL of the scale web (index pages + articles), grouped by host."""
    urls: list[str] = []
    for h in range(p.n_hosts):
        urls.append(index_url(p, h))
        urls.extend(f"{p.host(h)}/index.html?p={i}" for i in range(1, p.n_index_pages(h) + 1))
        urls.extend(f"{p.host(h)}/a/{a}.html" for a in range(p.n_articles(h)))
    return urls


def scale_web(p: ScaleParams, *, parallelism: int = 32):
    """The scale web as a Ray Dataset (distributed generation, WEB schema)."""
    import ray.data

    urls = all_urls(p)
    ds = ray.data.from_items(urls, override_num_blocks=max(1, min(parallelism, len(urls) // 1000 + 1)))
    return ds.map_batches(
        lambda b: gen_pages_batch(p, b["item"]),
        batch_format="numpy",
        batch_size=4096,
    )
