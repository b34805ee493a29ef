"""Sequential pure-Python oracle: an exact reimplementation of the reference
Scraper's control flow over a span-document web, used as the conformance
target for the distributed engine (SURVEY.md §5).

Control flow mirrors /root/reference/lib/upton.rb line-for-line in behavior
(NOT in implementation substrate — there is no HTML, no network, no
filesystem here; pages are span lists, the "network" is a dict, the stash is
a set):

* scrape / scrape_from_list   upton.rb:47-51,337-345
* get_index / parse_index     upton.rb:266-288   (resolve vs @index_url — Q3)
* get_index_pages             upton.rb:295-311   (early stop on empty page — Q7)
* get_instance                upton.rb:321-334   (depth-2 continuation quirk — Q5)
* next_index_page_url         upton.rb:149-164
* get_page + Downloader       upton.rb:206-225, downloader.rb:32-98
  (cache hit -> no sleep — Q8; 404/500/503/invalid -> "" empty page — M8)

The oracle also records the *observable trace* the engine must reproduce:
fetch order, URL-seen set, sleep count.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from upton_ray.config import CrawlConfig
from upton_ray.extract import apply_extractor, extract_links_page
from upton_ray.urlops import next_index_page_url, resolve_url

EMPTY: list[dict] = []


@dataclass
class OracleResult:
    index_urls: list = field(default_factory=list)      # get_index output (order matters)
    documents: list = field(default_factory=list)       # scrape() output documents
    records_rows: list = field(default_factory=list)    # exploded RECORDS-shaped rows
    fetch_log: list = field(default_factory=list)       # every attempted network fetch, in order
    seen: set = field(default_factory=set)              # stashed URLs (the cache key set)
    sleeps: int = 0                                     # politeness sleeps (T2)


class UptonOracle:
    """web: {url: list[span]}; statuses: {url: http_status} fault overlay."""

    def __init__(self, cfg: CrawlConfig, web: dict, statuses: dict | None = None):
        self.cfg = cfg
        self.web = web
        self.statuses = statuses or dict(cfg.status_overlay)
        self.res = OracleResult()
        self._stash: set[str] = set()
        self._ran = False

    # --- downloader (S2-S4, M7, M8, T1, T2) ---
    def get_page(self, url: str | None, stash: bool) -> list[dict]:
        if url is None or url == "":
            return EMPTY          # nil-href guard, upton.rb:206-207
        if stash and url in self._stash:
            return self._fetch_body(url)   # cache hit: no sleep, no fetch log
        self.res.fetch_log.append(url)
        self.res.seen.add(url)
        if stash:
            self._stash.add(url)
        self.res.sleeps += 1      # from_resource -> sleep (upton.rb:219-224)
        return self._fetch_body(url)

    def _fetch_body(self, url: str) -> list[dict]:
        status = self.statuses.get(url, 200)
        if status != 200:
            return EMPTY          # error -> empty page (downloader.rb:50-68)
        return self.web.get(url, EMPTY)

    # --- index side (P1, P2, P5, M1, M2) ---
    def get_index_pages(self, original_url: str) -> list[list[dict]]:
        cfg = self.cfg
        resps: list[list[dict]] = []
        prev_url = None
        pagination_index = cfg.pagination_start_index
        fetched_empty = False
        while not resps or not fetched_empty:
            next_url = next_index_page_url(
                original_url, pagination_index, paginated=cfg.paginated,
                pagination_param=cfg.pagination_param,
                pagination_max_pages=cfg.pagination_max_pages)
            if next_url == "":
                break
            next_url = resolve_url(next_url, original_url)
            if next_url == prev_url:
                break
            body = self.get_page(next_url, cfg.index_debug)
            fetched_empty = len(body) == 0
            prev_url = next_url
            pagination_index += cfg.pagination_interval
            resps.append(body)
        return resps

    def get_index(self) -> list:
        pages = self.get_index_pages(self.cfg.index_url)
        urls: list = []
        for page in pages:
            hrefs = extract_links_page(page, self.cfg.index_selector)
            for href in hrefs:
                urls.append(None if href is None
                            else resolve_url(href, self.cfg.index_url))
        return urls

    # --- sitemap seeding (engine extension; upton_ray/sitemap.py) ---
    def expand_sitemaps(self) -> list:
        """Sequential statement of the sitemap-expansion law: level-by-level
        to sitemap_max_depth, files in discovery order, <loc> entries in
        document order, relative locs resolved against the sitemap URL,
        already-visited files skipped.  Sitemap-file reads are frontier
        construction — no stash, no sleep, no fetch log (the engine's
        probe likewise fetches outside the politeness loop)."""
        from upton_ray.sitemap import CHILD_KIND, LOC_KIND

        cfg = self.cfg
        pending = [cfg.sitemap_url]
        visited = {cfg.sitemap_url}
        urls: list = []
        for _depth in range(cfg.sitemap_max_depth):
            nxt: list = []
            for sm_url in pending:
                for s in self.web.get(sm_url, EMPTY):
                    loc = s["media_ref"]
                    if not loc:
                        continue
                    if s["kind"] == LOC_KIND:
                        urls.append(resolve_url(loc, sm_url))
                    elif s["kind"] == CHILD_KIND:
                        child = resolve_url(loc, sm_url)
                        if child not in visited:
                            visited.add(child)
                            nxt.append(child)
            pending = nxt
            if not pending:
                break
        return urls

    # --- instance side (P3, P4, P6, M3) ---
    def get_instance(self, url) -> list[list[dict]]:
        cfg = self.cfg
        resps = [self.get_page(url, cfg.debug)]
        pagination_index = 0
        prev_url = url
        while len(resps[-1]) != 0:
            succ = cfg.next_instance_page_url
            next_url = succ(url, pagination_index + 1) if succ else ""
            if next_url == prev_url or next_url == "":
                break
            resps.append(self.get_page(next_url, cfg.debug))
            prev_url = next_url
        return resps

    def scrape(self) -> OracleResult:
        if self._ran:
            return self.res
        self._ran = True
        cfg = self.cfg
        if cfg.url_array is not None:
            url_array = list(cfg.url_array)
        elif getattr(cfg, "sitemap_url", None):
            url_array = self.expand_sitemaps()
        else:
            url_array = self.get_index()
        self.res.index_urls = list(url_array)
        for instance_index, instance_url in enumerate(url_array):
            pages = self.get_instance(instance_url)
            for pagination_index, page in enumerate(pages):
                kind, rows = apply_extractor(cfg.extractor, page, instance_url,
                                             instance_index, pagination_index)
                if kind == "scalar":
                    self.res.documents.append(rows[0][0])
                elif kind == "none":
                    self.res.documents.append(None)
                elif kind == "list":
                    self.res.documents.append(rows[0])
                else:
                    self.res.documents.append(rows)
                for rno, row in enumerate(rows):
                    self.res.records_rows.append({
                        "instance_index": instance_index,
                        "pagination_index": pagination_index,
                        "row_no": rno,
                        "instance_url": "" if instance_url is None else instance_url,
                        "record": row,
                        "doc_kind": kind,
                    })
        return self.res

    def scrape_to_rows(self) -> list[list[str]]:
        """CSV-sink row stream (S5): compact nils, explode table documents
        (upton.rb:169-183)."""
        self.scrape()
        rows = []
        for doc in self.res.documents:
            if doc is None:
                continue
            if doc and isinstance(doc, list) and isinstance(doc[0], list):
                rows.extend(doc)
            elif isinstance(doc, list):
                rows.append(doc)
            else:
                rows.append([doc])
        return rows
