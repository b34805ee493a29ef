"""CrawlConfig — run configuration mirroring the reference Scraper accessors
(/root/reference/lib/upton.rb:37-39,78-114) plus the engine's distributed knobs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence


@dataclass
class CrawlConfig:
    # --- reference-visible configuration (upton.rb defaults at :78-114) ---
    index_url: Optional[str] = None
    index_selector: str = ""
    url_array: Optional[Sequence[str]] = None   # explicit instance list (S1)
    verbose: bool = False
    debug: bool = True                 # stash instance pages (T1)
    index_debug: bool = False          # stash index pages
    sleep_time_between_requests: float = 30.0   # politeness budget (T2)
    paginated: bool = False
    pagination_param: str = "page"
    pagination_max_pages: int = 2
    pagination_start_index: int = 1
    pagination_interval: int = 1
    readable_filenames: bool = False
    stash_folder: Optional[str] = None  # checkpoint dir (engine: Lance/parquet tables)

    # extraction UDF: "identity" | "css:<sel>" | "list:<sel>" | "table:<sel>"
    # or a callable (spans, url, instance_index, pagination_index) -> record
    extractor: object = "identity"

    # instance-pagination successor (P3; default none — upton.rb:127-129)
    next_instance_page_url: Optional[Callable[[str, int], str]] = None
    # index-pagination successor override (P1; subclass hook upton.rb:149 —
    # custom index sources / nonstandard pagination). None = the standard
    # query-param successor driven by the pagination_* fields
    next_index_page_url: Optional[Callable[[str, int], str]] = None

    # --- engine extensions (absent in the reference; north_rule requirements) ---
    # sitemap seeding (upton_ray.sitemap): expand a sitemap / sitemap-index
    # tree into the instance frontier. Seed precedence: url_array >
    # sitemap_url > index_url. Sitemap-file fetches are frontier
    # CONSTRUCTION (like the robots probe): unpaced, unstashed, outside
    # sleep accounting — the politeness budget governs page fetches.
    sitemap_url: Optional[str] = None
    sitemap_max_depth: int = 3
    robots: dict = field(default_factory=dict)   # host -> list of disallowed prefixes
    robots_txt: dict = field(default_factory=dict)  # host -> raw robots.txt body
    respect_robots: bool = False
    # fetch http://<host>/robots.txt from the web source itself at crawl
    # start (distributed probe, one result row per host) instead of — or in
    # addition to — the pre-supplied robots/robots_txt tables
    fetch_robots: bool = False
    status_overlay: dict = field(default_factory=dict)  # url -> http status (fault injection)
    max_retries: int = 3               # bounded (reference retries forever, T4)
    canonicalize_seen: bool = False    # key the seen set by canonical URL form
                                       # (reference semantics: raw URL keys —
                                       # distinct query-string orderings are
                                       # distinct cache entries)
    real_sleep: bool = False           # tests/bench count sleeps instead of sleeping
    max_sleep: float = 0.05            # cap on actual sleep when real_sleep

    # --- skew handling (north_rule: hot-host splitting, shared token bucket) ---
    hot_host_threshold: Optional[int] = None  # frontier URLs per host; None = off
    hot_host_salts: int = 8                   # sub-queues per hot host

    # --- distributed shape ---
    seen_exact: bool = True   # False = filters-only membership (10^10-URL
                              # memory config; a filter FP may skip a fetch)
    num_seen_shards: int = 8
    seen_capacity_per_shard: int = 1_000_000   # filter sizing (bloom/cuckoo)
    fetch_concurrency: int = 4         # fetch actor pool size
    fetch_batch_size: int = 256
    # CPU reservation per bucket-walk task (group-routed fetch): each task
    # decodes a whole corpus bucket into heap, so capping concurrent decodes
    # bounds memory + IO thrash.  None = auto rule max(1, cluster_cpus/16):
    # ~16 concurrent decodes at 32 cpus (measured 26s -> 5s on the 1M-page
    # bench — one decode per vCPU starves the object store), full fan-out on
    # small clusters where decodes fit comfortably
    bucket_walk_num_cpus: float | None = None
    # instance_index assignment: collect-and-broadcast the per-index-page
    # count rollup below this many rows (cheapest at sandbox scale); above
    # it, the exclusive prefix-sum runs fully distributed (block-base sums +
    # union-sort-sweep attach) — a 10^10-URL crawl has ~10^8+ index pages
    index_offset_collect_limit: int = 2_000_000
    host_sharded_fetch: Optional[bool] = None  # None = auto (politeness>0 or robots)

    def needs_host_affinity(self) -> bool:
        if self.host_sharded_fetch is not None:
            return self.host_sharded_fetch
        return self.real_sleep and self.sleep_time_between_requests > 0
