"""10^7-page single-node crawl (SURVEY §7.1 local scale target; BASELINE.md).

Storage-free corpus (GeneratorWebStore regenerates pages from URLs), cuckoo
filters-only seen set — the memory configuration of the 10^10-URL design
point, scaled to one node. Recorded result on the 32-vCPU sandbox:
10,502,933 pages / 598.9 s = 17,539 pages/s, 9,999,985 records.

Usage:  python tools/crawl_10m.py   (~10 min; prints one JSON line)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

from upton_ray import synth
from upton_ray.config import CrawlConfig
from upton_ray.engine import Crawler

if not ray.is_initialized():
    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")

p = synth.ScaleParams(n_hosts=2000, pages_per_host=5000, links_per_page=20,
                      spans_per_page=12, media_fraction=0.25, zipf_alpha=0.3,
                      seed=42)
n_pages = sum(p.n_articles(h) + p.n_index_pages(h) + 1
              for h in range(p.n_hosts))
cfg = CrawlConfig(
    index_selector="section#river section h1 a",
    extractor="css:h1.article-title",
    paginated=True, pagination_param="p", pagination_max_pages=1_000_000,
    sleep_time_between_requests=0, debug=True, index_debug=True,
    seen_exact=False, seen_capacity_per_shard=2_500_000, num_seen_shards=8,
    fetch_concurrency=16, fetch_batch_size=2048)
seeds = [(h, synth.index_url(p, h), cfg.index_selector)
         for h in range(p.n_hosts)]
c = Crawler(cfg, p, seeds=seeds)
t0 = time.time()
n = c.crawl().records.count()
dt = time.time() - t0
print(json.dumps({"pages": n_pages, "records": n, "sec": round(dt, 1),
                  "pages_per_sec": round(n_pages / dt, 1),
                  "seen_mode": "cuckoo filters-only"}))
c.shutdown()
ray.shutdown()
