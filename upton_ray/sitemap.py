"""Sitemap-seeded crawling (engine extension; the sitemaps.org protocol).

The reference has no sitemap support (its seeds are ``index_url`` /
``url_array``, lib/upton.rb:78-114); a web-scale crawler gets most of its
frontier from sitemaps, so the engine grows a third seed source:
``CrawlConfig.sitemap_url``.  Expansion contract (deterministic, documented
so the conformance golden can pin it):

* A sitemap page in the span data model is a span document whose entries
  are ``(kind=LOC_KIND, media_ref=<page url>)`` for ``<urlset>`` URL
  entries and ``(kind=CHILD_KIND, media_ref=<child sitemap url>)`` for
  ``<sitemapindex>`` children.  Fixture webs encode sitemaps directly as
  these spans; :class:`upton_ray.fetch.HttpWebStore` converts real sitemap
  XML via :func:`sitemap_xml_to_spans` (wired into its decode step, the
  same seam that turns HTML into spans).
* Expansion is level-by-level to ``sitemap_max_depth``: seed pages are
  ordered by (depth, parent-rank, position-in-parent) — the order a
  sequential reader visiting each level's files in discovery order
  produces.  Relative ``<loc>`` values resolve against the sitemap's URL
  (M2 semantics).  A sitemap URL already expanded is skipped (cycle
  guard); the FILE set is driver-held and protocol-bounded (<=50k children
  per index), while the extracted page URLs stay a distributed Dataset and
  feed the same instance_index prefix-sum as index-page links.

Scale shape: each level is one ``map_batches`` over the level's file URLs
(actor pool holding the store), emitting one row per ``<loc>``; only
CHILD_KIND rows are collected (files, never page URLs).  At 10^10-URL
scale the per-level loc Datasets union into the frontier without the
driver ever seeing a page URL.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

LOC_KIND = "urlset/url/loc"
CHILD_KIND = "sitemapindex/sitemap/loc"

_SM_SNIFF = re.compile(r"<\s*(urlset|sitemapindex)\b", re.I)


def sniff_sitemap(text: str) -> bool:
    """True if the body looks like a sitemap (root tag anywhere — a long
    comment/license prolog before <urlset> is spec-legal, so no prefix
    window).  Shared by the fetch path; one regex, one owner."""
    return _SM_SNIFF.search(text) is not None


def sitemap_xml_to_spans(xml: str) -> list[dict] | None:
    """Real sitemap XML -> span rows, or None if the body is not a sitemap
    (caller falls through to the HTML parser).  Namespace-agnostic: tags
    match on local name, the protocol's only structure that matters here
    (``urlset/url/loc`` and ``sitemapindex/sitemap/loc``)."""
    if not sniff_sitemap(xml):
        return None
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(xml)
    except ET.ParseError:
        return None
    local = root.tag.rsplit("}", 1)[-1].lower()
    if local == "urlset":
        entry_tag, kind = "url", LOC_KIND
    elif local == "sitemapindex":
        entry_tag, kind = "sitemap", CHILD_KIND
    else:
        return None
    spans, off = [], 0
    for child in root:
        if child.tag.rsplit("}", 1)[-1].lower() != entry_tag:
            continue
        for sub in child:
            if sub.tag.rsplit("}", 1)[-1].lower() == "loc":
                loc = (sub.text or "").strip()
                if loc:
                    spans.append({"kind": kind, "text": "",
                                  "media_ref": loc, "offset": off})
                    off += 1
                break
    return spans


def make_sitemap_probe(web_ref):
    """Actor class for ``map_batches`` over one level's sitemap-file URLs.

    Input columns: rank:int64 (discovery order of the file), url:string.
    Output: rank, pos:int32 (position within the file), url:string (the
    resolved <loc>), is_index:bool (True = child sitemap file).
    """
    import ray

    from upton_ray.urlops import resolve_url

    class SitemapProbe:
        def __init__(self):
            from upton_ray.fetch import make_store

            src = web_ref
            if isinstance(src, ray.ObjectRef):
                src = ray.get(src)
            self.store = make_store(src)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ranks, poss, urls, kinds = [], [], [], []
            for rank, sm_url in zip(batch["rank"].to_pylist(),
                                    batch["url"].to_pylist()):
                spans = self.store.lookup_one(sm_url) or []
                # SEPARATE counters per kind: dom_pos must be dense over
                # the loc rows alone (the instance_index prefix-sum adds
                # base + dom_pos, so a gap from an interleaved child row
                # would collide the next file's first index), and child
                # ordering likewise counts only children
                pos = {LOC_KIND: 0, CHILD_KIND: 0}
                for s in spans:
                    k = s["kind"]
                    if k not in pos:
                        continue
                    loc = s["media_ref"]
                    if not loc:
                        continue
                    try:
                        resolved = resolve_url(loc, sm_url)
                    except Exception:
                        continue
                    ranks.append(rank)
                    poss.append(pos[k])
                    urls.append(resolved)
                    kinds.append(k == CHILD_KIND)
                    pos[k] += 1
            return pa.table({
                "rank": pa.array(ranks, pa.int64()),
                "pos": pa.array(poss, pa.int32()),
                "url": pa.array(urls, pa.string()),
                "is_index": pa.array(kinds, pa.bool_())})

    return SitemapProbe


def expand_levels(web_ref, seed_url: str, max_depth: int = 3,
                  concurrency: int = 2):
    """Expand a sitemap (or sitemap-index tree) into a link Dataset with
    the (seed_id, page_no, dom_pos, url) schema of
    :func:`upton_ray.extract.extract_links_batch`, ready for the engine's
    instance_index prefix-sum.  Returns (links_ds, n_files)."""
    import ray
    import ray.data

    probe = make_sitemap_probe(web_ref)
    pending: list[tuple[int, str]] = [(0, seed_url)]
    visited = {seed_url}
    next_rank = 1
    loc_parts = []
    n_files = 1
    for _depth in range(max_depth):
        if not pending:
            break
        ds = ray.data.from_arrow(pa.table({
            "rank": pa.array([r for r, _ in pending], pa.int64()),
            "url": pa.array([u for _, u in pending], pa.string())}))
        if len(pending) > 1024:
            ds = ds.repartition(max(2, len(pending) // 512))
        rows = ds.map_batches(
            probe, batch_format="pyarrow", batch_size=512,
            concurrency=max(1, min(concurrency,
                                   len(pending) // 256 + 1)),
            num_cpus=0.5).materialize()

        def to_links(b: pa.Table) -> pa.Table:
            keep = b.filter(pa.compute.invert(b["is_index"]))
            return pa.table({
                "seed_id": pa.compute.cast(keep["rank"], pa.int32()),
                "page_no": pa.array(
                    np.zeros(keep.num_rows, np.int32), pa.int32()),
                "dom_pos": keep["pos"],
                "url": keep["url"]})

        loc_parts.append(rows.map_batches(to_links, batch_format="pyarrow"))
        # child FILES come to the driver (protocol-bounded), page URLs never
        kids = pa.concat_tables([t.filter(t["is_index"]) for t in
                                 ray.get(rows.to_arrow_refs())]) \
            .sort_by([("rank", "ascending"), ("pos", "ascending")])
        pending = []
        for u in kids["url"].to_pylist():
            if u in visited:
                continue
            visited.add(u)
            pending.append((next_rank, u))
            next_rank += 1
            n_files += 1
    if not loc_parts:          # max_depth <= 0: empty frontier, not a crash
        links = ray.data.from_arrow(pa.table({
            "seed_id": pa.array([], pa.int32()),
            "page_no": pa.array([], pa.int32()),
            "dom_pos": pa.array([], pa.int32()),
            "url": pa.array([], pa.string())}))
        return links, n_files
    links = loc_parts[0]
    for extra in loc_parts[1:]:
        links = links.union(extra)
    return links, n_files
