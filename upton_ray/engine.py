"""Crawler: the Ray-Data round loop (SURVEY.md §3.4).

Round 0 (index): seeds Dataset -> IndexWalker actor pool (per-seed sequential
pagination chains, P2) -> vectorized link extraction (M1/M2) -> deterministic
``instance_index`` assignment (the order Upton's sequential loop would have
produced: seed order, then index-page order, then DOM position).

Round 1 (instances): frontier Dataset -> InstanceWalker actor pool (stash
gate via the sharded seen-set, politeness, robots, continuation quirk) ->
ExtractRecords (the user scrape block) -> records sorted by
(instance_index, pagination_index, row_no) — Upton's exact output order
(upton.rb:337-345) restored by an explicit sort rather than by sequential
execution.

Checkpointing: when ``cfg.stash_folder`` is set, fetched pages are written as
parquet *inside the stream* (write -> read-back), the seen set is dumped at
the end, and lineage rows gate re-execution — a re-run restores the seen set
so previously-fetched URLs become cache hits (no network fetch, no sleep):
exactly the reference's stash-driven resume semantics (downloader.rb:70-98).

Scale notes (10^10-URL design point, tested single-node):
* the only driver-side materializations are (a) the per-(seed, index-page)
  link-count table used for the instance_index prefix-sum — one row per INDEX
  PAGE, ~1/links_per_page of the frontier — and (b) trace-mode conformance
  collections (tests only);
* the frontier->fetch stage is an actor pool with batched seen-set RPCs;
  host-affinity (politeness) uses a host_shard groupby — the one designed
  shuffle (SURVEY.md §7.3);
* everything else is streaming ``map_batches`` over Arrow batches.

The one inter-round BARRIER (round 0 completes before round 1 fetches) is
deliberate: Upton's ``instance_index`` is a global prefix-sum over per-index-
page link counts, and the groupby that routes fetches is itself an all-to-all.
Under real politeness pacing this costs ~15% vs the skew floor (BASELINE.md
"polite" row); removing it would mean assigning indices post-hoc from the
records themselves — noted as the next optimization, not worth the
conformance-path risk at current scale.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from upton_ray import schema
from upton_ray.config import CrawlConfig
from upton_ray.extract import ExtractRecords, extract_links_batch
from upton_ray.fetch import IndexWalker, InstanceWalker
from upton_ray.seen import SeenSet
from upton_ray.shuffle import hash_reduce
from upton_ray.urlops import hosts_of, shard_hashes


def _bucket_count(web_ref) -> int | None:
    """Bucket count of a BUCKETED corpus source (("parquet"|"lance", path,
    n_buckets)), None for every other store — the ("http", opts) source is
    a tuple too but has no bucket layout to route by."""
    if isinstance(web_ref, tuple) and web_ref[0] in ("parquet", "lance"):
        return web_ref[2]
    return None


RECORDS_OUT = pa.schema([
    ("instance_index", pa.int64()), ("pagination_index", pa.int32()),
    ("row_no", pa.int32()), ("instance_url", pa.string()),
    ("record", pa.list_(pa.string())), ("doc_kind", pa.string()),
])

FETCHED_OUT = pa.schema([
    ("instance_index", pa.int64()), ("pagination_index", pa.int32()),
    ("instance_url", pa.string()), ("spans", schema.SPANS),
    ("from_resource", pa.bool_()), ("slept", pa.bool_()),
    ("status", pa.int32()), ("robots_blocked", pa.bool_()),
])


def collect(ds, fallback_schema: pa.Schema) -> pa.Table:
    """Materialize a Dataset to one Arrow table; empty datasets yield a typed
    empty table instead of a schema-less one."""
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns > 0]
    if not tables:
        return fallback_schema.empty_table()
    return pa.concat_tables(tables, promote_options="permissive")


@dataclass
class CrawlResult:
    records: object                      # ray.data.Dataset (lazy) or pa.Table (trace)
    index_urls: Optional[list] = None    # trace: get_index output (order incl. Nones)
    sleeps: Optional[int] = None         # trace: politeness sleep count
    fetched_urls: Optional[set] = None   # trace: network-fetched URL set
    metrics: Optional[pa.Table] = None   # per-shard counters
    stats: dict = field(default_factory=dict)

    def records_table(self) -> pa.Table:
        if isinstance(self.records, pa.Table):
            return self.records
        t = collect(self.records, RECORDS_OUT)
        return t.sort_by([("instance_index", "ascending"),
                          ("pagination_index", "ascending"),
                          ("row_no", "ascending")])

    def records_rows(self) -> list[dict]:
        return self.records_table().to_pylist()

    def documents(self) -> list:
        """Reassemble Upton ``scrape()`` documents from exploded record rows."""
        docs: list = []
        cur_key = None
        for r in self.records_rows():
            key = (r["instance_index"], r["pagination_index"])
            if r["doc_kind"] == "none":
                docs.append(None)
                cur_key = key
            elif r["doc_kind"] == "scalar":
                docs.append(r["record"][0])
                cur_key = key
            elif r["doc_kind"] == "list":
                docs.append(list(r["record"]))
                cur_key = key
            else:  # table: one document accumulating its rows
                if key != cur_key:
                    docs.append([list(r["record"])])
                    cur_key = key
                else:
                    docs[-1].append(list(r["record"]))
        return docs


@ray.remote
def _block_count_sum(t: pa.Table) -> int:
    return int(pc.sum(t["sum(size)"]).as_py() or 0)


@ray.remote
def _block_exclusive_offsets(t: pa.Table, base: int) -> pa.Table:
    """Per-block piece of the distributed exclusive prefix-sum over sorted
    per-index-page link counts (see Crawler._assign_instance_index)."""
    sz = t["sum(size)"].to_numpy(zero_copy_only=False)
    off = base + np.r_[0, np.cumsum(sz)][:-1]
    return pa.table({"seed_id": t["seed_id"], "page_no": t["page_no"],
                     "base_off": pa.array(off.astype(np.int64), pa.int64())})


class Crawler:
    """One crawl run. ``web_source`` is a dict web, a synth.ScaleParams
    generator, or ("parquet", path, num_buckets) — see upton_ray.fetch."""

    def __init__(self, cfg: CrawlConfig, web_source,
                 seeds: Optional[list[tuple[int, str, str]]] = None):
        self.cfg = cfg
        if isinstance(web_source, dict):
            self.web_ref = ray.put(web_source)   # broadcast once, not per actor
        else:
            self.web_ref = web_source
        if seeds is None and cfg.index_url is not None:
            seeds = [(0, cfg.index_url, cfg.index_selector)]
        self.seeds = seeds
        self.pacer = None            # shared hot-host token bucket (if engaged)
        if cfg.stash_folder and not cfg.seen_exact:
            # fail fast: filter-only shards can't enumerate their URLs, so a
            # seen checkpoint would persist an empty set and a resumed crawl
            # would silently refetch (and re-emit) everything
            raise ValueError(
                "stash_folder (resumable crawl) requires seen_exact=True: "
                "approximate-mode seen sets cannot be checkpointed")
        self.seen: Optional[SeenSet] = None
        if cfg.debug or cfg.index_debug:
            self.seen = SeenSet(cfg.num_seen_shards,
                                capacity_per_shard=cfg.seen_capacity_per_shard,
                                approximate=not cfg.seen_exact)
            self._restore_seen()

    def shutdown(self) -> None:
        """Release the seen-set shard actors (call after consuming results)."""
        if self.seen is not None:
            self.seen.kill()
            self.seen = None
        if self.pacer is not None:
            ray.kill(self.pacer, no_restart=True)
            self.pacer = None

    # ------------------------------------------------------------ checkpoint

    def _ckpt(self, name: str) -> Optional[str]:
        if not self.cfg.stash_folder:
            return None
        os.makedirs(self.cfg.stash_folder, exist_ok=True)
        return os.path.join(self.cfg.stash_folder, name)

    def _lineage_done(self, unit: str) -> bool:
        p = self._ckpt("lineage.json")
        if not p or not os.path.exists(p):
            return False
        with open(p) as f:
            return unit in json.load(f)

    def _mark_done(self, unit: str, **info) -> None:
        p = self._ckpt("lineage.json")
        if not p:
            return
        done = {}
        if os.path.exists(p):
            with open(p) as f:
                done = json.load(f)
        done[unit] = info
        with open(p, "w") as f:
            json.dump(done, f)

    @staticmethod
    def _done_buckets(ckpt: str) -> set:
        """Buckets whose round-1 fetch checkpoint completed (marker present).
        The marker, written after the bucket's data file, is the per-partition
        lineage unit — a crash mid-bucket leaves no marker, so only that
        bucket re-walks on resume."""
        out = set()
        if not os.path.isdir(ckpt):
            return out
        for d in os.listdir(ckpt):
            if d.startswith("bucket=") and \
                    os.path.exists(os.path.join(ckpt, d, "_SUCCESS")):
                out.add(int(d.split("=", 1)[1]))
        return out

    @staticmethod
    def _clean_stale_buckets(ckpt: str, done: set) -> None:
        """Drop partial bucket dirs (data written, no marker) from a crashed
        run so the re-walk starts clean."""
        import shutil

        if not os.path.isdir(ckpt):
            return
        for d in os.listdir(ckpt):
            if d.startswith("bucket=") and int(d.split("=", 1)[1]) not in done:
                shutil.rmtree(os.path.join(ckpt, d))

    def _restore_seen(self) -> None:
        """Stream the seen checkpoint back into the shard actors one file /
        row-group at a time — the driver never holds the full URL set (and
        re-routing by hash means the shard count may change between runs).
        Accepts both the per-shard directory layout and the legacy single
        file."""
        p = self._ckpt("seen.parquet")
        if not (p and os.path.exists(p) and self.seen is not None):
            return
        files = ([os.path.join(p, f) for f in sorted(os.listdir(p))
                  if f.endswith(".parquet")] if os.path.isdir(p) else [p])
        for f in files:
            pf = pq.ParquetFile(f)
            for batch in pf.iter_batches(batch_size=65536):
                t = pa.Table.from_batches([batch])
                self.seen.restore(
                    t.filter(pc.equal(t["bad"], False))["url"].to_pylist(),
                    t.filter(pc.equal(t["bad"], True))["url"].to_pylist())

    def _dump_seen(self) -> None:
        p = self._ckpt("seen.parquet")
        if p and self.seen is not None:
            if os.path.isfile(p):
                os.remove(p)   # upgrade a legacy single-file checkpoint
            # shards write their own files in parallel — O(shard) memory
            # everywhere, nothing URL-sized on the driver
            self.seen.checkpoint(p)

    # --------------------------------------------------------------- round 0

    def get_index(self, *, trace: bool = False):
        """Round 0: seeds -> index pages -> ordered frontier Dataset with
        columns (url, seed_id, page_no, dom_pos, instance_index).
        Returns (frontier_ds, trace_info)."""
        cfg = self.cfg
        assert self.seeds, "no index seeds configured"
        ckpt = self._ckpt("frontier.parquet")
        if ckpt and self._lineage_done("round0") and os.path.exists(ckpt):
            return ray.data.read_parquet(ckpt), None

        seeds_ds, step, conc = self._seed_blocks()
        pages = seeds_ds.map_batches(
            IndexWalker,
            fn_constructor_args=(cfg, self.web_ref, self.seen),
            batch_size=step,
            batch_format="pyarrow",
            concurrency=conc,
            num_cpus=0.5,
        )
        trace_info = None
        if trace:
            pages = pages.materialize()
            pt = pa.concat_tables(ray.get(pages.to_arrow_refs()))
            trace_info = {
                "index_sleeps": int(pc.sum(pt["slept"]).as_py() or 0),
                "index_fetched": set(),
                "pages": pt,
            }
            # network-fetched index URLs: reconstruct from walker provenance
        links = pages.map_batches(extract_links_batch, batch_format="pyarrow")
        links = links.materialize()   # round-0 output is ~1/links_per_page of the crawl

        frontier = self._assign_instance_index(links)
        if ckpt:
            import shutil

            if os.path.exists(ckpt):
                shutil.rmtree(ckpt)   # stale partial output from a crashed run
            frontier.write_parquet(ckpt)
            frontier = ray.data.read_parquet(ckpt)
            self._mark_done("round0")
            self._dump_seen()
        return frontier, trace_info

    def _assign_instance_index(self, links):
        """Deterministic ``instance_index`` = exclusive prefix-sum of
        per-(seed, page) link counts + ``dom_pos`` — Upton's sequential
        numbering, computed distributed.

        Counts reduce through an Arrow combiner + groupby (one row per INDEX
        PAGE, 1/links-per-page of the frontier).  Below
        ``cfg.index_offset_collect_limit`` rows, the rollup is collected and
        broadcast as a dict (cheapest at sandbox scale).  Above it — a
        10^10-URL crawl has ~10^8+ index pages, too many for the driver —
        the prefix-sum itself runs distributed: sort the counts, per-block
        base offsets from a tiny block-sum collect (one row per BLOCK), then
        the offsets attach to links through a union-sort-sweep co-partition
        on (seed, page) — the same segment pattern as datapipe's sorted
        joins; block-edge segments fall back to a small residual groupby.
        Both paths produce identical indices (pinned by test)."""
        cfg = self.cfg

        def _page_counts(b: pa.Table) -> pa.Table:
            g = b.select(["seed_id", "page_no"]) \
                .group_by(["seed_id", "page_no"]) \
                .aggregate([([], "count_all")])   # Arrow-native, no pandas
            return pa.table({"seed_id": g["seed_id"], "page_no": g["page_no"],
                             "size": pc.cast(g["count_all"], pa.int64())})

        def _part_counts(t: pa.Table) -> pa.Table:
            if "seed_id" not in t.column_names:   # all-empty partition
                return pa.table({"seed_id": pa.array([], pa.int32()),
                                 "page_no": pa.array([], pa.int32()),
                                 "sum(size)": pa.array([], pa.int64())})
            g = t.group_by(["seed_id", "page_no"]).aggregate([("size", "sum")])
            return pa.table({"seed_id": g["seed_id"], "page_no": g["page_no"],
                             "sum(size)": g["size_sum"]})

        # final rollup on hash_reduce: the partials are one row per index
        # page per block, far below Dataset.groupby's fixed cost
        counts_ds = hash_reduce(
            links.map_batches(_page_counts, batch_format="pyarrow"),
            ["seed_id", "page_no"], _part_counts)
        n_pages = counts_ds.count()

        if n_pages <= cfg.index_offset_collect_limit:
            t = collect(counts_ds, pa.schema([
                ("seed_id", pa.int32()), ("page_no", pa.int32()),
                ("sum(size)", pa.int64())]))
            s = t["seed_id"].to_numpy(zero_copy_only=False)
            pg = t["page_no"].to_numpy(zero_copy_only=False)
            sz = t["sum(size)"].to_numpy(zero_copy_only=False)
            o = np.lexsort((pg, s))
            offs = np.r_[0, np.cumsum(sz[o])][:-1]
            offsets = {(int(a), int(b)): int(c) for a, b, c in
                       zip(s[o], pg[o], offs)}

            def assign(batch: pa.Table) -> pa.Table:
                s = batch["seed_id"].to_numpy(zero_copy_only=False)
                p = batch["page_no"].to_numpy(zero_copy_only=False)
                d = batch["dom_pos"].to_numpy(zero_copy_only=False)
                base = np.array([offsets[(int(a), int(b))]
                                 for a, b in zip(s, p)], dtype=np.int64)
                return batch.append_column(
                    "instance_index", pa.array(base + d, pa.int64()))

            return links.map_batches(assign, batch_format="pyarrow")

        # ---- distributed prefix-sum path ----
        srt = counts_ds.sort(["seed_id", "page_no"]).materialize()
        refs = srt.to_arrow_refs()
        sums = ray.get([_block_count_sum.remote(r) for r in refs])
        bases = np.r_[0, np.cumsum(sums)][:-1]
        offsets_ds = ray.data.from_arrow_refs(
            [_block_exclusive_offsets.remote(r, int(b))
             for r, b in zip(refs, bases)])

        def tag_links(b: pa.Table) -> pa.Table:
            return pa.table({
                "seed_id": b["seed_id"], "page_no": b["page_no"],
                "dom_pos": b["dom_pos"], "url": b["url"],
                "base_off": pa.array(np.full(b.num_rows, -1, np.int64))})

        def tag_offsets(b: pa.Table) -> pa.Table:
            return pa.table({
                "seed_id": pc.cast(b["seed_id"], pa.int32()),
                "page_no": pc.cast(b["page_no"], pa.int32()),
                # marker sorts FIRST within its (seed, page) segment
                "dom_pos": pa.array(np.full(b.num_rows, -1, np.int32)),
                "url": pa.array([None] * b.num_rows, pa.string()),
                "base_off": b["base_off"]})

        merged = (links.map_batches(tag_links, batch_format="pyarrow")
                  .union(offsets_ds.map_batches(tag_offsets,
                                                batch_format="pyarrow"))
                  .sort(["seed_id", "page_no", "dom_pos"])).materialize()

        def _seg_bounds(b: pa.Table):
            s = b["seed_id"].to_numpy(zero_copy_only=False)
            p = b["page_no"].to_numpy(zero_copy_only=False)
            n = len(s)
            change = np.zeros(n + 1, dtype=bool)
            change[0] = change[n] = True
            change[1:n] |= (s[1:] != s[:-1]) | (p[1:] != p[:-1])
            return np.flatnonzero(change), n

        def _assign_segment(t: pa.Table) -> pa.Table:
            d = t["dom_pos"].to_numpy(zero_copy_only=False)
            base = int(t["base_off"][int(np.argmin(d))].as_py())
            keep = d >= 0                       # drop the marker row
            return pa.table({
                "seed_id": t["seed_id"].filter(pa.array(keep)),
                "page_no": t["page_no"].filter(pa.array(keep)),
                "dom_pos": t["dom_pos"].filter(pa.array(keep)),
                "url": t["url"].filter(pa.array(keep)),
                "instance_index": pa.array(base + d[keep].astype(np.int64),
                                           pa.int64())})

        def interior(b: pa.Table) -> pa.Table:
            empty = pa.table({
                "seed_id": pa.array([], pa.int32()),
                "page_no": pa.array([], pa.int32()),
                "dom_pos": pa.array([], pa.int32()),
                "url": pa.array([], pa.string()),
                "instance_index": pa.array([], pa.int64())})
            if b.num_rows == 0:
                return empty
            bounds, n = _seg_bounds(b)
            outs = [empty]
            for s, e in zip(bounds[:-1], bounds[1:]):
                if s == 0 or e == n:
                    continue                    # edge segment: residual pass
                outs.append(_assign_segment(b.slice(s, e - s)))
            return pa.concat_tables(outs)

        def edge_rows(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return b
            bounds, n = _seg_bounds(b)
            keep = np.zeros(n, dtype=bool)
            keep[:bounds[1]] = True
            keep[bounds[-2]:] = True
            return b.filter(pa.array(keep))

        return merged.map_batches(interior, batch_format="pyarrow",
                                  batch_size=None).union(
            merged.map_batches(edge_rows, batch_format="pyarrow",
                               batch_size=None)
                  .groupby(["seed_id", "page_no"])
                  .map_groups(_assign_segment, batch_format="pyarrow"))

    def _frontier_from_sitemaps(self):
        """Sitemap-seeded frontier (cfg.sitemap_url): expand the sitemap /
        sitemap-index tree level-by-level (upton_ray.sitemap.expand_levels,
        each level a distributed actor-pool probe over the store), then the
        same instance_index prefix-sum as index-page links.  Checkpoints
        under the round0 lineage marker exactly like get_index, so a
        crashed run resumes without re-expanding."""
        cfg = self.cfg
        ckpt = self._ckpt("frontier.parquet")
        if ckpt and self._lineage_done("round0") and os.path.exists(ckpt):
            return ray.data.read_parquet(ckpt)
        from upton_ray.sitemap import expand_levels

        links, _n_files = expand_levels(
            self.web_ref, cfg.sitemap_url, max_depth=cfg.sitemap_max_depth,
            concurrency=cfg.fetch_concurrency)
        frontier = self._assign_instance_index(links).materialize()
        # sitemap frontiers arrive in one block per probe task — far fewer
        # than the fetch pool wants; re-grain to ~2 blocks per CPU so the
        # InstanceWalker pool fills (same rule as directory corpus reads)
        if frontier.count() > 10_000:
            try:
                cpus = int(ray.cluster_resources().get("CPU", 0)) or 8
            except Exception:
                cpus = 8
            frontier = frontier.repartition(max(2, 2 * cpus))
        if ckpt:
            import shutil

            if os.path.exists(ckpt):
                shutil.rmtree(ckpt)
            frontier.write_parquet(ckpt)
            frontier = ray.data.read_parquet(ckpt)
            self._mark_done("round0")
            self._dump_seen()
        return frontier

    # --------------------------------------------------------------- round 1

    def _frontier_from_url_array(self):
        urls = list(self.cfg.url_array)
        t = pa.table({
            "url": pa.array(urls, pa.string()),
            "instance_index": pa.array(np.arange(len(urls), dtype=np.int64)),
        })
        ds = ray.data.from_arrow(t)
        if len(urls) > 10_000:
            ds = ds.repartition(64)
        return ds

    def fetch_instances(self, frontier):
        """Frontier Dataset -> fetched instance-page Dataset."""
        cfg = self.cfg
        walker_args = (cfg, self.web_ref, self.seen)
        if _bucket_count(self.web_ref) and not cfg.needs_host_affinity():
            # frontier-routing shuffle (SURVEY.md §7.3): co-locate each corpus
            # bucket's URLs so every bucket is decoded ONCE, not per batch —
            # the shuffle moves only (url, ints) rows, the cheap side
            from upton_ray.fetch import make_group_walker

            _, path, buckets = self.web_ref

            def add_bucket(batch: pa.Table) -> pa.Table:
                urls = batch["url"].to_numpy(zero_copy_only=False)
                return batch.append_column(
                    "bucket", pa.array(shard_hashes(hosts_of(urls), buckets),
                                       pa.int32()))

            token = f"walk-{os.getpid()}-{id(self)}"
            ckpt = self._ckpt("fetched_round1")
            done: set = set()
            if ckpt:
                done = self._done_buckets(ckpt)
                self._clean_stale_buckets(ckpt, done)
            bucketed = frontier.map_batches(add_bucket, batch_format="pyarrow")
            if done:   # partition-level resume: only not-yet-done buckets walk
                done_arr = np.array(sorted(done), dtype=np.int64)

                def drop_done(b: pa.Table) -> pa.Table:
                    keep = ~np.isin(b["bucket"].to_numpy(zero_copy_only=False),
                                    done_arr)
                    return b.filter(pa.array(keep))

                bucketed = bucketed.map_batches(drop_done, batch_format="pyarrow")
            walk_ncpu = cfg.bucket_walk_num_cpus
            if walk_ncpu is None:   # auto: bound concurrent decodes at ~16
                total = int(ray.cluster_resources().get("CPU", 8))
                walk_ncpu = max(1.0, total / 16.0)
            walked = bucketed.groupby("bucket").map_groups(
                make_group_walker(token, *walker_args, ckpt_dir=ckpt),
                batch_format="pyarrow",
                num_cpus=walk_ncpu)
            if not ckpt:
                return walked
            # With a checkpoint, the walkers write page data straight to
            # <ckpt>/bucket=<b>/ and emit only one-row stats — the barrier
            # below holds a few KB, never the crawl's spans. Lineage +
            # per-partition metrics come from the stats (THIS run's work
            # only; resumed buckets contribute nothing); extraction then
            # streams from the checkpoint files.
            stats_schema = pa.schema([
                ("bucket", pa.int32()), ("rows", pa.int64()),
                ("fetched", pa.int64()), ("cache_hits", pa.int64()),
                ("slept", pa.int64()), ("errors", pa.int64()),
                ("robots_blocked", pa.int64())])
            stats_t = collect(walked, stats_schema)
            self._write_metrics_from_stats(stats_t)
            for b in sorted(stats_t["bucket"].to_pylist()):
                self._mark_done(f"round1/bucket={b}")
            self._mark_done("round1")
            self._dump_seen()
            all_done = sorted(self._done_buckets(ckpt))
            if not all_done:
                return ray.data.from_arrow(FETCHED_OUT.empty_table())
            return ray.data.read_parquet(
                [os.path.join(ckpt, f"bucket={b}", "data-0.parquet")
                 for b in all_done],
                columns=[f.name for f in FETCHED_OUT])
        if cfg.needs_host_affinity():
            # the designed shuffle: co-locate each host on one worker so the
            # per-host deadline heap is authoritative cluster-wide.
            # Skew handling (north_rule): hosts above cfg.hot_host_threshold
            # are SPLIT into salted sub-queues that land on different workers
            # but share one global token bucket (HostPacer actor).
            hot_hosts: frozenset = frozenset()
            self.pacer = None
            if cfg.hot_host_threshold:
                # pin the frontier first: the counting pass must not re-run
                # the (stateful) round-0 walkers when the fetch pass executes.
                # Frontier rows are just (url, ints); at the 10^10 design
                # point replace this with the round-0 per-host link counts.
                frontier = frontier.materialize()
                hot_hosts = self._find_hot_hosts(frontier,
                                                 cfg.hot_host_threshold)
                if hot_hosts:
                    from upton_ray.frontier import make_host_pacer

                    self.pacer = make_host_pacer()
            salts = max(1, cfg.hot_host_salts)

            def add_shard(batch: pa.Table) -> pa.Table:
                from upton_ray.frontier import salt_hosts

                urls = batch["url"].to_numpy(zero_copy_only=False)
                keys = salt_hosts(hosts_of(urls), hot_hosts, salts)
                return batch.append_column(
                    "host_shard",
                    pa.array(shard_hashes(keys, cfg.fetch_concurrency), pa.int32()))

            from upton_ray.fetch import make_group_walker

            # map_groups parallelism is bounded by the shuffled BLOCK count,
            # not the group count: a small-block frontier would serialize the
            # per-shard walks. The frontier rows are tiny (url + ints), so a
            # pre-groupby repartition is cheap insurance.
            sharded = (frontier
                       .map_batches(add_shard, batch_format="pyarrow")
                       .repartition(cfg.fetch_concurrency * 2))
            token = f"hostwalk-{os.getpid()}-{id(self)}"
            fetched = sharded.groupby("host_shard").map_groups(
                make_group_walker(token, *walker_args, drop=("host_shard",),
                                  pacer=self.pacer, hot_hosts=hot_hosts),
                batch_format="pyarrow")
        else:
            fetched = frontier.map_batches(
                InstanceWalker,
                fn_constructor_args=walker_args,
                batch_size=cfg.fetch_batch_size,
                batch_format="pyarrow",
                concurrency=cfg.fetch_concurrency,
                num_cpus=0.5,
            )
        return self._maybe_checkpoint_fetch(fetched)

    def _seed_blocks(self):
        """Pre-split seed blocks (block = task unit). For a bucketed parquet
        corpus, group seeds by their host's bucket so each task touches ONE
        bucket and the per-actor bucket cache actually hits (without this,
        every chain re-decodes a full bucket — the dominant cost at scale).
        Returns (seeds_ds, batch_step, pool_concurrency)."""
        cfg = self.cfg
        seeds_t = pa.table({
            "seed_id": pa.array([s[0] for s in self.seeds], pa.int32()),
            "url": pa.array([s[1] for s in self.seeds], pa.string()),
            "selector": pa.array([s[2] for s in self.seeds], pa.string()),
        })
        n_seeds = len(self.seeds)
        conc = min(cfg.fetch_concurrency, max(1, n_seeds))
        n_buckets = _bucket_count(self.web_ref)
        if n_buckets:
            hb = shard_hashes(hosts_of(np.array([s[1] for s in self.seeds],
                                                dtype=object)), n_buckets)
            order = np.lexsort((seeds_t["seed_id"].to_numpy(), hb))
            seeds_t = seeds_t.take(pa.array(order))
            hb_sorted = hb[order]
            cuts = [0] + (np.flatnonzero(np.diff(hb_sorted)) + 1).tolist() + [n_seeds]
            seed_blocks = []
            max_chains = max(4, n_seeds // max(1, conc * 2))
            for a, b in zip(cuts[:-1], cuts[1:]):
                for i in range(a, b, max_chains):
                    seed_blocks.append(seeds_t.slice(i, min(max_chains, b - i)))
            step = max_chains
        else:
            n_blocks = min(n_seeds, conc * 4) or 1
            step = (n_seeds + n_blocks - 1) // n_blocks
            seed_blocks = [seeds_t.slice(i, step)
                           for i in range(0, n_seeds, step)]
        return ray.data.from_arrow(seed_blocks), step, conc

    @staticmethod
    def _find_hot_hosts(frontier, threshold: int) -> frozenset:
        """Per-host frontier counts: per-block Arrow combiner -> distributed
        groupby-sum -> DISTRIBUTED threshold filter, so only the hosts that
        are actually hot (few, by definition) ever reach the driver — a
        web-scale frontier has ~10^8 distinct hosts, far too many to
        collect."""
        def partial(b: pa.Table) -> pa.Table:
            hs = hosts_of(b["url"].to_numpy(zero_copy_only=False))
            g = pa.table({"host": pa.array(hs, pa.string())}) \
                .group_by("host").aggregate([([], "count_all")])
            return pa.table({"host": g["host"],
                             "size": pc.cast(g["count_all"], pa.int64())})

        def part_hot(t: pa.Table) -> pa.Table:
            if "host" not in t.column_names:      # all-empty partition
                return pa.table({"host": pa.array([], pa.string())})
            g = t.group_by("host").aggregate([("size", "sum")])
            return pa.table({"host": g["host"].filter(
                pc.greater(g["size_sum"], threshold))})

        hot = hash_reduce(
            frontier.map_batches(partial, batch_format="pyarrow"),
            ["host"], part_hot)
        t = collect(hot, pa.schema([("host", pa.string())]))
        return frozenset(t["host"].to_pylist())

    def _maybe_checkpoint_fetch(self, fetched):
        ckpt = self._ckpt("fetched_round1")
        if ckpt:
            import shutil

            if os.path.exists(ckpt):
                shutil.rmtree(ckpt)   # stale partial output from a crashed run
            cols = ["instance_index", "pagination_index", "instance_url", "spans",
                    "from_resource", "slept", "status", "robots_blocked"]
            from upton_ray.urlops import stash_filenames
            cfg = self.cfg

            def add_stash_key(b: pa.Table) -> pa.Table:
                # the reference's per-page stash filename
                # (downloader.rb:122-139; readable via cfg.readable_filenames)
                return b.append_column("stash_key", pa.array(
                    stash_filenames(b["instance_url"].to_pylist(),
                                    cfg.readable_filenames,
                                    cfg.stash_folder or ""), pa.string()))

            fetched.select_columns(cols).map_batches(
                add_stash_key, batch_format="pyarrow").write_parquet(ckpt)
            fetched = ray.data.read_parquet(ckpt, columns=cols)
            self._write_metrics(fetched)
            self._mark_done("round1")
            self._dump_seen()
        return fetched

    def _write_metrics(self, fetched) -> None:
        """Per-partition counters (T5: the structured replacement for the
        reference's @verbose logging) appended to the checkpoint: partition =
        host-hash bucket, matching the fetch routing, so resume tooling can
        reconcile lineage with counters per unit of work."""
        p = self._ckpt("metrics.parquet")
        if not p:
            return
        buckets = _bucket_count(self.web_ref) or self.cfg.num_seen_shards

        def partial(b: pa.Table) -> pa.Table:
            hs = hosts_of(b["instance_url"].to_numpy(zero_copy_only=False))
            part = shard_hashes(hs, buckets)
            status = b["status"].to_numpy(zero_copy_only=False)
            fetched_f = b["from_resource"].to_numpy(zero_copy_only=False)
            g = pa.table({
                "partition": pa.array(part, pa.int32()),
                "fetched": pa.array(fetched_f.astype(np.int64), pa.int64()),
                "cache_hits": pa.array((~fetched_f).astype(np.int64),
                                       pa.int64()),
                "slept": pa.array(
                    b["slept"].to_numpy(zero_copy_only=False).astype(np.int64),
                    pa.int64()),
                "errors": pa.array(
                    ((status != 200) & (status != 0)).astype(np.int64),
                    pa.int64()),
                "robots_blocked": pa.array(
                    b["robots_blocked"].to_numpy(zero_copy_only=False)
                    .astype(np.int64), pa.int64()),
            }).group_by("partition").aggregate(
                [("fetched", "sum"), ("cache_hits", "sum"), ("slept", "sum"),
                 ("errors", "sum"), ("robots_blocked", "sum"),
                 ([], "count_all")])
            return pa.table({
                "partition": g["partition"],
                "fetched": g["fetched_sum"],
                "cache_hits": g["cache_hits_sum"],
                "slept": g["slept_sum"], "errors": g["errors_sum"],
                "robots_blocked": g["robots_blocked_sum"],
                "rows": pc.cast(g["count_all"], pa.int64())})

        sch = pa.schema([("partition", pa.int32()), ("fetched", pa.int64()),
                         ("cache_hits", pa.int64()), ("slept", pa.int64()),
                         ("errors", pa.int64()), ("robots_blocked", pa.int64()),
                         ("rows", pa.int64())])
        t = collect(fetched.map_batches(partial, batch_format="pyarrow"), sch)
        g = t.group_by("partition").aggregate(
            [(c, "sum") for c in sch.names if c != "partition"])
        g = g.sort_by("partition")
        pq.write_table(pa.table(
            {"round": pa.array(np.ones(g.num_rows, dtype=np.int64)),
             "partition": g["partition"],
             **{c: g[f"{c}_sum"] for c in sch.names if c != "partition"}}), p)

    def _write_metrics_from_stats(self, stats_t: pa.Table) -> None:
        """Per-partition metrics straight from the walkers' per-bucket stat
        rows (partition = corpus bucket, matching the fetch routing and the
        lineage unit)."""
        p = self._ckpt("metrics.parquet")
        if not p:
            return
        t = stats_t.rename_columns(
            ["partition" if c == "bucket" else c
             for c in stats_t.column_names]).sort_by("partition")
        pq.write_table(pa.table(
            {"round": pa.array(np.ones(t.num_rows, dtype=np.int64)),
             **{c: t[c] for c in t.column_names}}), p)

    def extract_records(self, fetched):
        # instance (not class): runs in the task pool — extraction is stateless,
        # the instance just pre-splits the extractor spec once
        return fetched.map_batches(
            ExtractRecords(self.cfg.extractor),
            batch_format="pyarrow",
            batch_size=self.cfg.fetch_batch_size,
        )

    # ------------------------------------------------------------------ runs

    def _load_robots_from_web(self) -> None:
        """T3 completion: probe ``http://<host>/robots.txt`` for every seed
        host THROUGH THE WEB SOURCE (distributed map_batches over the host
        list; one (host, body) row per host reaches the driver — the host
        list is always the small side) and merge the bodies into
        ``cfg.robots_txt`` for the fetch workers to parse.  Pre-supplied
        entries win — they act as operator overrides."""
        cfg = self.cfg
        urls = ([s[1] for s in (self.seeds or [])]
                + list(cfg.url_array or []))
        # each host keeps the scheme of the seed that introduced it — an
        # https-only corpus stores robots under https://, so a fixed http://
        # probe would silently find no rules; the other scheme stays as the
        # fallback probe
        str_urls = [u for u in urls if isinstance(u, str)]
        host_scheme: dict[str, str] = {}
        if str_urls:
            # one vectorized hosts_of over every URL — a per-URL call costs
            # a numpy array construction each on 10^7-URL crawls
            hs = hosts_of(np.array(str_urls, dtype=object))
            for u, h in zip(str_urls, hs):
                if h and h not in host_scheme:
                    host_scheme[h] = "https" \
                        if u.lower().startswith("https:") else "http"
        hosts = sorted(h for h in host_scheme if h not in cfg.robots_txt)
        if not hosts:
            return
        web_ref = self.web_ref

        class RobotsProbe:
            def __init__(self):
                from upton_ray.fetch import make_store

                src = web_ref
                if isinstance(src, ray.ObjectRef):
                    src = ray.get(src)
                self.store = make_store(src)

            def __call__(self, batch: pa.Table) -> pa.Table:
                out_h, out_b = [], []
                for h, scheme in zip(batch["host"].to_pylist(),
                                     batch["scheme"].to_pylist()):
                    other = "https" if scheme == "http" else "http"
                    spans = (self.store.lookup_one(
                                 f"{scheme}://{h}/robots.txt")
                             or self.store.lookup_one(
                                 f"{other}://{h}/robots.txt"))
                    if spans:
                        out_h.append(h)
                        out_b.append("\n".join(
                            s["text"] for s in spans if s["text"]))
                return pa.table({"host": pa.array(out_h, pa.string()),
                                 "body": pa.array(out_b, pa.string())})

        ds = ray.data.from_arrow(pa.table({
            "host": pa.array(hosts),
            "scheme": pa.array([host_scheme[h] for h in hosts])}))
        found = collect(ds.map_batches(
            RobotsProbe, batch_format="pyarrow", batch_size=1024,
            concurrency=min(4, max(1, len(hosts) // 256 + 1)), num_cpus=0.5),
            pa.schema([("host", pa.string()), ("body", pa.string())]))
        for h, b in zip(found["host"].to_pylist(), found["body"].to_pylist()):
            cfg.robots_txt[h] = b

    def crawl(self, *, trace: bool = False) -> CrawlResult:
        cfg = self.cfg
        index_urls = None
        if cfg.respect_robots and cfg.fetch_robots:
            self._load_robots_from_web()
        if cfg.url_array is not None:
            frontier = self._frontier_from_url_array()
            trace_info = None
        elif cfg.sitemap_url:
            frontier = self._frontier_from_sitemaps()
            trace_info = None
        else:
            frontier, trace_info = self.get_index(trace=trace)

        if trace:
            frontier_schema = pa.schema([
                ("seed_id", pa.int32()), ("page_no", pa.int32()),
                ("dom_pos", pa.int32()), ("url", pa.string()),
                ("instance_index", pa.int64())])
            ft = collect(frontier, frontier_schema)
            if "dom_pos" in ft.column_names:
                ft = ft.sort_by([("instance_index", "ascending")])
                index_urls = ft["url"].to_pylist()
            frontier = ray.data.from_arrow(ft)

        fetched = self.fetch_instances(frontier)
        if trace:
            fetched = fetched.materialize()
            fetched_t = collect(fetched, FETCHED_OUT)
        records = self.extract_records(fetched)
        records = records.sort(["instance_index", "pagination_index", "row_no"])

        if not trace:
            return CrawlResult(records=records)

        rt = collect(records, RECORDS_OUT)
        rt = rt.sort_by([("instance_index", "ascending"),
                         ("pagination_index", "ascending"),
                         ("row_no", "ascending")])
        sleeps = int(pc.sum(fetched_t["slept"]).as_py() or 0)
        fetched_urls = set(
            pc.filter(fetched_t["instance_url"], fetched_t["from_resource"]).to_pylist())
        if trace_info is not None:
            sleeps += trace_info["index_sleeps"]
            pt = trace_info["pages"]
            # index pages that were network fetches: their resolved URLs are
            # not carried by the walker output; recompute from the fetch flags
            fetched_urls |= set(self._index_fetch_urls(pt))
        metrics = self._metrics(fetched_t)
        self._dump_seen()
        return CrawlResult(records=rt, index_urls=index_urls, sleeps=sleeps,
                           fetched_urls=fetched_urls, metrics=metrics)

    # ------------------------------------------------- overlapped streaming

    _SEED_SHIFT, _PAGE_SHIFT = 40, 20   # seed < 2^23, page < 2^20, dom < 2^20

    def crawl_overlapped(self) -> CrawlResult:
        """One continuous streaming pipeline — index chains, link extraction
        and instance fetches OVERLAP (no inter-round barrier): while one
        seed's pagination chain is still walking, other seeds' discovered
        instances are already fetching.

        How the barrier is removed:
        * ``instance_index`` is fetched-through as a bit-packed
          ``(seed_id, page_no, dom_pos)`` surrogate whose lexicographic order
          EQUALS Upton's sequential order, then rank-remapped to the dense
          prefix-sum value at finalize (every link yields >= 1 record row,
          so the rank domain is complete);
        * politeness (when real) routes instance fetches by HOST (the same
          host_shard groupby as :meth:`crawl`) while EVERY host still leases
          its windows from the shared HostPacer token-bucket actor — the
          lease keeps global pacing airtight even though a host's index
          chain may still be walking on another worker while its instances
          fetch; the affinity keeps a host's leased windows contiguous on
          one worker instead of fragmented across the pool.

        Checkpoint / trace / url_array runs use :meth:`crawl` (the surrogate
        would leak into their artifacts).

        Measured tradeoff (192-host zipf bench corpus, this sandbox): at
        sleep=0 throughput is on par with :meth:`crawl` (the removed barrier
        is offset by losing bucket-routed corpus decodes + the rank-remap
        pass); under real politeness the round-4 host-affine routing closed
        the round-2 gap — 67.1 s, 0.861 of the 57.8 s skew floor, vs 117.8 s
        (0.49) when fetches were randomly routed, on par with :meth:`crawl`'s
        0.81-0.86. :meth:`crawl` stays the default (it adds hot-host
        SPLITTING + checkpointing); this mode is for pipelines that need
        index discovery and instance processing to overlap (e.g. when the
        extract stage, not the fetch budget, dominates).
        """
        cfg = self.cfg
        assert cfg.url_array is None and not cfg.stash_folder, \
            "overlapped mode: index-driven, stash-less crawls only"
        pacer = None
        hot: object = frozenset()
        if cfg.real_sleep and cfg.sleep_time_between_requests > 0:
            from upton_ray.frontier import make_host_pacer

            self.pacer = pacer = make_host_pacer()
            hot = None           # sentinel: ALL hosts lease from the pacer
        seeds_ds, step, conc = self._seed_blocks()
        pages = seeds_ds.map_batches(
            IndexWalker,
            fn_constructor_args=(cfg, self.web_ref, self.seen, pacer, hot),
            batch_size=step, batch_format="pyarrow", concurrency=conc,
            num_cpus=0.5)
        links = pages.map_batches(extract_links_batch, batch_format="pyarrow")

        sh_s, sh_p = self._SEED_SHIFT, self._PAGE_SHIFT

        def pack(b: pa.Table) -> pa.Table:
            s = b["seed_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            p = b["page_no"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = b["dom_pos"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "url": b["url"],
                "instance_index": pa.array((s << sh_s) | (p << sh_p) | d,
                                           pa.int64()),
            })

        frontier = links.map_batches(pack, batch_format="pyarrow")
        if pacer is not None:
            # real politeness: route instance fetches by HOST so each host's
            # leased windows are requested by ONE worker in one contiguous
            # block.  Random routing fragmented a hot host's windows across
            # workers, each blocking out its slice serially (r2 measurement:
            # 0.49 of the skew floor vs 0.81-0.86 host-affine).  Every host
            # still leases from the shared pacer (hot_hosts=None), so global
            # pacing stays airtight even while the host's index chain — which
            # may still be walking on another worker — fetches concurrently.
            # The groupby is a barrier on the LINK stream only; under real
            # politeness the fetch floor dominates wall time, so the lost
            # overlap is noise (measured: BASELINE.md round-4 addendum).
            from upton_ray.fetch import make_group_walker

            def add_shard(b: pa.Table) -> pa.Table:
                urls = b["url"].to_numpy(zero_copy_only=False)
                return b.append_column(
                    "host_shard",
                    pa.array(shard_hashes(hosts_of(urls),
                                          cfg.fetch_concurrency), pa.int32()))

            token = f"overlapwalk-{os.getpid()}-{id(self)}"
            fetched = (frontier
                       .map_batches(add_shard, batch_format="pyarrow")
                       .repartition(cfg.fetch_concurrency * 2)
                       .groupby("host_shard")
                       .map_groups(make_group_walker(
                           token, cfg, self.web_ref, self.seen,
                           drop=("host_shard",), pacer=pacer, hot_hosts=None),
                           batch_format="pyarrow"))
        else:
            fetched = frontier.map_batches(
                InstanceWalker,
                fn_constructor_args=(cfg, self.web_ref, self.seen, pacer, hot),
                batch_size=cfg.fetch_batch_size, batch_format="pyarrow",
                concurrency=cfg.fetch_concurrency, num_cpus=0.5)
        records = self.extract_records(fetched).materialize()
        # rank-remap: surrogate -> dense index. The distinct-key set is one
        # entry per LINK (records/row_no-fold smaller than the crawl); at
        # 10^10 scale this becomes a distributed sort-rank, same contract.
        def uniq(b: pa.Table) -> pa.Table:
            return pa.table({"s": pc.unique(b["instance_index"])})

        keys_t = collect(records.map_batches(uniq, batch_format="pyarrow"),
                         pa.schema([("s", pa.int64())]))
        keys = np.unique(keys_t["s"].to_numpy(zero_copy_only=False))
        keys_ref = ray.put(keys)

        def remap(b: pa.Table) -> pa.Table:
            k = ray.get(keys_ref)
            vals = b["instance_index"].to_numpy(zero_copy_only=False)
            return b.set_column(
                b.column_names.index("instance_index"), "instance_index",
                pa.array(np.searchsorted(k, vals), pa.int64()))

        out = records.map_batches(remap, batch_format="pyarrow") \
            .sort(["instance_index", "pagination_index", "row_no"])
        return CrawlResult(records=out)

    def _index_fetch_urls(self, pages_t: pa.Table) -> list[str]:
        """Reconstruct the index-page URLs that hit the network (trace only)."""
        from upton_ray.urlops import next_index_page_url, resolve_url

        cfg = self.cfg
        out = []
        sel = {s[0]: s[1] for s in (self.seeds or [])}
        for row in pages_t.to_pylist():
            if not row["from_resource"]:
                continue
            seed_url = sel[row["seed_id"]]
            pidx = cfg.pagination_start_index + row["page_no"] * cfg.pagination_interval
            if cfg.next_index_page_url is not None:   # P1 override hook
                nxt = cfg.next_index_page_url(seed_url, pidx)
            else:
                nxt = next_index_page_url(
                    seed_url, pidx, paginated=cfg.paginated,
                    pagination_param=cfg.pagination_param,
                    pagination_max_pages=cfg.pagination_max_pages)
            out.append(resolve_url(nxt, seed_url) if nxt else seed_url)
        return out

    def _metrics(self, fetched_t: pa.Table) -> pa.Table:
        n = fetched_t.num_rows
        return pa.table({
            "round": pa.array([1], pa.int32()),
            "partition": pa.array([-1], pa.int32()),
            "fetched": pa.array([int(pc.sum(fetched_t["from_resource"]).as_py() or 0)], pa.int64()),
            "cache_hits": pa.array([int(n - (pc.sum(fetched_t["from_resource"]).as_py() or 0))], pa.int64()),
            "slept": pa.array([int(pc.sum(fetched_t["slept"]).as_py() or 0)], pa.int64()),
            "errors": pa.array([int(pc.sum(pc.and_(pc.not_equal(fetched_t["status"], 200),
                                                   pc.not_equal(fetched_t["status"], 0))).as_py() or 0)], pa.int64()),
            "robots_blocked": pa.array([int(pc.sum(fetched_t["robots_blocked"]).as_py() or 0)], pa.int64()),
            "deduped": pa.array([0], pa.int64()),
        })
