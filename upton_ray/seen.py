"""Partitioned URL-seen set: the distributed re-expression of the reference's
filesystem stash keyed by MD5(url) (/root/reference/lib/upton/downloader.rb:70-143).

Design (SURVEY.md §2.4 T1): N shard actors, routed by a stable string hash of
the url.  Each shard holds

* a bloom filter  — fast *negative* membership (definitely-new fast path);
* an exact Python set — the source of truth (bloom false-positives fall
  through to it, so semantics are exact — a bloom positive alone must never
  skip a fetch).

``check_and_add`` is the one batch RPC the fetch stage needs: it returns, per
url, whether the url was NEW (and atomically marks it seen).  Duplicates
*within* one call count once — matching stash semantics where the first fetch
writes the cache file and the second read hits it.

Shards checkpoint/restore their exact sets (parquet) for crawl resume.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

def _hash2(urls: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    arr = np.asarray(urls, dtype=object)
    h1 = pd.util.hash_array(arr, categorize=False)
    h2 = pd.util.hash_array(arr, hash_key="upton_ray_seen_2", categorize=False)
    return h1, h2


class Bloom:
    """Plain numpy bloom filter (Kirsch–Mitzenmacher double hashing)."""

    def __init__(self, capacity: int = 1_000_000, fp_rate: float = 0.01, k: int = 7):
        bits = max(1024, int(-capacity * np.log(fp_rate) / (np.log(2) ** 2)))
        self.m = np.uint64(bits)
        self.k = k
        self.bits = np.zeros((bits + 63) // 64, dtype=np.uint64)

    def _positions(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        # (n, k) bit positions
        ks = np.arange(self.k, dtype=np.uint64)
        return (h1[:, None] + ks[None, :] * h2[:, None]) % self.m

    def add_and_test(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Returns mask of items that *might* have been present before adding."""
        pos = self._positions(h1, h2)
        word, bit = pos >> np.uint64(6), pos & np.uint64(63)
        present = (self.bits[word] >> bit) & np.uint64(1)
        maybe = present.all(axis=1).astype(bool)
        np.bitwise_or.at(self.bits, word, np.uint64(1) << bit)
        return maybe

    def test(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        pos = self._positions(h1, h2)
        word, bit = pos >> np.uint64(6), pos & np.uint64(63)
        present = (self.bits[word] >> bit) & np.uint64(1)
        return present.all(axis=1).astype(bool)


class Cuckoo:
    """Numpy cuckoo filter — the deletable approximate-membership structure
    (north_star: "cuckoo fallback for deletions").  Blooms can't delete: on
    re-crawl invalidation the bloom would keep answering "maybe seen" forever,
    so invalidated shards switch their fast path to this filter.

    4-slot buckets of uint16 fingerprints (0 = empty); partial-key cuckoo
    hashing: bucket2 = bucket1 XOR hash(fingerprint).  At 10^10 URLs this is
    ~2.25 bytes/key/shard vs ~60+ for a Python set — the memory scale path;
    exactness (when required for conformance) still comes from the exact set.
    """

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int = 1_000_000):
        n_buckets = 1
        while n_buckets * self.SLOTS < capacity * 1.05:
            n_buckets *= 2
        self.m = n_buckets                      # power of two -> mask indexing
        self.table = np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        self.count = 0
        # overfull-table safety net: fingerprints _insert_one couldn't place
        # (MAX_KICKS exhausted) land here so membership NEVER false-negatives
        # on an added key — a dropped insert would mean a permanent refetch
        # loop in approximate mode.  Bounded: non-empty only past ~95% load,
        # where the filter should have been sized larger anyway (n_spilled
        # makes saturation visible to operators).
        self.spill: set[tuple[int, int]] = set()   # (bucket1, fp)

    def _fp_and_buckets(self, h1: np.ndarray, h2: np.ndarray):
        fp = (h2 % np.uint64(65535) + np.uint64(1)).astype(np.uint16)
        i1 = (h1 & np.uint64(self.m - 1)).astype(np.int64)
        # bucket2 derived from (bucket1, fp) only — so membership/deletion can
        # recover both candidate buckets from a stored fingerprint alone
        i2 = (i1 ^ (fp.astype(np.uint64) * np.uint64(0x5BD1E995)
                    & np.uint64(self.m - 1)).astype(np.int64))
        return fp, i1, i2

    def _alt(self, i: int, fp: int) -> int:
        return i ^ int(np.uint64(fp) * np.uint64(0x5BD1E995)
                       & np.uint64(self.m - 1))

    def _spill_key(self, i: int, fp: int) -> tuple[int, int]:
        """Canonical (bucket, fp) key: the lower of the two candidate
        buckets, so lookups from either bucket find the spilled entry."""
        return (min(i, self._alt(i, fp)), fp)

    def _insert_one(self, i1: int, i2: int, fp: int,
                    rng: np.random.Generator) -> tuple[int, int] | None:
        """None on success; on an overfull table, the HOMELESS (bucket, fp)
        — note kicks displace OTHER fingerprints, so the unplaced one is
        generally not the one being inserted."""
        for i in (i1, i2):
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return None
        i = i1
        for _ in range(self.MAX_KICKS):
            slot = int(rng.integers(self.SLOTS))
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = self._alt(i, fp)
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return None
        return (i, fp)    # table overfull — add() spills this fingerprint

    def add(self, h1: np.ndarray, h2: np.ndarray) -> int:
        """Insert all items; unplaceable fingerprints go to the spill set so
        membership stays complete. Returns the number spilled."""
        fp, i1, i2 = self._fp_and_buckets(h1, h2)
        rng = np.random.default_rng(0xC0FFEE ^ self.count)
        spilled = 0
        for a, b, f in zip(i1, i2, fp):
            homeless = self._insert_one(int(a), int(b), int(f), rng)
            if homeless is not None:
                key = self._spill_key(*homeless)
                # count only a genuinely-new spill entry: past saturation the
                # same homeless fingerprint can recur, and set.add is a no-op
                # while delete decrements once per key — unconditional
                # increments would drift count above true occupancy
                if key not in self.spill:
                    self.spill.add(key)
                    self.count += 1
                    spilled += 1
        return spilled

    @property
    def n_spilled(self) -> int:
        return len(self.spill)

    def contains(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        fp, i1, i2 = self._fp_and_buckets(h1, h2)
        f = fp[:, None]
        out = ((self.table[i1] == f).any(axis=1)
               | (self.table[i2] == f).any(axis=1))
        if self.spill:
            for n in np.flatnonzero(~out):
                if (min(int(i1[n]), int(i2[n])), int(fp[n])) in self.spill:
                    out[n] = True
        return out

    def delete(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Remove one copy of each item's fingerprint; True where found."""
        fp, i1, i2 = self._fp_and_buckets(h1, h2)
        out = np.zeros(len(fp), dtype=bool)
        for n, (a, b, f) in enumerate(zip(i1, i2, fp)):
            key = (min(int(a), int(b)), int(f))
            if key in self.spill:
                self.spill.discard(key)
                self.count -= 1
                out[n] = True
                continue
            for i in (int(a), int(b)):
                row = self.table[i]
                hit = np.flatnonzero(row == f)
                if len(hit):
                    row[hit[0]] = 0
                    self.count -= 1
                    out[n] = True
                    break
        return out


@ray.remote(num_cpus=0)
class SeenShard:
    """One shard of the URL-seen set.

    Fast negative path: bloom until the first ``invalidate`` (deletion), then
    the deletable cuckoo filter — rebuilt from the exact set at switch time —
    serves it instead (a bloom cannot unlearn a deleted URL)."""

    def __init__(self, capacity: int = 1_000_000, approximate: bool = False):
        self.capacity = capacity
        self.bloom = Bloom(capacity)
        self.cuckoo: Cuckoo | None = None    # engaged on first invalidate
        # approximate mode (the 10^10-URL memory config): membership lives in
        # the filters ALONE — ~1.2 bits/key (bloom) or ~2.25 B/key (cuckoo)
        # instead of ~60+ B/key for a Python set. Tradeoff: a filter false
        # positive skips a fetch of a genuinely-new URL (rate set by
        # `capacity`); crawl-order conformance modes keep the exact tier.
        self.approximate = approximate
        if approximate:
            self.cuckoo = Cuckoo(capacity)   # deletable from day one
        self.exact: set[str] = set()
        self.n_seen = 0
        self.bad: set[str] = set()   # URLs whose stashed body is empty (error pages)

    def invalidate(self, urls: list[str]) -> int:
        """Re-crawl invalidation: forget these URLs so the next crawl refetches
        them. Switches the fast path from bloom to the deletable cuckoo."""
        if self.cuckoo is None:
            self.cuckoo = Cuckoo(max(self.capacity, len(self.exact) * 2))
            if self.exact:
                arr = np.asarray(sorted(self.exact), dtype=object)
                self.cuckoo.add(*_hash2(arr))
        arr = np.asarray(urls, dtype=object)
        if len(arr) == 0:
            return 0
        h1, h2 = _hash2(arr)
        deleted = self.cuckoo.delete(h1, h2)
        if self.approximate:
            n = int(deleted.sum())
            self.n_seen -= n
            for u in urls:
                self.bad.discard(u)
            return n
        n = 0
        for u in urls:
            if u in self.exact:
                self.exact.discard(u)
                n += 1
            self.bad.discard(u)
        self.n_seen = len(self.exact)
        return n

    def check_and_add(self, urls: list[str]) -> np.ndarray:
        """Per-url: True if NEW (first sighting, now marked seen)."""
        if not urls:
            return np.zeros(0, dtype=bool)
        arr = np.asarray(urls, dtype=object)
        h1, h2 = _hash2(arr)
        if self.approximate:
            # filters are the whole truth: new = filter-negative AND first
            # occurrence in this call (bloom probes all bits before setting
            # any, so intra-call duplicates would otherwise all read "new")
            import pandas as pd

            first = ~pd.Series(arr).duplicated().to_numpy()
            new = first & ~self.cuckoo.contains(h1, h2)
            if new.any():
                self.cuckoo.add(h1[new], h2[new])
            self.n_seen += int(new.sum())
            return new
        # keep the bloom warm for contains(); the vectorized pre-test is only a
        # hint and CANNOT shortcut here — duplicates within one call would all
        # test bloom-negative (bits are probed before any adds)
        self.bloom.add_and_test(h1, h2)
        new = np.empty(len(arr), dtype=bool)
        exact = self.exact
        for i, u in enumerate(arr):
            is_new = u not in exact
            new[i] = is_new
            if is_new:
                exact.add(u)
        self.n_seen = len(exact)
        if self.cuckoo is not None and new.any():
            self.cuckoo.add(h1[new], h2[new])   # only first sightings — keeps
            # the filter a set, so one delete fully forgets a URL
        return new

    def contains(self, urls: list[str]) -> np.ndarray:
        if not urls:
            return np.zeros(0, dtype=bool)
        arr = np.asarray(urls, dtype=object)
        h1, h2 = _hash2(arr)
        if self.cuckoo is not None:   # post-invalidate: deletable filter rules
            maybe = self.cuckoo.contains(h1, h2)
        else:
            maybe = self.bloom.test(h1, h2)
        if self.approximate:
            return maybe              # the filter IS the membership surface
        out = np.zeros(len(arr), dtype=bool)
        idx = np.flatnonzero(maybe)   # filter-negative -> definitely new, skip set probe
        for i in idx:
            out[i] = arr[i] in self.exact
        return out

    def add(self, urls: list[str]) -> int:
        arr = np.asarray(urls, dtype=object)
        h1, h2 = _hash2(arr)
        if self.approximate:
            fresh = ~self.cuckoo.contains(h1, h2)
            if fresh.any():
                self.cuckoo.add(h1[fresh], h2[fresh])
            self.n_seen += int(fresh.sum())
            return self.n_seen
        self.bloom.add_and_test(h1, h2)
        if self.cuckoo is not None:
            fresh = np.array([u not in self.exact for u in arr], dtype=bool)
            if fresh.any():
                self.cuckoo.add(h1[fresh], h2[fresh])
        self.exact.update(arr.tolist())
        self.n_seen = len(self.exact)
        return self.n_seen

    def record_bad(self, urls: list[str]) -> None:
        self.bad.update(urls)

    def bad_mask(self, urls: list[str]) -> np.ndarray:
        if not self.bad:
            return np.zeros(len(urls), dtype=bool)
        return np.array([u in self.bad for u in urls], dtype=bool)

    def size(self) -> int:
        return self.n_seen if self.approximate else len(self.exact)

    def dump(self) -> list[str]:
        return sorted(self.exact)

    def dump_bad(self) -> list[str]:
        return sorted(self.bad)

    def dump_parquet(self, path: str) -> int:
        """Write this shard's (url, bad) rows to its OWN parquet file —
        checkpointing scales with the shard, never the driver (which would
        otherwise hold the full URL set). Atomic via tmp+rename."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        urls = sorted(self.exact)
        bad = sorted(self.bad)
        t = pa.table({
            "url": pa.array(urls + bad, pa.string()),
            "bad": pa.array([False] * len(urls) + [True] * len(bad))})
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        import os

        os.replace(tmp, path)
        return t.num_rows

    def restore(self, urls: list[str], bad: list[str]) -> None:
        self.add(urls)
        self.bad.update(bad)


@ray.remote(num_cpus=0)
class IdShard:
    """One shard of a distributed int64-id membership set (the "does this
    doc exist" gate for graph expansion, e.g. :func:`datapipe.crawl_bfs`).

    Unlike :class:`SeenShard` (string URLs, bloom/cuckoo tiers) this is
    int-native: ids are ingested as numpy arrays by distributed map_batches
    tasks — the driver never reads the id column — then finalized into ONE
    sorted array per shard (searchsorted membership, ~8 B/id/shard). A
    parallel ``claimed`` bitmap aligned to the sorted array gives the
    check-and-claim gate (exists AND first claimer) with zero extra key
    storage."""

    def __init__(self):
        self.parts: list[np.ndarray] = []
        self.ids = np.empty(0, dtype=np.int64)
        self.claimed = np.zeros(0, dtype=bool)
        self.final = False

    def add(self, ids: np.ndarray) -> int:
        assert not self.final, "IdShard.add after finalize"
        self.parts.append(np.asarray(ids, dtype=np.int64))
        return len(ids)

    def finalize(self) -> int:
        if not self.final:
            self.ids = (np.unique(np.concatenate(self.parts))
                        if self.parts else np.empty(0, dtype=np.int64))
            self.parts = []
            self.claimed = np.zeros(len(self.ids), dtype=bool)
            self.final = True
        return len(self.ids)

    def contains(self, ids: np.ndarray) -> np.ndarray:
        q = np.asarray(ids, dtype=np.int64)
        if len(self.ids) == 0 or len(q) == 0:
            return np.zeros(len(q), dtype=bool)
        pos = np.searchsorted(self.ids, q)
        inb = pos < len(self.ids)
        out = np.zeros(len(q), dtype=bool)
        out[inb] = self.ids[pos[inb]] == q[inb]
        return out

    def claim(self, ids: np.ndarray) -> np.ndarray:
        """Per-id: True iff the id EXISTS in the set and this call is its
        first claim (atomic within the actor). Intra-call duplicates count
        once — same contract as SeenShard.check_and_add."""
        q = np.asarray(ids, dtype=np.int64)
        hit = self.contains(q)
        out = np.zeros(len(q), dtype=bool)
        if hit.any():
            pos = np.searchsorted(self.ids, q[hit])
            new = ~self.claimed[pos]
            # first occurrence within this call wins; later duplicates see
            # the bitmap already set because np assignment below is ordered
            first = np.zeros(len(pos), dtype=bool)
            _, first_idx = np.unique(pos, return_index=True)
            first[first_idx] = True
            ok = new & first
            self.claimed[pos[ok]] = True
            out[np.flatnonzero(hit)[ok]] = True
        return out

    def size(self) -> int:
        return len(self.ids)


class IdMembership:
    """Picklable handle over :class:`IdShard` actors — batched routed RPCs,
    same shape as :class:`SeenSet` but for int64 ids. Populate it
    DISTRIBUTEDLY (call :meth:`add` from inside map_batches tasks over the
    id column), then :meth:`finalize` once before membership queries."""

    #: multiplicative mix so arithmetic id patterns (e.g. BFS children
    #: 3d+1..3d+3) spread across shards instead of landing modulo-striped
    _MIX = np.uint64(0x9E3779B97F4A7C15)

    def __init__(self, num_shards: int = 4):
        self.num_shards = num_shards
        self.shards = [IdShard.remote() for _ in range(num_shards)]

    def _route(self, ids: np.ndarray) -> np.ndarray:
        h = ids.astype(np.uint64) * self._MIX
        return ((h >> np.uint64(33)) % np.uint64(self.num_shards)).astype(
            np.int64)

    def _scatter(self, method: str, ids) -> np.ndarray:
        arr = np.asarray(ids, dtype=np.int64)
        if len(arr) == 0:
            return np.zeros(0, dtype=bool)
        shard_ids = self._route(arr)
        out = np.zeros(len(arr), dtype=bool)
        futs, idxs = [], []
        for s in np.unique(shard_ids):
            idx = np.flatnonzero(shard_ids == s)
            futs.append(getattr(self.shards[s], method).remote(arr[idx]))
            idxs.append(idx)
        for idx, res in zip(idxs, ray.get(futs)):
            out[idx] = res
        return out

    def add(self, ids) -> None:
        arr = np.asarray(ids, dtype=np.int64)
        if len(arr) == 0:
            return
        shard_ids = self._route(arr)
        ray.get([self.shards[s].add.remote(arr[shard_ids == s])
                 for s in np.unique(shard_ids)])

    def finalize(self) -> int:
        return sum(ray.get([s.finalize.remote() for s in self.shards]))

    def contains(self, ids) -> np.ndarray:
        return self._scatter("contains", ids)

    def claim(self, ids) -> np.ndarray:
        return self._scatter("claim", ids)

    def size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def kill(self) -> None:
        for sh in self.shards:
            ray.kill(sh, no_restart=True)
        self.shards = []


class SeenSet:
    """Driver/worker-side handle: routes url batches to shard actors.

    The handle is picklable (actor handles serialize), so fetch-stage actors
    can hold one and issue batched membership RPCs from inside map_batches.
    """

    def __init__(self, num_shards: int = 8, capacity_per_shard: int = 1_000_000,
                 approximate: bool = False):
        self.num_shards = num_shards
        self.approximate = approximate
        self.shards = [SeenShard.remote(capacity_per_shard, approximate)
                       for _ in range(num_shards)]

    def _route(self, urls: np.ndarray) -> np.ndarray:
        h = pd.util.hash_array(np.asarray(urls, dtype=object), categorize=False)
        return (h % np.uint64(self.num_shards)).astype(np.int64)

    def check_and_add(self, urls) -> np.ndarray:
        """Batched fetch-once gate; preserves input order. True = new."""
        arr = np.asarray(urls, dtype=object)
        if len(arr) == 0:
            return np.zeros(0, dtype=bool)
        shard_ids = self._route(arr)
        out = np.zeros(len(arr), dtype=bool)
        futs, idxs = [], []
        for s in np.unique(shard_ids):
            idx = np.flatnonzero(shard_ids == s)
            futs.append(self.shards[s].check_and_add.remote(arr[idx].tolist()))
            idxs.append(idx)
        for idx, res in zip(idxs, ray.get(futs)):
            out[idx] = res
        return out

    def contains(self, urls) -> np.ndarray:
        arr = np.asarray(urls, dtype=object)
        if len(arr) == 0:
            return np.zeros(0, dtype=bool)
        shard_ids = self._route(arr)
        out = np.zeros(len(arr), dtype=bool)
        futs, idxs = [], []
        for s in np.unique(shard_ids):
            idx = np.flatnonzero(shard_ids == s)
            futs.append(self.shards[s].contains.remote(arr[idx].tolist()))
            idxs.append(idx)
        for idx, res in zip(idxs, ray.get(futs)):
            out[idx] = res
        return out

    def add(self, urls) -> None:
        arr = np.asarray(urls, dtype=object)
        if len(arr) == 0:
            return
        shard_ids = self._route(arr)
        ray.get([self.shards[s].add.remote(arr[shard_ids == s].tolist())
                 for s in np.unique(shard_ids)])

    def record_bad(self, urls) -> None:
        arr = np.asarray(urls, dtype=object)
        if len(arr) == 0:
            return
        shard_ids = self._route(arr)
        ray.get([self.shards[s].record_bad.remote(arr[shard_ids == s].tolist())
                 for s in np.unique(shard_ids)])

    def invalidate(self, urls) -> int:
        """Re-crawl invalidation: forget these URLs on their shards (cuckoo
        deletion path) so the next crawl fetches them fresh. Returns the
        number of URLs that were actually seen."""
        arr = np.asarray(urls, dtype=object)
        if len(arr) == 0:
            return 0
        shard_ids = self._route(arr)
        return sum(ray.get([
            self.shards[s].invalidate.remote(arr[shard_ids == s].tolist())
            for s in np.unique(shard_ids)]))

    def bad_mask(self, urls) -> np.ndarray:
        arr = np.asarray(urls, dtype=object)
        if len(arr) == 0:
            return np.zeros(0, dtype=bool)
        shard_ids = self._route(arr)
        out = np.zeros(len(arr), dtype=bool)
        futs, idxs = [], []
        for s in np.unique(shard_ids):
            idx = np.flatnonzero(shard_ids == s)
            futs.append(self.shards[s].bad_mask.remote(arr[idx].tolist()))
            idxs.append(idx)
        for idx, res in zip(idxs, ray.get(futs)):
            out[idx] = res
        return out

    def dump_bad(self) -> list[str]:
        out: list[str] = []
        for part in ray.get([s.dump_bad.remote() for s in self.shards]):
            out.extend(part)
        return out

    def restore(self, urls, bad) -> None:
        self.add(urls)
        arr = np.asarray(bad, dtype=object)
        if len(arr):
            shard_ids = self._route(arr)
            ray.get([self.shards[s].record_bad.remote(arr[shard_ids == s].tolist())
                     for s in np.unique(shard_ids)])

    def size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def dump(self) -> list[str]:
        out: list[str] = []
        for part in ray.get([s.dump.remote() for s in self.shards]):
            out.extend(part)
        return out

    def checkpoint(self, dir_path: str) -> int:
        """Each shard writes its own parquet file under ``dir_path`` in
        parallel; the driver never holds the URL set. Returns total rows.

        Approximate mode refuses to checkpoint: filter-only shards hold no
        enumerable URL set, so a dump would silently persist an EMPTY seen
        set and a later restore would refetch the whole crawl (or worse,
        re-emit records a resumed run already wrote). Exact mode clears any
        previous shard files first — a shrunk ``num_shards`` must not leave
        stale higher-numbered shards to be re-ingested by the next restore."""
        if self.approximate:
            raise ValueError(
                "cannot checkpoint an approximate-mode SeenSet: filter-only "
                "membership is not enumerable; use seen_exact=True for "
                "resumable crawls")
        import os

        os.makedirs(dir_path, exist_ok=True)
        for f in os.listdir(dir_path):
            if f.endswith(".parquet"):
                os.remove(os.path.join(dir_path, f))
        return sum(ray.get([
            s.dump_parquet.remote(os.path.join(dir_path, f"shard-{i}.parquet"))
            for i, s in enumerate(self.shards)]))

    def kill(self) -> None:
        """Release the shard actors."""
        for sh in self.shards:
            ray.kill(sh, no_restart=True)
        self.shards = []
