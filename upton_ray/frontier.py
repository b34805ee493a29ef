"""Frontier scheduling: per-host politeness with a min-heap of deadlines.

The reference's politeness is a single global ``sleep 30`` after every network
fetch (/root/reference/lib/upton.rb:220-223) — the degenerate one-host case.
The engine generalizes it (north_star): each fetch worker holds a min-heap of
``(next_allowed_time, host)`` and schedules the batch's URLs so that no host
is hit more often than its crawl-delay, while different hosts interleave
freely.  Cluster-wide per-host correctness comes from routing a host's URLs to
one worker (host-hash sharding; ``CrawlConfig.needs_host_affinity``); hot
hosts can be salted into sub-queues that share a token bucket.
"""

from __future__ import annotations

import heapq
import time
from collections import defaultdict

import numpy as np

from upton_ray.urlops import hosts_of


class HostScheduler:
    """Per-host pacing state held inside one fetch worker (actor).

    ``order_batch`` returns the indices of a URL batch in fetch order
    (earliest-deadline-first across hosts); ``wait_turn`` blocks (capped) until
    the host's next-allowed time and advances it.
    """

    def __init__(self, crawl_delay: float, *, real_sleep: bool = False,
                 max_sleep: float = 0.05, per_host_delay: dict | None = None):
        self.delay = crawl_delay
        self.real_sleep = real_sleep
        self.max_sleep = max_sleep
        self.per_host_delay = per_host_delay or {}
        self.next_allowed: dict[str, float] = defaultdict(float)
        self.virtual_clock = 0.0      # advances even when not actually sleeping
        self.total_slept = 0.0

    def host_delay(self, host: str) -> float:
        return self.per_host_delay.get(host, self.delay)

    def order_batch(self, urls: np.ndarray) -> np.ndarray:
        """Earliest-deadline-first order over the batch's hosts (min-heap)."""
        hosts = hosts_of(urls)
        heap: list[tuple[float, int, str]] = []
        pending: dict[str, list[int]] = defaultdict(list)
        for i, h in enumerate(hosts):
            pending[h].append(i)
        for h, idxs in pending.items():
            heapq.heappush(heap, (self.next_allowed[h], idxs[0], h))
        out = np.empty(len(urls), dtype=np.int64)
        pos = {h: 0 for h in pending}
        t = 0
        while heap:
            deadline, _, h = heapq.heappop(heap)
            idxs = pending[h]
            out[t] = idxs[pos[h]]
            t += 1
            pos[h] += 1
            if pos[h] < len(idxs):
                heapq.heappush(heap, (deadline + self.host_delay(h), idxs[pos[h]], h))
        return out

    def wait_turn(self, host: str) -> float:
        """Advance the host's deadline; really sleep only when configured.
        Real mode waits out the FULL deadline (in ``max_sleep`` chunks, so a
        shutdown isn't stuck in one long sleep) — an under-slept wait would
        break the politeness guarantee wall-clock. Returns the wait imposed."""
        d = self.host_delay(host)
        now = time.monotonic() if self.real_sleep else self.virtual_clock
        wait = max(0.0, self.next_allowed[host] - now)
        if self.real_sleep:
            while now < self.next_allowed[host]:
                time.sleep(min(self.next_allowed[host] - now, self.max_sleep))
                now = time.monotonic()
        self.virtual_clock = max(self.virtual_clock, now) + 0.0
        self.next_allowed[host] = max(now, self.next_allowed[host]) + d
        self.total_slept += wait
        return wait


def make_host_pacer():
    """Create the shared token-bucket actor for hot hosts (deferred ray import
    so this module stays importable without a session)."""
    import ray

    @ray.remote(num_cpus=0)
    class HostPacer:
        """Cluster-wide politeness bucket for SPLIT (salted) hot hosts.

        A hot host's sub-queues land on different workers, so worker-local
        deadline heaps would each pace independently — k sub-queues would
        fetch k× the polite rate. Every worker instead LEASES a window for
        its batch's fetches of that host here (one RPC per host per batch,
        amortized): the virtual clock advances ``n * delay`` per lease, so
        the host's global fetch rate stays 1/delay no matter how many
        sub-queues exist (north_rule: salted sub-queues share the bucket).
        """

        def __init__(self):
            self.next_allowed: dict[str, float] = {}
            self.first_start: dict[str, float] = {}
            self.granted: dict[str, int] = {}
            self.leases: dict[str, int] = {}

        def lease(self, host: str, n: int, delay: float,
                  now: float = 0.0) -> float:
            """Grant a window of n fetches and return the WAIT (seconds, a
            clock-domain-free duration) until it opens.  All window
            arithmetic runs on the PACER'S OWN clock — worker clocks on a
            multi-node cluster can skew, and windows computed in mixed
            domains could overlap; ``now`` is accepted for compatibility but
            ignored.  Windows never overlap, so the host's global rate stays
            <= 1/delay across all workers."""
            import time

            t = time.time()           # one clock domain: this actor's
            start = max(self.next_allowed.get(host, t), t)
            self.first_start.setdefault(host, start)
            self.next_allowed[host] = start + n * delay
            self.granted[host] = self.granted.get(host, 0) + n
            self.leases[host] = self.leases.get(host, 0) + 1
            return start - t

        def state(self):
            return (dict(self.next_allowed), dict(self.granted),
                    dict(self.leases))

        def spans(self):
            """Per-host (first_start, next_allowed): the busy window — its
            length always equals granted x delay."""
            return {h: (self.first_start[h], self.next_allowed[h])
                    for h in self.first_start}

    return HostPacer.remote()


def salt_hosts(hosts: np.ndarray, hot_hosts, num_salts: int) -> np.ndarray:
    """Skew handling: the routing key per row — the host itself, or
    ``host#s<i>`` (round-robin over ``num_salts`` sub-queues) for hosts in
    the globally-detected hot set (north_rule hot-host splitting). Salted
    sub-queues of one host still share that host's token bucket: pacing goes
    through the HostPacer actor keyed by the TRUE host, never the salted key."""
    if not hot_hosts:
        return hosts
    out = hosts.copy()
    salt_counter: dict[str, int] = defaultdict(int)
    for i, h in enumerate(hosts):
        if h in hot_hosts:
            c = salt_counter[h]
            out[i] = f"{h}#s{c % num_salts}"
            salt_counter[h] = c + 1
    return out


def parse_robots_txt(text: str, agent: str = "*") -> tuple[list, float | None]:
    """Minimal robots.txt parser (the reference has no robots handling at
    all — engine extension T3): returns (disallow_prefixes, crawl_delay) for
    the best-matching User-agent group, falling back to ``*``.

    Understands the de-facto format: ``User-agent`` lines open a group
    (consecutive agent lines share one group), ``Disallow`` adds a path
    prefix (empty value = allow all), ``Crawl-delay`` sets seconds between
    fetches, ``#`` comments anywhere."""
    groups: dict[str, tuple[list, float | None]] = {}
    cur: list[str] = []
    in_rules = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if in_rules:
                cur = []
                in_rules = False
            a = val.lower() or "*"
            cur.append(a)
            groups.setdefault(a, ([], None))
        elif key in ("disallow", "crawl-delay") and cur:
            in_rules = True
            for a in cur:
                dis, delay = groups[a]
                if key == "disallow":
                    if val:
                        dis.append(val)
                else:
                    try:
                        delay = float(val)
                    except ValueError:
                        pass
                groups[a] = (dis, delay)
    return groups.get(agent.lower()) or groups.get("*") or ([], None)


class RobotsCache:
    """Per-worker robots.txt decisions (engine extension; absent in reference —
    SURVEY.md §2.4 T3). Rules come from a broadcast {host: [disallow_prefix]}
    table; a real deployment would fetch/parse robots.txt per host and cache
    it here with the same interface."""

    def __init__(self, rules: dict[str, list[str]]):
        self.rules = rules

    def allowed_mask(self, urls: np.ndarray) -> np.ndarray:
        out = np.ones(len(urls), dtype=bool)
        if not self.rules:
            return out
        hosts = hosts_of(urls)
        for i, (u, h) in enumerate(zip(urls, hosts)):
            prefixes = self.rules.get(h)
            if prefixes:
                # path of the url
                j = u.find("/", u.find("://") + 3)
                path = u[j:] if j >= 0 else "/"
                out[i] = not any(path.startswith(p) for p in prefixes)
        return out
