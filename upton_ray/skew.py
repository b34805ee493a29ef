"""Adversarially skewed synthetic corpus — the degenerate-stratum inputs the
friendly testdata never produces.

Three deliberate pathologies (all deterministic, seeded, schema-identical to
``/root/testdata/sf*/{documents,events}.parquet``):

* **duplicate cluster**: ``dup_frac`` of all documents are byte-identical —
  the minhash/LSH worst case (every band bucket of the cluster holds the
  whole cluster, so ``max_bucket`` cap accounting MUST trigger; exact dedup
  must still collapse the cluster to one keeper);
* **near-dup family**: a base document plus single-word variants whose
  3-shingle Jaccard vs the base sits just above the 0.8 dedup threshold —
  the recall probe that must SURVIVE the cap (variants pair with the base
  through their unaffected bands);
* **hot user**: one user owns ``hot_frac`` of all events, with a fraction of
  timestamps quantized to whole seconds so equal-(user, ts) tie runs occur —
  the sessionize/as-of skew + tie torture.

Used by tests/test_skew.py (oracle-checked vs DuckDB over the same files)
and bench.py's ``skew_*`` entries (converts the "survives skew" design
arguments into per-round measurements).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ("the fast key order sort table scan merge part window small hash "
         "join batch stream spark dup group query row data slow filter "
         "customer line value agg column big vector a cache disk net shard "
         "spill probe build fact dim plan cost stats skew salt range").split()

DUP_TEXT = ("dup cluster body " + " ".join(VOCAB[i % 11] for i in range(24)))
BASE_TEXT = " ".join(VOCAB[(i * 7) % len(VOCAB)] for i in range(40))


def _near_dup_family(n_variants: int) -> list[str]:
    """Base + variants differing in ONE interior word each: 3-shingle
    Jaccard(base, variant) = 35/41 ≈ 0.854 ≥ 0.8, while variant-variant
    pairs (two changed positions) fall below the threshold."""
    words = BASE_TEXT.split()
    fam = [BASE_TEXT]
    for v in range(n_variants):
        w = list(words)
        w[5 + 3 * v] = f"variant{v}"     # spaced out: shingle edits disjoint
        fam.append(" ".join(w))
    return fam


def make_skew_corpus(out_dir: str, *, n_docs: int = 2000,
                     n_events: int = 20_000, dup_frac: float = 0.4,
                     n_variants: int = 6, hot_frac: float = 0.3,
                     n_users: int = 200, tie_frac: float = 0.25,
                     seed: int = 7) -> dict:
    """Write documents.parquet + events.parquet under ``out_dir``.
    Returns the stratum layout (cluster doc ids, family doc ids, hot user)
    so tests can assert against construction."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    # ------------------------------------------------------------ documents
    n_dup = int(n_docs * dup_frac)
    fam = _near_dup_family(n_variants)
    n_rest = n_docs - n_dup - len(fam)
    assert n_rest > 0, "n_docs too small for the configured strata"
    texts = [DUP_TEXT] * n_dup + fam
    # unique tail: random-length word soup; lengths 20-60 keep shingle sets
    # far from both the cluster and the family
    lens = rng.integers(20, 61, size=n_rest)
    widx = rng.integers(0, len(VOCAB), size=int(lens.sum()))
    off = np.r_[0, np.cumsum(lens)]
    texts += [" ".join(VOCAB[j] for j in widx[off[i]:off[i + 1]])
              + f" uniq{i}"                      # kills accidental dups
              for i in range(n_rest)]
    langs = np.array(["en", "es", "de", "fr", "zh"], dtype=object)
    docs = pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs[rng.integers(0, len(langs), size=n_docs)]),
        "source": pa.array([f"src{i % 8}" for i in range(n_docs)],
                           pa.string()),
        "n_chars": pa.array(np.array([len(t) for t in texts],
                                     dtype=np.int64)),
    })
    pq.write_table(docs, os.path.join(out_dir, "documents.parquet"))

    # --------------------------------------------------------------- events
    hot_user = 1
    is_hot = rng.random(n_events) < hot_frac
    users = rng.integers(2, n_users + 2, size=n_events).astype(np.int64)
    users[is_hot] = hot_user
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts_us = rng.integers(0, 7 * 24 * 3600 * 1_000_000, size=n_events)
    quant = rng.random(n_events) < tie_frac
    ts_us[quant] -= ts_us[quant] % 1_000_000     # whole-second ties
    etypes = np.array(["click", "purchase", "view", "signup", "error"],
                      dtype=object)
    ev = pa.table({
        "event_id": pa.array(np.arange(n_events, dtype=np.int64)),
        "ts": pa.array(base + ts_us.astype("timedelta64[us]"),
                       pa.timestamp("us")),
        "user_id": pa.array(users),
        "event_type": pa.array(
            etypes[rng.choice(len(etypes), size=n_events,
                              p=[0.4, 0.2, 0.2, 0.1, 0.1])]),
        "value": pa.array(np.round(rng.uniform(0, 200, size=n_events), 2)),
        "props": pa.array([f'{{"k": {i % 100}}}' for i in range(n_events)],
                          pa.string()),
    })
    pq.write_table(ev, os.path.join(out_dir, "events.parquet"))
    return {
        "cluster_ids": (0, n_dup),                    # [lo, hi) doc_id range
        "family_ids": (n_dup, n_dup + len(fam)),      # base = n_dup
        "hot_user": hot_user,
        "n_docs": n_docs, "n_events": n_events,
    }


def skew_dir(*, n_docs: int = 2000, n_events: int = 20_000,
             seed: int = 7, **kw) -> tuple[str, dict]:
    """Content-keyed cached corpus under /tmp (atomic rename, like the
    docweb store): bench and tests share builds."""
    import hashlib

    key = hashlib.md5(
        f"{n_docs}|{n_events}|{seed}|{sorted(kw.items())}".encode()
    ).hexdigest()[:12]
    path = f"/tmp/upton_ray_skew/{key}"
    layout = {
        "cluster_ids": (0, int(n_docs * kw.get("dup_frac", 0.4))),
        "family_ids": None, "hot_user": 1,
        "n_docs": n_docs, "n_events": n_events,
    }
    if not os.path.isdir(path):
        os.makedirs("/tmp/upton_ray_skew", exist_ok=True)
        tmp = f"{path}.build-{os.getpid()}"
        layout = make_skew_corpus(tmp, n_docs=n_docs, n_events=n_events,
                                  seed=seed, **kw)
        try:
            os.rename(tmp, path)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
        return path, layout
    # rebuild layout for a cache hit (pure arithmetic, no I/O)
    n_dup = int(n_docs * kw.get("dup_frac", 0.4))
    n_var = kw.get("n_variants", 6)
    layout.update(cluster_ids=(0, n_dup),
                  family_ids=(n_dup, n_dup + n_var + 1))
    return path, layout
