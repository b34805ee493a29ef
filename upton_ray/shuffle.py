"""Manual hash-partitioned reduce — the engine's lightweight alternative to
``Dataset.groupby`` for POST-COMBINER aggregates.

``Dataset.groupby`` (hash or sort strategy alike) carries a large fixed cost
per operation: measured on this sandbox (238k-row 8-block table, 32 cpus),
``groupby().sum()`` costs 4.3-5.5 s where the same all-to-all exchange done
as plain Ray tasks costs 0.07 s.  Any aggregate whose input is already
partial-aggregated (one row per key per block — the combiner pattern every
wide operator here uses) is far below that fixed cost, so those final
reduces run on :func:`hash_reduce` instead.  Corpus-keyed shuffles whose
partitions may not fit a worker (e.g. exact dedup over raw fingerprints)
stay on ``Dataset.groupby``'s external machinery on purpose.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

_HASH_COMBINE = np.uint64(0x100000001B3)        # FNV prime; any odd mixer


def key_hash(t: pa.Table, key_cols) -> np.ndarray:
    """Deterministic uint64 partitioning hash over one or more key columns
    (SipHash per column via pd.util.hash_array, mixed).  Only used to ROUTE
    rows — different keys landing in one partition are re-separated by the
    reduce's own group_by, so mixer collisions cannot affect results."""
    h = None
    for c in key_cols:
        hc = pd.util.hash_array(
            t[c].to_numpy(zero_copy_only=False), categorize=False)
        h = hc if h is None else (h * _HASH_COMBINE) ^ hc
    return h


@ray.remote
def _hash_split(t: pa.Table, key_cols, P: int):
    """Slice one block into P hash partitions (one stable argsort, P
    zero-copy slices)."""
    if t.num_rows == 0:
        return tuple(t for _ in range(P))
    part = (key_hash(t, key_cols) % np.uint64(P)).astype(np.int64)
    idx = np.argsort(part, kind="stable")
    srt = t.take(pa.array(idx, pa.int64()))
    ps = part[idx]
    bounds = np.searchsorted(ps, np.arange(P + 1))
    return tuple(srt.slice(bounds[i], bounds[i + 1] - bounds[i])
                 for i in range(P))


@ray.remote
def _hash_reduce_part(fn, *tabs):
    # empty upstream blocks can carry a stale (pre-map) schema — drop them;
    # if the whole partition is empty, reduce any non-zero-column table so
    # fn still sees the real column set
    live = [t for t in tabs if t.num_rows > 0]
    if not live:
        live = [next((t for t in tabs if t.num_columns > 0), tabs[0])]
    return fn(pa.concat_tables(live))


def hash_reduce(ds, key_cols, reduce_fn, num_partitions: int = 8):
    """Manual hash-partitioned reduce: every input block is split by
    key-hash into P slices (one task per block), then P reduce tasks apply
    ``reduce_fn`` to their partition's concatenated slices.  Returns a
    Dataset over the P outputs.

    This moves EXACTLY the same bytes as ``Dataset.groupby`` (an all-to-all
    on the key hash) but skips its sort machinery and per-op actor spin-up
    (see module docstring for measurements).  Contract (same as groupby's
    reduce): one partition's rows fit one worker; callers pass
    partial-aggregated inputs (one row per key per block) so that holds by
    construction.  At cluster scale raise ``num_partitions`` to ~total
    cores; the B x P object fan-out is the classic map-shuffle quadratic —
    beyond ~10^4 blocks, coalesce partials (or fall back to
    ``Dataset.groupby``'s push-based shuffle) before splitting."""
    refs = ds.materialize().to_arrow_refs()
    splits = [_hash_split.options(num_returns=num_partitions)
              .remote(r, list(key_cols), num_partitions) for r in refs]
    if num_partitions == 1:     # num_returns=1 yields a bare ref
        splits = [[s] for s in splits]
    outs = [_hash_reduce_part.remote(reduce_fn, *[s[i] for s in splits])
            for i in range(num_partitions)]
    return ray.data.from_arrow_refs(outs)
