"""API-CONTRACT SHIM — NOT the real ``lance`` package.

The sandbox cannot install lancedb/pylance, so the ``LanceWebStore`` branch
(upton_ray/fetch.py) would otherwise never execute.  This shim implements
the MINIMAL surface our code calls — ``lance.dataset(path)`` returning an
object with ``.to_table(columns=..., filter=...)`` accepting a pyarrow
compute expression — backed by a plain pyarrow parquet dataset.

What a test under this shim proves: our call pattern (constructor args,
filter-expression type, column pruning, the inherited bucket-pool / LRU
machinery, crawl-gate equality end to end).  What it does NOT prove: the
Lance storage format itself.  tests/test_sinks_lance.py still importorskips
the real-package round trip so the format claim stays honestly gated.
"""

import pyarrow.dataset as _pads

__version__ = "0.0.0-shim"
IS_CONTRACT_SHIM = True


class _ShimLanceDataset:
    def __init__(self, path: str):
        # hive partitioning mirrors write_web's bucket=N directory layout,
        # which is also the layout the real lance corpus would carry as a
        # column; the store only ever filters on that column
        self._ds = _pads.dataset(path, format="parquet", partitioning="hive")

    def to_table(self, columns=None, filter=None):
        return self._ds.to_table(columns=columns, filter=filter)


def dataset(path: str) -> _ShimLanceDataset:
    return _ShimLanceDataset(path)
