"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf and compare against oracle_sql() via DuckDB
(row count + column names + order-insensitive value comparison).

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(res, ray.data.Dataset):
            res = res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        res = res.to_pandas()
    assert isinstance(res, pd.DataFrame), type(res)
    return res


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            failures.append((name, f"query raised: {ex!r}"))
            print(f"{name:24s} ERROR {ex!r}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name:24s} rows={len(got):7d}  (rows-only) {dt:6.2f}s")
            continue
        exp = con.sql(oracles[name]).df()
        status = "OK"
        if len(got) == 0 and len(exp) == 0:
            # Dataset.to_pandas drops columns on an all-empty result; an
            # empty frame matching an empty oracle is a pass either way
            pass
        elif sorted(got.columns) != sorted(exp.columns):
            status = f"COLS {sorted(got.columns)} != {sorted(exp.columns)}"
        elif len(got) != len(exp):
            status = f"ROWS {len(got)} != {len(exp)}"
        else:
            g, x = canon(got), canon(exp)
            num = g.select_dtypes(include=[np.number]).columns
            ok = True
            for c in g.columns:
                if c in num:
                    if not np.allclose(g[c].to_numpy(dtype=float),
                                       x[c].to_numpy(dtype=float),
                                       rtol=0, atol=1e-9, equal_nan=True):
                        ok = False
                elif not (g[c].to_numpy() == x[c].to_numpy()).all():
                    ok = False
                if not ok:
                    bad = (g[c].to_numpy() != x[c].to_numpy())
                    i = int(np.flatnonzero(bad)[0]) if bad.any() else 0
                    status = f"VALUES differ in {c} @canon-row {i}: {g[c].iloc[i]!r} != {x[c].iloc[i]!r}"
                    break
        print(f"{name:24s} rows={len(got):7d}  {status} {dt:6.2f}s")
        if status != "OK":
            failures.append((name, status))
    ray.shutdown()
    if failures:
        print("\nFAILURES:")
        for n, s in failures:
            print(" ", n, s)
        sys.exit(1)
    print("\nall queries match")


if __name__ == "__main__":
    main()
