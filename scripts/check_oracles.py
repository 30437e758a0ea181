"""Local twin of the driver's correctness gate: run every queries()
entry at a given sf_dir and compare against oracle_sql() via DuckDB
(row count + schema + order-insensitive value compare).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def to_pandas(res):
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return res


def normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __ray_entry__ as e

    qs, sql = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"query raised: {ex!r}"))
            print(f"FAIL {name}: raised {ex!r}")
            continue
        dt = time.time() - t0
        if name not in sql:
            print(f"ok   {name}: rows-only, {len(got)} rows [{dt:.1f}s]")
            if len(got) == 0:
                failures.append((name, "0 rows"))
            continue
        want = con.execute(sql[name]).df()
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            failures.append((name, f"columns {list(g.columns)} != {list(w.columns)}"))
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            continue
        if len(g) != len(w):
            failures.append((name, f"rows {len(g)} != {len(w)}"))
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            continue
        if not g.equals(w):
            neq = (g != w).any(axis=1)
            failures.append((name, f"{int(neq.sum())} mismatched rows"))
            print(f"FAIL {name}: {int(neq.sum())}/{len(g)} rows differ")
            print(g[neq].head(3))
            print(w[neq].head(3))
            continue
        print(f"OK   {name}: {len(g)} rows match oracle [{dt:.1f}s]")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {[f[0] for f in failures]}")
        sys.exit(1)
    print("all queries pass")


if __name__ == "__main__":
    main()
