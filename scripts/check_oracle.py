"""Driver-style correctness harness: run every queries() entry and its
oracle_sql() side by side on a given sf dir and compare
(row-count + schema + order-insensitive values).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def compare(name, ray_df, sql_df) -> str:
    if len(ray_df) != len(sql_df):
        return f"ROWCOUNT {len(ray_df)} vs {len(sql_df)}"
    a, b = normalize(ray_df), normalize(sql_df)
    if list(a.columns) != list(b.columns):
        return f"COLUMNS {list(a.columns)} vs {list(b.columns)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind in "fc":
            if not np.array_equal(av, bv.astype(av.dtype), equal_nan=True):
                bad = np.flatnonzero(av != bv)[:3]
                return f"VALUES[{c}] e.g. rows {bad}: {av[bad]} vs {bv[bad]}"
        else:
            if av.dtype != bv.dtype:
                return f"DTYPE[{c}] {av.dtype} vs {bv.dtype}"
            if not np.array_equal(av, bv):
                bad = np.flatnonzero(av != bv)[:3]
                return f"VALUES[{c}] e.g. rows {bad}: {av[bad]} vs {bv[bad]}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    from ray.data import DataContext
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e
    qs = e.queries()
    from kmerray.queries import oracle_registry
    oracles = oracle_registry(sf_dir)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sf_dir}/{t}.parquet')")
        except Exception:
            pass

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        res = fn(sf_dir)
        ray_df = res.to_pandas() if hasattr(res, "to_pandas") else \
            pd.DataFrame(res)
        t1 = time.time()
        if name not in oracles:
            print(f"{name:25s} rows={len(ray_df):8d} ray={t1-t0:6.1f}s "
                  f"(no oracle)")
            continue
        sql_df = con.sql(oracles[name]).df()
        t2 = time.time()
        verdict = compare(name, ray_df, sql_df)
        failures += verdict != "OK"
        print(f"{name:25s} rows={len(ray_df):8d} ray={t1-t0:6.1f}s "
              f"sql={t2-t1:6.1f}s  {verdict}")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
