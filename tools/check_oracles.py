"""Local replica of the driver's correctness harness: run every
queries() entry and its oracle_sql() side by side on a given sf dir,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    try:
        from ray.data import Dataset

        if isinstance(res, Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"schema: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"rows: ray={len(ray_df)} sql={len(sql_df)}")
    a, b = normalize(ray_df), normalize(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]):
                if not np.allclose(a[c], b[c], rtol=0, atol=0, equal_nan=True):
                    bad = (a[c] != b[c]) & ~(a[c].isna() & b[c].isna())
                    problems.append(f"values[{c}]: {int(bad.sum())} mismatches, e.g. {a[c][bad].head(3).tolist()} vs {b[c][bad].head(3).tolist()}")
            else:
                if not a[c].equals(b[c]):
                    bad = a[c] != b[c]
                    problems.append(f"values[{c}]: {int(bad.sum())} mismatches, e.g. ray={a[c][bad].head(3).tolist()} sql={b[c][bad].head(3).tolist()}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=16, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: ray query raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        t1 = time.perf_counter()
        if name not in sqls:
            print(f"ok   {name}: rows-only ({len(ray_df)} rows, {t1-t0:.1f}s)")
            continue
        try:
            sql_df = con.execute(sqls[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({t1-t0:.1f}s):")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"PASS {name} ({len(ray_df)} rows, {t1-t0:.1f}s)")
    print("FAILURES:", n_fail)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
