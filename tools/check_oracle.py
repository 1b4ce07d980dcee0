"""Local replica of the driver's correctness check: run every
``queries()`` entry and its DuckDB ``oracle_sql()`` side-by-side and
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [--sf DIR] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def to_pandas(res):
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    sort_frame = df.copy()
    for c in sort_frame.columns:
        # quantize floats for the SORT (not the compared values): two
        # sides can hold the same decimal a 1-ulp apart (round() impls
        # compute round(x*100)/100 with different intermediates), and a
        # raw-float sort then breaks ties differently, scrambling the
        # row order the per-column comparison depends on
        if np.issubdtype(sort_frame[c].dtype, np.floating):
            sort_frame[c] = sort_frame[c].round(9)
    order = sort_frame.sort_values(
        list(sort_frame.columns), kind="mergesort"
    ).index
    return df.loc[order].reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, ora_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(ora_df.columns):
        problems.append(f"schema: ray={sorted(ray_df.columns)} oracle={sorted(ora_df.columns)}")
        return problems
    if len(ray_df) != len(ora_df):
        problems.append(f"rows: ray={len(ray_df)} oracle={len(ora_df)}")
    a, b = canonicalize(ray_df), canonicalize(ora_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
                ok = np.allclose(
                    av.astype(float), bv.astype(float), rtol=1e-9, atol=1e-9,
                    equal_nan=True,
                )
            else:
                ok = (av.astype(str).values == bv.astype(str).values).all()
            if not ok:
                bad = (
                    (av.astype(str).values != bv.astype(str).values).sum()
                    if av.dtype == object
                    else "?"
                )
                problems.append(f"values differ in col {c} ({bad} rows)")
    return problems


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from sociallink_ray.queries import ORACLE_SQL, QUERIES

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    only = set(args.only.split(",")) if args.only else None
    n_fail = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(args.sf))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: ray error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        sql = ORACLE_SQL.get(name)
        if sql is None:
            print(f"OK?  {name}: rows-only ({len(ray_df)} rows, {dt:.1f}s)")
            continue
        try:
            ora_df = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = compare(name, ray_df, ora_df)
        if problems:
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(ray_df)} rows ({dt:.1f}s)")
    print("ALL PASS" if n_fail == 0 else f"{n_fail} FAILURES")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
