"""Local mirror of the driver's correctness gate: run every queries() entry
at a given sf and compare to oracle_sql() via DuckDB (row count + schema +
order-insensitive value compare). Usage:

    python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # floats rounded for comparison stability is the QUERY's job; here we
    # sort rows for order-insensitivity only
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    import os

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, sqls = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL  {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"rows  {name}: {len(got)} rows, {len(got.columns)} cols ({dt:.1f}s)")
            continue
        want = canon(con.sql(sqls[name]).df())
        ok_shape = list(got.columns) == list(want.columns) and len(got) == len(want)
        if not ok_shape:
            print(f"FAIL  {name}: shape {got.shape}/{list(got.columns)} vs "
                  f"{want.shape}/{list(want.columns)} ({dt:.1f}s)")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(
                got, want, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9
            )
            print(f"OK    {name}: {len(got)} rows ({dt:.1f}s)")
        except AssertionError as ex:
            print(f"FAIL  {name}: values differ ({dt:.1f}s)\n{str(ex)[:500]}")
            failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
