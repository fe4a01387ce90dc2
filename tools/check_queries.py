"""Local mimic of the driver's correctness gate: run every
``__ray_entry__.queries()`` entry and compare against ``oracle_sql()``
via DuckDB (row count + column names + order-insensitive values).

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        df = res.to_pandas()
        if df.shape[1] == 0:
            # Ray's to_pandas drops columns when every block is empty;
            # rebuild the frame from the Dataset schema so an empty
            # result still compares by column names
            sch = res.schema()
            if sch is not None:
                df = pd.DataFrame({n: pd.Series(dtype="object") for n in sch.names})
        return df
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import ray

    ray.init(
        address="local", num_cpus=8, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, sqls = entry.queries(), entry.oracle_sql()
    unknown = sorted(set(only or ()) - set(qs))
    if unknown:
        print(f"FAIL  unknown query name(s): {unknown}")
        return 1
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            failed.append(name)
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"rows  {name}: {len(mine)} rows, cols={list(mine.columns)} ({dt:.1f}s)")
            continue
        oracle = canon(con.execute(sqls[name]).fetchdf())
        status = []
        if len(mine) != len(oracle):
            status.append(f"rowcount {len(mine)} != {len(oracle)}")
        if list(mine.columns) != list(oracle.columns):
            status.append(f"cols {list(mine.columns)} != {list(oracle.columns)}")
        if not status:
            try:
                pd.testing.assert_frame_equal(
                    mine, oracle, check_dtype=False, check_exact=True
                )
            except AssertionError as e:
                status.append("values differ: " + str(e).split("\n")[0])
        if status:
            print(f"FAIL  {name}: {'; '.join(status)} ({dt:.1f}s)")
            if len(mine) == len(oracle) and list(mine.columns) == list(oracle.columns):
                diff = mine.compare(oracle) if mine.shape == oracle.shape else None
                if diff is not None and len(diff):
                    print(diff.head(5))
            failed.append(name)
        else:
            print(f"OK    {name}: {len(mine)} rows ({dt:.1f}s)")
    ray.shutdown()
    print("FAILED:", failed if failed else "none")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
