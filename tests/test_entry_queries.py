"""Driver-contract tests: entry() smoke + a fast subset of the
queries()/oracle_sql() gate at sf0.001 (the full gate runs via
tools/check_queries.py; the external driver runs it at sf0.01)."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

# fast, representative subset (full sweep: tools/check_queries.py)
SUBSET = [
    "cdc_dead_letter",
    "flatten_project_json",
    "partition_derive",
    "broadcast_lookup_join",
    "pricing_summary",
    "topk_users",
    "token_stats",
    "doc_fingerprint",
    "ann_cosine_topk",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_pandas(res):
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_entry_runs_and_returns_rows():
    ds = entry.entry()
    df = _to_pandas(ds)
    assert len(df) >= 0
    assert list(df.columns) == ["repo", "path", "commit", "lang", "content"]


def test_every_query_has_callable():
    qs = entry.queries()
    assert len(qs) >= 20
    for name, fn in qs.items():
        assert callable(fn), name


def test_oracle_sql_keys_subset_of_queries():
    qs, sqls = entry.queries(), entry.oracle_sql()
    assert set(sqls) <= set(qs)
    assert len(sqls) >= 15


def test_oracle_backed_queries_come_first():
    """The driver's correctness gate checks the first 50 entries of
    queries() in dict order — every oracle-backed query must sit inside
    that window, ahead of the no-oracle tail (VERDICT r2 item 2)."""
    names = list(entry.queries())
    backed = set(entry.oracle_sql())
    last_backed = max(i for i, n in enumerate(names) if n in backed)
    first_unbacked = min(
        (i for i, n in enumerate(names) if n not in backed), default=len(names)
    )
    assert last_backed < first_unbacked, (
        f"oracle-backed query at position {last_backed} follows a "
        f"no-oracle query at {first_unbacked}"
    )
    assert last_backed < 50


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_duckdb(con, name):
    mine = _canon(_to_pandas(entry.queries()[name](SF)))
    oracle = _canon(con.execute(entry.oracle_sql()[name]).fetchdf())
    assert list(mine.columns) == list(oracle.columns)
    assert len(mine) == len(oracle)
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False, check_exact=True)
