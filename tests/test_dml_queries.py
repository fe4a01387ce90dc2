"""DuckDB equality gates for the DML tail queries (cdc_delete_where /
cdc_update_where) — the driver's 50-entry oracle window is saturated,
so these carry their hash-exact SQL gate here instead (same convention
as tests/test_tail_duckdb_gates.py)."""

import duckdb

import __ray_entry__ as entry

SF = "/root/testdata/sf0.001"

_LWW = """
    SELECT CAST(user_id AS VARCHAR) AS user_id, event_type,
           CAST(round(value * 100) AS BIGINT) AS value_cents
    FROM (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY event_id DESC) AS rn
        FROM read_parquet('{sf}/events.parquet')
    )
    WHERE rn = 1 AND event_type <> 'error'
"""


def _cmp(got, sql):
    exp = (
        duckdb.sql(sql)
        .df()
        .sort_values(["user_id"])
        .reset_index(drop=True)
    )
    got = got.to_pandas().sort_values(["user_id"]).reset_index(drop=True)
    assert sorted(got.columns) == sorted(exp.columns)
    for c in exp.columns:
        assert got[c].tolist() == exp[c].tolist(), c


def test_cdc_delete_where_matches_sql(ray_session):
    _cmp(
        entry.queries()["cdc_delete_where"](SF),
        f"SELECT * FROM ({_LWW.format(sf=SF)}) WHERE event_type <> 'click'",
    )


def test_cdc_merge_into_matches_sql(ray_session):
    _cmp(
        entry.queries()["cdc_merge_into"](SF),
        f"""
        SELECT user_id, event_type, value_cents + 500 AS value_cents
        FROM ({_LWW.format(sf=SF)})
        WHERE event_type = 'purchase'
        """,
    )


def test_cdc_restore_matches_sql(ray_session):
    # restore(1) == the LWW snapshot over batches <= 1 (batch = event_id
    # % 4, the 4-batch layout _events_as_cdc derives)
    _cmp(
        entry.queries()["cdc_restore"](SF),
        f"""
        SELECT CAST(user_id AS VARCHAR) AS user_id, event_type,
               CAST(round(value * 100) AS BIGINT) AS value_cents
        FROM (
            SELECT user_id, event_type, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY event_id DESC) AS rn
            FROM read_parquet('{SF}/events.parquet')
            WHERE event_id % 4 <= 1
        )
        WHERE rn = 1 AND event_type <> 'error'
        """,
    )


def test_cdc_update_where_matches_sql(ray_session):
    _cmp(
        entry.queries()["cdc_update_where"](SF),
        f"""
        SELECT user_id, event_type,
               CASE WHEN event_type = 'purchase'
                    THEN value_cents + 1000 ELSE value_cents
               END AS value_cents
        FROM ({_LWW.format(sf=SF)})
        """,
    )
