"""DuckDB equality gates for scd2_history and full_outer_join (tail
queries — the driver's 50-entry oracle window is saturated, so their
oracles live here)."""

import duckdb

import __ray_entry__ as entry

SF = "/root/testdata/sf0.001"

SQL = {
    "scd2_history": """
        SELECT user_id, event_type,
               CAST(round(value * 100) AS BIGINT) AS value_cents,
               event_id AS valid_from,
               COALESCE(nxt, -1) AS valid_to,
               nxt IS NULL AS is_current
        FROM (
            SELECT user_id, event_type, value, event_id,
                   lead(event_id) OVER (PARTITION BY user_id
                                        ORDER BY event_id) AS nxt
            FROM events
        )
    """,
    "full_outer_join": """
        WITH cell AS (
            SELECT user_id,
                   CAST(date_diff('day', DATE '1970-01-01',
                                  CAST(ts AS DATE)) AS BIGINT) AS epoch_day,
                   event_type
            FROM events
        ),
        c AS (SELECT user_id, epoch_day, count(*) AS n_clicks
              FROM cell WHERE event_type = 'click' GROUP BY 1, 2),
        p AS (SELECT user_id, epoch_day, count(*) AS n_purchases
              FROM cell WHERE event_type = 'purchase' GROUP BY 1, 2)
        SELECT COALESCE(c.user_id, p.user_id) AS user_id,
               COALESCE(c.epoch_day, p.epoch_day) AS epoch_day,
               COALESCE(n_clicks, 0) AS n_clicks,
               COALESCE(n_purchases, 0) AS n_purchases,
               CASE WHEN c.user_id IS NOT NULL AND p.user_id IS NOT NULL
                        THEN 'both'
                    WHEN c.user_id IS NOT NULL THEN 'left_only'
                    ELSE 'right_only' END AS side
        FROM c FULL OUTER JOIN p
          ON c.user_id = p.user_id AND c.epoch_day = p.epoch_day
    """,
}


def _compare(name: str, sort_cols: list[str]):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    exp = con.sql(SQL[name]).df()
    got = entry.queries()[name](SF).to_pandas()
    assert sorted(got.columns) == sorted(exp.columns)
    got = got.sort_values(sort_cols).reset_index(drop=True)
    exp = exp[list(got.columns)].sort_values(sort_cols).reset_index(drop=True)
    assert len(got) == len(exp)
    for c in got.columns:
        assert got[c].astype(exp[c].dtype).tolist() == exp[c].tolist(), c
    return got


def test_scd2_history_matches_duckdb(ray_session):
    got = _compare("scd2_history", ["user_id", "valid_from"])
    # SCD-2 invariants: exactly one open interval per key, and each
    # closed interval's valid_to equals the key's next valid_from
    per_key = got.groupby("user_id")
    assert (per_key["is_current"].sum() == 1).all()
    for _, g in per_key:
        g = g.sort_values("valid_from")
        closed = g["valid_to"].iloc[:-1]
        assert (closed.to_numpy() == g["valid_from"].iloc[1:].to_numpy()).all()
        assert g["valid_to"].iloc[-1] == -1


def test_full_outer_join_matches_duckdb(ray_session):
    got = _compare("full_outer_join", ["user_id", "epoch_day"])
    # genuine outer-ness: the gate only means something if BOTH sides
    # have unmatched cells (the (user, day) grain guarantees it)
    assert (got["side"] == "both").any()
    assert (got["side"] == "left_only").any()
    assert (got["side"] == "right_only").any()
    assert ((got["n_clicks"] > 0) | (got["n_purchases"] > 0)).all()
