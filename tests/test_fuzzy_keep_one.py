"""Hash-exact DuckDB gate for the composed keep-one fuzzy-dedup query
(`dedup_fuzzy_keep_one`): exact n-gram-Jaccard pairs -> connected
components -> drop every clustered doc that is not its component's min
id -> surviving corpus. The driver's 50-entry oracle window is
saturated, so (like decontaminate / vocab_topk) the hash-exact DuckDB
comparison lives here: the recursive-CTE oracle below reuses the exact
pairs + component CTEs of the registered ``dedup_clusters`` SQL."""

import duckdb
import pandas as pd

import __ray_entry__ as entry

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[sorted(df.columns)]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


ORACLE_SQL = """
    -- keep-one fuzzy dedup: survivors = everything except clustered
    -- docs that are not their component's min id (same recursive-CTE
    -- component fold as the registered dedup_clusters oracle)
    WITH RECURSIVE toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id,
               t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
        FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
        WHERE len(t) >= 3
        UNION
        SELECT doc_id, array_to_string(t, ' ') AS shingle
        FROM toks WHERE len(t) < 3
    ), sizes AS (
        SELECT doc_id, count(*) AS size FROM sh GROUP BY doc_id
    ), cand AS (
        SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle
                           AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), dup AS (
        SELECT c.da, c.db FROM cand c
        JOIN sizes sa ON sa.doc_id = c.da
        JOIN sizes sb ON sb.doc_id = c.db
        WHERE 5 * c.inter >= 4 * (sa.size + sb.size - c.inter)
    ), edges AS (
        SELECT da AS a, db AS b FROM dup
        UNION SELECT db, da FROM dup
    ), reach(node, r) AS (
        SELECT a, b FROM edges
        UNION
        SELECT reach.node, e.b FROM reach
        JOIN edges e ON reach.r = e.a
    ), drop_set AS (
        SELECT node FROM reach GROUP BY node
        HAVING node != least(node, min(r))
    )
    SELECT doc_id, text, lang, source, n_chars FROM documents
    WHERE doc_id NOT IN (SELECT node FROM drop_set)
"""


def test_fuzzy_keep_one_matches_recursive_cte(ray_session):
    sql = ORACLE_SQL
    con = _duck()
    exp = _norm(con.sql(sql).df())
    got = _norm(entry.queries()["dedup_fuzzy_keep_one"](SF).to_pandas())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_fuzzy_keep_one_subset_and_representatives(ray_session):
    """Structural invariants: survivors are a subset of the corpus;
    every dropped doc's cluster representative (its cluster_id from
    dedup_clusters) IS among the survivors — keep-one never orphans a
    cluster."""
    survivors = entry.queries()["dedup_fuzzy_keep_one"](SF).to_pandas()
    clusters = entry.queries()["dedup_clusters"](SF).to_pandas()
    con = _duck()
    all_ids = set(con.sql("SELECT doc_id FROM documents").df()["doc_id"])
    surv = set(survivors["doc_id"])
    assert surv <= all_ids
    dropped = all_ids - surv
    # dropped docs are exactly the clustered non-representatives
    non_rep = set(
        clusters.loc[clusters["doc_id"] != clusters["cluster_id"], "doc_id"]
    )
    assert dropped == non_rep
    # every cluster representative survives
    assert set(clusters["cluster_id"]) <= surv
