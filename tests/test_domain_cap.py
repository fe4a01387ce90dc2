"""Per-domain cap gate: hash-exact vs DuckDB row_number over md5."""

import duckdb

from glue_etl_pipeline_ray.pipelines.queries import q_domain_cap

SF = "/root/testdata/sf0.001"

ORACLE = """
SELECT doc_id, source FROM (
    SELECT doc_id, source,
           row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR))
           ) AS rn
    FROM read_parquet('{sf}/documents.parquet')
) WHERE rn <= 10
"""


def test_domain_cap_matches_duckdb(ray_session):
    got = (
        q_domain_cap(SF)
        .to_pandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    exp = (
        duckdb.sql(ORACLE.format(sf=SF))
        .df()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    assert list(got["doc_id"]) == list(exp["doc_id"])
    assert list(got["source"]) == list(exp["source"])
    # every source capped, at least one actually cut
    sizes = got.groupby("source").size()
    assert sizes.max() <= 10
    full = duckdb.sql(
        f"SELECT source, count(*) n FROM read_parquet('{SF}/documents.parquet') GROUP BY 1"
    ).df()
    assert (full["n"] > 10).any()
