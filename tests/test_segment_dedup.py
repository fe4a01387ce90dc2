"""Segment-level (sub-document) exact dedup gate: hash-exact vs a
DuckDB unnest/row_number/string_agg oracle, plus planted-duplicate
semantics and partitioning determinism."""

import duckdb
import pyarrow as pa

from glue_etl_pipeline_ray.functions.dedup import segment_dedup
from glue_etl_pipeline_ray.pipelines.queries import q_dedup_segments

SF = "/root/testdata/sf0.001"

ORACLE = """
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t
    FROM read_parquet('{sf}/documents.parquet')
), segs AS (
    SELECT doc_id, CAST(i AS BIGINT) AS seg_idx,
           array_to_string(t[i*{k}+1 : i*{k}+{k}], ' ') AS seg
    FROM toks,
         UNNEST(range(CAST(ceil(len(t)/{k}.0) AS BIGINT))) AS u(i)
), keep AS (
    SELECT doc_id, seg_idx, seg,
           row_number() OVER (
               PARTITION BY seg ORDER BY doc_id, seg_idx
           ) AS rn
    FROM segs
)
SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS text
FROM keep WHERE rn = 1 GROUP BY doc_id
"""


def test_segment_dedup_matches_duckdb(ray_session):
    got = (
        q_dedup_segments(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        duckdb.sql(ORACLE.format(sf=SF, k=16))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    assert list(got["doc_id"]) == list(exp["doc_id"])
    assert list(got["text"]) == list(exp["text"])
    # the corpus really contains cross-document duplicate segments
    full = duckdb.sql(
        f"SELECT sum(len(string_split(text,' '))) FROM "
        f"read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    kept = duckdb.sql(
        "SELECT sum(len(string_split(text,' '))) FROM "
        f"({ORACLE.format(sf=SF, k=16)})"
    ).fetchone()[0]
    assert kept < full


def test_segment_dedup_planted(ray_session):
    """Planted semantics: an exact repeated segment survives only at
    its first (doc_id, seg_idx); a doc made entirely of duplicate
    segments disappears; intra-document repeats also collapse."""
    import ray.data as rd

    seg_a = " ".join(f"a{i}" for i in range(4))
    seg_b = " ".join(f"b{i}" for i in range(4))
    seg_c = " ".join(f"c{i}" for i in range(4))
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    f"{seg_a} {seg_b}",      # originals
                    f"{seg_a} {seg_c}",      # first segment is a dup
                    f"{seg_a} {seg_a}",      # all segments dups
                ]
            ),
        }
    )
    out = (
        segment_dedup(rd.from_arrow(docs), seg_tokens=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [1, 2]
    assert list(out["text"]) == [f"{seg_a} {seg_b}", seg_c]


def test_segment_dedup_partitioning_deterministic(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array(range(40), pa.int64()),
            "text": pa.array(
                [" ".join(f"w{(i * 7 + j) % 11}" for j in range(10))
                 for i in range(40)]
            ),
        }
    )
    a = (
        segment_dedup(rd.from_arrow(t).repartition(1), seg_tokens=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        segment_dedup(rd.from_arrow(t).repartition(7), seg_tokens=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)
