"""Benchmark-decontamination gate: hash-exact vs a DuckDB shingle join.

``decontaminate`` rides outside the driver's 50-entry correctness
window (saturated by the hash-exact set), so its oracle lives here: the
same benchmark split (doc_id % 17 == 0) and 3-gram convention expressed
as SQL, compared row-for-row at sf0.001.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from glue_etl_pipeline_ray.functions.decontaminate import (
    benchmark_ngram_hashes,
    decontaminate,
)
from glue_etl_pipeline_ray.pipelines.queries import q_decontaminate

SF = "/root/testdata/sf0.001"

ORACLE = """
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t
    FROM read_parquet('{sf}/documents.parquet')
), sh AS (
    SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
    FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
    WHERE len(t) >= 3
    UNION
    SELECT doc_id, array_to_string(t, ' ') AS g FROM toks WHERE len(t) < 3
), bench AS (
    SELECT DISTINCT g FROM sh WHERE doc_id % 17 = 0
), train AS (
    SELECT * FROM sh WHERE doc_id % 17 <> 0
)
SELECT tr.doc_id,
       count(*) AS n_grams,
       CAST(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_overlap,
       sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) > 0 AS contaminated
FROM train tr LEFT JOIN bench b ON tr.g = b.g
GROUP BY tr.doc_id
"""


def test_decontaminate_matches_duckdb_oracle(ray_session):
    got = (
        q_decontaminate(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        duckdb.sql(ORACLE.format(sf=SF))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    for col in ("doc_id", "n_grams", "n_overlap"):
        assert (
            got[col].to_numpy().astype(np.int64)
            == exp[col].to_numpy().astype(np.int64)
        ).all(), col
    assert (
        got["contaminated"].to_numpy() == exp["contaminated"].to_numpy()
    ).all()
    # the synthetic corpus repeats a content pool, so contamination is real
    assert got["contaminated"].sum() > 0
    assert (~got["contaminated"]).sum() > 0


def test_decontaminate_drop_mode_keeps_exactly_clean_rows(ray_session):
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    bench = docs.filter(lambda r: r["doc_id"] % 17 == 0)
    train = docs.filter(lambda r: r["doc_id"] % 17 != 0)
    ref = benchmark_ngram_hashes(bench)
    tagged = decontaminate(train, ref).to_pandas()
    kept = decontaminate(train, ref, drop=True).to_pandas()
    clean_ids = set(tagged.loc[~tagged["contaminated"], "doc_id"])
    assert set(kept["doc_id"]) == clean_ids
    assert set(kept.columns) == {"doc_id", "text"}


def test_decontaminate_empty_benchmark_tags_nothing(ray_session):
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    empty = docs.filter(lambda r: False)
    ref = benchmark_ngram_hashes(empty)
    tagged = decontaminate(docs, ref).to_pandas()
    assert (tagged["n_overlap"] == 0).all()
    assert (~tagged["contaminated"]).all()
