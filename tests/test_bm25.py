"""BM25 retrieval gate: DuckDB expression with the same IEEE op order
(idf constants injected so ln() implementations can't diverge)."""

import duckdb
import numpy as np

from glue_etl_pipeline_ray.functions.bm25 import bm25_topk
from glue_etl_pipeline_ray.pipelines.queries import q_bm25_topk

SF = "/root/testdata/sf0.001"
TERMS = ["data", "row", "value"]
K1, B = 1.2, 0.75


def test_bm25_matches_duckdb(ray_session):
    con = duckdb.connect()
    con.sql(
        f"""
        CREATE VIEW docs AS
        SELECT doc_id, str_split(coalesce(text, ''), ' ') AS toks,
               len(str_split(coalesce(text, ''), ' ')) AS dl
        FROM read_parquet('{SF}/documents.parquet')
        """
    )
    n_docs, sum_dl = con.sql(
        "SELECT count(*), sum(dl) FROM docs"
    ).fetchone()
    avgdl = float(sum_dl) / max(n_docs, 1)  # engine float expression
    dfs = [
        con.sql(
            f"SELECT count(*) FROM docs WHERE list_contains(toks, '{t}')"
        ).fetchone()[0]
        for t in TERMS
    ]
    idf = np.log((n_docs - np.array(dfs) + 0.5) / (np.array(dfs) + 0.5) + 1.0)

    # score terms written out left-to-right, same op order as the engine
    c1 = K1 + 1.0
    parts = []
    for t, i in zip(TERMS, idf):
        tf = f"CAST(len(list_filter(toks, x -> x = '{t}')) AS DOUBLE)"
        parts.append(
            f"(({i!r} * ({tf} * {c1!r})) / "
            f"({tf} + {K1!r} * ({1.0 - B!r} + ({B!r} * dl) / {avgdl!r})))"
        )
    score = " + ".join(parts)
    exp = con.sql(
        f"""
        SELECT doc_id, {score} AS score FROM docs
        ORDER BY score DESC, doc_id LIMIT 20
        """
    ).df()

    got = q_bm25_topk(SF).to_pandas()
    assert list(got["doc_id"]) == list(exp["doc_id"])
    assert np.allclose(got["score"], exp["score"], rtol=0, atol=1e-10)
    assert (got["score"] > 0).any()


def test_bm25_ranks_planted_relevant_doc_first(ray_session):
    import pyarrow as pa
    import ray.data as rd

    texts = ["alpha beta gamma"] * 30 + [
        "needle needle needle haystack",
        "needle haystack haystack haystack",
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    out = bm25_topk(ds, ["needle"], k=2)
    assert out["doc_id"].to_pylist() == [30, 31]
    s = out["score"].to_pylist()
    assert s[0] > s[1] > 0


def test_bm25_empty_corpus_returns_typed_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
            }
        )
    )
    out = bm25_topk(ds, ["needle"], k=5)
    assert out.num_rows == 0
    assert out.schema.field("doc_id").type == pa.int64()
    assert out.schema.field("score").type == pa.float64()


def test_bm25_zero_hit_ties_break_on_doc_id_across_blocks(ray_session):
    """All-tie corpus (query term hits nothing) larger than k, split
    across blocks: the block-local top-k must keep the LOWEST doc_ids,
    not an arbitrary argpartition subset — the global merge can only
    order survivors, never recover ids a block discarded."""
    import pyarrow as pa
    import ray.data as rd

    n = 40
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["common words only"] * n, pa.string()),
        }
    )
    ds = rd.from_arrow(t).repartition(4)
    out = bm25_topk(ds, ["absent_term"], k=10)
    assert out["doc_id"].to_pylist() == list(range(10))
    assert all(s == 0.0 for s in out["score"].to_pylist())
