"""DuckDB equality gates for the pytest-gated tail queries that the
driver's 50-entry oracle window can't hold: dataset_split,
mixture_sample, doc_chunk, shuffle_train_order.

The hash-membership operators key off the engine's stable 64-bit id
hash (pandas SipHash); DuckDB can't compute that hash, so each test
derives the per-row hash INDEPENDENTLY (one direct pd.util.hash_array
call on the raw parquet column — not through the engine code path),
registers it as a DuckDB table, and expresses the operator's LOGIC in
SQL over it. The chunker gate is pure SQL (str_split + list slicing).
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

import __ray_entry__ as entry

SF = "/root/testdata/sf0.001"


def _ids_and_hash():
    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_numpy(zero_copy_only=False)
    h = pd.util.hash_array(np.asarray(ids, dtype=object), categorize=False)
    return ids, h


def _unit(h: np.ndarray, salt: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return (h * np.uint64(salt)).astype(np.float64) / float(2**64)


def test_dataset_split_matches_sql_over_independent_hash(ray_session):
    ids, h = _ids_and_hash()
    u = _unit(h, 0xA076_1D64_78BD_642F)  # _SPLIT_SALT
    con = duckdb.connect()
    con.register("hashes", pd.DataFrame({"doc_id": ids, "u": u}))
    edges = np.cumsum([0.9, 0.05, 0.05])  # engine edge arithmetic
    exp = con.sql(
        f"""
        SELECT d.doc_id, d.source,
               CASE WHEN h.u < {edges[0]!r} THEN 'train'
                    WHEN h.u < {edges[1]!r} THEN 'val'
                    ELSE 'test' END AS split
        FROM read_parquet('{SF}/documents.parquet') d
        JOIN hashes h USING (doc_id)
        ORDER BY doc_id
        """
    ).df()
    got = (
        entry.queries()["dataset_split"](SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got.columns.sort_values()) == sorted(exp.columns)
    for c in ("doc_id", "source", "split"):
        assert list(got[c]) == list(exp[c]), c


def test_mixture_sample_matches_sql_over_independent_hash(ray_session):
    ids, h = _ids_and_hash()
    u = _unit(h, 0xE703_7ED1_A0B4_28DB)  # _MIX_SALT
    con = duckdb.connect()
    con.register("hashes", pd.DataFrame({"doc_id": ids, "u": u}))
    # per-source keep rates: same formula as the engine, but from
    # DuckDB-counted sources (independent of the Ray aggregate)
    counts = dict(
        con.sql(
            f"SELECT source, count(*) FROM "
            f"read_parquet('{SF}/documents.parquet') GROUP BY source"
        ).fetchall()
    )
    target = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
    total = float(sum(target.values()))
    shares = {s: w / total for s, w in target.items()}
    n_out = min(counts[s] / shares[s] for s in shares)
    rates = {s: min(1.0, shares[s] * n_out / counts[s]) for s in shares}
    rate_rows = ", ".join(f"('{s}', {r!r})" for s, r in rates.items())
    exp = con.sql(
        f"""
        WITH rates(source, r) AS (VALUES {rate_rows})
        SELECT d.doc_id, d.source
        FROM read_parquet('{SF}/documents.parquet') d
        JOIN rates USING (source)
        JOIN hashes h USING (doc_id)
        WHERE h.u < rates.r
        ORDER BY doc_id
        """
    ).df()
    got = (
        entry.queries()["mixture_sample"](SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["doc_id"]) == list(exp["doc_id"])
    assert list(got["source"]) == list(exp["source"])


def test_doc_chunk_matches_pure_sql(ray_session):
    # max_tokens=64, overlap=8 -> stride 56; chunk starts while
    # start < max(n - overlap, 1); empty docs yield one empty chunk
    exp = duckdb.sql(
        f"""
        WITH docs AS (
            SELECT doc_id,
                   CASE WHEN text IS NULL OR text = ''
                        THEN CAST([] AS VARCHAR[])
                        ELSE str_split(text, ' ') END AS toks
            FROM read_parquet('{SF}/documents.parquet')
        ), meta AS (
            SELECT doc_id, toks, len(toks) AS n,
                   CAST(CEIL(GREATEST(len(toks) - 8, 1) / 56.0) AS BIGINT)
                       AS n_chunks
            FROM docs
        ), expanded AS (
            SELECT doc_id, toks, n,
                   unnest(range(n_chunks)) AS chunk_idx
            FROM meta WHERE n > 0
        )
        SELECT doc_id, chunk_idx,
               len(toks[chunk_idx * 56 + 1 : LEAST(chunk_idx * 56 + 64, n)])
                   AS n_tokens,
               array_to_string(
                   toks[chunk_idx * 56 + 1 : LEAST(chunk_idx * 56 + 64, n)],
                   ' ') AS text
        FROM expanded
        UNION ALL
        SELECT doc_id, 0, 0, '' FROM meta WHERE n = 0
        ORDER BY doc_id, chunk_idx
        """
    ).df()
    got = (
        entry.queries()["doc_chunk"](SF)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    for c in ("doc_id", "chunk_idx", "n_tokens", "text"):
        assert list(got[c]) == list(exp[c]), c


def test_shuffle_train_order_permutation_matches_sql_rank(ray_session):
    ids, h = _ids_and_hash()
    with np.errstate(over="ignore"):
        salt = np.uint64(0xD6E8_FEB8_6659_FD93) * np.uint64(2 * 1 + 1)
        skey = h * salt  # seed=1, matching the query entry
    assert len(np.unique(skey)) == len(skey), "tie would make order moot"
    con = duckdb.connect()
    con.register(
        "keys",
        pd.DataFrame(
            {"doc_id": ids, "skey": skey, "shard_exp": (skey % 16).astype(int)}
        ),
    )
    exp = con.sql(
        "SELECT doc_id, shard_exp FROM keys ORDER BY skey"
    ).df()
    got = entry.queries()["shuffle_train_order"](SF).to_pandas()
    # the ENGINE's output row order IS the permutation under test
    assert list(got["doc_id"]) == list(exp["doc_id"])
    assert list(got["shard"]) == list(exp["shard_exp"])
