"""Text-normalization gate: hash-exact vs the DuckDB expression chain
and a hand-built unicode/control-char fixture."""

import duckdb
import pyarrow as pa
import ray.data as rd

from glue_etl_pipeline_ray.functions.text import normalize_text
from glue_etl_pipeline_ray.pipelines.queries import q_text_normalize

SF = "/root/testdata/sf0.001"


def test_normalize_matches_duckdb(ray_session):
    got = (
        q_text_normalize(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""SELECT doc_id,
                   trim(regexp_replace(
                       regexp_replace(lower(nfc_normalize(text)),
                           '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'),
                       '\\s+', ' ', 'g')) AS text_norm
            FROM read_parquet('{SF}/documents.parquet')
            ORDER BY doc_id"""
    ).df()
    assert list(got["doc_id"]) == list(exp["doc_id"])
    assert list(got["text_norm"]) == list(exp["text_norm"])


def test_normalize_fixture_cases(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    "  Hello\tWORLD \n\n x ",
                    "café Naïve",  # combining marks -> NFC
                    "a\x00b\x1fc",
                ],
                pa.string(),
            ),
        }
    )
    got = normalize_text(rd.from_arrow(t)).to_pandas().set_index("doc_id")
    assert got.loc[0, "text_norm"] == "hello world x"
    assert got.loc[1, "text_norm"] == "café naïve"
    assert got.loc[2, "text_norm"] == "abc"
