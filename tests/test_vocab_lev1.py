"""Gates for the edit-distance-1 vocabulary join (functions/fuzzy.py).

1. Hash-exact DuckDB oracle: the engine's deletion-neighborhood
   equi-join must emit exactly the pairs DuckDB's quadratic
   ``levenshtein(a,b) = 1`` cross join finds over the same distinct
   vocabulary (part names at sf0.001 — 62 names, 8 true pairs).
2. Planted-typo fixture covering all three edit kinds (substitution,
   insertion, deletion), plus distance-2 decoys that share a deletion
   variant ("ab"/"ba") — the case where candidate generation alone
   over-reports and only the verify step keeps the output exact.
3. The verifier's unit contract on adversarial short strings.
"""

import duckdb
import pyarrow as pa

import ray

import __ray_entry__ as entry
from glue_etl_pipeline_ray.functions.fuzzy import lev1_verify, vocab_lev1_pairs

SF = "/root/testdata/sf0.001"


def _oracle_pairs(values: list[str]) -> set[tuple[str, str]]:
    con = duckdb.connect()
    con.register("vals", pa.table({"w": pa.array(values, pa.string())}))
    rows = con.sql(
        """
        WITH words AS (SELECT DISTINCT w FROM vals)
        SELECT a.w, b.w FROM words a JOIN words b
        ON a.w < b.w AND abs(length(a.w) - length(b.w)) <= 1
           AND levenshtein(a.w, b.w) = 1
        """
    ).fetchall()
    return {(r[0], r[1]) for r in rows}


def _got_pairs(ds) -> set[tuple[str, str]]:
    t = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    if isinstance(t, set):
        return t
    if len(t) == 0:  # empty results may lose their column names
        return set()
    return set(zip(t["word_a"].tolist(), t["word_b"].tolist()))


def test_part_names_match_duckdb_levenshtein(ray_session):
    import pyarrow.parquet as pq

    names = pq.read_table(f"{SF}/part.parquet", columns=["p_name"])[
        "p_name"
    ].to_pylist()
    exp = _oracle_pairs(names)
    got = _got_pairs(entry.queries()["vocab_lev1"](SF))
    assert got == exp
    assert len(exp) > 0  # the gate is not vacuous on this input
    # a<b ordering contract
    assert all(a < b for a, b in got)


def test_planted_typos_all_edit_kinds(ray_session):
    words = [
        "transformer",
        "transformr",  # deletion
        "transforme",  # deletion (different position family)
        "transformers",  # insertion
        "transformer",  # transposition -> distance 2, must NOT pair
        "trunsformer",  # substitution
        "ab",
        "ba",  # share deletion variants "a"/"b" but lev=2: decoy
        "a",
        "b",  # lev("a","b")=1 via substitution; lev("a","")... no empty
        "decoy_far",
    ]
    # duplicate corpus rows: vocabulary must dedup before pairing
    corpus = words * 3
    ds = ray.data.from_arrow(
        pa.table({"p_name": pa.array(corpus, pa.string())})
    )
    got = _got_pairs(vocab_lev1_pairs(ds, col="p_name", mode="values"))
    exp = _oracle_pairs(words)
    assert got == exp
    assert ("transformer", "transformr") in got
    assert ("transformer", "transformers") in got
    assert ("transformer", "trunsformer") in got
    assert ("ab", "ba") not in got
    assert ("a", "b") in got


def test_tokens_mode_matches_duckdb_on_documents(ray_session):
    import pyarrow.parquet as pq

    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    toks: list[str] = []
    for s in texts:
        toks.extend((s or "").split(" "))
    exp = _oracle_pairs(toks)
    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    got = _got_pairs(vocab_lev1_pairs(ds, col="text", mode="tokens"))
    assert got == exp  # empty on this corpus is fine — sets still equal


def test_lev1_verify_unit():
    assert lev1_verify("a", "")
    assert lev1_verify("", "a")
    assert not lev1_verify("ab", "ba")
    assert lev1_verify("ab", "ab"[:1])
    assert lev1_verify("abc", "abd")
    assert not lev1_verify("abc", "adb")
    assert lev1_verify("abc", "abcd")
    assert lev1_verify("xabc", "abc")
    assert not lev1_verify("abc", "abcde")


def test_hot_bucket_raises(ray_session):
    # 26 single-char words all share the deletion variant "" — with a
    # tiny max_bucket the exactness contract must fail LOUD, not skip
    import string

    ds = ray.data.from_arrow(
        pa.table(
            {"p_name": pa.array(list(string.ascii_lowercase), pa.string())}
        )
    )
    import pytest

    with pytest.raises(Exception, match="max_bucket"):
        vocab_lev1_pairs(
            ds, col="p_name", mode="values", max_bucket=5
        ).materialize()
