"""Gates for distributed BPE-merge training (functions/bpe.py).

The oracle is the single-process textbook implementation
(``bpe_train_reference``); equality is EXACT on the full merge
sequence — pair strings, merged tokens, AND weighted counts — which
pins the count arithmetic, the (max count, lexicographically smallest
pair) tie-break, and the greedy left-to-right overlap rule all at
once. Fixtures plant the corner cases: count ties, self-pair overlaps
("aaaa"), merge-path collisions (two merge rules yielding the same
string must unify into one symbol), and multi-shard consistency.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

import __ray_entry__ as entry
from glue_etl_pipeline_ray.functions.bpe import (
    bpe_train,
    bpe_train_reference,
)

SF = "/root/testdata/sf0.001"


def _word_counts(texts: list[str]) -> dict[str, int]:
    wc: dict[str, int] = {}
    for s in texts:
        for w in (s or "").split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    return wc


def _as_rows(tbl: pa.Table) -> list[tuple[str, str, int]]:
    return list(
        zip(
            tbl["left"].to_pylist(),
            tbl["right"].to_pylist(),
            tbl["pair_count"].to_pylist(),
        )
    )


def _check_corpus(texts: list[str], n_merges: int, n_shards: int = 4):
    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})
    )
    got = bpe_train(
        ds, text_col="text", n_merges=n_merges, n_shards=n_shards
    )
    exp = bpe_train_reference(_word_counts(texts), n_merges)
    assert _as_rows(got) == exp
    return got


def test_real_corpus_matches_reference(ray_session):
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    got = _check_corpus(texts, n_merges=25)
    assert got.num_rows > 0
    # merged tokens really are the concatenation of their pair
    for l, r, t in zip(
        got["left"].to_pylist(),
        got["right"].to_pylist(),
        got["new_token"].to_pylist(),
    ):
        assert t == l + r
    # counts are non-increasing merge-over-merge? NOT guaranteed by
    # BPE in general — but they must all clear the floor
    assert min(got["pair_count"].to_pylist()) >= 2


def test_query_entry_runs(ray_session):
    got = entry.queries()["bpe_train"](SF)
    assert got.num_rows > 0
    assert got["rank"].to_pylist() == list(range(got.num_rows))


def test_tie_break_is_lexicographic(ray_session):
    # "ab" and "cd" both occur exactly 3 times; ("a","b") must win
    texts = ["ab ab ab cd cd cd"]
    got = _check_corpus(texts, n_merges=1)
    assert _as_rows(got) == [("a", "b", 3)]


def test_self_pair_overlap_greedy(ray_session):
    # "aaaa" x2 + "aaa": pair (a,a) counts 2*3 + 2 = 8 (all adjacent
    # occurrences); after the greedy merge "aaaa"->(aa)(aa),
    # "aaa"->(aa)a — the reference applies the identical rule, so the
    # next round's counts must agree too
    texts = ["aaaa aaaa aaa"]
    _check_corpus(texts, n_merges=3)


def test_merge_path_collision_unifies_symbol(ray_session):
    # engineered so "ab"+"c" and "a"+"bc" can both arise: the string
    # "abc" reached by either path must be ONE symbol afterwards
    texts = [
        "ab ab ab ab abc abc " * 3,
        "bc bc bc bc xabc xabc " * 3,
        "abcd abcd dabc " * 2,
    ]
    _check_corpus(texts, n_merges=8)


def test_shard_count_does_not_change_merges(ray_session):
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})
    )
    a = _as_rows(bpe_train(ds, n_merges=12, n_shards=1))
    b = _as_rows(bpe_train(ds, n_merges=12, n_shards=7))
    assert a == b and len(a) > 0


def test_early_stop_below_floor(ray_session):
    # every word unique, every pair count 1 -> zero merges at floor 2
    texts = ["qw er ty ui op"]
    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})
    )
    got = bpe_train(ds, n_merges=10, n_shards=2)
    assert got.num_rows == 0


def test_randomized_corpora_match_reference(ray_session):
    rng = np.random.default_rng(5)
    alphabet = list("abcdef")
    for trial in range(3):
        words = [
            "".join(rng.choice(alphabet, size=rng.integers(1, 8)))
            for _ in range(40)
        ]
        texts = [
            " ".join(rng.choice(words, size=30)) for _ in range(10)
        ]
        _check_corpus(texts, n_merges=15, n_shards=3)
