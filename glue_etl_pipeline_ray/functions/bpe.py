"""Distributed BPE-merge training (Sennrich et al., "Neural Machine
Translation of Rare Words with Subword Units", ACL 2016) — learn the
top-N byte-pair merges of a corpus, the tokenizer-construction step of
an LLM data pipeline (functions/text.py's BpeTokenCount APPLIES a
fixed merge table; this LEARNS one).

Shape: BPE is iterative — each merge depends on the counts produced by
all previous merges — so it cannot be one Dataset pass. The classic
distributed formulation keeps the WORD VOCABULARY (distinct words +
corpus counts, the aggregate-sized output of one distributed word
count) sharded by word hash, with per-iteration work done where the
shards live:

1. one distributed word-count pass over the corpus (per-block
   ``np.unique`` partials + partial_groupby_sum — the only stage that
   touches corpus rows);
2. shard construction: each shard task reads the word-count blocks
   zero-copy and keeps its hash share, encoding every word as Unicode
   code points in one flat int64 array (``utf-32-le`` reinterpret —
   no per-char Python);
3. per merge: every shard emits its (pair -> count) partial
   (vectorized: adjacent-code keys masked at word boundaries,
   ``np.add.at`` weighted by word counts); the driver folds the
   partials (bounded by distinct adjacent pairs, not corpus size),
   picks argmax with the reference tie-break (max count, then
   lexicographically smallest decoded pair), and every shard applies
   the merge in place (vectorized candidate scan; overlapping
   runs — only possible when left == right — resolve greedy
   left-to-right by keeping alternate positions in each run).

Why raw Ray tasks for the iteration: the shard state (flat code
arrays) must PERSIST and MUTATE across N dependent rounds; a Dataset
would re-scan or re-materialize per round. This is the documented
escape hatch (same as state/seenindex.py) — per-round work is
O(vocab chars / shards) per task, and the driver only ever sees pair
partials and the merge table itself.

Merge symbols get codes above 0x110000 (the Unicode ceiling), so code
assignment is globally consistent across shards without a broadcast
dictionary; decoding walks the merge table.

Gate: exact merge-sequence equality (pair strings AND counts) vs a
single-process reference implementation on the real corpus and on
planted tie/overlap fixtures (tests/test_bpe.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

_MERGE_BASE = 0x110000  # first code above any Unicode code point
_PAIR_SHIFT = np.int64(32)  # pair key = left << 32 | right


def _encode_words(words: list[str], counts: np.ndarray):
    """Flat int64 code array + per-word extents, vectorized via a
    utf-32 reinterpret of the concatenated words."""
    lens = np.array([len(w) for w in words], np.int64)
    blob = "".join(words)
    codes = np.frombuffer(blob.encode("utf-32-le"), np.uint32).astype(
        np.int64
    )
    ptr = np.concatenate([[0], np.cumsum(lens)])
    word_of = np.repeat(np.arange(len(words), dtype=np.int64), lens)
    return codes, ptr, word_of, counts.astype(np.int64)


@ray.remote
def _build_shard(shard_id: int, n_shards: int, *blocks: pa.Table):
    from glue_etl_pipeline_ray.hashing import key_hash_u64

    words: list[str] = []
    counts: list[int] = []
    for t in blocks:
        if t.num_rows == 0:
            continue
        h = key_hash_u64(t["word"]) % np.uint64(n_shards)
        mine = t.filter(pa.array(h == np.uint64(shard_id)))
        words.extend(mine["word"].to_pylist())
        counts.extend(mine["n"].to_pylist())
    return _encode_words(words, np.asarray(counts, np.int64))


@ray.remote
def _pair_partial(state):
    codes, ptr, word_of, wc = state
    if len(codes) < 2:
        return np.array([], np.int64), np.array([], np.int64)
    same = word_of[:-1] == word_of[1:]
    left = codes[:-1][same]
    right = codes[1:][same]
    w = wc[word_of[:-1][same]]
    key = (left << _PAIR_SHIFT) | right
    uk, inv = np.unique(key, return_inverse=True)
    acc = np.zeros(len(uk), np.int64)
    np.add.at(acc, inv, w)
    return uk, acc


@ray.remote
def _apply_merge(state, left: int, right: int, new_code: int):
    codes, ptr, word_of, wc = state
    if len(codes) < 2:
        return state
    cand = np.flatnonzero(
        (codes[:-1] == left)
        & (codes[1:] == right)
        & (word_of[:-1] == word_of[1:])
    )
    if len(cand) == 0:
        return state
    # overlapping candidates (possible only when left == right, e.g.
    # "aaaa") resolve greedy left-to-right: keep alternate positions
    # within each run of consecutive candidates
    run_first = np.r_[True, np.diff(cand) != 1]
    run_id = np.cumsum(run_first) - 1
    first_pos = cand[run_first]
    in_run = cand - first_pos[run_id]
    kept = cand[in_run % 2 == 0]

    codes = codes.copy()
    codes[kept] = new_code
    drop = np.zeros(len(codes), np.bool_)
    drop[kept + 1] = True
    keep_mask = ~drop
    merged_per_word = np.bincount(word_of[kept], minlength=len(wc))
    lens = (ptr[1:] - ptr[:-1]) - merged_per_word
    new_ptr = np.concatenate([[0], np.cumsum(lens)])
    new_codes = codes[keep_mask]
    new_word_of = word_of[keep_mask]
    return new_codes, new_ptr, new_word_of, wc


def bpe_train(
    ds: Dataset,
    text_col: str = "text",
    n_merges: int = 50,
    n_shards: int = 8,
    min_pair_count: int = 2,
) -> pa.Table:
    """Learn the corpus's top-``n_merges`` BPE merges; returns
    ``(rank, left, right, new_token, pair_count)`` in merge order.
    Stops early when no pair reaches ``min_pair_count``."""
    from glue_etl_pipeline_ray.functions.agg import partial_groupby_sum

    def word_partial(t: pa.Table) -> pa.Table:
        toks: list[str] = []
        for s in t[text_col].to_pylist():
            toks.extend((s or "").split(" "))
        toks = [w for w in toks if w]
        if not toks:
            return pa.table(
                {"word": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        u, c = np.unique(np.array(toks, dtype=object), return_counts=True)
        return pa.table(
            {
                "word": pa.array(list(u), pa.string()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    parts = ds.map_batches(
        word_partial, batch_format="pyarrow", batch_size=None
    )
    folded = partial_groupby_sum(parts, ["word"], ["n"])
    # hold the block refs ONCE and fan the same refs to every shard
    # builder (shards read them zero-copy from the object store)
    block_refs = folded.to_arrow_refs()
    shards = [
        _build_shard.remote(i, n_shards, *block_refs)
        for i in range(n_shards)
    ]

    decode: dict[int, str] = {}
    # two different merge paths can build the SAME string (e.g.
    # (a,bc) and (ab,c) both yield "abc"); the reference treats equal
    # strings as one symbol, so codes must be assigned by STRING
    # identity, not by merge rank alone
    code_of_str: dict[str, int] = {}

    def to_str(code: int) -> str:
        if code < _MERGE_BASE:
            return chr(code)
        return decode[code]

    out_left: list[str] = []
    out_right: list[str] = []
    out_new: list[str] = []
    out_cnt: list[int] = []
    for rank in range(n_merges):
        partials = ray.get([_pair_partial.remote(s) for s in shards])
        keys = np.concatenate([p[0] for p in partials])
        cnts = np.concatenate([p[1] for p in partials])
        if len(keys) == 0:
            break
        uk, inv = np.unique(keys, return_inverse=True)
        acc = np.zeros(len(uk), np.int64)
        np.add.at(acc, inv, cnts)
        best = int(acc.max())
        if best < min_pair_count:
            break
        # tie-break: among max-count pairs, lexicographically smallest
        # (left_str, right_str) — decoded, so it is representation-free
        # and matches the single-process reference exactly
        cand = uk[acc == best]
        pairs = [
            (to_str(int(k) >> 32), to_str(int(k) & 0xFFFFFFFF))
            for k in cand
        ]
        j = min(range(len(pairs)), key=lambda i: pairs[i])
        l_code = int(cand[j]) >> 32
        r_code = int(cand[j]) & 0xFFFFFFFF
        l_str, r_str = pairs[j]
        tok = l_str + r_str
        new_code = code_of_str.get(tok)
        if new_code is None:
            new_code = _MERGE_BASE + len(decode)
            decode[new_code] = tok
            code_of_str[tok] = new_code
        out_left.append(l_str)
        out_right.append(r_str)
        out_new.append(l_str + r_str)
        out_cnt.append(best)
        shards = [
            _apply_merge.remote(s, l_code, r_code, new_code)
            for s in shards
        ]
    return pa.table(
        {
            "rank": pa.array(np.arange(len(out_left)), pa.int64()),
            "left": pa.array(out_left, pa.string()),
            "right": pa.array(out_right, pa.string()),
            "new_token": pa.array(out_new, pa.string()),
            "pair_count": pa.array(out_cnt, pa.int64()),
        }
    )


def bpe_train_reference(
    word_counts: dict[str, int],
    n_merges: int,
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Single-process reference (the textbook dict implementation) —
    test oracle only, O(vocab x merges), never the distributed path."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        if w:
            key = tuple(w)
            vocab[key] = vocab.get(key, 0) + c
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best_pair, best = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best < min_pair_count:
            break
        merges.append((best_pair[0], best_pair[1], best))
        tok = best_pair[0] + best_pair[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best_pair[0]
                    and syms[i + 1] == best_pair[1]
                ):
                    out.append(tok)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            new_vocab[k] = new_vocab.get(k, 0) + c
        vocab = new_vocab
    return merges
