"""Edit-distance-1 vocabulary neighbors: a FastSS-style deletion-
neighborhood join (Bocek et al., "Fast Similarity Search in Large
Dictionaries", 2007) — the fuzzy key-matching / typo-clustering step of
a data-cleaning pipeline, re-expressed as keyed Ray Data exchanges.

Why not a pairwise join: ``levenshtein(a, b) <= 1`` is a non-equi
predicate, so the naive plan is an all-pairs cross join over the
vocabulary — quadratic, and not expressible as a hash shuffle. The
deletion-neighborhood identity turns it into an EQUI-join:

    lev(a, b) <= 1  ⇔  a and b share a member of their deletion
                       neighborhoods D(x) = {x} ∪ {x minus one char}

(substitution pairs share the deletion at the substituted position;
insert/delete pairs share the shorter string itself, which is a
deletion variant of the longer). Sharing a variant is necessary but
not sufficient — e.g. "ab"/"ba" share variant "a" at distance 2 —
so every candidate pair is verified with an exact O(len) check.

Scale shape (all stages vocabulary-sized, never corpus-sized):

1. distinct terms: per-block ``np.unique`` partials, then one keyed
   exchange (``grouped_first``) — the only stage that reads the corpus.
2. variant expansion: ``map_batches`` emits len+1 ``(variant, term)``
   rows per term (D(x) including x itself).
3. bucket join: one keyed exchange on ``variant``; each bucket emits
   its verified pairs. Buckets larger than ``max_bucket`` raise — a
   pathological bucket means the vocabulary has a hot deletion variant
   (thousands of terms one edit apart) and silently skipping it would
   break the operator's exactness contract, unlike the recall-gated
   LSH family where ``max_bucket`` trades recall for speed.
4. pair dedup: a pair can surface in several buckets (one per shared
   variant); one keyed ``grouped_first`` on the pair makes the output
   a set.

Reference parity note: the Glue reference has no fuzzy matcher; this
is part of the beyond-reference training-data toolkit (nearest
in-repo relatives: functions/dedup.py's LSH banding — candidate
generation by shared key — and per_key_cap's exact-by-construction
discipline). Gate: hash-exact DuckDB ``levenshtein(a,b)=1`` oracle
plus a planted-typo fixture covering all three edit kinds
(tests/test_vocab_lev1.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

_PAIR_SCHEMA = pa.schema(
    [("word_a", pa.string()), ("word_b", pa.string())]
)


def lev1_verify(a: str, b: str) -> bool:
    """Exact check for edit distance == 1 (assumes ``a != b``)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        # substitution: exactly one differing position
        diff = 0
        for x, y in zip(a, b):
            if x != y:
                diff += 1
                if diff > 1:
                    return False
        return diff == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # insertion: a must equal b with one char removed (two-pointer)
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def vocab_lev1_pairs(
    ds: Dataset,
    col: str = "text",
    mode: str = "values",
    num_partitions: int = 64,
    max_bucket: int = 10_000,
) -> Dataset:
    """All unordered pairs of DISTINCT vocabulary terms at edit
    distance exactly 1, as ``(word_a, word_b)`` with ``word_a <
    word_b``. ``mode="values"`` treats each value of ``col`` as one
    term; ``mode="tokens"`` splits values on single spaces first
    (matching DuckDB ``string_split(col, ' ')``, empty tokens
    included, so the oracle sees the identical vocabulary)."""
    if mode not in ("values", "tokens"):
        raise ValueError(f"unknown mode {mode!r}")

    from glue_etl_pipeline_ray.functions.groups import (
        grouped_apply,
        grouped_first,
    )

    def block_terms(t: pa.Table) -> pa.Table:
        vals = t[col].to_pylist()
        if mode == "tokens":
            toks: list = []
            for s in vals:
                toks.extend((s or "").split(" "))
            vals = toks
        else:
            vals = [v or "" for v in vals]
        u = np.unique(np.array(vals, dtype=object)) if vals else []
        return pa.table({"term": pa.array(list(u), pa.string())})

    terms = ds.map_batches(
        block_terms, batch_format="pyarrow", batch_size=None
    )
    vocab = grouped_first(terms, ["term"], num_partitions=num_partitions)

    def variants(t: pa.Table) -> pa.Table:
        # vocabulary-sized stage: the per-term loop runs over distinct
        # terms, never corpus rows
        vs: list[str] = []
        ws: list[str] = []
        for w in t["term"].to_pylist():
            vs.append(w)
            ws.append(w)
            for i in range(len(w)):
                vs.append(w[:i] + w[i + 1 :])
                ws.append(w)
        return pa.table(
            {
                "variant": pa.array(vs, pa.string()),
                "term": pa.array(ws, pa.string()),
            }
        )

    keyed = vocab.map_batches(
        variants, batch_format="pyarrow", batch_size=None
    )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        words = sorted(set(g["term"].to_pylist()))
        if len(words) > max_bucket:
            raise ValueError(
                f"deletion-variant bucket holds {len(words)} terms "
                f"(> max_bucket={max_bucket}); the exact contract "
                "does not permit skipping — raise max_bucket or "
                "pre-partition the vocabulary"
            )
        a_out: list[str] = []
        b_out: list[str] = []
        for i in range(len(words)):
            for j in range(i + 1, len(words)):
                if lev1_verify(words[i], words[j]):
                    a_out.append(words[i])
                    b_out.append(words[j])
        return pa.table(
            {
                "word_a": pa.array(a_out, pa.string()),
                "word_b": pa.array(b_out, pa.string()),
            },
            schema=_PAIR_SCHEMA,
        )

    pairs = grouped_apply(
        keyed,
        ["variant"],
        bucket_pairs,
        num_partitions=num_partitions,
        min_group_size=2,
    )
    # a pair appears once per shared variant: dedup on the pair key
    return grouped_first(
        pairs, ["word_a", "word_b"], num_partitions=num_partitions
    )
