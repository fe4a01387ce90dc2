"""Exact all-pairs cosine similarity join over SPARSE integer count
vectors (Bayardo et al., "Scaling Up All Pairs Similarity Search",
WWW'07 — the inverted-index formulation, without the prefix-filter
approximation) — the collaborative-filtering / kNN-graph construction
step over co-occurrence vectors (customer x item baskets, doc x term
counts).

Exactness contract: similarity never touches floats. A pair passes
``cos(a, b) >= tau_num / tau_den`` iff

    tau_den^2 * dot(a,b)^2  >=  tau_num^2 * |a|^2 * |b|^2

— all int64 (dot and the squared norms are integer by construction),
so the DuckDB oracle reproduces the decision bit-for-bit, the same
discipline as ngram_jaccard_pairs' integer threshold. int64 bounds:
safe while dot < 2^31/tau_den and |a|^2*|b|^2 < 2^63/tau_num^2 —
holding for count vectors whose squared norms stay under ~3e9/tau_num,
far above any per-entity basket this engine targets; past that, fold
with Python-int partials (the q_grouped_stats discipline).

Scale shape (mirrors ngram_jaccard_pairs): one keyed exchange on the
TERM builds the inverted index; each term-run emits its co-occurrence
pairs with the per-term dot CONTRIBUTION ``c_a * c_b`` by the
offset-sweep (max-run iterations of O(rows) numpy, no per-term
Python); one keyed exchange on the PAIR folds contributions and
applies the integer threshold. ``max_df`` caps posting lists (REQUIRED
at scale — a stopword-like term otherwise emits O(df^2) pairs);
default None = exact for oracle parity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

_N_PARTS = 64


def cosine_pairs_exact(
    tf: Dataset,
    id_col: str = "id",
    term_col: str = "term",
    count_col: str = "c",
    norm2_col: str = "n2",
    tau_num: int = 1,
    tau_den: int = 5,
    max_df: int | None = None,
) -> Dataset:
    """All pairs (id_a < id_b) with cosine >= tau_num/tau_den over the
    sparse count vectors given as ``(id, term, c, n2)`` rows (``n2`` =
    the row's vector's squared norm, replicated per term — carried
    through the index like ngram_jaccard's ``size``). Emits
    ``(id_a, id_b, dot, norm2_a, norm2_b)``, all int64."""
    from glue_etl_pipeline_ray.functions.groups import (
        grouped_apply_partitions,
    )
    from glue_etl_pipeline_ray.hashing import key_hash_u64

    tn2 = np.int64(tau_num) * np.int64(tau_num)
    td2 = np.int64(tau_den) * np.int64(tau_den)

    def contrib_partition(part: pa.Table) -> pa.Table:
        kh = key_hash_u64(part[term_col])
        ids = part[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        c = part[count_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n2 = part[norm2_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, kh))
        khs, ids, c, n2 = kh[order], ids[order], c[order], n2[order]
        starts = np.flatnonzero(np.r_[True, khs[1:] != khs[:-1]])
        ends = np.r_[starts[1:], len(khs)]
        run_len = ends - starts
        if max_df is not None:
            keep_run = run_len <= max_df
            keep_row = np.repeat(keep_run, run_len)
            khs, ids, c, n2 = (
                khs[keep_row],
                ids[keep_row],
                c[keep_row],
                n2[keep_row],
            )
            starts = (
                np.flatnonzero(np.r_[True, khs[1:] != khs[:-1]])
                if len(khs)
                else np.array([], np.int64)
            )
            ends = np.r_[starts[1:], len(ids)] if len(starts) else starts
            run_len = ends - starts
        row_end = (
            np.repeat(ends, run_len)
            if len(starts)
            else np.array([], np.int64)
        )
        idx = np.arange(len(ids))
        cols: list[list[np.ndarray]] = [[], [], [], [], []]
        k = 1
        while True:
            dst = idx + k
            ok = dst < row_end
            if not ok.any():
                break
            s_i, d_i = idx[ok], dst[ok]
            cols[0].append(ids[s_i])
            cols[1].append(ids[d_i])
            cols[2].append(c[s_i] * c[d_i])
            cols[3].append(n2[s_i])
            cols[4].append(n2[d_i])
            k += 1
        cat = (
            lambda xs: np.concatenate(xs) if xs else np.array([], np.int64)
        )
        return pa.table(
            {
                "id_a": pa.array(cat(cols[0]), pa.int64()),
                "id_b": pa.array(cat(cols[1]), pa.int64()),
                "contrib": pa.array(cat(cols[2]), pa.int64()),
                "norm2_a": pa.array(cat(cols[3]), pa.int64()),
                "norm2_b": pa.array(cat(cols[4]), pa.int64()),
            }
        )

    contribs = grouped_apply_partitions(
        tf, [term_col], contrib_partition, num_partitions=_N_PARTS
    )

    _EMPTY_PAIRS = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "dot": pa.array([], pa.int64()),
            "norm2_a": pa.array([], pa.int64()),
            "norm2_b": pa.array([], pa.int64()),
        }
    )

    def fold_pairs(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:  # empty hash partitions (schema probe)
            return _EMPTY_PAIRS
        a = part["id_a"].to_numpy(zero_copy_only=False)
        b = part["id_b"].to_numpy(zero_copy_only=False)
        ct = part["contrib"].to_numpy(zero_copy_only=False)
        na = part["norm2_a"].to_numpy(zero_copy_only=False)
        nb = part["norm2_b"].to_numpy(zero_copy_only=False)
        if len(a) and (
            max(a.max(), b.max()) >= (1 << 31) or min(a.min(), b.min()) < 0
        ):
            raise ValueError(
                "cosine_pairs_exact: ids must be in [0, 2^31) for the "
                "packed pair key"
            )
        key = (a << np.int64(32)) | b
        order = np.argsort(key, kind="stable")
        key_s, ct_s = key[order], ct[order]
        starts = np.flatnonzero(np.r_[True, key_s[1:] != key_s[:-1]])
        dot = np.add.reduceat(ct_s, starts)
        first = order[starts]
        a_u, b_u = a[first], b[first]
        na_u, nb_u = na[first], nb[first]
        keep = td2 * dot * dot >= tn2 * na_u * nb_u
        return pa.table(
            {
                "id_a": pa.array(a_u[keep], pa.int64()),
                "id_b": pa.array(b_u[keep], pa.int64()),
                "dot": pa.array(dot[keep], pa.int64()),
                "norm2_a": pa.array(na_u[keep], pa.int64()),
                "norm2_b": pa.array(nb_u[keep], pa.int64()),
            }
        )

    return grouped_apply_partitions(
        contribs, ["id_a", "id_b"], fold_pairs, num_partitions=_N_PARTS
    )


def tf_with_norms(
    ds: Dataset,
    id_col: str,
    term_col: str,
    num_partitions: int = 64,
) -> Dataset:
    """Build the ``(id, term, c, n2)`` sparse-vector rows from raw
    ``(id, term)`` occurrence rows: ONE keyed exchange on the id
    delivers every vector whole, so counts and the squared norm are
    computed together and n2 rides along into the index (no second
    aggregate, no norms join against an id-scale table)."""
    from glue_etl_pipeline_ray.functions.groups import (
        grouped_apply_partitions,
    )

    def per_partition(part: pa.Table) -> pa.Table:
        ids = part[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        terms = part[term_col].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        if len(ids) == 0:
            return pa.table(
                {
                    "id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                    "n2": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((terms, ids))
        ids, terms = ids[order], terms[order]
        first = np.r_[True, (ids[1:] != ids[:-1]) | (terms[1:] != terms[:-1])]
        starts = np.flatnonzero(first)
        c = np.diff(np.r_[starts, len(ids)])
        id_u, term_u = ids[starts], terms[starts]
        vec_starts = np.flatnonzero(np.r_[True, id_u[1:] != id_u[:-1]])
        n2_per_vec = np.add.reduceat(c * c, vec_starts)
        vec_len = np.diff(np.r_[vec_starts, len(id_u)])
        n2 = np.repeat(n2_per_vec, vec_len)
        return pa.table(
            {
                "id": pa.array(id_u, pa.int64()),
                "term": pa.array(term_u, pa.int64()),
                "c": pa.array(c, pa.int64()),
                "n2": pa.array(n2, pa.int64()),
            }
        )

    return grouped_apply_partitions(
        ds, [id_col], per_partition, num_partitions=num_partitions
    )
