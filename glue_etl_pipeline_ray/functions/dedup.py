"""Deduplication operators over a documents table.

Five families, each expressed Ray-Data-first:

- **exact**: content-hash -> hash-partitioned groupby -> keep first
  (min id). The key-level generalization of the reference's file-level
  exact dedup look-up (``update_workflow_properties.py:141-151``, D1).
- **MinHash + LSH**: shingle -> minhash signature -> banded bucket
  groupby -> candidate pairs -> signature-agreement verify.
- **SimHash**: 64-bit simhash -> 16-bit band buckets -> hamming verify.
- **n-gram Jaccard (exact)**: inverted-index self-join on shingles;
  integer-only Jaccard threshold so the DuckDB oracle matches exactly.
- **embedding cosine near-dup**: see ``functions/similarity.py``.

Scale notes are inline; the common trick is that every candidate
generator is a groupby on a *content-derived* key (hash, band, shingle),
i.e. one all-to-all shuffle bounded by distinct keys, never an O(n^2)
cross join. Hot buckets are capped with ``max_df``-style guards
(logged, off by default at test scale).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from glue_etl_pipeline_ray.functions.groups import grouped_apply, grouped_first
from glue_etl_pipeline_ray.functions.text import hash_token

# ------------------------------------------------------------------ exact


def exact_dedup(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> Dataset:
    """Keep the min-id row per exact content (md5). One shuffle on the
    content hash; groups are tiny (true duplicates only)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5((t or "").encode("utf-8")).hexdigest()
            for t in batch[text_col].to_pylist()
        ]
        return batch.append_column("__fp", pa.array(fps, pa.string()))

    def keep_first(group: pa.Table) -> pa.Table:
        return group.sort_by(id_col).slice(0, 1)

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", batch_size=None)
    return grouped_apply(
        hashed, ["__fp"], keep_first, passthrough_singletons=True
    ).drop_columns(["__fp"])


# --------------------------------------------------- sub-document exact


def segment_dedup(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_tokens: int = 16,
) -> Dataset:
    """Sub-document exact dedup with span REMOVAL (the cut step of the
    ExactSubstr discipline, at fixed-token-segment granularity): split
    each document into ``seg_tokens``-token segments, keep the
    corpus-wide FIRST occurrence of each distinct segment
    (deterministic: min ``(id, seg_idx)``), and reassemble documents
    from their surviving segments in order. Documents whose every
    segment is a duplicate disappear; ``substring_dup_stats`` is the
    tag-only companion.

    Plan: one vectorized explode (Arrow split -> segment-boundary
    offsets -> ``binary_join``; no per-token Python), one exact groupby
    on the segment text (distinct-segment-bounded shuffle), one
    groupby back on the document id to reassemble. Two segment-volume
    exchanges are the floor for a global-first contract."""
    import pyarrow.compute as pc

    def explode(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(pc.fill_null(col, ""), " ")
        off = np.asarray(toks.offsets, dtype=np.int64)
        base = off[0]  # a sliced batch's offsets need not start at 0
        n_tok = np.diff(off)
        n_seg = np.maximum(-(-n_tok // seg_tokens), 1)
        total = int(n_seg.sum())
        doc_rep = np.repeat(np.arange(len(n_seg)), n_seg)
        intra = np.arange(total) - np.repeat(np.cumsum(n_seg) - n_seg, n_seg)
        ends = np.minimum(
            off[:-1][doc_rep] + (intra + 1) * seg_tokens, off[1:][doc_rep]
        )
        offsets = pa.array(
            np.concatenate(([base], ends)) - base, pa.int32()
        )
        flat = toks.values if base == 0 else toks.values.slice(base)
        segs = pc.binary_join(pa.ListArray.from_arrays(offsets, flat), " ")
        ids = batch[id_col].to_numpy(zero_copy_only=False)[doc_rep]
        return pa.table(
            {
                id_col: pa.array(ids),
                "seg_idx": pa.array(intra, pa.int64()),
                "__seg": segs,
            }
        )

    def keep_first(group: pa.Table) -> pa.Table:
        return group.sort_by([(id_col, "ascending"), ("seg_idx", "ascending")]).slice(0, 1)

    def reassemble(group: pa.Table) -> pa.Table:
        g = group.sort_by("seg_idx")
        return pa.table(
            {
                id_col: g[id_col].slice(0, 1),
                text_col: pa.array(
                    [" ".join(g["__seg"].to_pylist())], pa.string()
                ),
            }
        )

    segs = ds.map_batches(explode, batch_format="pyarrow", batch_size=None)
    kept = grouped_apply(
        segs, ["__seg"], keep_first, passthrough_singletons=True
    )
    return grouped_apply(kept, [id_col], reassemble)


# ------------------------------------------------------------- shingling


def _shingle_hashes(text: str, n: int) -> np.ndarray:
    import pandas as pd

    toks = (text or "").split(" ")
    if len(toks) < n:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    # vectorized SipHash (process-stable) — a per-byte python FNV loop here
    # was the minhash/simhash hot spot
    return np.unique(pd.util.hash_array(np.array(grams, dtype=object), categorize=False))


# ------------------------------------------------------------- MinHash+LSH


class MinHashFn:
    """Actor-pool stage: permutation parameters built once per actor
    (``__init__``), signatures per batch. Emits one row per (doc, band):
    ``(doc_id, band_id, band_hash)`` ready for the LSH bucket groupby."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        n_perm: int = 128,
        n_bands: int = 16,
        shingle_n: int = 3,
        seed: int = 42,
    ):
        assert n_perm % n_bands == 0
        rng = np.random.default_rng(seed)
        self.a = (rng.integers(1, 1 << 62, n_perm, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
        self.b = rng.integers(0, 1 << 62, n_perm, dtype=np.uint64)
        self.text_col, self.id_col = text_col, id_col
        self.n_perm, self.n_bands, self.shingle_n = n_perm, n_bands, shingle_n
        self.rows_per_band = n_perm // n_bands

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(text, self.shingle_n)
        # multiply-shift family mod 2^64 (uint64 wraparound is the mod)
        return (self.a[:, None] * h[None, :] + self.b[:, None]).min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        doc_ids = np.asarray(batch[self.id_col].to_pylist(), np.int64)
        n = len(texts)
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "band_id": pa.array([], pa.int64()),
                    "band_hash": pa.array([], pa.int64()),
                    "sig": pa.array([], pa.binary()),
                }
            )
        # one (n_perm x total_shingles) multiply-shift + reduceat per batch
        # instead of a python loop per document
        shingle_sets = [_shingle_hashes(t, self.shingle_n) for t in texts]
        starts = np.cumsum([0] + [len(s) for s in shingle_sets[:-1]])
        h_all = np.concatenate(shingle_sets)
        with np.errstate(over="ignore"):
            vals = self.a[:, None] * h_all[None, :] + self.b[:, None]
            sig_mat = np.minimum.reduceat(vals, starts, axis=1)  # (P, n_docs)
            # band hashes, vectorized over (bands x docs): fold the band's
            # rows with a golden-ratio multiply-xor (replaces an md5 call
            # per (doc, band) — the round-1 hot spot), then mix the band
            # id in so equal chunks in different bands can't collide
            B, R = self.n_bands, self.rows_per_band
            bands_mat = sig_mat.reshape(B, R, n)
            mult = np.uint64(0x9E3779B97F4A7C15)
            bh = bands_mat[:, 0, :].copy()
            for r in range(1, R):
                bh = (bh * mult) ^ bands_mat[:, r, :]
            bh ^= np.arange(B, dtype=np.uint64)[:, None] * mult
        sig_t = np.ascontiguousarray(sig_mat.T)  # (n_docs, P)
        sig_bytes = [sig_t[d].tobytes() for d in range(n)]
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(doc_ids, B), pa.int64()),
                "band_id": pa.array(np.tile(np.arange(B, dtype=np.int64), n)),
                "band_hash": pa.array(
                    np.ascontiguousarray(bh.T).ravel().view(np.int64)
                ),
                "sig": pa.array(
                    [s for s in sig_bytes for _ in range(B)], pa.binary()
                ),
            }
        )


def minhash_lsh_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 128,
    n_bands: int = 16,
    shingle_n: int = 3,
    min_agree_num: int = 1,
    min_agree_den: int = 2,
    max_bucket: int = 1000,
    concurrency: int = 4,
    batch_size: int = 256,
) -> Dataset:
    """Near-dup candidate pairs with signature-agreement verification.

    Returns ``(doc_id_a, doc_id_b, n_agree, n_perm)`` for pairs sharing
    >= 1 LSH band whose signatures agree on >= min_agree_num/min_agree_den
    of the permutations (integer threshold — deterministic).

    Scale: the only shuffle is groupby(band_id, band_hash); buckets
    larger than ``max_bucket`` are skipped (hot-bucket guard — a bucket
    that big means a boilerplate shingle, not real duplication).
    Signatures ride along as binary so verification happens inside the
    bucket group — no second join.
    """
    sig_ds = ds.map_batches(
        MinHashFn,
        fn_constructor_kwargs=dict(
            text_col=text_col, id_col=id_col, n_perm=n_perm,
            n_bands=n_bands, shingle_n=shingle_n,
        ),
        batch_format="pyarrow",
        # bounded batches: one giant input block must not serialize the
        # whole corpus through a single actor
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_pylist()
        if len(ids) < 2 or len(ids) > max_bucket:
            return _EMPTY_PAIRS
        sigs = [np.frombuffer(s, dtype=np.uint64) for s in group["sig"].to_pylist()]
        order = np.argsort(ids)
        a_out, b_out, agree = [], [], []
        for i in range(len(order)):
            for j in range(i + 1, len(order)):
                ii, jj = order[i], order[j]
                if ids[ii] == ids[jj]:
                    continue
                n_ag = int((sigs[ii] == sigs[jj]).sum())
                if n_ag * min_agree_den >= min_agree_num * n_perm:
                    a_out.append(ids[ii])
                    b_out.append(ids[jj])
                    agree.append(n_ag)
        return pa.table(
            {
                "doc_id_a": pa.array(a_out, pa.int64()),
                "doc_id_b": pa.array(b_out, pa.int64()),
                "n_agree": pa.array(agree, pa.int64()),
            }
        )

    # the banded signature table is shingle-exploded (docs x bands rows
    # of binary sigs) — the streaming sort-shuffle pipelines the band
    # map straight into the exchange, while auto/raycore would first
    # materialize the whole exploded intermediate (measured ~20% slower
    # at sf0.1 and linearly worse with scale)
    pairs = grouped_apply(
        sig_ds,
        ["band_id", "band_hash"],
        bucket_pairs,
        min_group_size=2,
        exchange="sort",
    )
    # a pair can collide in several bands -> distinct
    return grouped_first(pairs, ["doc_id_a", "doc_id_b", "n_agree"])


_EMPTY_PAIRS = pa.table(
    {
        "doc_id_a": pa.array([], pa.int64()),
        "doc_id_b": pa.array([], pa.int64()),
        "n_agree": pa.array([], pa.int64()),
    }
)


# --------------------------------------------------------------- SimHash


def simhash64_batch(texts: list, n: int = 2) -> np.ndarray:
    """Vectorized 64-bit simhash for a whole batch: one bit-unpack of all
    shingle hashes + one ``reduceat`` for the per-doc majority votes + one
    shift-sum bit-pack — no per-document Python (round-1 ran a 64-step
    bit loop per doc). ``_shingle_hashes`` always returns >= 1 hash, so
    the reduceat segments are non-empty."""
    sets = [_shingle_hashes(t, n) for t in texts]
    counts = np.array([len(s) for s in sets], np.int64)
    h_all = np.concatenate(sets) if sets else np.array([], np.uint64)
    bits = (
        (h_all[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    ).astype(np.int64)  # (total_shingles, 64)
    starts = np.cumsum([0] + counts[:-1].tolist())
    votes = np.add.reduceat(bits, starts, axis=0) if len(h_all) else np.zeros(
        (0, 64), np.int64
    )
    maj = votes * 2 > counts[:, None]
    return (
        maj.astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]
    ).sum(axis=1, dtype=np.uint64)


def simhash64(text: str, n: int = 2) -> int:
    return int(simhash64_batch([text], n)[0])


def simhash_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    shingle_n: int = 2,
) -> Dataset:
    """Near-dup pairs by SimHash: 4x16-bit band buckets (any pair within
    hamming distance 3 of a 64-bit simhash shares at least one exact
    16-bit quarter — pigeonhole), verified exactly inside the bucket.

    The 4-band scheme guarantees candidate recall only for
    ``max_hamming <= 3``: at distance 4 the differing bits can land one
    per quarter and the pair never shares a band. Larger thresholds
    need more/narrower bands, so they are rejected rather than
    silently losing recall."""
    if max_hamming > 3:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the 4x16-bit banding's "
            "recall guarantee (<= 3); use more bands for larger radii"
        )

    def add_sim(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), np.int64)
        sims = simhash64_batch(batch[text_col].to_pylist(), shingle_n)
        n = len(ids)
        shifts = np.uint64(16) * np.arange(4, dtype=np.uint64)
        keys = ((sims[:, None] >> shifts[None, :]) & np.uint64(0xFFFF)).astype(
            np.int64
        )
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, 4), pa.int64()),
                "band_id": pa.array(np.tile(np.arange(4, dtype=np.int64), n)),
                "band_key": pa.array(keys.ravel(), pa.int64()),
                "simhash": pa.array(np.repeat(sims, 4), pa.uint64()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_pylist()
        sims = group["simhash"].to_pylist()
        uniq = sorted(set(zip(ids, sims)))
        a_out, b_out, ham = [], [], []
        for i in range(len(uniq)):
            for j in range(i + 1, len(uniq)):
                d = bin(uniq[i][1] ^ uniq[j][1]).count("1")
                if d <= max_hamming:
                    a_out.append(uniq[i][0])
                    b_out.append(uniq[j][0])
                    ham.append(d)
        return pa.table(
            {
                "doc_id_a": pa.array(a_out, pa.int64()),
                "doc_id_b": pa.array(b_out, pa.int64()),
                "hamming": pa.array(ham, pa.int64()),
            }
        )

    simmed = ds.map_batches(add_sim, batch_format="pyarrow", batch_size=None)
    pairs = grouped_apply(
        simmed, ["band_id", "band_key"], bucket_pairs, min_group_size=2
    )
    return grouped_first(pairs, ["doc_id_a", "doc_id_b", "hamming"])


# ------------------------------------------------- exact n-gram Jaccard


def ngram_jaccard_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    tau_num: int = 4,
    tau_den: int = 5,
    max_df: int | None = None,
) -> Dataset:
    """EXACT Jaccard >= tau_num/tau_den pairs via an inverted-index
    self-join: explode distinct shingles, groupby(shingle) emits co-occur
    pairs, groupby(pair) counts the intersection, and the integer
    threshold ``tau_den*inter >= tau_num*(size_a+size_b-inter)`` decides.
    All-integer -> the DuckDB oracle reproduces it bit-for-bit.

    ``max_df`` drops shingles occurring in more than max_df docs (the
    classic posting-list cap; REQUIRED at scale — a stopword shingle
    otherwise emits O(df^2) pairs). Default None = exact, for oracle
    parity at test scale.
    """

    def explode(batch: pa.Table) -> pa.Table:
        ids, grams, sizes = [], [], []
        for doc_id, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            toks = (text or "").split(" ")
            if len(toks) < shingle_n:
                sh = {" ".join(toks)}
            else:
                sh = {
                    " ".join(toks[i : i + shingle_n])
                    for i in range(len(toks) - shingle_n + 1)
                }
            for g in sorted(sh):
                ids.append(doc_id)
                grams.append(g)
                sizes.append(len(sh))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "shingle": pa.array(grams, pa.string()),
                "size": pa.array(sizes, pa.int64()),
            }
        )

    from glue_etl_pipeline_ray.hashing import key_hash_u64

    n_parts = 64

    def add_shingle_part(batch: pa.Table) -> pa.Table:
        h = key_hash_u64(batch["shingle"])
        return batch.append_column(
            "__part", pa.array((h % np.uint64(n_parts)).astype(np.int64))
        )

    def co_pairs_partition(part: pa.Table) -> pa.Table:
        """All co-occurrence pairs for every shingle-run in this partition,
        vectorized: rows sorted by (shingle-hash, doc_id); sweep offset k
        emitting (row, row+k) while both land in the same run — max-run
        iterations of O(rows) numpy work, no per-shingle Python."""
        kh = key_hash_u64(part["shingle"])
        doc = part["doc_id"].to_numpy(zero_copy_only=False)
        size = part["size"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, kh))
        khs, docs, sizes = kh[order], doc[order], size[order]
        starts = np.flatnonzero(np.r_[True, khs[1:] != khs[:-1]])
        ends = np.r_[starts[1:], len(khs)]
        run_len = ends - starts
        if max_df is not None:  # posting-list cap: mask out hot shingles
            keep_run = run_len <= max_df
            keep_row = np.repeat(keep_run, run_len)
            docs, sizes = docs[keep_row], sizes[keep_row]
            starts = np.flatnonzero(
                np.r_[True, khs[keep_row][1:] != khs[keep_row][:-1]]
            ) if keep_row.any() else np.array([], np.int64)
            ends = np.r_[starts[1:], len(docs)] if len(starts) else starts
            run_len = ends - starts
        row_end = np.repeat(ends, run_len) if len(starts) else np.array([], np.int64)
        idx = np.arange(len(docs))
        out_a, out_b, out_sa, out_sb = [], [], [], []
        k = 1
        while True:
            dst = idx + k
            ok = dst < row_end
            if not ok.any():
                break
            s_i, d_i = idx[ok], dst[ok]
            out_a.append(docs[s_i])
            out_b.append(docs[d_i])
            out_sa.append(sizes[s_i])
            out_sb.append(sizes[d_i])
            k += 1
        cat = (lambda xs: np.concatenate(xs) if xs else np.array([], np.int64))
        return pa.table(
            {
                "doc_id_a": pa.array(cat(out_a), pa.int64()),
                "doc_id_b": pa.array(cat(out_b), pa.int64()),
                "size_a": pa.array(cat(out_sa), pa.int64()),
                "size_b": pa.array(cat(out_sb), pa.int64()),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow", batch_size=None)
    pairs = (
        exploded.map_batches(add_shingle_part, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(co_pairs_partition, batch_format="pyarrow")
    )

    # count shared shingles per pair + threshold, fully vectorized per
    # hash-partition (a Dataset.groupby().aggregate() here costs ~10x the
    # work at 10^6 candidate pairs: one Ray group per distinct pair)
    def add_part(batch: pa.Table) -> pa.Table:
        h = key_hash_u64(batch["doc_id_a"], batch["doc_id_b"])
        return batch.append_column(
            "__part", pa.array((h % np.uint64(n_parts)).astype(np.int64))
        )

    def count_and_threshold(part: pa.Table) -> pa.Table:
        kh = key_hash_u64(part["doc_id_a"], part["doc_id_b"])
        order = np.argsort(kh, kind="stable")
        khs = kh[order]
        starts = np.flatnonzero(np.r_[True, khs[1:] != khs[:-1]])
        ends = np.r_[starts[1:], len(khs)]
        inter = (ends - starts).astype(np.int64)
        first = order[starts]
        a = part["doc_id_a"].to_numpy(zero_copy_only=False)[first]
        b = part["doc_id_b"].to_numpy(zero_copy_only=False)[first]
        sa = part["size_a"].to_numpy(zero_copy_only=False)[first]
        sb = part["size_b"].to_numpy(zero_copy_only=False)[first]
        union = sa + sb - inter
        keep = tau_den * inter >= tau_num * union
        return pa.table(
            {
                "doc_id_a": pa.array(a[keep], pa.int64()),
                "doc_id_b": pa.array(b[keep], pa.int64()),
                "size_a": pa.array(sa[keep], pa.int64()),
                "size_b": pa.array(sb[keep], pa.int64()),
                "inter": pa.array(inter[keep], pa.int64()),
            }
        )

    return (
        pairs.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(count_and_threshold, batch_format="pyarrow")
    )


def _char_window_hashes(
    texts: list, window: int, stride: int
) -> tuple[np.ndarray, np.ndarray]:
    """Unique char-window fingerprints per doc, hashed in ONE vectorized
    call for the whole batch. Returns (hashes, per_doc_lens).

    Window offsets are 0, stride, 2*stride, ... plus one final window
    ending exactly at len(text), so every character is covered; docs
    shorter than ``window`` contribute themselves as one window."""
    import pandas as pd

    grams: list[str] = []
    lens = np.zeros(len(texts), np.int64)
    for i, s in enumerate(texts):
        s = s or ""
        if len(s) <= window:
            ws = {s}
        else:
            ws = {s[off : off + window] for off in range(0, len(s) - window, stride)}
            ws.add(s[len(s) - window :])
        grams.extend(ws)
        lens[i] = len(ws)
    if not grams:
        return np.array([], np.uint64), lens
    h = pd.util.hash_array(np.array(grams, dtype=object), categorize=False)
    return h, lens


def substring_dup_stats(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 40,
    stride: int = 20,
    n_parts: int = 64,
) -> Dataset:
    """Substring-level duplication tagging (the practical stand-in for
    suffix-array ExactSubstr dedup, Lee et al. 2022 arXiv:2107.06499):
    a char window appearing in MORE THAN ONE document marks both docs'
    spans as duplicated. Detects any cross-doc duplicated substring of
    length >= window + stride - 1 (a span that long must contain a
    sampled window in both docs); shorter overlaps may be missed —
    the stride is the recall/cost dial, documented honestly.

    Plan (two scans, one bounded exchange, no window-level join):
    1. per-batch: unique window fingerprints per doc, hashed in one
       vectorized call; partials (fp, n_docs-in-block) compress before
       ONE hash-partition count (vocab_topk shape);
    2. fingerprints with doc-count >= 2 are assembled sorted in the
       object store (size = distinct DUPLICATED windows only) and
       broadcast; a second shuffle-free scan re-derives each doc's
       windows and counts membership.

    Output: (id_col, n_windows, n_dup_windows, has_dup_span).
    """
    import ray

    from glue_etl_pipeline_ray.hashing import key_hash_u64  # noqa: F401

    def fp_partials(t: pa.Table) -> pa.Table:
        h, lens = _char_window_hashes(
            t[text_col].to_pylist(), window, stride
        )
        # per-block doc-count per fp (each doc contributes each fp once)
        u, c = np.unique(h, return_counts=True)
        return pa.table(
            {
                "fp": pa.array(u, pa.uint64()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
                "__part": pa.array(
                    (u % np.uint64(n_parts)).astype(np.int64)
                ),
            }
        )

    def dup_fps(g: pa.Table) -> pa.Table:
        fp = g["fp"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(fp)
        fp, n = fp[order], n[order]
        starts = np.flatnonzero(np.r_[True, fp[1:] != fp[:-1]])
        totals = np.add.reduceat(n, starts)
        keep = totals >= 2
        return pa.table({"fp": pa.array(fp[starts][keep], pa.uint64())})

    dups = (
        ds.map_batches(fp_partials, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(dup_fps, batch_format="pyarrow")
    )

    @ray.remote
    def assemble(*tables: pa.Table) -> np.ndarray:
        tabs = [t for t in tables if "fp" in t.schema.names and t.num_rows]
        if not tabs:
            return np.array([], np.uint64)
        return np.sort(
            pa.concat_tables(tabs)["fp"].to_numpy(zero_copy_only=False)
        )

    dup_ref = assemble.remote(*dups.to_arrow_refs())

    def tag(t: pa.Table) -> pa.Table:
        dd = ray.get(dup_ref)
        h, lens = _char_window_hashes(
            t[text_col].to_pylist(), window, stride
        )
        if len(dd) and len(h):
            pos = np.searchsorted(dd, h)
            pos[pos == len(dd)] = 0
            hit = (dd[pos] == h).astype(np.int64)
        else:
            hit = np.zeros(len(h), np.int64)
        ends = np.cumsum(lens)
        starts = ends - lens
        n_dup = np.zeros(len(lens), np.int64)
        nz = lens > 0
        if nz.any() and len(hit):
            n_dup[nz] = np.add.reduceat(hit, starts[nz])
        return pa.table(
            {
                id_col: t[id_col],
                "n_windows": pa.array(lens, pa.int64()),
                "n_dup_windows": pa.array(n_dup, pa.int64()),
                "has_dup_span": pa.array(n_dup > 0),
            }
        )

    return ds.map_batches(tag, batch_format="pyarrow", batch_size=None)


# ------------------------------------------- generic 64-bit hamming join


def hamming_pairs(
    ds: Dataset,
    hash_col: str,
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> Dataset:
    """Near-dup pairs over ANY precomputed 64-bit hash column (pHash,
    simhash, audio fingerprints, ...): the same 4x16-bit pigeonhole
    banding as ``simhash_pairs`` — any pair within hamming distance 3
    shares at least one exact 16-bit quarter — exact-verified inside
    each band bucket. One keyed exchange over 4 rows/doc; per-bucket
    work is |bucket|^2 on 16-bit-equal candidates only.

    Rows with a null hash (e.g. decode dead-letters upstream) are
    skipped, mirroring the everything-lands-somewhere discipline: they
    stay in their producer's error channel, never in the pair graph."""
    if max_hamming > 3:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the 4x16-bit banding's "
            "recall guarantee (<= 3); use more bands for larger radii"
        )

    def add_bands(batch: pa.Table) -> pa.Table:
        mask = pc.is_valid(batch[hash_col])
        batch = batch.filter(mask)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hashes = (
            batch[hash_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        n = len(ids)
        shifts = np.uint64(16) * np.arange(4, dtype=np.uint64)
        keys = (
            (hashes[:, None] >> shifts[None, :]) & np.uint64(0xFFFF)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, 4), pa.int64()),
                "band_id": pa.array(np.tile(np.arange(4, dtype=np.int64), n)),
                "band_key": pa.array(keys.ravel(), pa.int64()),
                "hash64": pa.array(np.repeat(hashes, 4), pa.uint64()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        uniq = sorted(
            set(zip(group["doc_id"].to_pylist(), group["hash64"].to_pylist()))
        )
        a_out, b_out, ham = [], [], []
        for i in range(len(uniq)):
            for j in range(i + 1, len(uniq)):
                d = bin(uniq[i][1] ^ uniq[j][1]).count("1")
                if d <= max_hamming:
                    a_out.append(uniq[i][0])
                    b_out.append(uniq[j][0])
                    ham.append(d)
        return pa.table(
            {
                "doc_id_a": pa.array(a_out, pa.int64()),
                "doc_id_b": pa.array(b_out, pa.int64()),
                "hamming": pa.array(ham, pa.int64()),
            }
        )

    banded = ds.map_batches(add_bands, batch_format="pyarrow", batch_size=None)
    pairs = grouped_apply(
        banded, ["band_id", "band_key"], bucket_pairs, min_group_size=2
    )
    return grouped_first(pairs, ["doc_id_a", "doc_id_b", "hamming"])
