"""Vectorized Bloom filter over stable uint64 key hashes.

The scale companion to the bucketed anti/semi joins: the build side is
compressed into a ~100 KB bit array (built distributed as per-block
partial filters, OR-merged — a tree reduce at real scale), broadcast
once via ``ray.put``, and each probe batch is classified with one
vectorized membership test:

- "definitely absent" rows (no false negatives) can be emitted directly
  by an anti-join or dropped by a semi-join — no shuffle for them;
- only the "maybe present" residual — |build-distinct| + fp-rate *
  |probe| rows instead of the whole probe side — goes through the exact
  hash-partitioned join.

Double hashing (Kirsch-Mitzenmacher): k indices derived from two
64-bit hashes; all membership math is numpy over the whole batch.
"""

from __future__ import annotations

import numpy as np

_MIX = np.uint64(0xFF51AFD7ED558CCD)


class BloomFilter:
    __slots__ = ("m", "k", "bits")

    def __init__(self, expected_items: int, fp_rate: float = 0.01):
        expected_items = max(1, expected_items)
        # m = -n ln p / (ln 2)^2, k = (m/n) ln 2
        m = int(-expected_items * np.log(fp_rate) / (np.log(2) ** 2))
        self.m = max(64, m)
        self.k = max(1, int(round(self.m / expected_items * np.log(2))))
        self.bits = np.zeros(self.m, dtype=bool)

    def _indices(self, h: np.ndarray) -> np.ndarray:
        h = h.astype(np.uint64, copy=False)
        with np.errstate(over="ignore"):
            h2 = (h * _MIX) | np.uint64(1)
            idx = (
                h[:, None]
                + np.arange(self.k, dtype=np.uint64)[None, :] * h2[:, None]
            ) % np.uint64(self.m)
        return idx.astype(np.int64)

    def add_hashes(self, h: np.ndarray) -> None:
        if len(h):
            self.bits[self._indices(h).ravel()] = True

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        """Boolean mask: False = definitely absent; True = maybe present."""
        if not len(h):
            return np.zeros(0, dtype=bool)
        return self.bits[self._indices(h)].all(axis=1)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m == other.m and self.k == other.k
        self.bits |= other.bits
        return self

    @property
    def nbytes(self) -> int:
        return self.m // 8


def bloom_from_dataset(
    ds,
    key_cols: list[str],
    expected_items: int,
    fp_rate: float = 0.01,
    combine_parts: int = 32,
) -> BloomFilter:
    """Build a filter over a Dataset's keys: per-block partial filters
    (packed bits) OR-merged through one bounded tree-combine level —
    ``combine_parts`` parallel tasks each fold their share of the block
    partials, so the driver ORs at most ``combine_parts`` bitmaps
    instead of one per block (at 10^9 expected items a partial is
    ~1.2 GB; a driver loop over thousands of those would serialize the
    whole build). The driver only ever holds m-bit arrays, never keys."""
    import pyarrow as pa

    from glue_etl_pipeline_ray.hashing import key_hash_u64

    proto = BloomFilter(expected_items, fp_rate)
    m = proto.m
    nbytes = (m + 7) // 8

    def partial(t: pa.Table) -> pa.Table:
        bf = BloomFilter(expected_items, fp_rate)
        bf.add_hashes(key_hash_u64(*(t[c] for c in key_cols)))
        return pa.table({"bits": pa.array([np.packbits(bf.bits).tobytes()])})

    def or_rows(t: pa.Table) -> pa.Table:
        acc = np.zeros(nbytes, np.uint8)
        for buf in t["bits"]:
            np.bitwise_or(
                acc, np.frombuffer(buf.as_py(), dtype=np.uint8), out=acc
            )
        return pa.table({"bits": pa.array([acc.tobytes()])})

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .repartition(combine_parts)
        .map_batches(or_rows, batch_format="pyarrow", batch_size=None)
    )
    packed = np.zeros(nbytes, np.uint8)
    for row in out.iter_rows():  # <= combine_parts rows by construction
        np.bitwise_or(
            packed, np.frombuffer(row["bits"], dtype=np.uint8), out=packed
        )
    proto.bits = np.unpackbits(packed, count=m).astype(bool)
    return proto
