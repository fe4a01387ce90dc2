"""Deterministic hashing: key -> bucket assignment and canonical table sha256.

Bucket assignment must be stable across *processes and runs* (resume reads
bucket files written by an earlier run), so Python's salted ``hash()`` is
banned. We use pandas' SipHash-1-3 (``pandas.util.hash_array``) which is
keyed by a fixed default key and therefore process-stable, and vectorized.

The canonical sha256 is the engine's correctness oracle target
(BASELINE.json metric: "final-state sha256 equality"): hash of the live
table sorted by key, columns in canonical order, with an unambiguous
serialization (field sep 0x1f, row sep 0x1e, null sentinel 0x00+"NULL").
Strict upgrade over the reference's shape-only e2e oracle
(``test/end_to_end_tests/run_e2e_test.py:102-116``, SURVEY.md B3).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_SEP = "\x1f"
_ROW = "\x1e"
_NULL = "\x00NULL"


def key_hash_u64(*cols: pa.Array | pa.ChunkedArray | np.ndarray) -> np.ndarray:
    """Vectorized stable uint64 hash of the key columns.

    Per-column SipHash (pandas) mixed with a golden-ratio multiply —
    no row-wise string concatenation (the naive join was the hot spot
    of every map task). Stable across processes/runs; collision odds
    within a 32k-row chunk ~1e-11 (and the merge stage re-checks
    nothing: a collision would conflate two keys, which at 10^10 events
    is ~1e-5 end-to-end — accepted and documented)."""
    h: np.ndarray | None = None
    mult = np.uint64(0x9E3779B97F4A7C15)
    for c in cols:
        if isinstance(c, (pa.Array, pa.ChunkedArray)):
            c = c.to_numpy(zero_copy_only=False)
        hc = pd.util.hash_array(np.asarray(c, dtype=object), categorize=False)
        with np.errstate(over="ignore"):
            h = hc if h is None else (h * mult) ^ hc
    return h


def bucket_of(num_buckets: int, *cols) -> np.ndarray:
    return (key_hash_u64(*cols) % np.uint64(num_buckets)).astype(np.int64)


def _col_to_str(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_nested(t):
        # nested list/struct columns: canonical sorted-key JSON per value
        # (both the engine and the python oracle route through this exact
        # function, so the serialization only needs to be deterministic)
        import json

        return pa.array(
            [
                _NULL if v is None else json.dumps(
                    v, sort_keys=True, separators=(",", ":"), default=str
                )
                for v in col.to_pylist()
            ],
            pa.string(),
        )
    if pa.types.is_boolean(t):
        col = pc.if_else(col, "true", "false")
    elif pa.types.is_timestamp(t):
        col = pc.strftime(col, format="%Y-%m-%dT%H:%M:%S.%f")
    elif pa.types.is_floating(t):
        # fixed formatting so the oracle (python) and engine agree
        col = pa.array(
            [None if v is None else format(v, ".10g") for v in col.to_pylist()],
            pa.string(),
        )
    elif not pa.types.is_string(t) and not pa.types.is_large_string(t):
        col = pc.cast(col, pa.string())
    return pc.fill_null(pc.cast(col, pa.string()), _NULL)


def canonical_bytes(table: pa.Table, key_cols: list[str] | tuple[str, ...]) -> bytes:
    """Serialize a table deterministically: sort by key, join cols/rows."""
    if table.num_rows == 0:
        return b""
    table = table.sort_by([(k, "ascending") for k in key_cols])
    str_cols = [_col_to_str(table[name]) for name in table.column_names]
    joined = str_cols[0]
    for c in str_cols[1:]:
        joined = pc.binary_join_element_wise(joined, c, _SEP)
    return (_ROW.join(joined.to_pylist()) + _ROW).encode("utf-8")


def table_sha256(table: pa.Table, key_cols) -> str:
    return hashlib.sha256(canonical_bytes(table, key_cols)).hexdigest()


def combine_bucket_hashes(bucket_hashes: dict[int, str]) -> str:
    """Full-table digest from per-bucket digests, in bucket order.

    Buckets partition the key space and rows are key-sorted within a
    bucket... but bucket id is a *hash* of the key, so concatenating
    bucket digests in bucket-id order is NOT the same as hashing the
    globally key-sorted table. This combined digest is therefore a fast
    engine-internal fingerprint; oracle comparison uses
    :func:`table_sha256` over the assembled live table.
    """
    h = hashlib.sha256()
    for b in sorted(bucket_hashes):
        h.update(f"{b}:{bucket_hashes[b]};".encode())
    return h.hexdigest()
