"""Within-batch partial last-writer-wins reduce + bucket assignment.

The skew killer (SURVEY.md 7.4): LWW is a commutative, associative,
idempotent reduce on ``(key, seq)``, so each ``map_batches`` task first
collapses its block to at most ONE row per key (max ``seq``, tombstones
included) before the hash shuffle. A hot key with 10^6 updates in a block
ships exactly one row to the merge stage — the pre-aggregation analog of
"combine before groupby", which is why no explicit key salting is needed
for the upsert path: shuffle volume is bounded by distinct keys per
block, never by event count.

Bucket id is a process-stable hash of the key columns
(``hashing.key_hash_u64``); the same bucketing is reused by the sink
(one output file per bucket) so the shuffle key and the storage layout
agree across batches and runs.
"""

from __future__ import annotations

import pyarrow as pa

from glue_etl_pipeline_ray.hashing import bucket_of
from glue_etl_pipeline_ray.spec import TableSpec

BUCKET_COL = "__bucket"


def make_partial_lww(spec: TableSpec, num_buckets: int):
    key_cols = list(spec.key_cols)
    seq_col = spec.seq_col

    def partial_lww(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(BUCKET_COL, pa.array([], pa.int64()))
        import os

        # one task = one core: a 32-thread rayon pool per worker process
        # thrashes the node when 32 workers run (must be set before the
        # first polars import in this process)
        os.environ.setdefault("POLARS_MAX_THREADS", "1")
        import polars as pl

        df = pl.from_arrow(batch)
        # maintain_order on the SORT too: polars sorts are unstable by
        # default, so equal-(key, seq) rows with different payloads
        # would pick a nondeterministic survivor — diverging from the
        # raw exchange's stable lexsort (last input row wins) and
        # breaking byte-reproducibility between the two exchange modes
        df = df.sort(seq_col, maintain_order=True).unique(
            subset=key_cols, keep="last", maintain_order=True
        )
        out = df.to_arrow()
        # polars may emit large_string; normalize back to the event schema types
        out = out.cast(batch.schema)
        b = bucket_of(num_buckets, *(out[k] for k in key_cols))
        return out.append_column(BUCKET_COL, pa.array(b, pa.int64()))

    return partial_lww
