"""Downstream replication driven by the change data feed.

``replicate(src, dst, staging_dir)`` ships the NET row-level changes
since the destination's committed watermark into a second
:class:`ReplayEngine` lake as ordinary CDC event batches — the CDC
fan-out pattern: one upstream lake, any number of downstream replicas
(different bucket counts, different placement, different retention),
each pulling O(changes since last sync), never O(state).

Correctness story: the change feed is a COMPLETE delta — replaying only
the feed on top of the destination's previous state reproduces the
source's live table exactly (sha256-tested, including through schema
evolution and deletes). Exactly-once falls out of existing machinery on
both sides: the destination's batch ids ARE source batch ids, so its
commit gate skips an already-applied sync, and a replicate that crashes
after staging but before commit is finished by the next call (the
staged batch is still there; ``replay`` picks up whatever is
uncommitted). Staged batch files are written once per sync with
deterministic names — re-staging the same sync overwrites with
identical content.

Scale shape: the feed is one diff task per bucket (no shuffle), the
event transform is a vectorized ``map_batches``, and the write streams
— the driver never holds data rows. The destination replays the staged
batch with its own exchange/merge pipeline, so a replica with a
different ``num_buckets`` re-partitions naturally.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc

from glue_etl_pipeline_ray.stages.merge import CHANGE_TYPE_COL

_OP_BY_CHANGE = {"insert": "INSERT", "update": "UPDATE", "delete": "DELETE"}


def changes_to_events(changes: pa.Table, seq: int) -> pa.Table:
    """One CDF slice -> CDC event rows: ``_change_type`` becomes ``op``,
    every row gets the sync's sequence number (net-per-key feeds carry at
    most one row per key per sync, so a single seq per sync preserves
    LWW order across syncs)."""
    ct = changes[CHANGE_TYPE_COL]
    op = pc.case_when(
        pc.make_struct(
            pc.equal(ct, "insert"),
            pc.equal(ct, "update"),
            pc.equal(ct, "delete"),
        ),
        "INSERT",
        "UPDATE",
        "DELETE",
    )
    out = changes.drop_columns([CHANGE_TYPE_COL])
    out = out.append_column("op", op)
    return out.append_column(
        "seq", pa.array([seq] * changes.num_rows, pa.int64())
    )


def replicate(src, dst, staging_dir: str) -> dict:
    """Sync ``dst`` up to ``src``'s committed watermark. Returns the
    destination replay summary (``applied_batches`` empty on no-op).
    Requires the source to retain history (``gc_old_versions=False``)."""
    target = src.ckpt.watermark
    from_b = dst.ckpt.watermark
    if target <= from_b:
        return {"applied_batches": [], "skipped_committed": [], "summaries": []}
    if not dst.ckpt.is_committed(target):
        feed = src.changes_dataset(from_b, target)
        batch_dir = os.path.join(staging_dir, f"batch={target:05d}")
        # a sync that crashed between staging and commit restages from
        # scratch — same content, but a fresh dir so a partial or
        # completed earlier attempt can't leave duplicate files behind
        shutil.rmtree(batch_dir, ignore_errors=True)
        feed.map_batches(
            lambda t: changes_to_events(t, seq=target),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).write_parquet(batch_dir)
    summary = dst.replay(staging_dir)
    # GC staged syncs the replica has durably committed (keep the one in
    # flight; a crash before this point just leaves them for next time)
    import glob
    import re

    for d in glob.glob(os.path.join(staging_dir, "batch=*")):
        m = re.search(r"batch=(\d+)$", d)
        if m and dst.ckpt.is_committed(int(m.group(1))):
            shutil.rmtree(d, ignore_errors=True)
    return summary
