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
evolution, deletes, and source backfills — a backfill enters the feed
in the span after its watermark, see ``ReplayEngine.backfill``).
Exactly-once falls out of existing machinery on both sides: the
destination's batch ids ARE source batch ids, so its commit gate skips
an already-applied sync, and a replicate that crashes after staging but
before commit is finished by the next call (the staged batch is still
there; ``replay`` picks up whatever is uncommitted). A staged sync left
by a crash at an OLDER target is purged, never replayed: a stale
``(from, t1]`` feed applied alongside the fresh ``(from, t2]`` feed
would resurrect values a key held at ``t1`` but reverted by ``t2``
(the net feed carries no row for a key whose value at ``t2`` equals its
value at ``from``). Staged batch files are written once per sync with
deterministic names — re-staging the same sync overwrites with
identical content.

Scale shape: the feed is one diff task per bucket (no shuffle), the
event transform is a vectorized ``map_batches``, and the write streams
— the driver never holds data rows. The destination replays the staged
batch with its own exchange/merge pipeline, so a replica with a
different ``num_buckets`` re-partitions naturally.
"""

from __future__ import annotations

import glob
import os
import re
import shutil

import pyarrow as pa
import pyarrow.compute as pc

from glue_etl_pipeline_ray.stages.merge import CHANGE_TYPE_COL


def changes_to_events(
    changes: pa.Table, seq: int, op_col: str = "op", seq_col: str = "seq"
) -> pa.Table:
    """One CDF slice -> CDC event rows: ``_change_type`` becomes the
    destination's op column, every row gets the sync's sequence number
    (net-per-key feeds carry at most one row per key per sync, so a
    single seq per sync preserves LWW order across syncs). Column
    names follow the DESTINATION spec — a spec with renamed meta
    columns would otherwise null-fill its own op/seq, turning every
    DELETE into an upsert."""
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
    out = out.append_column(op_col, op)
    return out.append_column(
        seq_col, pa.array([seq] * changes.num_rows, pa.int64())
    )


def replicate(src, dst, staging_dir: str) -> dict:
    """Sync ``dst`` up to ``src``'s committed watermark. Returns the
    destination replay summary (``applied_batches`` empty on no-op).
    Requires the source to retain history (``gc_old_versions=False``)."""
    target = src.ckpt.watermark
    from_b = dst.ckpt.watermark
    # purge stale staged syncs from attempts at a DIFFERENT target that
    # crashed before commit — replaying an old (from, t1] feed alongside
    # the fresh (from, t2] feed silently diverges the replica (see
    # module docstring). Committed dirs are ordinary GC work below.
    for d in glob.glob(os.path.join(staging_dir, "batch=*")):
        m = re.search(r"batch=(\d+)$", d)
        if (
            m
            and int(m.group(1)) != target
            and not dst.ckpt.is_committed(int(m.group(1)))
        ):
            shutil.rmtree(d, ignore_errors=True)
    if target <= from_b:
        return {"applied_batches": [], "skipped_committed": [], "summaries": []}
    if not dst.ckpt.is_committed(target):
        feed = src.changes_dataset(from_b, target)
        batch_dir = os.path.join(staging_dir, f"batch={target:05d}")
        # a sync that crashed between staging and commit restages from
        # scratch — same content, but a fresh dir so a partial or
        # completed earlier attempt can't leave duplicate files behind
        shutil.rmtree(batch_dir, ignore_errors=True)
        op_col, seq_col = dst.spec.op_col, dst.spec.seq_col
        feed.map_batches(
            lambda t: changes_to_events(t, seq=target, op_col=op_col, seq_col=seq_col),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).write_parquet(batch_dir)
    summary = dst.replay(staging_dir)
    # GC staged syncs the replica has durably committed (keep the one in
    # flight; a crash before this point just leaves them for next time)
    for d in glob.glob(os.path.join(staging_dir, "batch=*")):
        m = re.search(r"batch=(\d+)$", d)
        if m and dst.ckpt.is_committed(int(m.group(1))):
            shutil.rmtree(d, ignore_errors=True)
    return summary
