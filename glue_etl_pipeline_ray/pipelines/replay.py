"""The change-event replayer: micro-batch cursor over the event lake.

Ray-native re-expression of the reference's 7-job Glue workflow
(SURVEY.md 3.1-3.2) as ONE streaming Dataset pipeline per micro-batch:

    read_parquet(batch files)                 # pre-job work-list analog
      -> map_batches(ValidateFn)              # profile-job analog (+ DLQ)
      -> map_batches(evolve)                  # flat-job fix-ups analog
      -> map_batches(partial_lww)             # combiner: <=1 row/key/block
      -> groupby(__bucket).map_groups(merge)  # convert-job analog: the one
                                              # hash shuffle + idempotent sink
      -> take_all()                           # tiny lineage records only
    promote staging -> lake; write lineage; commit checkpoint  # post-job

The driver-side loop (``replay``) is the incremental-ingest cursor
(``update_workflow_properties.py:104-165`` analog): pending batches =
discovered batch ids minus committed set; batches apply in id order;
commit happens strictly after the sink promotion, so every batch is
exactly-once (idempotent merge makes re-runs no-ops).

Scale notes (100 TB / multi-node): all heavy flow is inside the lazy
Dataset — blocks stream with backpressure; the driver only ever
materializes lineage records (<= num_buckets rows per batch). ``lake_dir``
would be shared storage (S3/NFS) on a real cluster; ``num_buckets`` sizes
both the shuffle fan-in and the output file count (pick ~data_size/512MB).
"""

from __future__ import annotations

import glob
import os
import re
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from glue_etl_pipeline_ray.hashing import table_sha256
from glue_etl_pipeline_ray.spec import TableSpec
from glue_etl_pipeline_ray.stages.evolve import conform, discover_evolved, make_evolve_fn
from glue_etl_pipeline_ray.stages.merge import (
    DELETED_COL,
    make_merge_fn,
    state_schema,
)
from glue_etl_pipeline_ray.stages.partial import BUCKET_COL, make_partial_lww
from glue_etl_pipeline_ray.stages.validate import ValidateFn
from glue_etl_pipeline_ray.state.checkpoint import CheckpointManager
from glue_etl_pipeline_ray.state.lineage import write_lineage

_BATCH_RE = re.compile(r"batch=(\d+)")


def discover_batches(events_dir: str) -> list[tuple[int, list[str]]]:
    """Map batch_id -> parquet file list; supports ``batch=N.parquet``
    files and ``batch=N/`` directories."""
    out: dict[int, list[str]] = {}
    for entry in sorted(glob.glob(os.path.join(events_dir, "batch=*"))):
        m = _BATCH_RE.search(os.path.basename(entry))
        if not m:
            continue
        bid = int(m.group(1))
        if os.path.isdir(entry):
            out.setdefault(bid, []).extend(
                sorted(glob.glob(os.path.join(entry, "*.parquet")))
            )
        elif entry.endswith(".parquet"):
            out.setdefault(bid, []).append(entry)
    return sorted(out.items())


class ReplayEngine:
    def __init__(
        self,
        spec: TableSpec,
        lake_dir: str,
        compute_bucket_hash: bool = True,
        validate_batch_size: int | None = None,
        exchange: str = "raycore",
    ):
        """``exchange``: "raycore" (default) = map-side-partition shuffle on
        Ray core (stages/exchange.py — ~10x less overhead per micro-batch);
        "groupby" = pure Dataset ``groupby(bucket).map_groups`` path. Both
        produce byte-identical lake state (tested)."""
        if exchange not in ("raycore", "groupby"):
            raise ValueError(f"unknown exchange mode: {exchange}")
        self.spec = spec
        self.lake_dir = lake_dir
        self.compute_bucket_hash = compute_bucket_hash
        self.validate_batch_size = validate_batch_size
        self.exchange = exchange
        os.makedirs(lake_dir, exist_ok=True)
        self.ckpt = CheckpointManager(lake_dir)

    # ---------------------------------------------------------------- replay
    def replay(self, events_dir: str, fail_before_commit_of: int | None = None) -> dict:
        """Apply all not-yet-committed batches in order. Returns run summary.

        ``fail_before_commit_of``: test hook (FIXTURES.md F6) — raise after
        the named batch's sink promotion but before its checkpoint commit,
        simulating a crash in the at-least-once window.
        """
        batches = discover_batches(events_dir)
        applied = []
        for bid, files in batches:
            if self.ckpt.is_committed(bid):
                continue
            summary = self.apply_batch(
                bid, files, _fail_before_commit=(bid == fail_before_commit_of)
            )
            applied.append(summary)
        return {
            "applied_batches": [s["batch_id"] for s in applied],
            "skipped_committed": [b for b, _ in batches if b not in
                                  {s["batch_id"] for s in applied}],
            "watermark": self.ckpt.watermark,
            "summaries": applied,
        }

    def apply_batch(
        self, batch_id: int, files: list[str], _fail_before_commit: bool = False
    ) -> dict:
        spec = self.spec
        # schema-evolution discovery from Parquet footers (no data read)
        evolved = self.ckpt.evolved
        for f in files:
            evolved = discover_evolved(spec, pq.read_schema(f), evolved)

        dlq_dir = os.path.join(self.lake_dir, "_dlq", f"batch={batch_id:05d}")
        staging_dir = os.path.join(
            self.lake_dir, "_staging", f"batch={batch_id:05d}"
        )
        n_events = sum(pq.ParquetFile(f).metadata.num_rows for f in files)

        if self.exchange == "raycore":
            from glue_etl_pipeline_ray.stages.exchange import exchange_apply_batch

            records = exchange_apply_batch(
                spec,
                evolved,
                files,
                self.lake_dir,
                staging_dir,
                dlq_dir,
                batch_id,
                compute_hash=self.compute_bucket_hash,
            )
            return self._finish_batch(
                batch_id, evolved, n_events, dlq_dir, staging_dir, records,
                _fail_before_commit,
            )

        ds = ray.data.read_parquet(files)
        ds = ds.map_batches(
            ValidateFn(spec, dlq_dir),
            batch_format="pyarrow",
            batch_size=self.validate_batch_size,
            zero_copy_batch=True,
        )
        ds = ds.map_batches(
            make_evolve_fn(spec, evolved),
            batch_format="pyarrow",
            batch_size=None,
            zero_copy_batch=True,
        )
        ds = ds.map_batches(
            make_partial_lww(spec, spec.num_buckets),
            batch_format="pyarrow",
            batch_size=None,
        )
        merge_fn = make_merge_fn(
            spec,
            evolved,
            self.lake_dir,
            staging_dir,
            batch_id,
            compute_hash=self.compute_bucket_hash,
        )
        lineage_ds = ds.groupby(BUCKET_COL).map_groups(
            merge_fn, batch_format="pyarrow"
        )
        records = lineage_ds.take_all()  # <= num_buckets tiny rows
        return self._finish_batch(
            batch_id, evolved, n_events, dlq_dir, staging_dir, records,
            _fail_before_commit,
        )

    def _finish_batch(
        self,
        batch_id: int,
        evolved: tuple[tuple[str, str], ...],
        n_events: int,
        dlq_dir: str,
        staging_dir: str,
        records: list[dict],
        _fail_before_commit: bool = False,
    ) -> dict:
        # promote staging -> lake (atomic per file; idempotent overall)
        if os.path.isdir(staging_dir):
            for name in sorted(os.listdir(staging_dir)):
                os.replace(
                    os.path.join(staging_dir, name),
                    os.path.join(self.lake_dir, name),
                )
            shutil.rmtree(staging_dir, ignore_errors=True)

        n_dlq = 0
        if os.path.isdir(dlq_dir):
            n_dlq = sum(
                pq.ParquetFile(os.path.join(dlq_dir, f)).metadata.num_rows
                for f in os.listdir(dlq_dir)
                if f.endswith(".parquet")
            )
        summary = {
            "batch_id": batch_id,
            "n_events": n_events,
            "n_dead_lettered": n_dlq,
            "n_merged_events": sum(r["n_events"] for r in records),
            "n_upserts": sum(r["n_upserts"] for r in records),
            "n_deletes": sum(r["n_deletes"] for r in records),
            "n_live": sum(r["n_live"] for r in records),
            "buckets_touched": len(records),
            "evolved": [list(e) for e in evolved],
        }
        if _fail_before_commit:
            raise RuntimeError(f"injected crash before commit of batch {batch_id}")
        write_lineage(self.lake_dir, batch_id, records, summary)
        self.ckpt.commit_batch(batch_id, evolved, summary)
        return summary

    # ----------------------------------------------------------- final state
    def _state_files(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self.lake_dir, "part-*.parquet")))

    def final_dataset(self) -> "ray.data.Dataset":
        """Live table as a streaming Dataset (scale path)."""
        evolved = self.ckpt.evolved
        st = state_schema(self.spec, evolved)
        cols = self.spec.canonical_cols(evolved)

        def live_view(t: pa.Table) -> pa.Table:
            t = conform(t, st)
            return t.filter(pc.invert(t[DELETED_COL])).select(cols)

        return ray.data.read_parquet(self._state_files()).map_batches(
            live_view, batch_format="pyarrow", zero_copy_batch=True
        )

    def final_table(self) -> pa.Table:
        """Live table assembled driver-side (test/oracle path only)."""
        evolved = self.ckpt.evolved
        st = state_schema(self.spec, evolved)
        cols = self.spec.canonical_cols(evolved)
        parts = []
        for f in self._state_files():
            t = conform(pq.read_table(f), st)
            parts.append(t.filter(pc.invert(t[DELETED_COL])).select(cols))
        if not parts:
            return self.spec.canonical_schema(evolved).empty_table()
        out = pa.concat_tables(parts)
        return out.sort_by([(k, "ascending") for k in self.spec.key_cols])

    def final_sha256(self) -> str:
        return table_sha256(self.final_table(), self.spec.key_cols)
