"""Parallel (sharded) reference replayer: the oracle at 10^9+ events.

The serial :func:`glue_etl_pipeline_ray.oracle.replay_oracle` is a
single-threaded dict replay (~30 us/row: 3,032 s at 10^8 events,
BASELINE.md) — the right independence trade at test scale, but ~8.4 h
at 10^9. This module shards that SAME row-at-a-time logic by key hash:
last-writer-wins state is per-key, so any partition of the key space
replays independently and the union of shard states is the global
state (the analog of the reference's per-file independence,
``update_workflow_properties.py:141-151``, generalized to keys).

Independence from the engine is preserved where it matters:
- routing uses ``zlib.crc32`` over the key tuple — NOT the engine's
  bucket hash — so a routing bug in either cannot cancel out;
- per-row validation / LWW / evolution are the serial oracle's own
  functions (``_row_errors_planned``, ``register_evolution``), not the
  engine's vectorized kernels;
- the final sha256 is :func:`hashing.table_sha256`, which re-sorts the
  assembled table globally, so shard order cannot leak into the digest.

Memory: shard actors intern repeated strings (content is drawn from a
bounded pool; repo/path/lang are low-cardinality) so 10^7+ live rows
hold one Python object per distinct string, not per row. DLQ rows can
be counted instead of kept (``keep_dlq=False``) — at 2% dirt and 10^9
events the quarantine is 2x10^7 rows, only the count is asserted at
soak scale (row-level DLQ equality is pinned by the small-scale gates).

Gated against the serial oracle at small scale (dirt, deletes, schema
evolution, renames) in tests/test_oracle_sharded.py.
"""

from __future__ import annotations

import glob
import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from glue_etl_pipeline_ray.hashing import table_sha256, upcast_large_strings
from glue_etl_pipeline_ray.oracle import (
    _row_errors_planned,
    _seq_sort_key,
    apply_renames_oracle,
    assemble_live,
    batch_files,
    build_rule_plan,
    register_evolution,
)
from glue_etl_pipeline_ray.spec import TableSpec

_NULLK = "\x00<null>\x00"  # key-part marker for null key columns


def _shard_ids(t: pa.Table, key_cols, num_shards: int) -> np.ndarray:
    """crc32-of-key shard id per row (independent of the engine hash).

    crc32 runs only once per DISTINCT key (dictionary-encode first,
    hash the dictionary, gather by index): at CDC scale a batch holds
    many events per key, so this is the difference between hashing
    10^9 rows and hashing the touched key set."""
    import pyarrow.compute as pc

    joined = pc.fill_null(
        pc.cast(t[key_cols[0]], pa.string()), _NULLK
    )
    for k in key_cols[1:]:
        joined = pc.binary_join_element_wise(
            joined, pc.fill_null(pc.cast(t[k], pa.string()), _NULLK), "\x1f"
        )
    d = pc.dictionary_encode(joined).combine_chunks()
    if isinstance(d, pa.ChunkedArray):
        d = d.chunk(0)
    uniq = d.dictionary.to_pylist()
    h = np.fromiter(
        (zlib.crc32(u.encode("utf-8")) % num_shards for u in uniq),
        np.int64,
        len(uniq),
    )
    return h[d.indices.to_numpy(zero_copy_only=False)]


class _OracleShard:
    """One key-hash shard of the reference dict replay (a Ray actor).

    Batches MUST be applied in global batch order; Ray actor task
    ordering (submission order per actor) provides that for free.
    """

    def __init__(self, spec: TableSpec, keep_dlq: bool):
        self.spec = spec
        self.keep_dlq = keep_dlq
        self.state: dict[tuple, dict] = {}
        self.dlq: list[dict] = []
        self.n_dlq = 0
        self.n_applied = 0
        self.n_deleted = 0
        self._intern: dict[str, str] = {}
        self._plan = build_rule_plan(spec)

    def apply(self, chunk: pa.Table) -> int:
        spec = self.spec
        # per-chunk column plan (rows of one chunk share the schema):
        # which payload columns exist, and which of those to intern
        # columns whose values repeat across rows (keys, enums, pooled
        # content) are interned so 10^7+ live rows share one Python
        # object per distinct string; the spec names its per-event-unique
        # payload columns (spec.unique_cols) — interning those would
        # retain every value ever applied, not just the live set
        never = set(self.spec.unique_cols)
        meta = {
            spec.seq_col,
            spec.op_col,
            spec.batch_col,
            *spec.key_cols,
            *spec.extra_meta_cols,
            *spec.ignored_cols,
        }
        base = list(spec.base_col_names)
        extra = [
            c
            for c in chunk.column_names
            if c not in meta and c not in base
        ]
        pay_intern = [c for c in base + extra if c not in never]
        pay_raw = [c for c in base + extra if c in never]
        seq_col, op_col = spec.seq_col, spec.op_col
        key_cols = spec.key_cols
        intern = self._intern.setdefault
        state = self.state

        plan = self._plan
        rows = chunk.to_pylist()
        rows.sort(key=_seq_sort_key(seq_col))
        n_dlq = n_deleted = n_applied = 0
        for row in rows:
            errs = _row_errors_planned(spec, row, plan)
            if errs:
                n_dlq += 1
                if self.keep_dlq:
                    self.dlq.append({**row, "error": ";".join(errs)})
                continue
            key = tuple(
                intern(v, v) if type(v) is str else v
                for v in (row[k] for k in key_cols)
            )
            cur = state.get(key)
            seq = row[seq_col]
            if cur is not None and cur["seq"] >= seq:
                continue  # LWW: stale writer loses
            if row[op_col] == "DELETE":
                state[key] = {"seq": seq, "deleted": True, "row": None}
                n_deleted += 1
            else:
                payload = {}
                for c in pay_intern:
                    v = row.get(c)
                    payload[c] = (
                        intern(v, v) if type(v) is str else v
                    )
                for c in pay_raw:
                    payload[c] = row.get(c)
                state[key] = {"seq": seq, "deleted": False, "row": payload}
                n_applied += 1
        self.n_dlq += n_dlq
        self.n_deleted += n_deleted
        self.n_applied += n_applied
        return len(rows)

    def snapshot(self, evolved_t: tuple) -> pa.Table:
        """Current live rows as a canonical-layout table (non-mutating)."""
        live = sorted(
            (k, v["row"]) for k, v in self.state.items() if not v["deleted"]
        )
        return assemble_live(self.spec, evolved_t, live)

    def counters(self) -> dict:
        return {
            "n_applied": self.n_applied,
            "n_deleted": self.n_deleted,
            "n_dead_lettered": self.n_dlq,
            "n_live": sum(1 for v in self.state.values() if not v["deleted"]),
        }

    def dlq_rows(self) -> list[dict]:
        return self.dlq


class ShardedOracle:
    """Incremental sharded oracle: feed batch files (in order) across
    any number of calls; snapshot the sha at any point — the shape the
    disk-bounded segmented soak needs (apply a segment, delete its
    files, keep going)."""

    def __init__(
        self,
        spec: TableSpec,
        num_shards: int = 16,
        keep_dlq: bool = True,
        actor_num_cpus: float = 0.5,
    ):
        import ray

        self.spec = spec
        self.num_shards = num_shards
        self.evolved: list[tuple[str, str]] = []
        # fractional default: a shard actor is busy only while an apply
        # runs, and shard count must not be capped by the CPU count of
        # a small test session
        actor = ray.remote(num_cpus=actor_num_cpus)(_OracleShard)
        self.shards = [
            actor.remote(spec, keep_dlq) for _ in range(num_shards)
        ]
        self._route = ray.remote(num_cpus=1, num_returns=num_shards)(
            _route_row_groups
        )

    # Routing pipeline shape (the 10^9-soak enabler): the unit of
    # routing is a RANGE OF ROW GROUPS (~ROUTE_ROWS rows), not a whole
    # batch file — a 15M-row batch routed as one task holds ~3 copies
    # of ~8 GB in one worker heap and serializes the oracle behind a
    # single reader. Small units let ROUTE_WAVE readers run
    # concurrently while shard applies drain earlier units, and the
    # LWW fold is order-independent (seq is globally unique and the
    # state keeps the max-seq writer per key; gated against the serial
    # oracle, which replays strictly in order, by
    # tests/test_oracle_sharded.py), so units need no ordering at all.
    ROUTE_ROWS = 1 << 20  # target rows per routing unit
    ROUTE_WAVE = 6  # concurrent route tasks (each ~2x unit in heap)
    APPLY_UNITS_PENDING = 3  # units whose applies may be outstanding

    def apply_files(self, files: list[str]) -> None:
        """Route + apply a list of batch files, in the given order."""
        from collections import deque

        import ray

        spec, n = self.spec, self.num_shards
        # evolution registry is driver-side, from file footers in batch
        # order (rows can only carry a column their file schema declares,
        # so actors don't need the running registry)
        units: deque = deque()
        for f in files:
            pf = pq.ParquetFile(f)  # ONE footer read: schema + row groups
            register_evolution(
                spec,
                apply_renames_oracle(
                    spec, pf.schema_arrow.empty_table()
                ).schema,
                self.evolved,
            )
            md = pf.metadata
            nrg = md.num_row_groups
            if nrg == 0:
                continue
            per_unit = max(
                1, self.ROUTE_ROWS // max(1, md.row_group(0).num_rows)
            )
            for lo in range(0, nrg, per_unit):
                units.append((f, lo, min(lo + per_unit, nrg)))

        routed: deque = deque()  # route futures, FIFO
        pending: deque = deque()  # per-unit lists of apply futures
        while units or routed or pending:
            while units and len(routed) < self.ROUTE_WAVE:
                f, lo, hi = units.popleft()
                routed.append(self._route.remote(f, lo, hi, spec, n))
            if routed:
                chunk_refs = routed.popleft()
                refs = [chunk_refs] if n == 1 else list(chunk_refs)
                pending.append(
                    [self.shards[p].apply.remote(refs[p]) for p in range(n)]
                )
                del refs, chunk_refs
            # bound plasma: at most ROUTE_WAVE routed units plus
            # APPLY_UNITS_PENDING units being applied live at once
            while pending and (
                len(pending) > self.APPLY_UNITS_PENDING
                or not (units or routed)
            ):
                ray.get(pending.popleft())

    def apply_dir(self, events_dir: str) -> None:
        # batch_files honors the engine's full layout contract (file- and
        # directory-style batches, NUMERIC order) — a plain file glob
        # silently skipped batch=N/ directories
        self.apply_files(batch_files(events_dir))

    def result(self, with_table: bool = True) -> dict:
        import ray

        evolved_t = tuple(self.evolved)
        tables = ray.get(
            [s.snapshot.remote(evolved_t) for s in self.shards]
        )
        counters = ray.get([s.counters.remote() for s in self.shards])
        table = pa.concat_tables(tables)
        if with_table:
            # sorted table only on request: a driver-side sort of a
            # 10^9-scale table is an int32-offset overflow; the sha
            # sorts internally (upcast) either way
            table = table.sort_by(
                [(k, "ascending") for k in self.spec.key_cols]
            )
        out = {
            "sha256": table_sha256(table, self.spec.key_cols),
            "evolved": evolved_t,
            "n_applied": sum(c["n_applied"] for c in counters),
            "n_deleted": sum(c["n_deleted"] for c in counters),
            "n_dead_lettered": sum(c["n_dead_lettered"] for c in counters),
            "n_live": table.num_rows,
        }
        if with_table:
            out["table"] = table
        return out

    def dlq_rows(self) -> list[dict]:
        import ray

        rows: list[dict] = []
        for part in ray.get([s.dlq_rows.remote() for s in self.shards]):
            rows.extend(part)
        rows.sort(key=_seq_sort_key(self.spec.seq_col))
        return rows


def _route_row_groups(
    f: str, rg_lo: int, rg_hi: int, spec: TableSpec, num_shards: int
):
    """Read row groups [rg_lo, rg_hi) of one batch file, rename, split
    into per-shard sub-tables.

    String columns are upcast to large_string first: a unit's
    ``content`` column can pass 2 GB, and ``take`` concatenates chunks
    — int32 offsets would overflow (actors see the same python values
    either way). The split is ONE stable-argsort gather followed by
    zero-copy slices — measured 6x cheaper than a scattered ``take``
    per shard, and Ray's Arrow serializer truncates sliced buffers, so
    each shard ships only its own bytes."""
    t = pq.ParquetFile(f).read_row_groups(list(range(rg_lo, rg_hi)))
    t = upcast_large_strings(apply_renames_oracle(spec, t))
    if num_shards == 1:
        return t
    sh = _shard_ids(t, spec.key_cols, num_shards)
    order = np.argsort(sh, kind="stable")
    ts = t.take(order)
    counts = np.bincount(sh, minlength=num_shards)
    offs = np.concatenate([[0], np.cumsum(counts)])
    return tuple(
        ts.slice(int(offs[p]), int(counts[p]))
        for p in range(num_shards)
    )


def replay_oracle_sharded(
    spec: TableSpec,
    events_dir: str,
    num_shards: int = 16,
    keep_dlq: bool = True,
) -> dict:
    """One-shot wrapper matching :func:`oracle.replay_oracle`'s shape."""
    o = ShardedOracle(spec, num_shards=num_shards, keep_dlq=keep_dlq)
    o.apply_dir(events_dir)
    out = o.result()
    if keep_dlq:
        out["dlq"] = o.dlq_rows()
    return out
