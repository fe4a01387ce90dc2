"""Single-threaded reference replayer: ground truth for the engine.

A plain-dict replay of the change-event stream in global ``seq`` order —
the analog of the reference's deterministic sequential file loop
(``data_profiling.py:145``, ``flat_jsons.py:277``) — defining the final
table state the parallel Ray pipeline must reproduce bit-for-bit
(sha256 of the canonically-sorted live table, FIXTURES.md F5).

Validation here is deliberately written row-at-a-time and independently
of the engine's vectorized validators, so the two implementations
cross-check each other.
"""

from __future__ import annotations

import glob
import os
import re

import pyarrow as pa
import pyarrow.parquet as pq

from glue_etl_pipeline_ray.hashing import table_sha256
from glue_etl_pipeline_ray.spec import TableSpec, type_from_name, type_name

_BATCH_NUM = re.compile(r"batch=(\d+)")


def _seq_sort_key(seq_col: str):
    """Null-safe per-batch row order: a null/missing ``seq`` (the F3
    dirt the ``seq not_null`` rule exists for) sorts LAST (False < True
    in the tuple key) and then dead-letters during validation — the
    engine handles that stream, so the ground-truth oracle must not
    crash on it. Null position only affects DLQ encounter order, never
    LWW state."""
    return lambda r: (r.get(seq_col) is None, r.get(seq_col) or 0)


def batch_files(events_dir: str) -> list[str]:
    """Same layout AND ordering contract as the engine's
    discover_batches: a batch is one ``batch=N.parquet`` file or a
    ``batch=N/`` directory of part files, applied in NUMERIC batch
    order (lexicographic order diverges on unpadded names — the engine
    parses the integer, so the oracle must too)."""

    def bid(p: str) -> int:
        m = _BATCH_NUM.search(os.path.basename(p.rstrip("/")))
        return int(m.group(1)) if m else -1

    files: list[str] = []
    entries = sorted(
        # entries with no numeric id (batch=tmp, batch=staging/) are
        # skipped exactly as the engine's discover_batches skips them
        (p for p in glob.glob(os.path.join(events_dir, "batch=*")) if bid(p) >= 0),
        key=lambda p: (bid(p), p),
    )
    for entry in entries:
        if os.path.isdir(entry):
            files.extend(sorted(glob.glob(os.path.join(entry, "*.parquet"))))
        elif entry.endswith(".parquet"):
            files.append(entry)
    return files


def _resolve_path(row: dict, path: str):
    """Dotted-path lookup mirroring the engine's struct-field resolution
    (stages/validate._resolve_col): missing segment -> absent (None)."""
    v = row
    for part in path.split("."):
        if not isinstance(v, dict):
            return None
        v = v.get(part)
    return v


def build_rule_plan(spec: TableSpec) -> list[tuple]:
    """Pre-split rule paths and pre-compile regexes once per replay —
    semantics identical to evaluating ``spec.rules`` directly; only the
    per-row ``str.split``/``re`` cache lookups are hoisted (the oracle
    stays row-at-a-time by design)."""
    plan = []
    for r in spec.rules:
        rx = re.compile(r.pattern) if r.kind == "regex" else None
        plan.append((tuple(r.col.split(".")), r, rx))
    return plan


def _row_errors_planned(spec: TableSpec, row: dict, plan: list) -> list[str]:
    errs = []
    op = row.get(spec.op_col)
    for parts, r, rx in plan:
        if len(parts) == 1:
            v = row.get(parts[0])
        else:
            v = row
            for part in parts:
                if not isinstance(v, dict):
                    v = None
                    break
                v = v.get(part)
        kind = r.kind
        if kind == "not_null":
            if v is None and op not in r.nullable_for_ops:
                errs.append(r.error)
        elif v is None:
            continue  # remaining kinds are null-tolerant (open world)
        elif kind == "enum":
            if v not in r.allowed:
                errs.append(r.error)
        elif kind == "regex":
            if not rx.fullmatch(str(v)):
                errs.append(r.error)
        elif kind == "range":
            if not (r.lo <= v <= r.hi):
                errs.append(r.error)
    return errs


def apply_renames_oracle(spec: TableSpec, t: pa.Table) -> pa.Table:
    """Column mapping, independently re-implemented from the engine's
    apply_renames (same ambiguity contract)."""
    rmap = spec.rename_map
    if not rmap:
        return t
    present = set(t.column_names)
    for src, dst in rmap.items():
        if src in present and dst in present:
            raise ValueError(
                f"ambiguous batch schema: both {src!r} and {dst!r} present"
            )
    return t.rename_columns([rmap.get(n, n) for n in t.column_names])


def register_evolution(
    spec: TableSpec, schema: pa.Schema, evolved: list[tuple[str, str]]
) -> None:
    """Register (mutating ``evolved``) any extra columns in a batch
    schema, mirroring the engine's safe type widening
    (evolve.widen_type); raises on an incompatible change."""
    from glue_etl_pipeline_ray.stages.evolve import widen_type

    known = {
        *spec.key_cols,
        *spec.base_col_names,
        spec.seq_col,
        spec.op_col,
        spec.batch_col,
        *spec.extra_meta_cols,
    }
    ignored = set(spec.ignored_cols)
    for fld in schema:
        if fld.name in known or fld.name in ignored:
            continue
        tname = type_name(fld.type)
        names = {n: i for i, (n, _) in enumerate(evolved)}
        if fld.name not in names:
            evolved.append((fld.name, tname))
        else:
            idx = names[fld.name]
            registered = evolved[idx][1]
            if tname != registered:
                widened = widen_type(registered, tname)
                if widened is None:
                    raise ValueError(
                        f"incompatible schema evolution for column "
                        f"{fld.name!r}: {registered} vs {tname}"
                    )
                evolved[idx] = (fld.name, widened)


def assemble_live(
    spec: TableSpec, evolved_t: tuple, live: list[tuple[tuple, dict]]
) -> pa.Table:
    """Canonical-layout Arrow table from sorted (key, payload) pairs."""
    cols = spec.canonical_cols(evolved_t)
    schema = spec.canonical_schema(evolved_t)
    arrays = []
    for i, c in enumerate(cols):
        if c in spec.key_cols:
            ki = spec.key_cols.index(c)
            vals = [k[ki] for k, _ in live]
        else:
            vals = [r.get(c) for _, r in live]
        arrays.append(pa.array(vals, schema.field(i).type))
    return pa.table(dict(zip(cols, arrays)))


def replay_oracle(spec: TableSpec, events_dir: str) -> dict:
    """Replay every ``batch=*.parquet`` in order; return final state.

    Returns dict with: ``table`` (live rows, canonical layout), ``sha256``,
    ``evolved`` (first-seen extra columns), ``dlq`` rows, counters.
    """
    files = batch_files(events_dir)
    evolved: list[tuple[str, str]] = []
    state: dict[tuple, dict] = {}  # key -> {"seq": int, "deleted": bool, "row": dict}
    dlq: list[dict] = []
    n_applied = n_deleted = 0
    plan = build_rule_plan(spec)

    for f in files:
        t = apply_renames_oracle(spec, pq.read_table(f))
        register_evolution(spec, t.schema, evolved)
        rows = t.to_pylist()
        rows.sort(key=_seq_sort_key(spec.seq_col))
        for row in rows:
            errs = _row_errors_planned(spec, row, plan)
            if errs:
                dlq.append({**row, "error": ";".join(errs)})
                continue
            key = tuple(row[k] for k in spec.key_cols)
            cur = state.get(key)
            seq = row[spec.seq_col]
            if cur is not None and cur["seq"] >= seq:
                continue  # LWW: stale writer loses
            if row[spec.op_col] == "DELETE":
                state[key] = {"seq": seq, "deleted": True, "row": None}
                n_deleted += 1
            else:
                payload = {c: row.get(c) for c in spec.base_col_names}
                payload.update({n: row.get(n) for n, _ in evolved if n in row})
                state[key] = {"seq": seq, "deleted": False, "row": payload}
                n_applied += 1

    evolved_t = tuple(evolved)
    live = sorted((k, v["row"]) for k, v in state.items() if not v["deleted"])
    table = assemble_live(spec, evolved_t, live)
    return {
        "table": table,
        "sha256": table_sha256(table, spec.key_cols),
        "evolved": evolved_t,
        "dlq": dlq,
        "n_applied": n_applied,
        "n_deleted": n_deleted,
        "n_dead_lettered": len(dlq),
        "n_live": table.num_rows,
    }
