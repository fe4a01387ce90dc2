"""Vectorized flatten + validate stage with a dead-letter channel.

Ray-native analog of the reference profile job
(``ef_ingestion_etl/data_profiling.py:135-216``): every change event is
checked against the ``TableSpec`` rules (Cerberus-schema analog,
``data_profiling.py:46-58``); failures are routed to a dead-letter
Parquet prefix carrying the original payload plus an ``error`` column
(``dirty_efs`` analog, ``data_profiling.py:113-132``) — and, unlike the
reference, *nothing* is silently dropped (fixes bugs B1/B2, SURVEY.md
2.11): every row lands in exactly one of {clean stream, dead letter}.

The hot path is pure ``pyarrow.compute`` over zero-copy Arrow batches;
per-row error strings are materialized only for the (rare) dirty rows.

Idempotence of the DLQ sink: dirty rows from a batch are written to a
file named by the sha1 of their canonical bytes — a retried task
rewrites the same file, never duplicates.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc

from glue_etl_pipeline_ray.hashing import canonical_bytes
from glue_etl_pipeline_ray.spec import Rule, TableSpec


def _resolve_col(batch: pa.Table, path: str):
    """Resolve a rule column, following dotted paths into struct columns
    (``meta.idx`` — the Cerberus nested-schema analog for the columnar
    rules). A missing top-level column, a path segment into a non-struct,
    or an absent struct field all resolve to None (absent); a NULL parent
    struct yields null children (vectorized struct_field semantics)."""
    first, _, rest = path.partition(".")
    if first not in batch.column_names:
        return None
    col = batch[first]
    if not rest:
        return col
    for part in rest.split("."):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if not pa.types.is_struct(col.type):
            return None
        if col.type.get_field_index(part) < 0:
            return None
        col = pc.struct_field(col, part)
    return col


def _rule_fail_mask(rule: Rule, batch: pa.Table, op: pa.ChunkedArray) -> pa.Array | None:
    """Boolean array: True where the row FAILS this rule."""
    n = batch.num_rows
    col = _resolve_col(batch, rule.col)
    has_col = col is not None
    if rule.kind == "not_null":
        isnull = pc.is_null(col) if has_col else pa.array([True] * n)
        if rule.nullable_for_ops:
            exempt = pc.is_in(op, value_set=pa.array(rule.nullable_for_ops))
            return pc.and_(isnull, pc.invert(pc.fill_null(exempt, False)))
        return isnull
    if not has_col or pa.types.is_null(col.type):
        return None  # open world: other rule kinds are null/absent-tolerant
    if rule.kind == "enum":
        ok = pc.is_in(col, value_set=pa.array(list(rule.allowed), col.type))
        return pc.and_(pc.invert(ok), pc.is_valid(col))
    if rule.kind == "regex":
        m = pc.match_substring_regex(col, f"^(?:{rule.pattern})$")
        return pc.fill_null(pc.invert(m), False)
    if rule.kind == "range":
        bad = pc.or_(pc.less(col, rule.lo), pc.greater(col, rule.hi))
        return pc.fill_null(bad, False)
    raise ValueError(f"unknown rule kind {rule.kind}")


def make_flag_fn(spec: TableSpec, invalid_only: bool = True):
    """In-stream variant of :class:`ValidateFn`: append an ``error`` column
    (rule errors joined with ';' in spec rule order, null when valid)
    instead of writing a side-channel. With ``invalid_only`` the batch is
    filtered down to the failing rows — the dead-letter *query* shape."""

    def flag(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        op = (
            batch[spec.op_col]
            if spec.op_col in batch.column_names
            else pa.nulls(n, pa.string())
        )
        fails = []
        any_fail = pa.array([False] * n)
        for rule in spec.rules:
            m = _rule_fail_mask(rule, batch, op)
            if m is None:
                continue
            m = pc.fill_null(m, False)
            fails.append((rule.error, m.to_pylist()))
            any_fail = pc.or_(any_fail, m)
        flags = any_fail.to_pylist()
        errors = [
            ";".join(e for e, vals in fails if vals[i]) if flags[i] else None
            for i in range(n)
        ]
        out = batch.append_column("error", pa.array(errors, pa.string()))
        if invalid_only:
            out = out.filter(any_fail)
        return out

    return flag


class ValidateFn:
    """``map_batches`` callable: Arrow batch in -> clean Arrow batch out,
    dirty rows written to ``dlq_dir`` as a side channel.

    Usable as a plain function (stateless tasks) or as an actor-pool
    class via ``map_batches(ValidateFn, fn_constructor_kwargs=...)``
    when rule compilation cost matters (ST1 analog, SURVEY.md 2.3).
    """

    def __init__(self, spec: TableSpec, dlq_dir: str | None = None):
        self.spec = spec
        self.dlq_dir = dlq_dir
        if dlq_dir:
            os.makedirs(dlq_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        spec = self.spec
        n = batch.num_rows
        if n == 0:
            return batch
        if spec.renames:
            # column mapping FIRST: rules, key extraction and the DLQ
            # all see canonical names (stages/evolve.apply_renames)
            from glue_etl_pipeline_ray.stages.evolve import apply_renames

            batch = apply_renames(spec, batch)
        op = batch[spec.op_col] if spec.op_col in batch.column_names else pa.nulls(n, pa.string())
        fails: list[tuple[str, pa.Array]] = []
        any_fail = pa.array([False] * n)
        for rule in spec.rules:
            m = _rule_fail_mask(rule, batch, op)
            if m is None:
                continue
            m = pc.fill_null(m, False)
            fails.append((rule.error, m))
            any_fail = pc.or_(any_fail, m)
        n_dirty = pc.sum(any_fail).as_py() or 0
        if n_dirty == 0:
            return batch  # zero-copy fast path: nothing to quarantine
        clean = batch.filter(pc.invert(any_fail))
        if not self.dlq_dir:
            # no dead-letter sink configured: refuse to silently drop —
            # the module contract is every row lands in exactly one of
            # {clean stream, dead letter}
            raise ValueError(
                f"{n_dirty} row(s) failed validation but no dlq_dir is "
                "configured; pass dlq_dir to quarantine instead of drop"
            )
        if n_dirty and self.dlq_dir:
            dirty = batch.filter(any_fail)
            # error detail strings only for the dirty minority
            idx = [i for i, f in enumerate(any_fail.to_pylist()) if f]
            per_rule = [(e, m.to_pylist()) for e, m in fails]
            errors = [
                ";".join(e for e, vals in per_rule if vals[i]) for i in idx
            ]
            dirty = dirty.append_column("error", pa.array(errors, pa.string()))
            self._write_dlq(dirty)
        return clean

    def _write_dlq(self, dirty: pa.Table) -> None:
        import pyarrow.parquet as pq

        sort_col = (
            self.spec.seq_col
            if self.spec.seq_col in dirty.column_names
            else dirty.column_names[0]
        )
        digest = hashlib.sha1(canonical_bytes(dirty, [sort_col])).hexdigest()[:16]
        path = os.path.join(self.dlq_dir, f"part-{digest}.parquet")
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(dirty, tmp)
        os.replace(tmp, path)
