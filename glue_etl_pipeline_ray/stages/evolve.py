"""Additive schema evolution: normalize every batch to the target schema.

Analog of the reference's null backfill of missing fields
(``flat_jsons.py:85-110`` `_populate_metadata_field` /
`_populate_skipped_paragraphs_field`) and of Spark's schema union on read
(``convert_to_parquet.py:183``), done explicitly: the driver discovers new
columns from Parquet *metadata* (cheap, no data read) in batch order, and
this stage projects each Arrow batch to the fixed target layout —
missing columns backfilled as typed nulls, types cast, unknown columns
dropped, column order canonical. A fixed output schema is what lets the
downstream merge and sha256 oracle be deterministic (SURVEY.md 7.4).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from glue_etl_pipeline_ray.spec import TableSpec, type_from_name, type_name


def apply_renames(spec: TableSpec, batch: pa.Table) -> pa.Table:
    """Column-mapping step (Delta/Iceberg column-mapping analog): map
    source-renamed columns to their canonical lake names, FIRST in the
    ingest chain so validation rules and key extraction see canonical
    names. A batch carrying BOTH a source name and its canonical target
    is ambiguous (which values win?) and raises instead of guessing."""
    rmap = spec.rename_map
    if not rmap:
        return batch
    names = batch.column_names
    present = set(names)
    hit = False
    for src, dst in rmap.items():
        if src in present:
            if dst in present:
                raise ValueError(
                    f"ambiguous batch schema: both {src!r} and its "
                    f"canonical name {dst!r} present — a rename era "
                    "must not overlap the canonical column"
                )
            hit = True
    if not hit:
        return batch
    return batch.rename_columns([rmap.get(n, n) for n in names])


def renamed_schema(spec: TableSpec, file_schema: pa.Schema) -> pa.Schema:
    """The footer-level analog of :func:`apply_renames` (discovery reads
    schemas, not data)."""
    rmap = spec.rename_map
    if not rmap:
        return file_schema
    names = set(file_schema.names)
    fields = []
    for f in file_schema:
        dst = rmap.get(f.name)
        if dst is not None:
            if dst in names:
                raise ValueError(
                    f"ambiguous batch schema: both {f.name!r} and its "
                    f"canonical name {dst!r} present — a rename era "
                    "must not overlap the canonical column"
                )
            f = f.with_name(dst)
        fields.append(f)
    return pa.schema(fields)


def event_schema(
    spec: TableSpec, evolved: tuple[tuple[str, str], ...]
) -> pa.Schema:
    """Full change-event schema: seq/op/batch + keys + payload (+ evolved)."""
    fields = [
        pa.field(spec.seq_col, pa.int64()),
        pa.field(spec.op_col, pa.string()),
    ]
    fields += [pa.field(k, pa.string()) for k in spec.key_cols]
    fields += [pa.field(n, type_from_name(t)) for n, t in spec.base_cols]
    fields += [pa.field(n, type_from_name(t)) for n, t in evolved]
    return pa.schema(fields)


_INT_WIDTH = {"int8": 8, "int16": 16, "int32": 32, "int64": 64}
# Arrow's canonical str() names floats "float"/"double"; accept the
# width-suffixed aliases too so the lattice is name-convention-proof
_FLOAT_WIDTH = {"float": 32, "float32": 32, "double": 64, "float64": 64}
_FLOAT_CANON = {32: "float", 64: "double"}


def widen_type(a: str, b: str) -> str | None:
    """Smallest SAFE common type name for an evolved column seen with
    types ``a`` then ``b`` (Delta/Iceberg-style type widening):
    narrower int -> wider int, float32 -> float64, int -> float64.
    Returns None when no lossless promotion exists (e.g. int64 ->
    string) — the caller must treat that as an incompatible evolution,
    never silently cast."""
    if a == b:
        return a
    if a in _INT_WIDTH and b in _INT_WIDTH:
        return a if _INT_WIDTH[a] >= _INT_WIDTH[b] else b
    if a in _FLOAT_WIDTH and b in _FLOAT_WIDTH:
        return _FLOAT_CANON[max(_FLOAT_WIDTH[a], _FLOAT_WIDTH[b])]
    if (a in _INT_WIDTH and b in _FLOAT_WIDTH) or (
        a in _FLOAT_WIDTH and b in _INT_WIDTH
    ):
        # float64 holds every int32 exactly; int64 values past 2^53
        # lose precision in float64, so only promote small ints
        int_side = a if a in _INT_WIDTH else b
        return _FLOAT_CANON[64] if _INT_WIDTH[int_side] <= 32 else None
    return None


def discover_evolved(
    spec: TableSpec,
    file_schema: pa.Schema,
    known_evolved: tuple[tuple[str, str], ...],
) -> tuple[tuple[str, str], ...]:
    """Append unseen columns (first-seen order) from a batch file
    schema, and WIDEN a known evolved column when a batch arrives with
    a safely wider type (int32 -> int64, float32 -> float64); the
    registry keeps the column's position, and every state read path
    conforms old narrow data upward. Base/key columns are fixed by the
    spec and never widen (the lake's external contract). Incompatible
    type changes raise instead of corrupting downstream casts."""
    known = {
        *spec.key_cols,
        *spec.base_col_names,
        spec.seq_col,
        spec.op_col,
        spec.batch_col,
        *spec.extra_meta_cols,
    }
    file_schema = renamed_schema(spec, file_schema)
    ignored = set(spec.ignored_cols)
    by_name = {n: i for i, (n, _) in enumerate(known_evolved)}
    out = list(known_evolved)
    for f in file_schema:
        if f.name in known or f.name in ignored:
            continue
        # type_name round-trips nested list/struct types through the
        # JSON manifest (str(f.type) would not parse back)
        tname = type_name(f.type)
        if f.name not in by_name:
            by_name[f.name] = len(out)
            out.append((f.name, tname))
            continue
        idx = by_name[f.name]
        registered = out[idx][1]
        if tname == registered:
            continue
        widened = widen_type(registered, tname)
        if widened is None:
            raise ValueError(
                f"incompatible schema evolution for column {f.name!r}: "
                f"registered {registered}, batch has {tname}"
            )
        out[idx] = (f.name, widened)
    return tuple(out)


def conform(batch: pa.Table, target: pa.Schema) -> pa.Table:
    """Project/cast/backfill a batch to exactly ``target``."""
    if batch.schema.equals(target):
        return batch  # zero-copy fast path: already canonical
    n = batch.num_rows
    cols = []
    for f in target:
        if f.name in batch.column_names:
            c = batch[f.name]
            if c.type != f.type:
                c = pc.cast(c, f.type)
            cols.append(c)
        else:
            cols.append(pa.nulls(n, f.type))
    return pa.Table.from_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols], schema=target)


def make_evolve_fn(spec: TableSpec, evolved: tuple[tuple[str, str], ...]):
    target = event_schema(spec, evolved)

    def evolve(batch: pa.Table) -> pa.Table:
        return conform(batch, target)

    return evolve
