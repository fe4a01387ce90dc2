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


def discover_evolved(
    spec: TableSpec,
    file_schema: pa.Schema,
    known_evolved: tuple[tuple[str, str], ...],
) -> tuple[tuple[str, str], ...]:
    """Append unseen columns (first-seen order) from a batch file schema."""
    known = {
        *spec.key_cols,
        *spec.base_col_names,
        spec.seq_col,
        spec.op_col,
        spec.batch_col,
        *spec.extra_meta_cols,
        *(n for n, _ in known_evolved),
    }
    out = list(known_evolved)
    for f in file_schema:
        if f.name not in known:
            # type_name round-trips nested list/struct types through the
            # JSON manifest (str(f.type) would not parse back)
            out.append((f.name, type_name(f.type)))
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
