"""The reference's five-job event-file ETL as ONE streaming Ray pipeline.

Reference flow (SURVEY.md 3.1): pre-job work-list -> profile-job
(split + Cerberus validate + dead-letter) -> flat-job (classify by
service x type + per-service fix-ups) -> convert-job (project nested
fields to flat columns, derive y/m/d/h, partitioned Parquet append) ->
post-job commit. Here each Glue job is a stage on the same Dataset —
no S3 staging hops, no per-job processes, same contract:

    read_event_files(blobs)                      # S2+S3 (B1/B2 fixed)
      -> classify (service, kind)                # M2/M5
      -> per-table: rules validate -> DLQ        # M3/M4 (ST1 analog)
                    fix-ups (casts, list-promote,
                    null backfill)               # M6-M10
                    projection to flat schema    # M12
                    y/m/d/h partition derive     # M13
                    write_parquet(partition_cols)# S7
      -> per-table lineage counts                # M14/A1/A2

A logical table = an :class:`EventTableSpec` (the 2.10 extension surface:
adding a "microservice" is one new spec entry, vs the reference's three
files). Unknown (service, kind) pairs dead-letter — they neither crash
the run (ref bug B4, ``flat_jsons.py:234-239``) nor vanish (B2).
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from glue_etl_pipeline_ray.sources.eventfiles import read_event_files


@dataclass(frozen=True)
class EventTableSpec:
    """One logical table: route key + projection + optional fix-ups.

    ``project``: (detail dict) -> flat dict of output column values.
    ``fixups``: applied to the detail dict before projection (M6-M10
    analogs); each is (detail) -> detail.
    ``schema``: authoritative flat output schema (the reference's SQL
    SELECT contract, ``convert_to_parquet.py:58-159``)."""

    service: str
    kind: str  # "event" | "prediction"
    schema: pa.Schema
    project: Callable[[dict], dict]
    fixups: tuple[Callable[[dict], dict], ...] = field(default=())
    required: tuple[str, ...] = ("id", "time")

    @property
    def name(self) -> str:
        return f"{self.service}_{self.kind}".upper()


def classify(detail: dict) -> tuple[str | None, str | None]:
    """M2 analog: (service, kind) from ``detail.type`` +
    ``prediction.service`` / ``evaluation.service``, with the reference's
    ``prediction_id`` suffix fallback (``data_profiling.py:61-87``)."""
    dtype = detail.get("type")
    if dtype == "EFPredictionEvent":
        kind = "prediction"
        body = detail.get("prediction") or {}
    elif dtype == "EFEvaluationEvent":
        kind = "event"
        body = detail.get("evaluation") or {}
    else:
        return None, None
    service = body.get("service")
    if not service:
        pid = body.get("prediction_id") or ""
        service = pid.split("#")[-1] if "#" in pid else None
    return service, kind


def run_eventfile_etl(
    paths: list[str],
    specs: list[EventTableSpec],
    out_dir: str,
) -> dict:
    """Run the full ETL; returns per-table + DLQ counts (A1/A2 analog).

    Writes ``out_dir/{TABLE}/year=/month=/day=/hour=/*.parquet`` and
    ``out_dir/_dlq/*.parquet``.

    One heavy pass: each event's JSON payload is parsed ONCE; classify,
    fix-ups and projection all happen in that map wave, which emits a
    union-schema table (every spec's columns, null outside its rows) with
    a ``table`` discriminator — the M5 "discriminator column, filter per
    table downstream" shape. Per-table writes are then cheap vectorized
    filters over the materialized union."""
    by_key = {(s.service, s.kind): s for s in specs}
    union_schema = _union_schema(specs)

    def process(batch: pa.Table) -> pa.Table:
        """split + classify + fix-ups + project, all on the raw blob —
        each event's JSON is decoded exactly once (the generic
        ``read_event_files`` source re-serializes the payload for
        schema-stable transport; this fused path skips that round-trip)."""
        from glue_etl_pipeline_ray.sources.eventfiles import split_concat_json

        rows = []
        for blob in batch["bytes"].to_pylist():
            events, bad = split_concat_json(blob.decode("utf-8", "replace"))
            for span in bad:
                rows.append({"table": None, "__raw": span, "__error": "decode"})
            for ev in events:
                if not ev.get("id") or not ev.get("time") or "detail" not in ev:
                    rows.append(
                        {"table": None, "__raw": str(ev)[:200], "__error": "required"}
                    )
                    continue
                detail = ev["detail"]
                service, kind = classify(detail)
                spec = by_key.get((service, kind))
                if spec is None:
                    rows.append(
                        {"table": None, "__raw": str(ev)[:200], "__error": "unroutable"}
                    )
                    continue
                for fx in spec.fixups:
                    detail = fx(detail)
                flat = spec.project(detail)
                flat["table"] = spec.name
                flat["event_id"] = ev["id"]
                flat["date_time"] = ev["time"]
                rows.append(flat)
        # explicit per-column build: from_pylist would type-infer per batch
        # and can collapse a column to null type in mixed batches
        out = pa.table(
            {
                f.name: pa.array([r.get(f.name) for r in rows], f.type)
                for f in union_schema
            }
        )
        ts = pc.strptime(out["date_time"], format="%Y-%m-%dT%H:%M:%SZ", unit="s")
        for unit, fn in (("year", pc.year), ("month", pc.month),
                         ("day", pc.day), ("hour", pc.hour)):
            out = out.append_column(unit, pc.cast(fn(ts), pa.int32()))
        return out

    import ray.data as _rd

    processed = (
        _rd.read_binary_files(paths)
        .map_batches(process, batch_format="pyarrow", batch_size=8)
        .materialize()
    )

    counts: dict = {"tables": {}, "dead_lettered": 0}

    def keep(pred):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pred(t))

        return f

    dlq = processed.map_batches(
        keep(lambda t: pc.is_null(t["table"])),
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()
    n_dlq = dlq.count()
    if n_dlq:
        dlq.select_columns(["__raw", "__error"]).write_parquet(
            os.path.join(out_dir, "_dlq")
        )
    counts["dead_lettered"] = n_dlq

    part_cols = ["year", "month", "day", "hour"]
    for spec in specs:
        name = spec.name
        tbl = processed.map_batches(
            keep(lambda t, name=name: pc.fill_null(pc.equal(t["table"], name), False)),
            batch_format="pyarrow",
            batch_size=None,
        ).select_columns(list(spec.schema.names) + part_cols)
        counts["tables"][name] = hive_partitioned_write(
            tbl, os.path.join(out_dir, name), part_cols
        )
    return counts


def hive_partitioned_write(ds: Dataset, out_root: str, part_cols: list[str]) -> int:
    """Partition-grouped hive write: ONE deterministic file per partition
    value (``.../year=Y/month=M/day=D/hour=H/part-0.parquet``), via a
    hash-partitioned group apply — a naive ``write_parquet(partition_cols)``
    emits a file per (block x partition) pair, i.e. thousands of tiny
    files (measured 9004 for 650 partitions). Deterministic names also
    make re-runs idempotent (the reference's append mode duplicates,
    SURVEY.md 2.9). Returns the row count written."""
    import pyarrow.parquet as pq

    from glue_etl_pipeline_ray.functions.groups import raycore_grouped_apply

    def write_group(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64())})
        parts = [f"{c}={g[c][0].as_py()}" for c in part_cols]
        dirp = os.path.join(out_root, *parts)
        os.makedirs(dirp, exist_ok=True)
        path = os.path.join(dirp, "part-0.parquet")
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(g.drop_columns(part_cols), tmp)
        os.replace(tmp, path)
        return pa.table({"n": [g.num_rows]})

    written = raycore_grouped_apply(ds.materialize(), part_cols, write_group)
    return sum(r["n"] for r in written.take_all())


def _union_schema(specs: list[EventTableSpec]) -> pa.Schema:
    fields: dict[str, pa.DataType] = {
        "table": pa.string(),
        "__raw": pa.string(),
        "__error": pa.string(),
    }
    for s in specs:
        for f in s.schema:
            prev = fields.get(f.name)
            assert prev is None or prev == f.type, f"conflicting type for {f.name}"
            fields[f.name] = f.type
    return pa.schema(list(fields.items()))


def conform_union(t: pa.Table, schema: pa.Schema) -> pa.Table:
    cols = []
    for f in schema:
        if f.name in t.column_names:
            c = t[f.name]
            cols.append(pc.cast(c, f.type) if c.type != f.type else c)
        else:
            cols.append(pa.nulls(t.num_rows, f.type))
    return pa.Table.from_arrays(
        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols],
        schema=schema,
    )


def _empty_with_parts(schema: pa.Schema) -> pa.Table:
    s = schema
    for unit in ("year", "month", "day", "hour"):
        s = s.append(pa.field(unit, pa.int32()))
    return s.empty_table()
