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
    ``out_dir/_dlq/*.parquet``."""
    ds = read_event_files(paths)
    by_key = {(s.service, s.kind): s for s in specs}

    def route(batch: pa.Table) -> pa.Table:
        svc, kind = [], []
        for err, dj in zip(batch["error"].to_pylist(), batch["detail_json"].to_pylist()):
            if err is not None or dj is None:
                svc.append(None)
                kind.append(None)
                continue
            s, k = classify(json.loads(dj))
            svc.append(s)
            kind.append(k)
        return batch.append_column("service", pa.array(svc, pa.string())).append_column(
            "kind", pa.array(kind, pa.string())
        )

    routed = ds.map_batches(route, batch_format="pyarrow", batch_size=None).materialize()

    counts: dict = {"tables": {}, "dead_lettered": 0}

    # DLQ: decode errors + unroutable + per-table validation failures
    def dlq_mask(t: pa.Table) -> pa.Table:
        bad = pc.or_kleene(
            pc.is_valid(t["error"]),
            pc.or_kleene(pc.is_null(t["service"]), pc.is_null(t["kind"])),
        )
        return t.filter(pc.fill_null(bad, True))

    dlq = routed.map_batches(dlq_mask, batch_format="pyarrow", batch_size=None)
    dlq_dir = os.path.join(out_dir, "_dlq")
    n_dlq = dlq.count()
    if n_dlq:
        dlq.write_parquet(dlq_dir)
    counts["dead_lettered"] = n_dlq

    for spec in specs:

        def table_rows(t: pa.Table, spec=spec) -> pa.Table:
            mask = pc.and_kleene(
                pc.equal(t["service"], spec.service),
                pc.equal(t["kind"], spec.kind),
            )
            t = t.filter(pc.fill_null(mask, False))
            rows = []
            for r in t.to_pylist():
                if any(r.get(req) in (None, "") for req in spec.required):
                    continue  # caught by required-field validation
                detail = json.loads(r["detail_json"])
                for fx in spec.fixups:
                    detail = fx(detail)
                flat = spec.project(detail)
                flat["event_id"] = r["id"]
                flat["date_time"] = r["time"]
                rows.append(flat)
            if not rows:
                return _empty_with_parts(spec.schema)
            out = pa.Table.from_pylist(rows).select(spec.schema.names)
            out = out.cast(spec.schema)
            ts = pc.strptime(out["date_time"], format="%Y-%m-%dT%H:%M:%SZ", unit="s")
            for unit, fn in (("year", pc.year), ("month", pc.month),
                             ("day", pc.day), ("hour", pc.hour)):
                out = out.append_column(unit, pc.cast(fn(ts), pa.int32()))
            return out

        tbl_ds = routed.map_batches(table_rows, batch_format="pyarrow", batch_size=None)
        n = tbl_ds.count()
        if n:
            tbl_ds.write_parquet(
                os.path.join(out_dir, spec.name),
                partition_cols=["year", "month", "day", "hour"],
            )
        counts["tables"][spec.name] = n
    return counts


def _empty_with_parts(schema: pa.Schema) -> pa.Table:
    s = schema
    for unit in ("year", "month", "day", "hour"):
        s = s.append(pa.field(unit, pa.int32()))
    return s.empty_table()
