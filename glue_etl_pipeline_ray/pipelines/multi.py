"""Multi-table demux replay: one change stream -> N logical table lakes.

The reference routes every event into one of six logical tables by a
classifier over (service, type) (``flat_jsons.py:186-240``,
``convert_to_parquet.py:50-57``) and its extension story is "add a
schema + a bucket + a SQL entry" (SURVEY.md 2.10). The engine analog:
register a :class:`TableSpec` plus a route predicate per logical table;
each table runs its own :class:`ReplayEngine` (own lake, checkpoint,
lineage, DLQ) over the same event stream with the predicate pushed into
the map tasks.

Routing predicates must be key-deterministic (derivable from every
event of a key, including DELETEs) so a key's whole history lands in
exactly one table — same constraint the reference's service-prefix
routing satisfies.

Scale note: each table scans the stream once (read amplification = N).
That is the reference's own layout (per-table JSONL reads) and keeps
per-table checkpoints independent; a shared-scan variant would fuse
routing into one map wave and feed N exchanges — noted as future work,
not needed at current table counts.
"""

from __future__ import annotations

import os
from collections.abc import Callable

import pyarrow as pa

from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import TableSpec


class MultiTableReplayer:
    def __init__(
        self,
        lake_root: str,
        tables: dict[str, tuple[TableSpec, Callable[[pa.Table], pa.Table]]],
        **engine_kwargs,
    ):
        """``tables``: name -> (spec, route_filter). The filter is an
        Arrow-batch -> Arrow-batch predicate applied before validation."""
        self.engines: dict[str, ReplayEngine] = {
            name: ReplayEngine(
                spec,
                os.path.join(lake_root, name),
                event_filter=flt,
                **engine_kwargs,
            )
            for name, (spec, flt) in tables.items()
        }

    def replay(self, events_dir: str) -> dict[str, dict]:
        return {n: e.replay(events_dir) for n, e in self.engines.items()}

    def final_tables(self) -> dict[str, pa.Table]:
        return {n: e.final_table() for n, e in self.engines.items()}

    def final_sha256(self) -> dict[str, str]:
        return {n: e.final_sha256() for n, e in self.engines.items()}
