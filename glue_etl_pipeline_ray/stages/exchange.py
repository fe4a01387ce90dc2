"""Raw-Ray keyed exchange: the replay hot path's map-side-partition shuffle.

Why raw Ray here (and only here): the replay inner loop needs a *keyed
exchange whose partitioning is pinned to the sink's bucket layout* — every
merge task must receive exactly the rows of its sink buckets AND read/write
those buckets' lake files. ``Dataset.groupby(bucket).map_groups`` expresses
this but via a general sort-based shuffle whose per-group machinery costs
~10x the actual merge work at micro-batch sizes (measured: 64-bucket merge
of 130k rows = 0.97 s of compute inside 9+ s of groupby overhead). This
module is the textbook two-stage shuffle on Ray core — the same pattern
Ray Data's own shuffle uses internally (M map tasks x G reduce groups of
object-store refs):

    map task  (per row-group chunk):  read -> validate(+DLQ) -> evolve ->
              partial LWW -> sort by sink bucket -> split into G
              zero-copy slices, returned as G separate objects
    merge task (per exchange group):  fetch its G-column of slices ->
              per-sink-bucket LWW merge vs prior lake file -> staged
              idempotent write -> lineage records

Scale shape: G (exchange groups) ~ 2x cluster cores, independent of the
sink bucket count B (each merge task owns the contiguous bucket range
``[g*B/G, (g+1)*B/G)``), so object count is M x G — bounded by compute
parallelism, not by B (B can be 2^16 at 100 TB while G stays ~10^3).
Everything else in the engine stays on the Dataset API; the groupby path
is kept as ``ReplayEngine(exchange="groupby")`` and tested for equality.

Reference analog: this stage *is* the Spark shuffle implicit in the
reference's convert job (``convert_to_parquet.py:218-239``) made explicit.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from glue_etl_pipeline_ray.spec import TableSpec
from glue_etl_pipeline_ray.stages.evolve import make_evolve_fn
from glue_etl_pipeline_ray.stages.merge import merge_bucket_table
from glue_etl_pipeline_ray.stages.partial import BUCKET_COL, make_partial_lww
from glue_etl_pipeline_ray.stages.validate import ValidateFn


def plan_chunks(
    files: list[str], target_chunks: int
) -> list[list[tuple[str, list[int]]]]:
    """Pack (file, row-group) units into <= target_chunks row-balanced
    chunks. Row-group granularity is what lets one big batch file fan out
    across the cluster (the reference's one-file-one-iteration straggler,
    SURVEY.md 4 'sharding unit', dissolved)."""
    units: list[tuple[str, int, int]] = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            units.append((f, rg, md.row_group(rg).num_rows))
    if not units:
        return []
    n_chunks = max(1, min(target_chunks, len(units)))
    # greedy longest-first into least-loaded chunk
    chunks: list[list[tuple[str, int]]] = [[] for _ in range(n_chunks)]
    loads = [0] * n_chunks
    for f, rg, rows in sorted(units, key=lambda u: -u[2]):
        i = loads.index(min(loads))
        chunks[i].append((f, rg))
        loads[i] += rows
    out = []
    for ch in chunks:
        if not ch:
            continue
        by_file: dict[str, list[int]] = {}
        for f, rg in ch:
            by_file.setdefault(f, []).append(rg)
        out.append([(f, sorted(rgs)) for f, rgs in sorted(by_file.items())])
    return out


@ray.remote
def _map_chunk(
    spec: TableSpec,
    evolved: tuple[tuple[str, str], ...],
    chunk: list[tuple[str, list[int]]],
    dlq_dir: str,
    num_exchange: int,
):
    """read -> validate -> evolve -> partial LWW -> G bucket-range slices."""
    parts = [pq.ParquetFile(f).read_row_groups(rgs) for f, rgs in chunk]
    t = (
        parts[0]
        if len(parts) == 1
        else pa.concat_tables(parts, promote_options="permissive")
    )
    t = ValidateFn(spec, dlq_dir)(t)
    t = make_evolve_fn(spec, evolved)(t)
    t = make_partial_lww(spec, spec.num_buckets)(t)

    b = t[BUCKET_COL].to_numpy(zero_copy_only=False)
    order = np.argsort(b, kind="stable")
    t = t.take(order)
    ex = b[order] * num_exchange // spec.num_buckets
    bounds = np.searchsorted(ex, np.arange(num_exchange + 1))
    slices = [
        t.slice(int(bounds[g]), int(bounds[g + 1] - bounds[g]))
        for g in range(num_exchange)
    ]
    return tuple(slices) if num_exchange > 1 else slices[0]


@ray.remote
def _merge_group(
    spec: TableSpec,
    evolved: tuple[tuple[str, str], ...],
    lake_dir: str,
    staging_dir: str,
    batch_id: int,
    compute_hash: bool,
    *slices: pa.Table,
) -> list[dict]:
    """LWW-merge every sink bucket in this exchange group's range."""
    live = [s for s in slices if s.num_rows]
    if not live:
        return []
    t = live[0] if len(live) == 1 else pa.concat_tables(live)
    b = t[BUCKET_COL].to_numpy(zero_copy_only=False)
    order = np.argsort(b, kind="stable")
    t = t.take(order)
    bs = b[order]
    records = []
    starts = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
    ends = np.r_[starts[1:], len(bs)]
    for s, e in zip(starts, ends):
        records.append(
            merge_bucket_table(
                spec,
                evolved,
                lake_dir,
                staging_dir,
                batch_id,
                int(bs[s]),
                t.slice(int(s), int(e - s)),
                compute_hash=compute_hash,
            )
        )
    return records


def exchange_apply_batch(
    spec: TableSpec,
    evolved: tuple[tuple[str, str], ...],
    files: list[str],
    lake_dir: str,
    staging_dir: str,
    dlq_dir: str,
    batch_id: int,
    compute_hash: bool = True,
    num_exchange: int | None = None,
) -> list[dict]:
    """Run one micro-batch through the raw-Ray exchange. Returns lineage
    records (one per touched sink bucket). Idempotent: staged files are
    deterministic per bucket; the caller promotes + commits."""
    if num_exchange is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_exchange = max(2, min(spec.num_buckets, cpus * 2))
    num_exchange = max(1, min(num_exchange, spec.num_buckets))

    chunks = plan_chunks(files, target_chunks=num_exchange)
    if not chunks:
        return []
    map_refs = [
        _map_chunk.options(num_returns=num_exchange).remote(
            spec, evolved, ch, dlq_dir, num_exchange
        )
        for ch in chunks
    ]
    if num_exchange == 1:
        map_refs = [[r] for r in map_refs]
    merge_refs = [
        _merge_group.remote(
            spec,
            evolved,
            lake_dir,
            staging_dir,
            batch_id,
            compute_hash,
            *(map_refs[m][g] for m in range(len(map_refs))),
        )
        for g in range(num_exchange)
    ]
    return [rec for sub in ray.get(merge_refs) for rec in sub]
