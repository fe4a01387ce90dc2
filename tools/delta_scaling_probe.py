"""Fixed-work weak-scaling probe for state_mode="delta" (BASELINE.md).

Same methodology as tools/weak_scaling_probe.py (which covers the shared
map task) but for the two task bodies UNIQUE to delta mode:

- "reduce": validate -> evolve -> partial LWW -> per-bucket ``delta-*``
  parquet writes (stages/exchange.py ``_delta_group`` body)
- "fold": read an 8-delta chain -> LWW fold -> write the new base
  (pipelines/replay.py ``fold_one`` body)

The SAME set of tasks runs at two concurrency levels in fresh Ray
sessions; flat per-task time from N to 4N workers means the delta sink's
tasks don't contend with each other and end-to-end scaling is bounded
only by the box (whose shared memory bus a real N -> 4N *node* cluster
does not share).

Usage: python tools/delta_scaling_probe.py [n_tasks] [levels e.g. 4,16]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(n_tasks: int, cpus: int, ev_dir: str) -> None:
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    import glob

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from glue_etl_pipeline_ray.spec import repo_file_spec
    from glue_etl_pipeline_ray.stages.exchange import (
        _pin_intraop_threads,
        _validate_reduce_slice,
        plan_chunks,
        warm_cluster,
    )
    from glue_etl_pipeline_ray.stages.partial import BUCKET_COL

    spec = repo_file_spec(num_buckets=64)
    files = sorted(glob.glob(os.path.join(ev_dir, "batch=*.parquet")))
    total_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    chunks = plan_chunks(files, target_chunks=max(1, total_rows // 32_768))

    @ray.remote(num_cpus=1)
    def reduce_task(chunk, dlq, out_dir, task_id):
        """One delta-sink work unit: map body + the group delta-file
        write (one row group per touched bucket — the production
        ``_delta_group`` body)."""
        _pin_intraop_threads()
        from glue_etl_pipeline_ray.stages.merge import (
            events_to_state,
            write_delta_group,
        )

        t0 = time.perf_counter()
        parts = [pq.ParquetFile(f).read_row_groups(rgs) for f, rgs in chunk]
        t = parts[0] if len(parts) == 1 else pa.concat_tables(
            parts, promote_options="permissive"
        )
        slices = _validate_reduce_slice(spec, (), t, dlq, 1)
        t = slices[0]
        b = t[BUCKET_COL].to_numpy(zero_copy_only=False)
        order = np.argsort(b, kind="stable")
        t = t.take(order)
        bs = b[order]
        lake = os.path.join(out_dir, f"t{task_id:04d}")
        os.makedirs(lake, exist_ok=True)
        state_t, _ = events_to_state(spec, (), t)
        starts = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
        ends = np.r_[starts[1:], len(bs)]
        write_delta_group(
            spec, (), lake, 0, task_id, state_t, bs[starts], starts, ends
        )
        dt = time.perf_counter() - t0
        shutil.rmtree(lake, ignore_errors=True)
        return dt

    @ray.remote(num_cpus=1)
    def fold_task(lake, bucket, deltas, out_dir, task_id):
        """One compaction work unit: fold an 8-delta chain to a base."""
        _pin_intraop_threads()
        from glue_etl_pipeline_ray.stages.merge import (
            part_name,
            read_bucket_state,
            write_atomic,
        )

        t0 = time.perf_counter()
        st = read_bucket_state(spec, (), lake, None, deltas, bucket)
        dst = os.path.join(out_dir, f"f{task_id:04d}")
        os.makedirs(dst, exist_ok=True)
        write_atomic(os.path.join(dst, part_name(bucket, 99)), st)
        dt = time.perf_counter() - t0
        shutil.rmtree(dst, ignore_errors=True)
        return dt

    warm_cluster(cpus)
    out_dir = "/tmp/delta_probe_out"
    dlq = "/tmp/delta_probe_dlq"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    # ---- build one real 8-deep delta-chain lake for the fold probe
    # (written once, group-file layout — the production sink's shape)
    from glue_etl_pipeline_ray.stages.merge import (
        events_to_state,
        write_delta_group,
    )

    chain_lake = os.path.join(out_dir, "chain_lake")
    os.makedirs(chain_lake, exist_ok=True)
    chain_of: dict[int, list] = {}
    for v, chunk in enumerate(chunks[:8]):
        parts = [pq.ParquetFile(f).read_row_groups(rgs) for f, rgs in chunk]
        t = parts[0] if len(parts) == 1 else pa.concat_tables(
            parts, promote_options="permissive"
        )
        sl = _validate_reduce_slice(spec, (), t, dlq, 1)[0]
        b = sl[BUCKET_COL].to_numpy(zero_copy_only=False)
        order = np.argsort(b, kind="stable")
        sl = sl.take(order)
        bs = b[order]
        state_t, _ = events_to_state(spec, (), sl)
        starts = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
        ends = np.r_[starts[1:], len(bs)]
        for rec in write_delta_group(
            spec, (), chain_lake, v, 0, state_t, bs[starts], starts, ends
        ):
            chain_of.setdefault(rec["bucket"], []).append([v, 0])
    buckets_with_chains = sorted(chain_of)

    results = {}
    for name, mk in (
        ("reduce", lambda i: reduce_task.remote(
            chunks[i % len(chunks)], dlq, out_dir, i)),
        ("fold", lambda i: fold_task.remote(
            chain_lake,
            buckets_with_chains[i % len(buckets_with_chains)],
            chain_of[buckets_with_chains[i % len(buckets_with_chains)]],
            out_dir, i)),
    ):
        ray.get([mk(i) for i in range(cpus)])  # warm cache + code paths
        t0 = time.perf_counter()
        times = ray.get([mk(i) for i in range(n_tasks)])
        wall = time.perf_counter() - t0
        results[name] = {
            "mean_task_sec": round(sum(times) / len(times), 4),
            "wall_sec": round(wall, 3),
            "tasks_per_sec": round(n_tasks / wall, 2),
        }
    shutil.rmtree(out_dir, ignore_errors=True)
    print(json.dumps({"cpus": cpus, "n_tasks": n_tasks, **results}))
    ray.shutdown()


def main() -> int:
    if len(sys.argv) >= 4 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
        return 0
    n_tasks = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    levels = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "4,16").split(",")]

    from bench import make_events

    ev_dir = make_events(2_000_000, "/tmp/gepr_bench_cache")
    out = {}
    for cpus in levels:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             str(n_tasks), str(cpus), ev_dir],
            capture_output=True, text=True, check=True,
        )
        line = proc.stdout.strip().splitlines()[-1]
        out[cpus] = json.loads(line)
        print(line)
    lo, hi = levels[0], levels[-1]  # 3+ levels: endpoints, like bench.py
    for stage in ("reduce", "fold"):
        eff = out[hi][stage]["tasks_per_sec"] / (
            (hi / lo) * out[lo][stage]["tasks_per_sec"]
        )
        inflation = (
            out[hi][stage]["mean_task_sec"] / out[lo][stage]["mean_task_sec"]
        )
        print(json.dumps({
            "metric": f"delta_{stage}_fixed_work_scaling_{lo}_to_{hi}",
            "efficiency": round(eff, 3),
            "per_task_inflation": round(inflation, 3),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
