"""Fixed-work weak-scaling probe (BASELINE.md evidence).

Runs the SAME set of engine map tasks (read row-group chunk -> validate
-> evolve -> partial LWW -> bucket slices, i.e. stages/exchange.py's
``_map_chunk`` body) at two concurrency levels in fresh Ray sessions and
reports mean in-task wall time + aggregate throughput. If per-task time
is flat from N to 4N workers, the engine's tasks don't contend with each
other and throughput scaling is bounded only by the scheduler + the box;
if per-task time inflates, the box's shared memory bandwidth is the
ceiling (each node of a real cluster brings its own).

Usage: python tools/weak_scaling_probe.py [n_tasks] [levels e.g. 4,16]
"""

from __future__ import annotations

import json
import os
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

    import pyarrow.parquet as pq

    from glue_etl_pipeline_ray.spec import repo_file_spec
    from glue_etl_pipeline_ray.stages.exchange import (
        _pin_intraop_threads,
        _validate_reduce_slice,
        plan_chunks,
        warm_cluster,
    )

    spec = repo_file_spec(num_buckets=64)
    files = sorted(glob.glob(os.path.join(ev_dir, "batch=*.parquet")))
    total_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    chunks = plan_chunks(files, target_chunks=max(1, total_rows // 32_768))

    @ray.remote(num_cpus=1)
    def probe_task(chunk, dlq):
        _pin_intraop_threads()
        t0 = time.perf_counter()
        parts = [pq.ParquetFile(f).read_row_groups(rgs) for f, rgs in chunk]
        import pyarrow as pa

        t = parts[0] if len(parts) == 1 else pa.concat_tables(
            parts, promote_options="permissive"
        )
        _validate_reduce_slice(spec, (), t, dlq, 8)
        return time.perf_counter() - t0

    warm_cluster(cpus)
    work = [chunks[i % len(chunks)] for i in range(n_tasks)]
    dlq = "/tmp/weak_probe_dlq"
    # warm page cache + code paths
    ray.get([probe_task.remote(c, dlq) for c in work[: cpus]])
    t0 = time.perf_counter()
    times = ray.get([probe_task.remote(c, dlq) for c in work])
    wall = time.perf_counter() - t0
    print(json.dumps({
        "cpus": cpus,
        "n_tasks": n_tasks,
        "mean_task_sec": round(sum(times) / len(times), 4),
        "wall_sec": round(wall, 3),
        "tasks_per_sec": round(n_tasks / wall, 2),
    }))
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
        out[cpus] = json.loads(proc.stdout.strip().splitlines()[-1])
        print(proc.stdout.strip().splitlines()[-1])
    lo, hi = levels[0], levels[-1]  # 3+ levels: endpoints, like bench.py
    eff = out[hi]["tasks_per_sec"] / ((hi / lo) * out[lo]["tasks_per_sec"])
    inflation = out[hi]["mean_task_sec"] / out[lo]["mean_task_sec"]
    print(json.dumps({
        "metric": f"fixed_work_scaling_{lo}_to_{hi}",
        "efficiency": round(eff, 3),
        "per_task_inflation": round(inflation, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
