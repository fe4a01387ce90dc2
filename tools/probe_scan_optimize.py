#!/usr/bin/env python3
"""Scan + optimize_sort probe over a soak-built rewrite lake: measure a
predicate scan before and after clustering, plus the row-group-overlap
footprint the Parquet scanner can skip.

What "scale-safe" must look like: optimize_sort is one task per bucket
(pure permutation, sha-invariant); the post-optimize scan should touch
only row groups whose min/max admit the predicate value, so its wall
and decompressed volume drop while results stay byte-identical.

Usage:
  python tools/soak_1e8.py gen    --n-events=40000000 --cache-dir=D --parallel-gen
  python tools/soak_1e8.py replay --n-events=40000000 --cache-dir=D \
      --state-mode=rewrite --keep-lake
  python tools/probe_scan_optimize.py --lake D/soak_lake_rewrite

Prints one JSON line per step plus a summary line for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def rg_overlap(lake: str, versions: dict, col: str, value) -> tuple[int, int]:
    import pyarrow.parquet as pq

    total = match = 0
    for b, v in versions.items():
        path = os.path.join(lake, f"part-{b:05d}-v{v:05d}.parquet")
        pf = pq.ParquetFile(path)
        idx = pf.schema_arrow.names.index(col)
        for g in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(g).column(idx).statistics
            total += 1
            if st is None or st.min is None or st.min <= value <= st.max:
                match += 1
    return match, total


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--lake", default="/tmp/gepr_scanprobe/soak_lake_rewrite")
    p.add_argument("--num-buckets", type=int, default=256)
    p.add_argument("--num-cpus", type=int, default=32)
    p.add_argument("--col", default="lang")
    p.add_argument("--value", default="py")
    p.add_argument("--row-group-rows", type=int, default=1024)
    args = p.parse_args()

    import ray

    ray.init(
        address="local",
        num_cpus=args.num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
    from glue_etl_pipeline_ray.spec import repo_file_spec

    eng = ReplayEngine(
        repo_file_spec(num_buckets=args.num_buckets),
        args.lake,
        state_mode="rewrite",
    )
    where = [(args.col, "==", args.value)]

    # scan twice: first run pays cold page cache + footer reads, the
    # second is the steady-state measurement the comparison uses
    eng.scan(where).count()
    t0 = time.monotonic()
    n_pre = eng.scan(where).count()
    scan_pre = time.monotonic() - t0
    m0, g0 = rg_overlap(args.lake, eng.ckpt.bucket_versions, args.col, args.value)
    print(json.dumps({"step": "scan_pre_warm", "rows": n_pre, "sec": round(scan_pre, 3),
                      "rg_overlap": m0, "rg_total": g0}))

    sha_pre = eng.final_sha256()
    t0 = time.monotonic()
    s = eng.optimize_sort(args.col, row_group_rows=args.row_group_rows)
    opt_sec = time.monotonic() - t0
    print(json.dumps({"step": "optimize_sort", "sec": round(opt_sec, 3), **s}))

    eng.scan(where).count()
    t0 = time.monotonic()
    n_post = eng.scan(where).count()
    scan_post = time.monotonic() - t0
    m1, g1 = rg_overlap(args.lake, eng.ckpt.bucket_versions, args.col, args.value)
    sha_post = eng.final_sha256()
    print(json.dumps({"step": "scan_post", "rows": n_post, "sec": round(scan_post, 3),
                      "rg_overlap": m1, "rg_total": g1}))
    ok = n_pre == n_post and sha_pre == sha_post
    print(json.dumps({
        "summary": "scan_optimize_probe",
        "rows": n_pre,
        "sha_invariant": ok,
        "scan_pre_warm_s": round(scan_pre, 3),
        "optimize_s": round(opt_sec, 3),
        "scan_post_warm_s": round(scan_post, 3),
        "rg_overlap_pre": f"{m0}/{g0}",
        "rg_overlap_post": f"{m1}/{g1}",
    }))
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    import sys

    sys.exit(main())
