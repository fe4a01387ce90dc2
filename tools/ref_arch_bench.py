"""Reference-architecture throughput comparison on identical inputs.

The reference publishes no performance numbers (BASELINE.md), so this
harness measures a faithful *architectural* mimic of it — one Python
process, sequential per-file loop, per-event dict validation, fix-ups,
projection, per-table buffer, final Parquet write (its profile+flat+
convert jobs collapsed, minus the S3 hops and process restarts, i.e. a
FAVORABLE rendition of the reference) — against this repo's
``run_eventfile_etl`` on the same synthetic Firehose-style blobs.

Usage: python tools/ref_arch_bench.py [n_files] [events_per_file]
Prints one JSON line with events/sec for both and the speedup.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_blobs(out_dir: str, n_files: int, per_file: int) -> list[str]:
    import numpy as np

    rng = np.random.default_rng(42)
    paths = []
    for fi in range(n_files):
        parts = []
        for i in range(per_file):
            kind = rng.random()
            ev_id = f"f{fi}-e{i}"
            t = f"2022-04-{(fi % 27) + 1:02d}T{(i % 24):02d}:00:00Z"
            if kind < 0.5:
                ev = {
                    "id": ev_id, "time": t, "source": "app.event.file",
                    "detail": {
                        "type": "EFPredictionEvent",
                        "prediction": {
                            "service": "microone",
                            "prediction_id": f"pid-{fi}-{i}",
                            "sentences_scores": [
                                {"score": int(rng.integers(-1, 100))}
                                for _ in range(4)
                            ],
                        },
                    },
                }
            elif kind < 0.95:
                ev = {
                    "id": ev_id, "time": t, "source": "app.event.file",
                    "detail": {
                        "type": "EFEvaluationEvent",
                        "evaluation": {
                            "service": "microthree",
                            "action": "ADD_TAG",
                            "tags": ["a", "b"] if i % 3 == 0 else ("null" if i % 3 == 1 else "solo"),
                        },
                    },
                }
            else:  # unknown service (dead-letter path)
                ev = {
                    "id": ev_id, "time": t, "source": "app.event.file",
                    "detail": {"type": "TAG_IMAGE", "evaluation": {"service": "imageTagging"}},
                }
            parts.append(json.dumps(ev))
        p = os.path.join(out_dir, f"ef-prod-stream-1-{fi:05d}")
        with open(p, "w") as f:
            f.write("".join(parts))  # Firehose style: no delimiters
        paths.append(p)
    return paths


def specs():
    import pyarrow as pa

    from glue_etl_pipeline_ray.pipelines.eventfile_etl import EventTableSpec

    def score_fixup(detail):
        pred = detail.get("prediction") or {}
        for s in pred.get("sentences_scores") or []:
            if isinstance(s.get("score"), int):
                s["score"] = float(s["score"])
        return detail

    def tags_fixup(detail):
        ev = detail.get("evaluation") or {}
        tags = ev.get("tags")
        if tags is None or tags == "null":
            ev["tags"] = []
        elif isinstance(tags, str):
            ev["tags"] = [tags]
        return detail

    return [
        EventTableSpec(
            service="microone", kind="prediction",
            schema=pa.schema(
                [("event_id", pa.string()), ("date_time", pa.string()),
                 ("prediction_id", pa.string()), ("max_score", pa.float64())]
            ),
            fixups=(score_fixup,),
            project=lambda d: {
                "prediction_id": d["prediction"]["prediction_id"],
                "max_score": max(
                    (s["score"] for s in d["prediction"].get("sentences_scores", [])),
                    default=-1.0,
                ),
            },
        ),
        EventTableSpec(
            service="microthree", kind="event",
            schema=pa.schema(
                [("event_id", pa.string()), ("date_time", pa.string()),
                 ("action", pa.string()), ("n_tags", pa.int64())]
            ),
            fixups=(tags_fixup,),
            project=lambda d: {
                "action": d["evaluation"].get("action"),
                "n_tags": len(d["evaluation"].get("tags", [])),
            },
        ),
    ]


def run_reference_mimic(paths: list[str], out_dir: str) -> dict:
    """The reference's loop: one process, file by file, event by event
    (``data_profiling.py:145`` + ``flat_jsons.py:277`` +
    ``convert_to_parquet.py:218``), collapsed into one pass."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from glue_etl_pipeline_ray.pipelines.eventfile_etl import classify
    from glue_etl_pipeline_ray.sources.eventfiles import split_concat_json

    sp = specs()
    by_key = {(s.service, s.kind): s for s in sp}
    tables: dict[str, list] = {s.name: [] for s in sp}
    dlq = 0
    for p in paths:
        with open(p) as f:
            blob = f.read()
        events, bad = split_concat_json(blob)
        dlq += len(bad)
        for ev in events:
            # per-event validation (Cerberus analog: required + types)
            if not ev.get("id") or not ev.get("time") or "detail" not in ev:
                dlq += 1
                continue
            service, kind = classify(ev["detail"])
            spec = by_key.get((service, kind))
            if spec is None:
                dlq += 1
                continue
            detail = ev["detail"]
            for fx in spec.fixups:
                detail = fx(detail)
            flat = spec.project(detail)
            flat["event_id"] = ev["id"]
            flat["date_time"] = ev["time"]
            tables[spec.name].append(flat)
    import pyarrow.compute as _pc

    for name, rows in tables.items():
        if rows:
            t = pa.Table.from_pylist(rows)
            ts = _pc.strptime(t["date_time"], format="%Y-%m-%dT%H:%M:%SZ", unit="s")
            for unit, fn in (("year", _pc.year), ("month", _pc.month),
                             ("day", _pc.day), ("hour", _pc.hour)):
                t = t.append_column(unit, _pc.cast(fn(ts), pa.int32()))
            # the reference's convert job writes hive-partitioned parquet
            pq.write_to_dataset(
                t, os.path.join(out_dir, name),
                partition_cols=["year", "month", "day", "hour"],
            )
    return {"tables": {k: len(v) for k, v in tables.items()}, "dead_lettered": dlq}


def main() -> int:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    n_events = n_files * per_file

    work = tempfile.mkdtemp(prefix="ref_arch_bench_")
    blob_dir = os.path.join(work, "blobs")
    os.makedirs(blob_dir)
    paths = make_blobs(blob_dir, n_files, per_file)

    # reference-architecture mimic (single process, sequential)
    ref_out = os.path.join(work, "ref_out")
    os.makedirs(ref_out)
    t0 = time.perf_counter()
    ref_counts = run_reference_mimic(paths, ref_out)
    ref_dt = time.perf_counter() - t0

    # this engine
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from glue_etl_pipeline_ray.pipelines.eventfile_etl import run_eventfile_etl
    from glue_etl_pipeline_ray.stages.exchange import warm_cluster

    warm_cluster()
    eng_out = os.path.join(work, "eng_out")
    t0 = time.perf_counter()
    eng_counts = run_eventfile_etl(paths, specs(), eng_out)
    eng_dt = time.perf_counter() - t0

    same = eng_counts["tables"] == ref_counts["tables"]
    print(
        json.dumps(
            {
                "n_events": n_events,
                "reference_arch_events_per_sec": round(n_events / ref_dt, 1),
                "engine_events_per_sec": round(n_events / eng_dt, 1),
                "speedup": round(ref_dt / eng_dt, 2),
                "row_counts_match": same,
                "table_rows": eng_counts["tables"],
            }
        )
    )
    ray.shutdown()
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
