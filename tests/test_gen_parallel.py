"""Parallel fixture generator gates (round 5): the per-batch Ray-task
generator must be (1) deterministic — byte-identical output across
runs, independent of task scheduling, (2) schema-identical to the
serial generator, and (3) a valid fixture — the engine's replay of its
stream sha-matches the single-threaded oracle, and the stream actually
exercises dirty routing and schema evolution.
"""

import glob
import hashlib
import os

import pyarrow.parquet as pq

from glue_etl_pipeline_ray.gen import (
    generate_change_events,
    generate_change_events_parallel,
)
from glue_etl_pipeline_ray.oracle import replay_oracle
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import repo_file_spec

GEN = dict(
    n_events=20_000,
    n_batches=4,
    evolve_from_batch=2,
    dirty_frac=0.02,
    seed=777,
)


def _file_hashes(d):
    out = {}
    for p in sorted(glob.glob(os.path.join(d, "events", "*.parquet"))):
        out[os.path.basename(p)] = hashlib.sha256(
            open(p, "rb").read()
        ).hexdigest()
    return out


def test_parallel_gen_deterministic(ray_session, tmp_path):
    a = generate_change_events_parallel(
        str(tmp_path / "a"), num_cpus_per_task=1, **GEN
    )
    b = generate_change_events_parallel(
        str(tmp_path / "b"), num_cpus_per_task=2, **GEN
    )
    assert a["n_events"] == b["n_events"] == GEN["n_events"]
    ha, hb = _file_hashes(str(tmp_path / "a")), _file_hashes(
        str(tmp_path / "b")
    )
    assert ha == hb and len(ha) == GEN["n_batches"]


def test_parallel_gen_schema_matches_serial(ray_session, tmp_path):
    generate_change_events(str(tmp_path / "s"), **GEN)
    generate_change_events_parallel(
        str(tmp_path / "p"), num_cpus_per_task=1, **GEN
    )
    for name in (f"batch={b:05d}.parquet" for b in range(GEN["n_batches"])):
        ss = pq.read_schema(os.path.join(tmp_path, "s", "events", name))
        ps = pq.read_schema(os.path.join(tmp_path, "p", "events", name))
        assert ss.equals(ps), name


def test_parallel_gen_replay_matches_oracle(ray_session, tmp_path):
    gen = generate_change_events_parallel(
        str(tmp_path / "w"), num_cpus_per_task=1, **GEN
    )
    spec = repo_file_spec()
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    eng.replay(gen["events_dir"])
    o = replay_oracle(spec, gen["events_dir"])
    assert eng.final_sha256() == o["sha256"]
    # the stream exercises the contract: dirt routed, evolution applied
    assert o["n_dead_lettered"] > 0
    assert "size_bytes" in eng.final_table().column_names
