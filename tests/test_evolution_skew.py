"""Schema evolution (FIXTURES.md F4) and hot-key skew (SURVEY.md 7.4)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from glue_etl_pipeline_ray.gen import generate_change_events
from glue_etl_pipeline_ray.oracle import replay_oracle
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import repo_file_spec
from glue_etl_pipeline_ray.stages.partial import BUCKET_COL, make_partial_lww


def test_evolved_column_backfilled_null(tmp_path):
    meta = generate_change_events(
        str(tmp_path), n_events=3000, n_repos=10, n_paths=30, n_batches=3,
        evolve_from_batch=2, seed=21,
    )
    spec = repo_file_spec(num_buckets=8)
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    eng.replay(meta["events_dir"])
    t = eng.final_table()
    assert t.column_names[-1] == "size_bytes"  # evolved col, canonical last
    # rows last written pre-evolution read as null; post-evolution non-null
    nulls = pc.sum(pc.is_null(t["size_bytes"])).as_py()
    assert 0 < nulls < t.num_rows
    assert eng.final_sha256() == replay_oracle(spec, meta["events_dir"])["sha256"]


def test_evolution_registry_persists_for_resume(tmp_path):
    meta = generate_change_events(
        str(tmp_path), n_events=2000, n_batches=2, evolve_from_batch=1, seed=22
    )
    spec = repo_file_spec(num_buckets=8)
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    eng.replay(meta["events_dir"])
    eng2 = ReplayEngine(spec, str(tmp_path / "lake"))
    assert eng2.ckpt.evolved == (("size_bytes", "int64"),)


def test_hot_key_skew_matches_oracle(tmp_path):
    """Zipf-heavy stream: one repo dominates. The partial-LWW combiner
    bounds shuffle volume by distinct keys per block, so correctness and
    completion are unaffected."""
    meta = generate_change_events(
        str(tmp_path), n_events=5000, n_repos=5, n_paths=10, n_batches=2,
        zipf_a=1.05, seed=23,
    )
    spec = repo_file_spec(num_buckets=8)
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    eng.replay(meta["events_dir"])
    assert eng.final_sha256() == replay_oracle(spec, meta["events_dir"])["sha256"]


def test_partial_lww_collapses_hot_key():
    spec = repo_file_spec(num_buckets=8)
    n = 10_000
    t = pa.table(
        {
            "seq": pa.array(np.arange(n)),
            "op": pa.array(["UPDATE"] * n),
            "repo": pa.array(["hot/repo"] * n),
            "path": pa.array(["f.py"] * n),
            "commit": pa.array(["a" * 40] * n),
            "lang": pa.array(["py"] * n),
            "content": pa.array([f"v{i}" for i in range(n)]),
        }
    )
    out = make_partial_lww(spec, 8)(t)
    assert out.num_rows == 1  # 10k updates -> 1 shuffled row
    assert out["seq"][0].as_py() == n - 1
    assert out["content"][0].as_py() == f"v{n-1}"
    assert BUCKET_COL in out.column_names


def test_wide_rows_roundtrip(tmp_path):
    """Very wide content strings survive the full path unchanged."""
    spec = repo_file_spec(num_buckets=4)
    wide = "x" * 2_000_000
    import os
    ev = tmp_path / "events"
    os.makedirs(ev)
    pq.write_table(
        pa.table(
            {
                "seq": [1, 2],
                "batch_id": [0, 0],
                "op": ["INSERT", "INSERT"],
                "repo": ["o/r", "o/r"],
                "path": ["big.py", "small.py"],
                "commit": ["a" * 40, "b" * 40],
                "lang": ["py", "py"],
                "content": [wide, "tiny"],
            }
        ),
        str(ev / "batch=00000.parquet"),
    )
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    eng.replay(str(ev))
    t = eng.final_table()
    got = {p: c for p, c in zip(t["path"].to_pylist(), t["content"].to_pylist())}
    assert got["big.py"] == wide and got["small.py"] == "tiny"
