"""Hypothesis: random streams with the round-5 lakehouse ops
(optimize_sort / build_lookup_filters / clone) interleaved between
ingest runs must keep every read surface oracle-exact — the ops are
read-path accelerators and snapshots, never state mutations."""

import os
import uuid

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from glue_etl_pipeline_ray.gen import generate_change_events
from glue_etl_pipeline_ray.oracle import replay_oracle
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine, _where_mask
from glue_etl_pipeline_ray.spec import repo_file_spec


@st.composite
def ops_plan(draw):
    n = draw(st.integers(600, 2000))
    seed = draw(st.integers(0, 2**31 - 1))
    n_runs = draw(st.integers(2, 4))
    # gap actions: 0 none, 1 optimize_sort, 2 filters+lookup check, 3 clone
    actions = tuple(
        draw(st.sampled_from([0, 1, 2, 3])) for _ in range(n_runs - 1)
    )
    return n, seed, n_runs, actions


@settings(max_examples=4, deadline=None)
@given(s=ops_plan())
def test_interleaved_lakehouse_ops_match_oracle(ray_session, s):
    n, seed, n_runs, actions = s
    work = f"/tmp/gepr_lkh_{uuid.uuid4().hex[:12]}"
    meta = generate_change_events(
        work, n_events=n, n_batches=n_runs, seed=seed,
        n_repos=8, n_paths=25, dirty_frac=0.05, delete_frac=0.15,
    )
    spec = repo_file_spec(num_buckets=8)
    mode = "delta" if seed % 2 else "rewrite"
    eng = ReplayEngine(
        spec, os.path.join(work, "lake"), state_mode=mode, fold_threshold=2
    )
    clones = []
    for run in range(n_runs):
        eng.replay(meta["events_dir"], max_batches=1)
        if run >= len(actions):
            continue
        act = actions[run]
        if act == 1:
            sha = eng.final_sha256()
            eng.optimize_sort("lang", row_group_rows=256)
            assert eng.final_sha256() == sha  # pure permutation
        elif act == 2:
            eng.build_lookup_filters()
            t = eng.final_table()
            live = list(
                zip(t["repo"].to_pylist()[:4], t["path"].to_pylist()[:4])
            )
            ghosts = [(f"ghost-{i}", "x.py") for i in range(3)]
            got = eng.lookup(live + ghosts)
            assert got.equals(eng.lookup(live + ghosts, use_filters=False))
            assert len(got) == len(live)
        elif act == 3:
            c = eng.clone(os.path.join(work, f"clone{run}"))
            assert c.final_sha256() == eng.final_sha256()
            clones.append(os.path.join(work, f"clone{run}"))

    oracle = replay_oracle(spec, meta["events_dir"])
    assert eng.final_sha256() == oracle["sha256"], (n, seed, n_runs, actions)

    # scan == brute filter regardless of which rewrites happened
    where = [("lang", "in", ["py", "go"])]
    brute = eng.final_table()
    brute = brute.filter(_where_mask(brute, where))
    batches = list(eng.scan(where).iter_batches(batch_format="pyarrow"))
    got_t = pa.concat_tables(batches) if batches else brute.slice(0, 0)
    order = [(c, "ascending") for c in brute.column_names]
    assert got_t.select(brute.column_names).sort_by(order).equals(
        brute.sort_by(order)
    )

    # every mid-stream clone catches up to the same truth; diff drains
    for cdir in clones:
        ceng = ReplayEngine(spec, cdir, state_mode=mode, fold_threshold=2)
        ceng.replay(meta["events_dir"])
        assert ceng.final_sha256() == oracle["sha256"]
        assert eng.diff_with(ceng).count() == 0
