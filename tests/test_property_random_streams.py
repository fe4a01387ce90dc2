"""Property-based: arbitrary change-event streams — valid, dirty, weird —
must always satisfy engine sha == single-threaded oracle sha, in both
state modes. (The reference has no randomized testing, SURVEY.md §5;
this is the engine's upgrade.)"""

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings, strategies as st

from glue_etl_pipeline_ray.oracle import replay_oracle
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import repo_file_spec

REPOS = ["org0/repoA", "org0/repoB", "org1/repoC", None]
PATHS = ["src/a.py", "src/b.js", "docs/r.md", None]
LANGS = ["py", "js", "md", "klingon", None]
OPS = ["INSERT", "UPDATE", "DELETE", "TAG_IMAGE", None]
HEX = "0123456789abcdef"


def _commit(rng):
    if rng.random() < 0.1:
        return rng.choice(["not-a-sha", None, "abc"])
    return "".join(rng.choice(list(HEX), 40))


@st.composite
def stream(draw):
    n = draw(st.integers(40, 200))
    n_batches = draw(st.integers(1, 3))
    seed = draw(st.integers(0, 2**31 - 1))
    return n, n_batches, seed


@settings(max_examples=6, deadline=None)
@given(s=stream())
def test_random_stream_matches_oracle(ray_session, s):
    n, n_batches, seed = s
    rng = np.random.default_rng(seed)
    work = f"/tmp/gepr_prop_{uuid.uuid4().hex[:12]}"
    ev_dir = os.path.join(work, "events")
    os.makedirs(ev_dir)

    seq = rng.permutation(n).astype(np.int64)
    rows = {
        "seq": seq,
        "batch_id": (seq % n_batches).astype(np.int64),
        "op": [rng.choice(OPS, p=[0.3, 0.4, 0.15, 0.1, 0.05]) for _ in range(n)],
        "repo": [rng.choice(REPOS, p=[0.4, 0.3, 0.25, 0.05]) for _ in range(n)],
        "path": [rng.choice(PATHS, p=[0.4, 0.3, 0.25, 0.05]) for _ in range(n)],
        "commit": [_commit(rng) for _ in range(n)],
        "lang": [rng.choice(LANGS, p=[0.4, 0.3, 0.2, 0.05, 0.05]) for _ in range(n)],
        "content": [
            None if rng.random() < 0.1 else f"content-{rng.integers(0, 20)}"
            for _ in range(n)
        ],
    }
    t = pa.table(
        {
            "seq": pa.array(rows["seq"]),
            "batch_id": pa.array(rows["batch_id"]),
            "op": pa.array(rows["op"], pa.string()),
            "repo": pa.array(rows["repo"], pa.string()),
            "path": pa.array(rows["path"], pa.string()),
            "commit": pa.array(rows["commit"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
            "content": pa.array(rows["content"], pa.string()),
        }
    )
    for b in range(n_batches):
        part = t.filter(pa.compute.equal(t["batch_id"], b))
        pq.write_table(part, os.path.join(ev_dir, f"batch={b:05d}.parquet"))

    spec = repo_file_spec(num_buckets=8)
    oracle = replay_oracle(spec, ev_dir)
    mode = "delta" if seed % 2 else "rewrite"
    eng = ReplayEngine(
        spec, os.path.join(work, f"lake_{mode}"), state_mode=mode, fold_threshold=2
    )
    eng.replay(ev_dir)
    assert eng.final_sha256() == oracle["sha256"], (n, n_batches, seed, mode)


@settings(max_examples=4, deadline=None)
@given(s=stream())
def test_random_nested_stream_matches_oracle(ray_session, s):
    """Same property over a spec with nested struct/list<struct> payload
    columns (arbitrary null/empty/missing shapes at depth)."""
    from glue_etl_pipeline_ray.spec import Rule, TableSpec, type_from_name

    n, n_batches, seed = s
    rng = np.random.default_rng(seed + 7)
    work = f"/tmp/gepr_propn_{uuid.uuid4().hex[:12]}"
    ev_dir = os.path.join(work, "events")
    os.makedirs(ev_dir)

    meta_t = "struct<idx:int64,tags:list<string>>"
    spec = TableSpec(
        name="nested_prop",
        key_cols=("repo", "path"),
        base_cols=(("meta", meta_t),),
        rules=(
            Rule("repo", "not_null"),
            Rule("path", "not_null"),
            Rule("op", "enum", allowed=("INSERT", "UPDATE", "DELETE")),
        ),
        num_buckets=4,
    )

    def meta(_):
        r = rng.random()
        if r < 0.25:
            return None
        if r < 0.4:
            return {"idx": None, "tags": None}
        if r < 0.55:
            return {"idx": int(rng.integers(0, 5)), "tags": []}
        return {
            "idx": int(rng.integers(0, 5)),
            "tags": [
                None if rng.random() < 0.2 else f"t{int(x)}"
                for x in rng.integers(0, 3, int(rng.integers(1, 4)))
            ],
        }

    seq = rng.permutation(n).astype(np.int64)
    t = pa.table(
        {
            "seq": pa.array(seq),
            "batch_id": pa.array((seq % n_batches).astype(np.int64)),
            "op": pa.array(
                [rng.choice(OPS, p=[0.3, 0.4, 0.15, 0.1, 0.05]) for _ in range(n)],
                pa.string(),
            ),
            "repo": pa.array(
                [rng.choice(REPOS, p=[0.4, 0.3, 0.25, 0.05]) for _ in range(n)],
                pa.string(),
            ),
            "path": pa.array(
                [rng.choice(PATHS, p=[0.4, 0.3, 0.25, 0.05]) for _ in range(n)],
                pa.string(),
            ),
            "meta": pa.array([meta(i) for i in range(n)], type_from_name(meta_t)),
        }
    )
    for b in range(n_batches):
        part = t.filter(pa.compute.equal(t["batch_id"], b))
        pq.write_table(part, os.path.join(ev_dir, f"batch={b:05d}.parquet"))

    oracle = replay_oracle(spec, ev_dir)
    mode = "delta" if seed % 2 else "rewrite"
    eng = ReplayEngine(
        spec, os.path.join(work, f"lake_{mode}"), state_mode=mode, fold_threshold=2
    )
    eng.replay(ev_dir)
    assert eng.final_sha256() == oracle["sha256"], (n, n_batches, seed, mode)


@settings(max_examples=5, deadline=None)
@given(s=stream())
def test_random_widening_stream_matches_oracle(ray_session, s):
    """Random streams whose evolved column appears with RANDOM per-batch
    widths — in any order the widening lattice ACCEPTS — must still
    satisfy engine sha == oracle sha in both state modes: the registry
    is order-insensitive up to the final joined type (the semilattice
    property) and conform upcasts every historic narrow file.

    The lattice deliberately rejects {int64, float*} (evolve.py: int64
    past 2^53 loses precision in float64 — the Delta Lake rule), so the
    per-stream width plan never mixes them: a stream that may draw
    floats caps its int draws at int32. The rejected combination is
    pinned deterministically by test_int64_float_stream_both_raise
    below and test_type_widening.py::test_incompatible_type_change_raises."""
    n, n_batches, seed = s
    n_batches = max(2, n_batches)
    rng = np.random.default_rng(seed ^ 0xBEEF)
    work = f"/tmp/gepr_propw_{uuid.uuid4().hex[:12]}"
    ev_dir = os.path.join(work, "events")
    os.makedirs(ev_dir)

    seq = rng.permutation(n).astype(np.int64)
    t = pa.table(
        {
            "seq": pa.array(seq),
            "batch_id": pa.array((seq % n_batches).astype(np.int64)),
            "op": pa.array(
                [rng.choice(["INSERT", "UPDATE", "DELETE"], p=[0.4, 0.4, 0.2])
                 for _ in range(n)],
                pa.string(),
            ),
            "repo": pa.array(
                [rng.choice(["org0/repoA", "org1/repoC"]) for _ in range(n)],
                pa.string(),
            ),
            "path": pa.array(
                [rng.choice(["src/a.py", "docs/r.md"]) for _ in range(n)],
                pa.string(),
            ),
            "commit": pa.array(
                ["".join(rng.choice(list(HEX), 40)) for _ in range(n)],
                pa.string(),
            ),
            "lang": pa.array(["py"] * n, pa.string()),
            "content": pa.array(
                [None if o == "DELETE" else f"c{rng.integers(5)}"
                 for o in None or []] or
                [f"c{rng.integers(5)}" for _ in range(n)],
                pa.string(),
            ),
        }
    )
    # DELETEs need null content per the spec's nullable_for_ops
    ops = t["op"].to_pylist()
    content = [
        None if o == "DELETE" else c
        for o, c in zip(ops, t["content"].to_pylist())
    ]
    t = t.set_column(
        t.column_names.index("content"), "content",
        pa.array(content, pa.string()),
    )

    # one compatible width PLAN per stream: if floats may appear, ints
    # are capped at int32 (int64+float has no lossless join — rejected)
    with_floats = rng.random() < 0.5
    int_widths = (
        [pa.int16(), pa.int32()]
        if with_floats
        else [pa.int16(), pa.int32(), pa.int64()]
    )
    fl_widths = [pa.float32(), pa.float64()]
    for b in range(n_batches):
        part = t.filter(pa.compute.equal(t["batch_id"], b))
        roll = rng.random()
        if roll < 0.25:
            pass  # column absent this batch
        elif roll < 0.75 or not with_floats:
            typ = int_widths[rng.integers(len(int_widths))]
            part = part.append_column(
                "size_bytes",
                pa.array(rng.integers(0, 1 << 14, part.num_rows), typ),
            )
        else:
            typ = fl_widths[rng.integers(len(fl_widths))]
            part = part.append_column(
                "size_bytes",
                pa.array(
                    rng.integers(0, 1 << 14, part.num_rows).astype(float),
                    typ,
                ),
            )
        pq.write_table(part, os.path.join(ev_dir, f"batch={b:05d}.parquet"))

    spec = repo_file_spec(num_buckets=4)
    oracle = replay_oracle(spec, ev_dir)
    mode = "delta" if seed % 2 else "rewrite"
    eng = ReplayEngine(
        spec, os.path.join(work, f"lake_{mode}"), state_mode=mode,
        fold_threshold=2,
    )
    eng.replay(ev_dir)
    assert eng.final_sha256() == oracle["sha256"], (n, n_batches, seed, mode)


def test_int64_float_stream_both_raise(ray_session):
    """Deterministic companion to the property above: a stream whose
    evolved column arrives int64 in one batch and float64 in another is
    the lattice's documented REJECTED combination — engine AND oracle
    must both raise, in both state modes, never silently cast."""
    import pytest

    rng = np.random.default_rng(11)
    work = f"/tmp/gepr_propwbad_{uuid.uuid4().hex[:12]}"
    ev_dir = os.path.join(work, "events")
    os.makedirs(ev_dir)
    n = 20
    for b, typ in ((0, pa.int64()), (1, pa.float64())):
        vals = rng.integers(0, 1 << 14, n)
        t = pa.table(
            {
                "seq": pa.array(np.arange(n) + b * n),
                "batch_id": pa.array(np.full(n, b, np.int64)),
                "op": pa.array(["INSERT"] * n, pa.string()),
                "repo": pa.array(["org0/repoA"] * n, pa.string()),
                "path": pa.array([f"src/f{i}.py" for i in range(n)], pa.string()),
                "commit": pa.array(
                    ["".join(rng.choice(list(HEX), 40)) for _ in range(n)],
                    pa.string(),
                ),
                "lang": pa.array(["py"] * n, pa.string()),
                "content": pa.array([f"c{i}" for i in range(n)], pa.string()),
                "size_bytes": pa.array(
                    vals.astype(float) if typ == pa.float64() else vals, typ
                ),
            }
        )
        pq.write_table(t, os.path.join(ev_dir, f"batch={b:05d}.parquet"))

    spec = repo_file_spec(num_buckets=4)
    with pytest.raises(ValueError, match="incompatible schema evolution"):
        replay_oracle(spec, ev_dir)
    for mode in ("rewrite", "delta"):
        eng = ReplayEngine(
            spec, os.path.join(work, f"lake_{mode}"), state_mode=mode
        )
        with pytest.raises(ValueError, match="incompatible schema evolution"):
            eng.replay(ev_dir)

@st.composite
def ops_plan(draw):
    n = draw(st.integers(120, 320))
    seed = draw(st.integers(0, 2**31 - 1))
    n_runs = draw(st.integers(2, 4))
    # between-run actions: 0 = nothing, 1 = reshard, 2 = redrive, 3 = both
    actions = tuple(
        draw(st.sampled_from([0, 1, 2, 3])) for _ in range(n_runs - 1)
    )
    return n, seed, n_runs, actions


@settings(max_examples=4, deadline=None)
@given(s=ops_plan())
def test_interleaved_reshard_redrive_matches_oracle(ray_session, s):
    """Random dirty streams with reshard() and redrive_dlq() calls
    INTERLEAVED between ingest runs (both state modes) must land the
    patched-stream oracle sha: a reshard is state-neutral and carries
    the DLQ, a redrive applies recovered rows at their ORIGINAL seq so
    LWW converges to the stream-as-if-never-dirty state regardless of
    when the repairs happen. (r4 gated these only on fixed scenarios.)"""
    import pyarrow.compute as pc

    n, seed, n_runs, actions = s
    rng = np.random.default_rng(seed ^ 0xD1CE)
    work = f"/tmp/gepr_propx_{uuid.uuid4().hex[:12]}"
    os.makedirs(work)

    seq = rng.permutation(n).astype(np.int64)
    ops = [rng.choice(["INSERT", "UPDATE", "DELETE"], p=[0.4, 0.4, 0.2])
           for _ in range(n)]
    content = [
        None if o == "DELETE" or rng.random() < 0.12 else f"c{rng.integers(6)}"
        for o in ops
    ]  # ~12% of upserts dirty (null content -> DLQ), all fixable
    t = pa.table(
        {
            "seq": pa.array(seq),
            "op": pa.array(ops, pa.string()),
            "repo": pa.array(
                [rng.choice(["org0/repoA", "org1/repoC"]) for _ in range(n)],
                pa.string(),
            ),
            "path": pa.array(
                [rng.choice(["src/a.py", "src/b.js", "docs/r.md"])
                 for _ in range(n)],
                pa.string(),
            ),
            "commit": pa.array(
                ["".join(rng.choice(list(HEX), 40)) for _ in range(n)],
                pa.string(),
            ),
            "lang": pa.array(["py"] * n, pa.string()),
            "content": pa.array(content, pa.string()),
        }
    )

    FIX = "recovered"

    def fixer(bt: pa.Table) -> pa.Table:
        is_up = pc.is_in(bt["op"], value_set=pa.array(["INSERT", "UPDATE"]))
        needs = pc.and_(is_up, pc.is_null(bt["content"]))
        return bt.set_column(
            bt.column_names.index("content"), "content",
            pc.if_else(needs, pa.scalar(FIX), bt["content"]),
        )

    spec = repo_file_spec(num_buckets=4)
    mode = "delta" if seed % 2 else "rewrite"
    eng = ReplayEngine(
        spec, os.path.join(work, "lake0"), state_mode=mode, fold_threshold=2
    )

    # split rows into n_runs chunks; each ingest run writes its chunk
    # under the NEXT free batch id (a redrive consumes one id, exactly
    # like a production stream whose ingest ids keep increasing)
    bounds = np.linspace(0, n, n_runs + 1).astype(int)
    lake_i = 0
    for run in range(n_runs):
        bid = eng.ckpt.watermark + 1
        chunk = t.slice(bounds[run], bounds[run + 1] - bounds[run])
        chunk = chunk.append_column(
            "batch_id", pa.array(np.full(chunk.num_rows, bid, np.int64))
        )
        run_dir = os.path.join(work, f"run{run}")
        os.makedirs(run_dir)
        pq.write_table(
            chunk, os.path.join(run_dir, f"batch={bid:05d}.parquet")
        )
        eng.replay(run_dir)
        if run < n_runs - 1:
            a = actions[run]
            if a in (2, 3):
                eng.redrive_dlq(fixer=fixer)
            if a in (1, 3):
                lake_i += 1
                eng = eng.reshard(
                    os.path.join(work, f"lake{lake_i}"), factor=2
                )
    # final repair pass: every still-quarantined fixable row recovers
    eng.redrive_dlq(fixer=fixer)

    # oracle: the same stream as if the dirty rows had never been dirty
    patched_dir = os.path.join(work, "patched")
    os.makedirs(patched_dir)
    pt = fixer(t).append_column(
        "batch_id", pa.array(np.zeros(n, np.int64))
    )
    pq.write_table(pt, os.path.join(patched_dir, "batch=00000.parquet"))
    oracle = replay_oracle(spec, patched_dir)
    assert eng.final_sha256() == oracle["sha256"], (n, seed, n_runs, actions, mode)


@st.composite
def bf_plan(draw):
    n = draw(st.integers(100, 260))
    seed = draw(st.integers(0, 2**31 - 1))
    n_runs = draw(st.integers(2, 4))
    # between-run actions: 0 none, 1 backfill, 2 export, 3 both
    actions = tuple(
        draw(st.sampled_from([0, 1, 2, 3])) for _ in range(n_runs - 1)
    )
    return n, seed, n_runs, actions


@settings(max_examples=4, deadline=None)
@given(s=bf_plan())
def test_interleaved_backfill_export_matches_oracle(ray_session, s):
    """Random streams with backfill() and export_snapshot() INTERLEAVED
    between ingest runs (both state modes): a backfill must never
    disturb LWW state (per-row seq untouched), so the final table must
    equal the plain-stream oracle plus exactly the derived column; and
    every mid-stream incremental export must hash-equal the live table
    at that moment. (Round-5 features, previously gated only on fixed
    scenarios — same discipline as the reshard/redrive property.)"""
    import glob as _glob

    import pyarrow.compute as pc

    from glue_etl_pipeline_ray.hashing import table_sha256

    n, seed, n_runs, actions = s
    rng = np.random.default_rng(seed ^ 0xBF11)
    work = f"/tmp/gepr_propbf_{uuid.uuid4().hex[:12]}"
    os.makedirs(work)

    seq = rng.permutation(n).astype(np.int64)
    ops = [rng.choice(["INSERT", "UPDATE", "DELETE"], p=[0.45, 0.35, 0.2])
           for _ in range(n)]
    content = [
        None if o == "DELETE" else "v" * int(rng.integers(1, 30))
        for o in ops
    ]
    t = pa.table(
        {
            "seq": pa.array(seq),
            "op": pa.array(ops, pa.string()),
            "repo": pa.array(
                [rng.choice(["org0/repoA", "org1/repoC"]) for _ in range(n)],
                pa.string(),
            ),
            "path": pa.array(
                [rng.choice(["src/a.py", "src/b.js", "docs/r.md"])
                 for _ in range(n)],
                pa.string(),
            ),
            "commit": pa.array(
                ["".join(rng.choice(list(HEX), 40)) for _ in range(n)],
                pa.string(),
            ),
            "lang": pa.array(["py"] * n, pa.string()),
            "content": pa.array(content, pa.string()),
        }
    )

    def add_len(bt: pa.Table) -> pa.Table:
        col = pc.cast(pc.utf8_length(bt["content"]), pa.int64())
        if "content_len" in bt.column_names:
            return bt.set_column(
                bt.column_names.index("content_len"), "content_len", col
            )
        return bt.append_column("content_len", col)

    spec = repo_file_spec(num_buckets=4)
    mode = "delta" if seed % 2 else "rewrite"
    eng = ReplayEngine(
        spec, os.path.join(work, "lake"), state_mode=mode, fold_threshold=2
    )
    exp_dir = os.path.join(work, "export")

    def check_export():
        eng.export_snapshot(exp_dir)
        files = sorted(_glob.glob(os.path.join(exp_dir, "part-*.parquet")))
        et = pa.concat_tables(
            [pq.read_table(f) for f in files], promote_options="permissive"
        )
        assert table_sha256(et, spec.key_cols) == eng.final_sha256(), (
            n, seed, n_runs, actions, mode,
        )

    bounds = np.linspace(0, n, n_runs + 1).astype(int)
    did_backfill = False
    for run in range(n_runs):
        bid = eng.ckpt.watermark + 1
        chunk = t.slice(bounds[run], bounds[run + 1] - bounds[run])
        chunk = chunk.append_column(
            "batch_id", pa.array(np.full(chunk.num_rows, bid, np.int64))
        )
        run_dir = os.path.join(work, f"run{run}")
        os.makedirs(run_dir)
        pq.write_table(
            chunk, os.path.join(run_dir, f"batch={bid:05d}.parquet")
        )
        eng.replay(run_dir)
        if run < n_runs - 1:
            a = actions[run]
            if a in (1, 3):
                eng.backfill(add_len)
                did_backfill = True
            if a in (2, 3):
                check_export()

    # a backfill is point-in-time: rows upserted AFTER it carry null
    # for the evolved column (exactly like arrival-driven evolution),
    # so close with one more backfill — now every live row must carry
    # the derived value and the lake must equal oracle + derived col
    if did_backfill:
        eng.backfill(add_len)

    # final export must also match the final state
    check_export()

    # oracle over the SAME whole stream; a backfilled lake equals the
    # oracle table plus exactly the derived column
    full_dir = os.path.join(work, "full")
    os.makedirs(full_dir)
    pq.write_table(
        t.append_column("batch_id", pa.array(np.zeros(n, np.int64))),
        os.path.join(full_dir, "batch=00000.parquet"),
    )
    oracle = replay_oracle(spec, full_dir)
    if did_backfill:
        expected = table_sha256(add_len(oracle["table"]), spec.key_cols)
    else:
        expected = oracle["sha256"]
    assert eng.final_sha256() == expected, (n, seed, n_runs, actions, mode)


@st.composite
def maint_plan(draw):
    n = draw(st.integers(100, 260))
    seed = draw(st.integers(0, 2**31 - 1))
    n_runs = draw(st.integers(2, 4))
    # between-run actions: 0 none, 1 compact+fsck, 2 view refresh, 3 both
    actions = tuple(
        draw(st.sampled_from([0, 1, 2, 3])) for _ in range(n_runs - 1)
    )
    return n, seed, n_runs, actions


@settings(max_examples=4, deadline=None)
@given(s=maint_plan())
def test_interleaved_compact_ivm_matches_oracle(ray_session, s):
    """Random streams with compact() and MaterializedView.refresh()
    INTERLEAVED between ingest runs (both state modes): compaction must
    never change live state (fsck stays clean), a view refreshed at
    arbitrary points must equal a direct aggregate of the final
    snapshot, and the closing lake must land the oracle sha. seq is
    ascending across runs (no late data), which is compact()'s
    documented contract for the default full-tombstone drop."""
    import duckdb

    from glue_etl_pipeline_ray.pipelines.ivm import MaterializedView

    n, seed, n_runs, actions = s
    rng = np.random.default_rng(seed ^ 0xC03B)
    work = f"/tmp/gepr_propmv_{uuid.uuid4().hex[:12]}"
    os.makedirs(work)

    bounds = np.linspace(0, n, n_runs + 1).astype(int)
    seq = np.concatenate(
        [bounds[k] + rng.permutation(bounds[k + 1] - bounds[k])
         for k in range(n_runs)]
    ).astype(np.int64)
    ops = [rng.choice(["INSERT", "UPDATE", "DELETE"], p=[0.45, 0.35, 0.2])
           for _ in range(n)]
    t = pa.table(
        {
            "seq": pa.array(seq),
            "op": pa.array(ops, pa.string()),
            "repo": pa.array(
                [rng.choice(["org0/repoA", "org1/repoC"]) for _ in range(n)],
                pa.string(),
            ),
            "path": pa.array(
                [rng.choice(["src/a.py", "src/b.js", "docs/r.md"])
                 for _ in range(n)],
                pa.string(),
            ),
            "commit": pa.array(
                ["".join(rng.choice(list(HEX), 40)) for _ in range(n)],
                pa.string(),
            ),
            "lang": pa.array(
                [rng.choice(["py", "js", "md"]) for _ in range(n)],
                pa.string(),
            ),
            "content": pa.array(
                [None if o == "DELETE" else "c" * int(rng.integers(1, 20))
                 for o in ops],
                pa.string(),
            ),
        }
    )

    spec = repo_file_spec(num_buckets=4)
    mode = "delta" if seed % 2 else "rewrite"
    eng = ReplayEngine(
        spec, os.path.join(work, "lake"), state_mode=mode,
        gc_old_versions=False, fold_threshold=2,
    )
    view = MaterializedView(eng, "by_lang", ["lang"])

    for run in range(n_runs):
        bid = eng.ckpt.watermark + 1
        chunk = t.slice(bounds[run], bounds[run + 1] - bounds[run])
        chunk = chunk.append_column(
            "batch_id", pa.array(np.full(chunk.num_rows, bid, np.int64))
        )
        run_dir = os.path.join(work, f"run{run}")
        os.makedirs(run_dir)
        pq.write_table(
            chunk, os.path.join(run_dir, f"batch={bid:05d}.parquet")
        )
        eng.replay(run_dir)
        if run < n_runs - 1:
            a = actions[run]
            if a in (1, 3):
                eng.compact()
                assert eng.fsck()["ok"], (n, seed, n_runs, actions, mode)
            if a in (2, 3):
                view.refresh()

    view.refresh()

    full_dir = os.path.join(work, "full")
    os.makedirs(full_dir)
    pq.write_table(
        t.append_column("batch_id", pa.array(np.zeros(n, np.int64))),
        os.path.join(full_dir, "batch=00000.parquet"),
    )
    oracle = replay_oracle(spec, full_dir)
    assert eng.final_sha256() == oracle["sha256"], (
        n, seed, n_runs, actions, mode,
    )

    got = view.table().sort_by("lang").to_pandas()
    con = duckdb.connect()
    con.register("live", oracle["table"])
    exp = con.execute(
        "SELECT lang, count(*) AS n_rows FROM live GROUP BY lang ORDER BY lang"
    ).df()
    assert list(got["lang"]) == list(exp["lang"]), (n, seed, actions, mode)
    assert list(got["n_rows"]) == list(exp["n_rows"]), (n, seed, actions, mode)


@st.composite
def dml_plan(draw):
    n = draw(st.integers(100, 260))
    seed = draw(st.integers(0, 2**31 - 1))
    n_runs = draw(st.integers(2, 4))
    # between-run actions: 0 none, 1 delete_where, 2 update_where,
    # 3 merge_into (pure upsert of fresh keys), 4 restore (roll back to
    # the previous committed batch), 5 crash-stage a delete (the NEXT
    # ingest run then takes the staged batch id — the aliasing recovery
    # path re-stages and applies it)
    actions = tuple(
        draw(st.sampled_from([0, 1, 2, 3, 4, 5])) for _ in range(n_runs - 1)
    )
    return n, seed, n_runs, actions


@settings(max_examples=4, deadline=None)
@given(s=dml_plan())
def test_interleaved_dml_matches_oracle(ray_session, s):
    """Random clean streams with delete_where / update_where /
    merge_into INTERLEAVED between ingest runs (both state modes): the
    engine's staged DML batches under _dml/ ARE the commit's source of
    truth, so replaying the original stream PLUS those staged batches
    through the single-threaded oracle must land the engine's exact
    final sha — whatever the predicates matched at the moment they ran
    (fixed-scenario DML gates live in tests/test_dml.py; this is the
    same interleaving discipline as the reshard/redrive property)."""
    import glob as _glob

    import pyarrow.compute as pc

    n, seed, n_runs, actions = s
    rng = np.random.default_rng(seed ^ 0xD311)
    work = f"/tmp/gepr_propdml_{uuid.uuid4().hex[:12]}"
    os.makedirs(work)

    seq = rng.permutation(n).astype(np.int64)
    ops = [rng.choice(["INSERT", "UPDATE", "DELETE"], p=[0.45, 0.35, 0.2])
           for _ in range(n)]
    t = pa.table(
        {
            "seq": pa.array(seq),
            "op": pa.array(ops, pa.string()),
            "repo": pa.array(
                [rng.choice(["org0/repoA", "org1/repoC"]) for _ in range(n)],
                pa.string(),
            ),
            "path": pa.array(
                [rng.choice(["src/a.py", "src/b.js", "docs/r.md"])
                 for _ in range(n)],
                pa.string(),
            ),
            "commit": pa.array(
                ["".join(rng.choice(list(HEX), 40)) for _ in range(n)],
                pa.string(),
            ),
            "lang": pa.array(["py"] * n, pa.string()),
            "content": pa.array(
                [None if o == "DELETE" else f"c{rng.integers(6)}" for o in ops],
                pa.string(),
            ),
        }
    )

    spec = repo_file_spec(num_buckets=4)
    mode = "delta" if seed % 2 else "rewrite"
    eng = ReplayEngine(
        spec, os.path.join(work, "lake"), state_mode=mode, fold_threshold=2,
        gc_old_versions=False,  # restore needs readable history
    )

    edges = np.linspace(0, n, n_runs + 1).astype(int)
    for run in range(n_runs):
        chunk = t.slice(edges[run], edges[run + 1] - edges[run])
        bid = eng.ckpt.watermark + 1  # DML runs consume batch ids too
        chunk = chunk.append_column(
            "batch_id", pa.array(np.full(chunk.num_rows, bid, np.int64))
        )
        run_dir = os.path.join(work, f"run{run}")
        os.makedirs(run_dir)
        pq.write_table(chunk, os.path.join(run_dir, f"batch={bid:05d}.parquet"))
        eng.replay(run_dir)
        if run < n_runs - 1:
            a = actions[run]
            # the DML seq contract: the caller owns the seq space, so a
            # mid-stream DML must take seqs DISJOINT from everything the
            # upstream will ever emit (default max_seq+1 would collide
            # with the not-yet-arrived tail of the permutation — ties
            # are a contract violation, like duplicated upstream seqs)
            sb = n + (run + 1) * n
            if a == 1:
                eng.delete_where(
                    lambda lt: pc.equal(lt["path"], "docs/r.md"), seq_base=sb
                )
            elif a == 2:
                eng.update_where(
                    lambda lt: pc.equal(lt["path"], "src/a.py"),
                    lambda rows: {
                        "content": pa.array(["upd"] * rows.num_rows, pa.string())
                    },
                    seq_base=sb,
                )
            elif a == 3:
                eng.merge_into(
                    pa.table(
                        {
                            "repo": pa.array([f"neworg/r{run}"]),
                            "path": pa.array([f"src/m{run}.py"]),
                            "commit": pa.array(["ab" * 20]),
                            "lang": pa.array(["py"]),
                            "content": pa.array([f"m{run}"]),
                        }
                    ),
                    seq_base=sb,
                )
            elif a == 4 and eng.ckpt.watermark >= 1:
                eng.restore(eng.ckpt.watermark - 1, seq_base=sb)
            elif a == 5:
                # stage a DML then crash before its commit: the NEXT
                # ingest run ships the staged batch id, and replay()'s
                # end-of-run drain must re-stage the orphan onto the
                # then-free id and apply it (never drop it)
                orig = ReplayEngine._dml_apply
                ReplayEngine._dml_apply = (
                    lambda self, *a_, **k_: (_ for _ in ()).throw(
                        RuntimeError("injected crash after stage")
                    )
                )
                try:
                    eng.delete_where(
                        lambda lt: pc.equal(lt["path"], "src/b.js"),
                        seq_base=sb,
                    )
                except RuntimeError:
                    pass
                finally:
                    ReplayEngine._dml_apply = orig

    # oracle: original run batches + every staged DML batch
    odir = os.path.join(work, "oev")
    os.makedirs(odir)
    batch_files = [
        f
        for run in range(n_runs)
        for f in _glob.glob(os.path.join(work, f"run{run}", "batch=*"))
    ] + _glob.glob(os.path.join(work, "lake", "_dml", "batch=*"))
    for f in batch_files:
        os.symlink(f, os.path.join(odir, os.path.basename(f)))
    oracle = replay_oracle(spec, odir)
    assert eng.final_sha256() == oracle["sha256"], (n, seed, n_runs, actions, mode)
