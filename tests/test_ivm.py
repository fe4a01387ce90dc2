"""Incremental materialized-view maintenance: a COUNT/SUM view refreshed
by folding only the change data feed must equal a direct aggregate over
the final snapshot — through deletes, updates, schema evolution, group
emptying, and process restarts, in both state modes."""

import os

import duckdb
import pyarrow as pa
import pytest

from glue_etl_pipeline_ray.gen import generate_change_events
from glue_etl_pipeline_ray.pipelines.ivm import MaterializedView, signed_partial
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import repo_file_spec
from glue_etl_pipeline_ray.stages.merge import CHANGE_TYPE_COL


def _gen(tmp_path, **kw):
    defaults = dict(n_events=8000, n_repos=15, n_paths=40, n_batches=6,
                    seed=53, delete_frac=0.2, dirty_frac=0.03,
                    evolve_from_batch=4)
    defaults.update(kw)
    return generate_change_events(str(tmp_path), **defaults)


def _direct_agg(live: pa.Table) -> pa.Table:
    """SQL-semantics oracle for the view over the live snapshot."""
    con = duckdb.connect()
    con.register("t", live)
    return con.execute(
        "SELECT lang, count(*) AS n_rows, sum(size_bytes) AS sum_size_bytes "
        "FROM t GROUP BY lang ORDER BY lang"
    ).arrow().cast(
        pa.schema([("lang", pa.string()), ("n_rows", pa.int64()),
                   ("sum_size_bytes", pa.int64())])
    )


@pytest.mark.parametrize("mode", ["rewrite", "delta"])
def test_view_equals_direct_recompute(ray_session, tmp_path, mode):
    """Bootstrap pre-evolution, then two incremental refreshes across the
    evolution boundary; final view == direct aggregate of the snapshot."""
    meta = _gen(tmp_path)
    spec = repo_file_spec(num_buckets=16)
    eng = ReplayEngine(spec, str(tmp_path / f"lake_{mode}"), state_mode=mode,
                       gc_old_versions=False, fold_threshold=2)
    view = MaterializedView(eng, "by_lang", ["lang"],
                            sum_cols=["size_bytes"])

    eng.replay(meta["events_dir"], max_batches=2)
    view.refresh()  # bootstrap: size_bytes doesn't exist yet
    assert view.watermark == 1

    eng.replay(meta["events_dir"], max_batches=2)  # batches 2-3
    view.refresh()
    eng.replay(meta["events_dir"])  # 4-5, through the evolution
    got = view.refresh().sort_by("lang")

    assert view.watermark == 5
    expected = _direct_agg(eng.final_table())
    assert got.cast(expected.schema).equals(expected)


def test_refresh_idempotent_and_persistent(ray_session, tmp_path):
    """A refresh at an unchanged watermark is a no-op, and a NEW view
    object over the same lake resumes from the persisted state."""
    meta = _gen(tmp_path, n_batches=4, evolve_from_batch=2)
    spec = repo_file_spec(num_buckets=8)
    eng = ReplayEngine(spec, str(tmp_path / "lake"), gc_old_versions=False)
    eng.replay(meta["events_dir"], max_batches=3)
    view = MaterializedView(eng, "v", ["lang"], sum_cols=["size_bytes"])
    t1 = view.refresh()
    t2 = view.refresh()
    assert t1.equals(t2)
    # exactly one state file persists (older versions are pruned)
    files = [f for f in os.listdir(view.view_dir) if f.endswith(".parquet")]
    assert files == ["view-v00002.parquet"]

    # a fresh engine + view object (process restart) resumes incrementally
    eng2 = ReplayEngine(spec, str(tmp_path / "lake"), gc_old_versions=False)
    eng2.replay(meta["events_dir"])
    view2 = MaterializedView(eng2, "v", ["lang"], sum_cols=["size_bytes"])
    assert view2.watermark == 2
    got = view2.refresh().sort_by("lang")
    assert view2.watermark == 3
    assert got.cast(_direct_agg(eng2.final_table()).schema).equals(
        _direct_agg(eng2.final_table())
    )


def test_group_vanishes_when_emptied(ray_session, tmp_path):
    """Deleting every row of a group removes it from the view entirely
    (n_rows==0 groups are dropped, not published as zeros)."""
    import pyarrow.parquet as pq

    spec = repo_file_spec(num_buckets=4)
    ev = tmp_path / "events"
    os.makedirs(ev)
    sha = "a" * 40

    def batch(bid, rows):
        t = pa.table({
            "seq": pa.array([r[0] for r in rows], pa.int64()),
            "op": pa.array([r[1] for r in rows], pa.string()),
            "repo": pa.array([r[2] for r in rows], pa.string()),
            "path": pa.array([r[3] for r in rows], pa.string()),
            "commit": pa.array([sha] * len(rows), pa.string()),
            "lang": pa.array([r[4] for r in rows], pa.string()),
            "content": pa.array(["x"] * len(rows), pa.string()),
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([float(r[0]) for r in rows], pa.float64()),
        })
        pq.write_table(t, ev / f"batch={bid:05d}.parquet")

    batch(0, [(1, "INSERT", "r1", "a.py", "py"),
              (2, "INSERT", "r1", "b.py", "py"),
              (3, "INSERT", "r1", "c.go", "go")])
    batch(1, [(4, "DELETE", "r1", "a.py", "py"),
              (5, "DELETE", "r1", "b.py", "py")])

    eng = ReplayEngine(spec, str(tmp_path / "lake"), gc_old_versions=False)
    eng.replay(str(ev), max_batches=1)
    view = MaterializedView(eng, "v", ["lang"])
    t0 = view.refresh()
    assert dict(zip(t0["lang"].to_pylist(), t0["n_rows"].to_pylist())) == {
        "py": 2, "go": 1,
    }
    eng.replay(str(ev))
    t1 = view.refresh()
    assert dict(zip(t1["lang"].to_pylist(), t1["n_rows"].to_pylist())) == {
        "go": 1,
    }


def test_update_preimage_pairs(ray_session, tmp_path):
    """update_preimages=True emits one pre + one post row per updated
    key, and the preimage carries the OLD payload."""
    meta = _gen(tmp_path, n_batches=4, evolve_from_batch=99)
    spec = repo_file_spec(num_buckets=8)
    eng = ReplayEngine(spec, str(tmp_path / "lake"), gc_old_versions=False)
    eng.replay(meta["events_dir"])

    plain = eng.changes_table(0, 3)
    paired = ray.get(eng._changes_refs(0, 3, update_preimages=True))
    paired = pa.concat_tables([p for p in paired if p.num_rows])
    by_type = lambda t, ct: t.filter(  # noqa: E731
        pa.compute.equal(t[CHANGE_TYPE_COL], ct)
    )
    n_upd = by_type(plain, "update").num_rows
    assert by_type(paired, "update_preimage").num_rows == n_upd
    assert by_type(paired, "update_postimage").num_rows == n_upd
    assert by_type(paired, "insert").num_rows == by_type(plain, "insert").num_rows
    assert by_type(paired, "delete").num_rows == by_type(plain, "delete").num_rows

    # preimage == the as-of-0 snapshot row; postimage == the final row
    old_live = {(r["repo"], r["path"]): r
                for r in eng.final_table(as_of=0).to_pylist()}
    new_live = {(r["repo"], r["path"]): r for r in eng.final_table().to_pylist()}
    post = {(r["repo"], r["path"]): r
            for r in by_type(paired, "update_postimage").to_pylist()}
    pre = {(r["repo"], r["path"]): r
           for r in by_type(paired, "update_preimage").to_pylist()}
    assert set(post) == set(pre)
    for k in post:
        assert {c: pre[k][c] for c in old_live[k]} == old_live[k]
        assert {c: post[k][c] for c in new_live[k]} == new_live[k]
        assert pre[k] != post[k]


def test_signed_partial_null_sum_semantics(ray_session):
    """SUM over a group whose every value is null publishes null (SQL),
    and mixed null/non-null counts only non-null contributions."""
    changes = pa.table({
        "g": ["a", "a", "b", "b"],
        "v": pa.array([None, None, 5, None], pa.int64()),
        CHANGE_TYPE_COL: ["insert", "insert", "insert", "insert"],
    })
    part = signed_partial(changes, ["g"], ["v"]).sort_by("g")
    assert part["n_rows"].to_pylist() == [2, 2]
    assert part["sum_v"].to_pylist() == [0, 5]
    assert part["__nnz_v"].to_pylist() == [0, 1]


def test_min_not_supported_loudly(ray_session, tmp_path):
    """No silent wrong answers: grouped+summed column overlap and unsafe
    names are rejected at construction."""
    meta = _gen(tmp_path, n_batches=2, n_events=500, evolve_from_batch=99)
    spec = repo_file_spec(num_buckets=4)
    eng = ReplayEngine(spec, str(tmp_path / "lake"), gc_old_versions=False)
    eng.replay(meta["events_dir"])
    with pytest.raises(ValueError):
        MaterializedView(eng, "v", ["lang"], sum_cols=["lang"])
    with pytest.raises(ValueError):
        MaterializedView(eng, "../evil", ["lang"])


import ray  # noqa: E402  (used by test_update_preimage_pairs)


def test_view_on_empty_lake_with_pre_evolution_sum_col(
    ray_session, tmp_path
):
    """A view whose sum column hasn't evolved into the schema yet (or
    whose lake is still empty) must publish an empty/all-null view, not
    crash building its empty state — the same pre-evolution contract
    signed_partial documents."""
    meta = _gen(tmp_path, n_batches=4, evolve_from_batch=2)
    spec = repo_file_spec(num_buckets=8)
    eng = ReplayEngine(spec, str(tmp_path / "lake"), gc_old_versions=False)
    view = MaterializedView(eng, "v", ["lang"], sum_cols=["size_bytes"])
    t0 = view.table()  # empty lake: KeyError here before the fix
    assert t0.num_rows == 0
    assert set(t0.column_names) == {"lang", "n_rows", "sum_size_bytes"}
    # pre-evolution batches: sums publish as null, counts are real
    eng.replay(meta["events_dir"], max_batches=2)
    got = view.refresh()
    assert got.num_rows > 0
    assert got["sum_size_bytes"].null_count == got.num_rows
    # through the evolution the same view picks up real sums
    eng.replay(meta["events_dir"])
    got = view.refresh().sort_by("lang")
    expected = _direct_agg(eng.final_table())
    assert got.cast(expected.schema).equals(expected)
    # a group column that never evolved stays a loud error
    bad = MaterializedView(eng, "bad", ["no_such_col"])
    with pytest.raises(ValueError, match="group column"):
        bad.table()


def test_signed_partial_rejects_plain_update_rows(ray_session, tmp_path):
    """Folding a non-preimage feed (plain 'update' rows are post-images
    with no retraction partner) must raise, not silently subtract."""
    meta = _gen(tmp_path, n_batches=2, evolve_from_batch=99)
    spec = repo_file_spec(num_buckets=8)
    eng = ReplayEngine(spec, str(tmp_path / "lake"), gc_old_versions=False)
    eng.replay(meta["events_dir"])
    feed = eng.changes_table(0, 1)  # default feed: plain updates
    assert "update" in set(feed[CHANGE_TYPE_COL].to_pylist())
    with pytest.raises(ValueError, match="pre-image"):
        signed_partial(feed, ["lang"], [])
