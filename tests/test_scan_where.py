"""Predicate-pushdown scans: both state modes must return exactly the
rows a full-scan + driver-side filter returns, across evolution
boundaries (pre-evolution files skipped whole) and as-of snapshots."""

import pyarrow as pa
import pytest

from glue_etl_pipeline_ray.gen import generate_change_events
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine, _where_mask
from glue_etl_pipeline_ray.spec import repo_file_spec


def _gen(tmp_path, **kw):
    kw.setdefault("n_events", 4000)
    kw.setdefault("n_batches", 4)
    kw.setdefault("seed", 41)
    return generate_change_events(str(tmp_path), n_repos=10, n_paths=30, **kw)


def _brute(eng, where, columns=None, as_of=None):
    t = eng.final_table(as_of=as_of)
    t = t.filter(_where_mask(t, where))
    cols = [c for c in t.column_names if columns is None or c in set(columns)]
    return t.select(cols)


def _sorted(t: pa.Table) -> pa.Table:
    return t.sort_by([(c, "ascending") for c in t.column_names])


@pytest.mark.parametrize("state_mode", ["rewrite", "delta"])
def test_scan_equals_full_filter(tmp_path, ray_session, state_mode):
    meta = _gen(tmp_path)
    eng = ReplayEngine(
        repo_file_spec(num_buckets=8), str(tmp_path / "lake"),
        state_mode=state_mode,
    )
    eng.replay(meta["events_dir"])
    for where in (
        [("lang", "==", "py")],
        [("lang", "!=", "py")],
        [("lang", "in", ["go", "rs"])],
        [("lang", ">=", "md"), ("path", "<", "src/dir5")],
    ):
        got = _sorted(pa.concat_tables(
            [b for b in eng.scan(where).iter_batches(batch_format="pyarrow")]
            or [eng.spec.canonical_schema(eng.ckpt.evolved).empty_table()]
        ))
        want = _sorted(_brute(eng, where))
        assert got.equals(want), where
        assert got.num_rows > 0  # fixtures must exercise the predicate


@pytest.mark.parametrize("state_mode", ["rewrite", "delta"])
def test_scan_evolved_column_and_projection(tmp_path, ray_session, state_mode):
    meta = _gen(tmp_path, evolve_from_batch=3, seed=42)
    eng = ReplayEngine(
        repo_file_spec(num_buckets=8), str(tmp_path / "lake"),
        state_mode=state_mode, gc_old_versions=False,
    )
    eng.replay(meta["events_dir"])
    evolved_cols = [c for c, _ in eng.ckpt.evolved]
    assert evolved_cols, "fixture must evolve a column"
    col = evolved_cols[0]
    # predicate on the EVOLVED column: pre-evolution rows are all-null
    # there and must not match (rewrite mode skips their files whole)
    where = [(col, ">=", 0)]
    got = _sorted(eng.scan(where, columns=["repo", "path", col]).to_pandas()
                  .pipe(pa.Table.from_pandas))
    want = _sorted(_brute(eng, where, columns=["repo", "path", col]))
    assert got.equals(want)
    assert got.num_rows > 0
    assert got.column_names == ["repo", "path", col]


def test_scan_as_of_and_validation(tmp_path, ray_session):
    meta = _gen(tmp_path, seed=43)
    eng = ReplayEngine(
        repo_file_spec(num_buckets=8), str(tmp_path / "lake"),
        gc_old_versions=False,
    )
    eng.replay(meta["events_dir"])
    where = [("lang", "==", "py")]
    got = _sorted(pa.concat_tables(
        eng.scan(where, as_of=1).iter_batches(batch_format="pyarrow")
    ))
    want = _sorted(_brute(eng, where, as_of=1))
    assert got.equals(want)
    with pytest.raises(ValueError, match="unknown predicate column"):
        eng.scan([("nope", "==", 1)]).count()
    with pytest.raises(ValueError, match="unknown op"):
        eng.scan([("lang", "~", 1)]).count()
