"""final_dataset(columns=...) projection pushdown: pruned reads must
equal a select over the full read in both state modes, through schema
evolution (pre-evolution files lack the column) and time travel; the
delta path prunes base, per-bucket delta AND group-delta reads."""

import os

import pyarrow as pa
import pytest

from glue_etl_pipeline_ray.gen import generate_change_events
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import repo_file_spec


@pytest.fixture(scope="module")
def lakes(ray_session, tmp_path_factory):
    work = tmp_path_factory.mktemp("pruned")
    meta = generate_change_events(
        str(work), n_events=6000, n_repos=12, n_paths=30, n_batches=4,
        evolve_from_batch=2, dirty_frac=0.02, seed=31,
    )
    out = {}
    for mode in ("rewrite", "delta"):
        eng = ReplayEngine(
            repo_file_spec(num_buckets=8), str(work / f"lake_{mode}"),
            state_mode=mode, fold_threshold=3, gc_old_versions=False,
        )
        eng.replay(meta["events_dir"])
        out[mode] = eng
    return out


def _sorted(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("mode", ["rewrite", "delta"])
@pytest.mark.parametrize(
    "columns",
    [["repo", "path", "lang"], ["lang"], ["repo", "size_bytes"]],
)
def test_pruned_equals_full_select(lakes, mode, columns):
    eng = lakes[mode]
    full = eng.final_dataset().to_pandas()
    pruned = eng.final_dataset(columns=columns).to_pandas()
    want = [c for c in full.columns if c in set(columns)]
    assert list(pruned.columns) == want  # canonical order preserved
    assert _sorted(full[want]).equals(_sorted(pruned))


@pytest.mark.parametrize("mode", ["rewrite", "delta"])
def test_pruned_as_of(lakes, mode):
    eng = lakes[mode]
    # batch 1 predates the evolution: the THEN-schema has no size_bytes
    full = eng.final_dataset(as_of=1).to_pandas()
    assert "size_bytes" not in full.columns
    pruned = eng.final_dataset(as_of=1, columns=["repo", "lang"]).to_pandas()
    assert _sorted(full[["repo", "lang"]]).equals(_sorted(pruned))
    with pytest.raises(ValueError, match="unknown columns"):
        eng.final_dataset(as_of=1, columns=["size_bytes"])


@pytest.mark.parametrize("mode", ["rewrite", "delta"])
def test_unknown_column_raises(lakes, mode):
    with pytest.raises(ValueError, match="unknown columns"):
        lakes[mode].final_dataset(columns=["nope"])


def test_pruned_batches_carry_only_requested(lakes):
    for mode in ("rewrite", "delta"):
        ds = lakes[mode].final_dataset(columns=["lang"])
        for b in ds.iter_batches(batch_format="pyarrow"):
            assert b.column_names == ["lang"]
            assert isinstance(b, pa.Table)
            break


@pytest.mark.parametrize("mode", ["rewrite", "delta"])
def test_lookup_pruned(lakes, mode):
    eng = lakes[mode]
    full = eng.final_dataset().to_pandas()
    some = list(
        full[["repo", "path"]].drop_duplicates().head(5).itertuples(
            index=False, name=None
        )
    )
    base = eng.lookup(some).to_pandas()
    pruned = eng.lookup(some, columns=["repo", "path", "lang"]).to_pandas()
    assert list(pruned.columns) == ["repo", "path", "lang"]
    assert _sorted(base[["repo", "path", "lang"]]).equals(_sorted(pruned))
    with pytest.raises(ValueError, match="unknown columns"):
        eng.lookup(some, columns=["nope"])
