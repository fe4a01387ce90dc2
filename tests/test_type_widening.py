"""Schema-evolution type widening: an evolved column that later
arrives with a safely wider type (int32 -> int64) widens the registry
in place; old narrow state upcasts on every read path; both state
modes match the (mirrored) oracle; incompatible changes raise."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from glue_etl_pipeline_ray.gen import generate_change_events
from glue_etl_pipeline_ray.oracle import replay_oracle
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import repo_file_spec
from glue_etl_pipeline_ray.stages.evolve import widen_type


def _widening_stream(tmp_path, last_type=pa.int64(), name="w"):
    work = str(tmp_path / name)
    meta = generate_change_events(
        work, n_events=4000, n_batches=4, dirty_frac=0.02, seed=7
    )
    ev = meta["events_dir"]
    files = sorted(glob.glob(os.path.join(ev, "batch=*.parquet")))
    rng = np.random.default_rng(3)
    for i, f in enumerate(files):
        if i == 0:
            continue  # batch 0: column absent (plain additive case)
        t = pq.read_table(f)
        if i < 3:
            vals = rng.integers(0, 1 << 20, t.num_rows)
            col = pa.array(vals, pa.int32())
        elif pa.types.is_integer(last_type) or pa.types.is_floating(
            last_type
        ):
            vals = rng.integers(1 << 33, 1 << 40, t.num_rows)
            col = pa.array(vals, last_type)
        else:
            col = pa.array(["x"] * t.num_rows, last_type)
        pq.write_table(t.append_column("size_bytes", col), f)
    return ev


def test_widening_matches_oracle_both_modes(ray_session, tmp_path):
    ev = _widening_stream(tmp_path)
    spec = repo_file_spec()
    o = replay_oracle(spec, ev)
    assert ("size_bytes", "int64") in o["evolved"]
    assert o["table"]["size_bytes"].type == pa.int64()
    # some widened value actually exceeds int32 range end-to-end
    mx = max(
        v for v in o["table"]["size_bytes"].to_pylist() if v is not None
    )
    assert mx > (1 << 31)

    for mode in ("rewrite", "delta"):
        eng = ReplayEngine(
            spec, str(tmp_path / f"lake_{mode}"), state_mode=mode
        )
        eng.replay(ev)
        assert eng.final_sha256() == o["sha256"], mode
        assert ("size_bytes", "int64") in eng.ckpt.evolved
        # time travel: registry as of the narrow batch still says int32
        assert dict(eng.ckpt.evolved_as_of(1))["size_bytes"] == "int32"


def test_incompatible_type_change_raises(ray_session, tmp_path):
    ev = _widening_stream(tmp_path, last_type=pa.string(), name="bad")
    spec = repo_file_spec()
    with pytest.raises(ValueError, match="incompatible schema evolution"):
        replay_oracle(spec, ev)
    eng = ReplayEngine(spec, str(tmp_path / "lake_bad"))
    with pytest.raises(ValueError, match="incompatible schema evolution"):
        eng.replay(ev)


def test_widen_type_lattice():
    assert widen_type("int32", "int64") == "int64"
    assert widen_type("int64", "int32") == "int64"  # order-insensitive
    assert widen_type("int8", "int16") == "int16"
    assert widen_type("float32", "float64") == "double"
    assert widen_type("float", "double") == "double"  # Arrow str() names
    assert widen_type("int32", "float64") == "double"
    assert widen_type("int16", "float32") == "double"
    assert widen_type("int64", "float64") is None  # 2^53 precision loss
    assert widen_type("int64", "string") is None
    assert widen_type("int32", "int32") == "int32"


def test_widen_type_semilattice_properties():
    """widen_type is a partial join-semilattice: commutative,
    idempotent, and associative wherever defined."""
    from hypothesis import given
    from hypothesis import strategies as st

    TYPES = ["int8", "int16", "int32", "int64", "float", "double",
             "string", "list<float32>"]

    @given(st.sampled_from(TYPES), st.sampled_from(TYPES))
    def comm(a, b):
        assert widen_type(a, b) == widen_type(b, a)

    @given(st.sampled_from(TYPES))
    def idem(a):
        assert widen_type(a, a) == a

    @given(
        st.sampled_from(TYPES), st.sampled_from(TYPES), st.sampled_from(TYPES)
    )
    def assoc(a, b, c):
        ab = widen_type(a, b)
        bc = widen_type(b, c)
        if ab is not None and bc is not None:
            left = widen_type(ab, c)
            right = widen_type(a, bc)
            assert left == right

    comm()
    idem()
    assoc()
