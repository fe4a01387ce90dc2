"""Regression pins for the round-5 review findings: lookup projection
without keys, writer-lease takeover races, restore's lake-wide seq
floor, full-restore history kind, duplicate rename targets, generator
int32 offset chunking, and all-empty partition exchanges."""

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import glue_etl_pipeline_ray.gen as gen_mod
from glue_etl_pipeline_ray.gen import generate_change_events
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import TableSpec, repo_file_spec
from glue_etl_pipeline_ray.state.lease import ConcurrentWriter, WriterLease


# ---------------------------------------------------------------- lookup
@pytest.mark.parametrize("mode", ["rewrite", "delta"])
def test_lookup_projection_without_keys(tmp_path, mode, ray_session):
    """lookup(columns=...) that omits the key columns keeps them anyway
    (they are the result's identity and sort key) — it used to crash on
    the final key sort; the zero-match path returns the same projected
    schema as the hit path."""
    meta = generate_change_events(str(tmp_path), n_events=800, n_batches=2, seed=51)
    spec = repo_file_spec(num_buckets=8)
    eng = ReplayEngine(spec, str(tmp_path / "lake"), state_mode=mode)
    eng.replay(meta["events_dir"])
    live = eng.final_table()
    key = (live["repo"][0].as_py(), live["path"][0].as_py())
    hit = eng.lookup([key], columns=["lang"])
    assert hit.num_rows == 1
    assert set(hit.schema.names) == {"repo", "path", "lang"}
    miss = eng.lookup([("no/such", "x.py")], columns=["lang"])
    assert miss.num_rows == 0
    assert miss.schema.names == hit.schema.names


# ----------------------------------------------------------------- lease
def test_takeover_verify_restores_live_lock(tmp_path):
    """A stealer whose staleness check raced a fresh (re)creation must
    NOT keep the rename: the live lock is restored and the stealer
    aborts — the double-writer hole the bare rename left open."""
    lake = str(tmp_path / "lake")
    os.makedirs(os.path.join(lake, "_checkpoint"))
    live = WriterLease(lake, owner="live-holder:1:aa", ttl_s=60).acquire()
    thief = WriterLease(lake, owner="thief:2:bb", ttl_s=60)
    thief._age_s = lambda: 1e9  # simulate: its staleness check passed earlier
    with pytest.raises(ConcurrentWriter, match="raced a live writer"):
        thief.acquire()
    lock = os.path.join(lake, "_checkpoint", "WRITER_LOCK")
    assert json.load(open(lock))["owner"] == "live-holder:1:aa"
    live.heartbeat()  # the live holder is unharmed
    live.release()


def test_heartbeat_detects_usurpation(tmp_path):
    """A holder wrongly judged dead halts at its next heartbeat instead
    of silently double-writing."""
    lake = str(tmp_path / "lake")
    os.makedirs(os.path.join(lake, "_checkpoint"))
    a = WriterLease(lake, owner="a:1:aa", ttl_s=60).acquire()
    lock = os.path.join(lake, "_checkpoint", "WRITER_LOCK")
    old = 0
    os.utime(lock, (old, old))  # a looks dead
    b = WriterLease(lake, owner="b:2:bb", ttl_s=60).acquire()  # legit steal
    with pytest.raises(ConcurrentWriter, match="lease lost"):
        a.heartbeat()
    b.release()


# --------------------------------------------------------------- restore
def test_restore_default_seq_base_covers_unchurned_buckets(
    tmp_path, ray_session
):
    """restore()'s default seqs must exceed the max seq ANYWHERE in the
    lake, not just in the churned (feed) buckets."""
    import pyarrow.parquet as pq

    from glue_etl_pipeline_ray.hashing import bucket_of

    spec = repo_file_spec(num_buckets=4)
    # two keys in DIFFERENT buckets: k_hi carries the lake's max seq and
    # never churns after batch 0; k_lo (low seqs) is all the churn
    keys = [(f"org/r{i}", f"f{i}.py") for i in range(64)]
    b_of = {
        k: int(bucket_of(4, pa.array([k[0]]), pa.array([k[1]]))[0])
        for k in keys
    }
    k_hi = keys[0]
    k_lo = next(k for k in keys if b_of[k] != b_of[k_hi])

    def ev(k, seq, bid, content="x"):
        return {
            "seq": seq, "batch_id": bid, "op": "INSERT", "repo": k[0],
            "path": k[1], "commit": "ab" * 20, "lang": "py",
            "content": content,
        }

    evdir = str(tmp_path / "events")
    os.makedirs(evdir)
    pq.write_table(
        pa.Table.from_pylist([ev(k_hi, 1000, 0), ev(k_lo, 1, 0)]),
        os.path.join(evdir, "batch=00000.parquet"),
    )
    pq.write_table(
        pa.Table.from_pylist([ev(k_lo, 2, 1, content="changed")]),
        os.path.join(evdir, "batch=00001.parquet"),
    )
    eng = ReplayEngine(spec, str(tmp_path / "lake"), gc_old_versions=False)
    eng.replay(evdir)
    s = eng.restore(0)
    assert s["n_matched"] == 1  # only k_lo churned
    man = glob.glob(
        os.path.join(str(tmp_path / "lake"), "_dml", "*", "MANIFEST.json")
    )
    assert json.load(open(man[0]))["seq_base"] >= 1001


def test_full_restore_reports_restore_in_history(tmp_path, ray_session):
    meta = generate_change_events(str(tmp_path), n_events=800, n_batches=2, seed=52)
    spec = repo_file_spec(num_buckets=4)
    eng = ReplayEngine(spec, str(tmp_path / "lake"), gc_old_versions=False)
    eng.replay(meta["events_dir"])
    s = eng.restore(0, full=True)
    assert s["dml"] == "restore" and s["restored_to"] == 0
    h = eng.history()
    assert h["operation"][0].as_py() == "restore"


# ------------------------------------------------------------------ spec
def test_duplicate_rename_targets_rejected():
    spec = repo_file_spec()
    bad = TableSpec(
        name=spec.name, key_cols=spec.key_cols, base_cols=spec.base_cols,
        renames=(("sz", "size_bytes"), ("size_b", "size_bytes")),
    )
    with pytest.raises(ValueError, match="two sources rename"):
        bad.rename_map


# ------------------------------------------------------------- generator
def test_fixed_width_strings_chunk_past_int32(monkeypatch):
    """Past the int32 offset ceiling the generator emits chunked,
    value-identical string arrays instead of silently wrapping
    offsets."""
    mat = gen_mod._hex_mat(np.arange(100, dtype=np.int64), 8)
    whole = gen_mod._fixed_width_strings(mat)
    monkeypatch.setattr(gen_mod, "_MAX_STR_CHARS", 8 * 10)
    chunked = gen_mod._fixed_width_strings(mat)
    assert isinstance(chunked, pa.ChunkedArray) and chunked.num_chunks > 1
    assert chunked.to_pylist() == whole.to_pylist()


# ---------------------------------------------------------------- groups
def test_partition_exchange_all_empty_keeps_schema(ray_session):
    """grouped_apply_partitions over an all-empty dataset hands the
    partition_fn a TYPED empty (key columns present), never a
    zero-column placeholder."""
    import ray.data

    from glue_etl_pipeline_ray.functions.groups import grouped_apply_partitions

    t = pa.table({"k": pa.array([], pa.string()), "v": pa.array([], pa.int64())})

    def fn(part: pa.Table) -> pa.Table:
        # indexes the key column: crashes on a zero-column input
        return pa.table({"k": part["k"], "n": pa.array([1] * part.num_rows, pa.int64())})

    out = grouped_apply_partitions(
        ray.data.from_arrow(t), ["k"], fn, num_partitions=4, exchange="raycore"
    )
    got = out.take_all()
    assert got == []


# ----------------------------------------------------------------- joins
@pytest.mark.parametrize("sharded", [False, True])
def test_asof_join_int64_values_past_2p53_lossless(
    tmp_path, sharded, ray_session
):
    """Integer right-values above 2^53 must come through the as-of join
    bit-exact — the null-bearing __rv column used to round-trip through
    float64."""
    import ray.data

    from glue_etl_pipeline_ray.functions.joins import (
        asof_join_backward,
        asof_join_backward_sharded,
    )

    big = 2**55 + 3
    # sharded variant's contract: integer `by` key (hash-bucketed)
    right = ray.data.from_arrow(
        pa.table({"k": [1, 1], "ts": [10, 20], "v": pa.array([big, big + 1], pa.int64())})
    )
    left = ray.data.from_arrow(
        pa.table({"k": [1, 1, 1], "ts": [5, 15, 25]})
    )
    fn = asof_join_backward_sharded if sharded else asof_join_backward
    kw = {"bucket_width": 100} if sharded else {}
    out = (
        fn(left, right, by="k", on="ts", left_cols=["k", "ts"],
           right_value_col="v", out_col="matched", **kw)
        .take_all()
    )
    got = {r["ts"]: r["matched"] for r in out}
    assert got == {5: None, 15: big, 25: big + 1}


# ----------------------------------------------------------------- dedup
def test_simhash_rejects_unguaranteed_radius(ray_session):
    import ray.data

    from glue_etl_pipeline_ray.functions.dedup import simhash_pairs

    ds = ray.data.from_arrow(pa.table({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(ValueError, match="recall guarantee"):
        simhash_pairs(ds, max_hamming=4)


# -------------------------------------------------------------- validate
def test_validate_without_dlq_refuses_to_drop():
    from glue_etl_pipeline_ray.stages.validate import ValidateFn

    spec = repo_file_spec(num_buckets=4)
    bad = pa.table(
        {
            "seq": pa.array([1], pa.int64()),
            "batch_id": pa.array([0], pa.int64()),
            "op": pa.array(["INSERT"], pa.string()),
            "repo": pa.array([None], pa.string()),  # violates not_null
            "path": pa.array(["a.py"], pa.string()),
            "commit": pa.array(["ab" * 20], pa.string()),
            "lang": pa.array(["py"], pa.string()),
            "content": pa.array(["x"], pa.string()),
        }
    )
    with pytest.raises(ValueError, match="no dlq_dir"):
        ValidateFn(spec)(bad)


# --------------------------------------------------------------- partial
def test_partial_lww_equal_seq_survivor_is_last_input_row():
    """Equal-(key, seq) rows: the partial reduce keeps the LAST input
    row deterministically (stable sort), matching the raw exchange."""
    from glue_etl_pipeline_ray.stages.partial import make_partial_lww

    spec = repo_file_spec(num_buckets=4)
    fn = make_partial_lww(spec, 4)
    rows = pa.table(
        {
            "seq": pa.array([7, 7, 7], pa.int64()),
            "batch_id": pa.array([0, 0, 0], pa.int64()),
            "op": pa.array(["INSERT"] * 3, pa.string()),
            "repo": pa.array(["o/r"] * 3, pa.string()),
            "path": pa.array(["f.py"] * 3, pa.string()),
            "commit": pa.array(["ab" * 20] * 3, pa.string()),
            "lang": pa.array(["py"] * 3, pa.string()),
            "content": pa.array(["first", "middle", "last"], pa.string()),
        }
    )
    for _ in range(5):  # stable across repeats
        out = fn(rows)
        assert out.num_rows == 1
        assert out["content"][0].as_py() == "last"
