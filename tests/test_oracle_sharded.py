"""Sharded-oracle gates (round 5, the 10^9-soak enabler).

The parallel oracle must be bit-equivalent to the serial reference
replayer on streams exercising every contract dimension — dirt (all
five dirt modes), deletes, LWW overwrites under Zipf key skew, and
additive schema evolution — at several shard counts (1 = degenerate,
a prime count so keys straddle shard boundaries), including a
mid-stream snapshot taken between segments (the soak's checkpoint
protocol) and DLQ row-level equality.

Also gates the generator's new ``batch_ids`` segmentation: generating
a stream in two segments must be byte-identical to one full run.
"""

import glob
import hashlib
import os

from glue_etl_pipeline_ray.gen import (
    generate_change_events,
    generate_change_events_parallel,
)
from glue_etl_pipeline_ray.oracle import replay_oracle
from glue_etl_pipeline_ray.oracle_sharded import (
    ShardedOracle,
    replay_oracle_sharded,
)
from glue_etl_pipeline_ray.spec import repo_file_spec

GEN = dict(
    n_events=24_000,
    n_repos=40,
    n_paths=60,
    n_batches=6,
    evolve_from_batch=4,
    dirty_frac=0.03,
    delete_frac=0.10,
    seed=4242,
)


def _dlq_key(rows, spec):
    return sorted((r[spec.seq_col], r["error"]) for r in rows)


def test_sharded_oracle_matches_serial(ray_session, tmp_path):
    generate_change_events(str(tmp_path), **GEN)
    ev = str(tmp_path / "events")
    spec = repo_file_spec()
    serial = replay_oracle(spec, ev)
    assert serial["n_dead_lettered"] > 0 and serial["n_deleted"] > 0
    assert serial["evolved"]  # evolution actually exercised
    for n_shards in (1, 5):
        sharded = replay_oracle_sharded(spec, ev, num_shards=n_shards)
        assert sharded["sha256"] == serial["sha256"]
        for k in ("n_applied", "n_deleted", "n_dead_lettered", "n_live"):
            assert sharded[k] == serial[k], k
        assert sharded["evolved"] == serial["evolved"]
        assert _dlq_key(sharded["dlq"], spec) == _dlq_key(
            serial["dlq"], spec
        )


def test_sharded_oracle_midstream_snapshot(ray_session, tmp_path):
    """Feed the stream in two segments; the snapshot between them must
    equal a serial replay of the prefix, and the tip must equal the
    full serial replay — the segmented soak's exact protocol."""
    generate_change_events(str(tmp_path), **GEN)
    ev = str(tmp_path / "events")
    spec = repo_file_spec()
    files = sorted(glob.glob(os.path.join(ev, "batch=*.parquet")))
    assert len(files) == 6

    o = ShardedOracle(spec, num_shards=3, keep_dlq=False)
    o.apply_files(files[:3])
    mid = o.result(with_table=False)

    prefix_dir = tmp_path / "prefix"
    prefix_dir.mkdir()
    for f in files[:3]:
        os.symlink(f, prefix_dir / os.path.basename(f))
    serial_mid = replay_oracle(spec, str(prefix_dir))
    assert mid["sha256"] == serial_mid["sha256"]
    assert mid["n_live"] == serial_mid["n_live"]

    o.apply_files(files[3:])
    tip = o.result(with_table=False)
    serial_tip = replay_oracle(spec, ev)
    assert tip["sha256"] == serial_tip["sha256"]
    assert tip["n_dead_lettered"] == serial_tip["n_dead_lettered"]


def test_segmented_generation_equals_full(ray_session, tmp_path):
    kw = dict(GEN, seed=99)
    full = generate_change_events_parallel(
        str(tmp_path / "full"), num_cpus_per_task=1, **kw
    )
    assert full["n_events"] == kw["n_events"]
    generate_change_events_parallel(
        str(tmp_path / "seg"),
        num_cpus_per_task=1,
        batch_ids=range(0, 2),
        **kw,
    )
    generate_change_events_parallel(
        str(tmp_path / "seg"),
        num_cpus_per_task=1,
        batch_ids=range(2, 6),
        **kw,
    )

    def hashes(d):
        return {
            os.path.basename(p): hashlib.sha256(
                open(p, "rb").read()
            ).hexdigest()
            for p in sorted(glob.glob(os.path.join(d, "events", "*.parquet")))
        }

    h_full, h_seg = hashes(str(tmp_path / "full")), hashes(
        str(tmp_path / "seg")
    )
    assert h_full == h_seg and len(h_full) == 6


def test_multi_unit_row_group_routing(ray_session, tmp_path):
    """Force the routing pipeline into MANY units per file (tiny row
    groups + a tiny ROUTE_ROWS) so units of the same file are applied
    out of submission lockstep — the 10^9 soak's actual shape. The LWW
    fold must still land the serial oracle's exact state, DLQ included:
    order independence of the unit stream is the property this pins."""
    kw = dict(GEN, n_events=12_000, seed=515)
    generate_change_events(str(tmp_path), row_group_size=512, **kw)
    ev = str(tmp_path / "events")
    spec = repo_file_spec()
    serial = replay_oracle(spec, ev)

    o = ShardedOracle(spec, num_shards=5)
    assert o.ROUTE_ROWS > 1000  # the scale default
    o.ROUTE_ROWS = 1000  # ~2 row groups per unit -> 4+ units per file
    o.ROUTE_WAVE = 4
    o.apply_dir(ev)
    out = o.result(with_table=False)
    assert out["sha256"] == serial["sha256"]
    assert out["n_dead_lettered"] == serial["n_dead_lettered"]
    assert out["n_live"] == serial["n_live"]
    assert _dlq_key(o.dlq_rows(), spec) == _dlq_key(serial["dlq"], spec)


def test_sharded_oracle_reads_directory_batches(ray_session, tmp_path):
    """apply_dir must honor the engine's full layout contract: a batch
    can be a ``batch=N/`` DIRECTORY of part files (staged DML batches,
    _events_as_cdc output) — a plain file glob silently replayed
    partial data."""
    import shutil

    generate_change_events(str(tmp_path), **{**GEN, "n_events": 6000})
    ev = str(tmp_path / "events")
    spec = repo_file_spec()
    serial = replay_oracle(spec, ev)

    # convert batch 2 to directory layout
    src = os.path.join(ev, "batch=00002.parquet")
    d = os.path.join(ev, "batch=00002")
    os.makedirs(d)
    shutil.move(src, os.path.join(d, "part-0.parquet"))
    assert replay_oracle(spec, ev)["sha256"] == serial["sha256"]
    sharded = replay_oracle_sharded(spec, ev, num_shards=3)
    assert sharded["sha256"] == serial["sha256"]
    assert sharded["n_dead_lettered"] == serial["n_dead_lettered"]


def test_oracles_survive_null_seq_rows(ray_session, tmp_path):
    """A null ``seq`` (the dirt the seq not_null rule exists for) must
    dead-letter in BOTH oracles, not crash the per-batch sort."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    ev = str(tmp_path / "events")
    os.makedirs(ev)
    n = 20
    seq = list(range(n))
    seq[7] = None  # one null-seq row
    t = pa.table(
        {
            "seq": pa.array(seq, pa.int64()),
            "batch_id": pa.array(np.zeros(n, np.int64)),
            "op": pa.array(["INSERT"] * n, pa.string()),
            "repo": pa.array(["o/r"] * n, pa.string()),
            "path": pa.array([f"f{i}.py" for i in range(n)], pa.string()),
            "commit": pa.array(["ab" * 20] * n, pa.string()),
            "lang": pa.array(["py"] * n, pa.string()),
            "content": pa.array([f"c{i}" for i in range(n)], pa.string()),
        }
    )
    pq.write_table(t, os.path.join(ev, "batch=00000.parquet"))
    spec = repo_file_spec()
    serial = replay_oracle(spec, ev)
    assert serial["n_dead_lettered"] == 1
    assert serial["n_live"] == n - 1
    sharded = replay_oracle_sharded(spec, ev, num_shards=2)
    assert sharded["sha256"] == serial["sha256"]
    assert sharded["n_dead_lettered"] == 1


def test_oracle_batch_order_is_numeric_not_lexicographic(
    ray_session, tmp_path
):
    """Unpadded batch names (batch=2 vs batch=10) must replay in
    numeric order like the engine's discover_batches — lexicographic
    order applies 10 before 2 and flips LWW outcomes."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    ev = str(tmp_path / "events")
    os.makedirs(ev)

    def one(bid, seq, content):
        return pa.table(
            {
                "seq": pa.array([seq], pa.int64()),
                "batch_id": pa.array([bid], pa.int64()),
                "op": pa.array(["INSERT" if bid == 2 else "UPDATE"]),
                "repo": pa.array(["o/r"]),
                "path": pa.array(["f.py"]),
                "commit": pa.array(["ab" * 20]),
                "lang": pa.array(["py"]),
                "content": pa.array([content]),
            }
        )

    pq.write_table(one(2, 0, "old"), os.path.join(ev, "batch=2.parquet"))
    pq.write_table(one(10, 1, "new"), os.path.join(ev, "batch=10.parquet"))
    spec = repo_file_spec()
    serial = replay_oracle(spec, ev)
    assert serial["table"]["content"].to_pylist() == ["new"]
    sharded = replay_oracle_sharded(spec, ev, num_shards=2)
    assert sharded["sha256"] == serial["sha256"]


def test_parallel_generator_more_batches_than_events(ray_session, tmp_path):
    """n_batches > n_events: tail batches are empty files in the serial
    path; the parallel path must not crash on a negative row count."""
    import pyarrow.parquet as pq

    p = generate_change_events_parallel(
        str(tmp_path / "b"), n_events=10, n_batches=20, seed=5
    )
    files = sorted(glob.glob(os.path.join(p["events_dir"], "batch=*.parquet")))
    assert len(files) == 20
    assert sum(pq.ParquetFile(f).metadata.num_rows for f in files) == 10
    spec = repo_file_spec()
    res = replay_oracle(spec, p["events_dir"])
    assert res["n_live"] + res["n_dead_lettered"] >= 1


def test_batch_files_skips_non_numeric_entries(ray_session, tmp_path):
    """Scratch entries like batch=tmp.parquet / batch=staging/ are
    skipped by the engine's discover_batches — the oracles must skip
    them too, not replay them first."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from glue_etl_pipeline_ray.oracle import batch_files

    ev = str(tmp_path / "events")
    os.makedirs(os.path.join(ev, "batch=staging"))
    t = pa.table({"x": pa.array([1], pa.int64())})
    pq.write_table(t, os.path.join(ev, "batch=tmp.parquet"))
    pq.write_table(t, os.path.join(ev, "batch=staging", "p.parquet"))
    pq.write_table(t, os.path.join(ev, "batch=00000.parquet"))
    got = batch_files(ev)
    assert [os.path.basename(f) for f in got] == ["batch=00000.parquet"]
