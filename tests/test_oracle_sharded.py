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
