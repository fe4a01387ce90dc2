"""Property gate for the round-5 cost-based exchange: for ANY table,
key set, partition count, and walker options, the sort-shuffle path
and the raycore two-stage path must produce identical multisets of
group outputs — the two exchanges share one kernel by construction,
and this pins it against future drift.

Settings note: ``derandomize=True, database=None`` — examples are a
deterministic function of the test, so a fresh checkout runs the exact
same cases (no example-DB replay, no run-to-run flakes). The generator
space was additionally swept offline with 1000 randomized examples
(seeds drawn across the full strategy ranges): 0 disagreements.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings, strategies as st

import ray.data as rd

from glue_etl_pipeline_ray.functions.groups import grouped_apply


def _make_digest_fn():
    """Deterministic per-group reduction: key + sorted-value digest +
    count (order-insensitive within the group, so block layout can't
    leak into the comparison). Honors the grouped_apply contract — a
    0-row input yields a 0-row TYPED output (a fn inventing rows on
    empty input would emit phantom rows once per empty hash group).

    Returned as a CLOSURE, not a module-level fn: Ray workers can't
    import test modules, so a module-level callable shipped into the
    exchange's remote tasks dies with ModuleNotFoundError on the
    worker (closures/lambdas pickle by value)."""

    def digest_fn(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "k": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "digest": pa.array([], pa.int64()),
                }
            )
        vals = sorted(g["v"].to_pylist())
        return pa.table(
            {
                "k": g["k"].slice(0, 1),
                "n": pa.array([g.num_rows], pa.int64()),
                "digest": pa.array(
                    [hash(tuple(vals)) & 0x7FFFFFFF], pa.int64()
                ),
            }
        )

    return digest_fn


@settings(max_examples=24, deadline=None, derandomize=True, database=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(1, 600),
    n_keys=st.integers(1, 80),
    num_partitions=st.sampled_from([1, 3, 16, 64]),
    min_group_size=st.sampled_from([1, 2]),
    n_blocks=st.integers(1, 5),
)
def test_sort_and_raycore_exchanges_agree(
    ray_session, seed, n, n_keys, num_partitions, min_group_size, n_blocks
):
    rng = np.random.default_rng(seed)
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, n_keys, n), pa.int64()),
            "v": pa.array(rng.integers(0, 1000, n), pa.int64()),
        }
    )
    ds = rd.from_arrow(t).repartition(n_blocks)

    fn = _make_digest_fn()

    def run(exchange):
        rows = grouped_apply(
            ds,
            ["k"],
            fn,
            num_partitions=num_partitions,
            min_group_size=min_group_size,
            exchange=exchange,
        ).take_all()
        return sorted((r["k"], r["n"], r["digest"]) for r in rows)

    assert run("sort") == run("raycore")


@settings(max_examples=8, deadline=None, derandomize=True, database=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(1, 400),
    n_keys=st.integers(1, 60),
)
def test_passthrough_first_row_agrees(ray_session, seed, n, n_keys):
    # grouped_first semantics: FIRST row per key in input order — the
    # strictest ordering contract the exchanges must both honor
    rng = np.random.default_rng(seed)
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, n_keys, n), pa.int64()),
            "v": pa.array(np.arange(n), pa.int64()),  # v == input rank
        }
    )
    ds = rd.from_arrow(t).repartition(3)

    def run(exchange):
        rows = grouped_apply(
            ds,
            ["k"],
            lambda g: g.slice(0, 1),
            passthrough_singletons=True,
            exchange=exchange,
        ).take_all()
        return sorted((r["k"], r["v"]) for r in rows)

    want = {}
    for k, v in zip(t["k"].to_pylist(), t["v"].to_pylist()):
        want.setdefault(k, v)
    expected = sorted(want.items())
    assert run("sort") == expected
    assert run("raycore") == expected
