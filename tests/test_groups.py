"""grouped_apply: exact fine-grained groupby semantics at coarse Ray fan-out."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from glue_etl_pipeline_ray.functions.groups import grouped_apply, grouped_first


def test_grouped_apply_matches_naive_groupby(ray_session):
    rng = np.random.default_rng(3)
    n = 5000
    keys = rng.integers(0, 800, n)          # ~800 distinct keys, many singletons
    vals = rng.integers(0, 1000, n)
    ds = rd.from_arrow(pa.table({"k": keys, "v": vals}))

    def group_sum(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table(
            {"k": g["k"].slice(0, 1), "s": pa.array([pc.sum(g["v"]).as_py() or 0], pa.int64())}
        )

    got = {r["k"]: r["s"] for r in grouped_apply(ds, ["k"], group_sum).take_all()}
    want = {}
    for k, v in zip(keys.tolist(), vals.tolist()):
        want[k] = want.get(k, 0) + v
    assert got == want


def test_grouped_first_keeps_one_row_per_key(ray_session):
    t = pa.table({"k": [1, 1, 2, 3, 3, 3], "v": [10, 11, 20, 30, 31, 32]})
    out = grouped_first(rd.from_arrow(t), ["k"]).take_all()
    assert sorted(r["k"] for r in out) == [1, 2, 3]


def test_grouped_apply_min_group_size_skips_singletons(ray_session):
    t = pa.table({"k": [1, 2, 2, 3], "v": [1, 2, 3, 4]})

    def pairs(g: pa.Table) -> pa.Table:
        return pa.table({"k": g["k"].slice(0, 1)})

    out = grouped_apply(rd.from_arrow(t), ["k"], pairs, min_group_size=2).take_all()
    assert [r["k"] for r in out] == [2]


def test_raycore_grouped_apply_matches_dataset_path(ray_session):
    import pyarrow.compute as pc

    from glue_etl_pipeline_ray.functions.groups import raycore_grouped_apply

    rng = np.random.default_rng(11)
    n = 8000
    t = pa.table({"k": rng.integers(0, 500, n), "v": rng.integers(0, 100, n)})
    ds = rd.from_arrow(t).materialize()

    def group_sum(g: pa.Table) -> pa.Table:
        return pa.table(
            {"k": g["k"].slice(0, 1),
             "s": pa.array([pc.sum(g["v"]).as_py() or 0], pa.int64())}
        )

    a = {r["k"]: r["s"] for r in grouped_apply(ds, ["k"], group_sum).take_all()}
    b = {r["k"]: r["s"] for r in raycore_grouped_apply(ds, ["k"], group_sum).take_all()}
    assert a == b and len(a) == len(set(t["k"].to_pylist()))


def test_heavy_hitters_bound_and_exactness(ray_session):
    """SpaceSaving-style sketch: with partial_m above the distinct count
    the result equals the exact top-k; with a tight partial_m the
    deterministic bound still holds (true count within [min, max] and no
    qualifying key missed)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from glue_etl_pipeline_ray.functions.sketch import heavy_hitters

    rng = np.random.default_rng(11)
    # zipf-ish: few heavy keys, long tail
    keys = np.minimum(rng.zipf(1.4, 40_000), 500).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": pa.array(keys)})).repartition(8)
    exact = {}
    for kk in keys:
        exact[int(kk)] = exact.get(int(kk), 0) + 1
    top_exact = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    # generous partial_m: must be EXACT (zero slack)
    wide = heavy_hitters(ds, "k", k=10, partial_m=600).to_pylist()
    assert [(r["key"], r["count_min"]) for r in wide] == top_exact
    assert all(r["count_max"] == r["count_min"] for r in wide)

    # tight partial_m: bounds must bracket the truth for reported keys
    tight = heavy_hitters(ds, "k", k=10, partial_m=20).to_pylist()
    for r in tight:
        assert r["count_min"] <= exact[r["key"]] <= r["count_max"], r
    # every truly-heavy key (above worst-case slack) is present
    max_slack = max(r["count_max"] - r["count_min"] for r in tight)
    floor = min(r["count_min"] for r in tight) + max_slack
    reported = {r["key"] for r in tight}
    for kk, c in exact.items():
        if c > floor:
            assert kk in reported, (kk, c, floor)


def test_topk_sketch_matches_exact_on_testdata(ray_session):
    """With partial_m above the user cardinality, the sketch top-k is
    exact: same keys, same totals, zero slack."""
    from glue_etl_pipeline_ray.pipelines.queries import (
        q_topk_users,
        q_topk_users_sketch,
    )

    sf = "/root/testdata/sf0.001"
    sk = q_topk_users_sketch(sf).to_pylist()
    ex = q_topk_users(sf).to_pandas()
    assert [r["key"] for r in sk] == list(ex.user_id)
    assert [r["count_min"] for r in sk] == list(ex.total_cents)
    assert all(r["count_max"] == r["count_min"] for r in sk)


def test_exchange_paths_agree_incl_passthrough_and_empty_groups(ray_session):
    """The three exchange settings must be semantically identical —
    including passthrough_singletons (grouped_first shapes), empty hash
    groups (raycore G > n_keys), and group fns that cannot take a 0-row
    input (auto must quietly keep the sort path for those)."""
    import pyarrow.compute as pc

    rng = np.random.default_rng(29)
    n = 4000
    t = pa.table(
        {
            "k": rng.integers(0, 37, n),  # 37 keys << 64 groups
            "v": rng.integers(0, 100, n),
        }
    )
    ds = rd.from_arrow(t)

    def group_sum(g: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": g["k"].slice(0, 1),
                "s": pa.array([pc.sum(g["v"]).as_py() or 0], pa.int64()),
            }
        )

    want = {
        r["k"]: r["s"]
        for r in grouped_apply(ds, ["k"], group_sum, exchange="sort").take_all()
    }
    got = {
        r["k"]: r["s"]
        for r in grouped_apply(ds, ["k"], group_sum, exchange="auto").take_all()
    }
    assert got == want, "auto"

    # EXPLICIT raycore with the unprobeable fn fails loud (the old
    # silent sort downgrade hid a 4-5x plan change from the caller);
    # a probe-safe fn takes the raycore path and agrees with sort
    import pytest

    with pytest.raises(ValueError, match="0-row schema probe"):
        grouped_apply(ds, ["k"], group_sum, exchange="raycore")

    def group_sum_safe(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"k": g["k"], "s": pa.array([], pa.int64())})
        return group_sum(g)

    got = {
        r["k"]: r["s"]
        for r in grouped_apply(
            ds, ["k"], group_sum_safe, exchange="raycore"
        ).take_all()
    }
    assert got == want, "raycore"

    # passthrough_singletons: first-row-per-key identical across paths
    t2 = pa.table({"k": [1, 1, 2, 3, 3, 3], "v": [10, 11, 20, 30, 31, 32]})
    for ex in ("sort", "raycore", "auto"):
        out = grouped_apply(
            rd.from_arrow(t2),
            ["k"],
            lambda g: g.slice(0, 1),
            passthrough_singletons=True,
            exchange=ex,
        ).take_all()
        assert sorted((r["k"], r["v"]) for r in out) == [
            (1, 10),
            (2, 20),
            (3, 30),
        ], ex

    # a fn that indexes row 0 unconditionally (raises on 0-row input):
    # auto's driver-side probe must detect it and keep the sort path
    def head_unsafe(g: pa.Table) -> pa.Table:
        return pa.table({"k": pa.array([g["k"][0].as_py()], pa.int64())})

    out = grouped_apply(ds, ["k"], head_unsafe, exchange="auto").take_all()
    assert sorted(set(r["k"] for r in out)) == sorted(set(t["k"].to_pylist()))


def test_explicit_raycore_request_raises_on_unprobeable_fn(ray_session):
    """exchange='raycore' requested EXPLICITLY with an fn that raises on
    the 0-row schema probe must fail loud (naming the probe), never
    silently run the slower sort plan the caller opted out of."""
    import pytest

    t = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                  "v": pa.array([1, 2, 3], pa.int64())})

    def head_unsafe(g: pa.Table) -> pa.Table:
        return pa.table({"k": pa.array([g["k"][0].as_py()], pa.int64())})

    with pytest.raises(ValueError, match="0-row schema probe"):
        grouped_apply(
            rd.from_arrow(t), ["k"], head_unsafe, exchange="raycore"
        )
