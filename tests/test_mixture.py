"""Pytest oracles for the mixture operators: hash_split proportions /
disjointness / determinism, mixture_sample achieved proportions and
binding-source behavior."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from glue_etl_pipeline_ray.functions.mixture import hash_split, mixture_sample


def _docs(n=20_000, sources=("a", "b", "c"), weights=(0.7, 0.2, 0.1)):
    rng = np.random.default_rng(13)
    src = rng.choice(sources, size=n, p=weights)
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "source": pa.array(src, pa.string()),
            }
        )
    )


def test_hash_split_proportions_disjoint_deterministic(ray_session):
    ds = _docs()
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out1 = {r["doc_id"]: r["split"] for r in hash_split(ds, w).take_all()}
    out2 = {r["doc_id"]: r["split"] for r in hash_split(ds, w).take_all()}
    assert out1 == out2  # deterministic
    assert len(out1) == 20_000  # exhaustive, one split per row
    counts = {s: 0 for s in w}
    for s in out1.values():
        counts[s] += 1
    for name, frac in w.items():
        assert abs(counts[name] / 20_000 - frac) < 0.02, counts


def test_hash_split_stable_under_repartition(ray_session):
    ds = _docs(5000)
    w = {"train": 0.5, "test": 0.5}
    a = {r["doc_id"]: r["split"] for r in hash_split(ds, w).take_all()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(ds.repartition(9), w).take_all()
    }
    assert a == b


def test_mixture_sample_hits_target_proportions(ray_session):
    ds = _docs()
    target = {"a": 0.3, "b": 0.4, "c": 0.3}
    sampled, plan = mixture_sample(ds, target)
    rows = sampled.take_all()
    got = {}
    for r in rows:
        got[r["source"]] = got.get(r["source"], 0) + 1
    n = len(rows)
    for s, share in target.items():
        assert abs(got[s] / n - share) < 0.03, (got, n)
    # binding source: 'c' is rarest relative to its target -> kept whole
    assert plan["rates"]["c"] == 1.0
    assert got["c"] == plan["counts"]["c"]
    assert abs(n - plan["expected_rows"]) / n < 0.05


def test_mixture_sample_drops_unlisted_sources(ray_session):
    ds = _docs()
    sampled, _ = mixture_sample(ds, {"a": 0.5, "b": 0.5})
    assert all(r["source"] != "c" for r in sampled.take_all())


def test_mixture_sample_missing_source_raises(ray_session):
    ds = _docs()
    with pytest.raises(ValueError):
        mixture_sample(ds, {"a": 0.5, "zz": 0.5})


@pytest.mark.parametrize("q", ["dataset_split", "mixture_sample"])
def test_query_entries_run(ray_session, q):
    import __ray_entry__ as entry

    res = entry.queries()[q]("/root/testdata/sf0.001")
    assert res.count() > 0


def test_mixture_sample_token_budget(ray_session):
    """weight_col mode: achieved TOKEN proportions match the target
    (long-doc sources contribute fewer docs for the same token share)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from glue_etl_pipeline_ray.functions.mixture import mixture_sample

    rng = np.random.default_rng(9)
    n = 4000
    src = np.where(rng.random(n) < 0.5, "long", "short").astype(object)
    toks = np.where(src == "long", 1000, 100).astype(np.int64)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "source": pa.array(src, pa.string()),
            "n_tokens": pa.array(toks, pa.int64()),
        }
    )
    target = {"long": 0.5, "short": 0.5}
    sampled, plan = mixture_sample(
        rd.from_arrow(t), target, weight_col="n_tokens"
    )
    df = sampled.to_pandas()
    got = df.groupby("source")["n_tokens"].sum()
    share_long = got["long"] / got.sum()
    # token share ~0.5 even though long docs are 10x the tokens each
    assert abs(share_long - 0.5) < 0.05
    assert plan["unit"] == "n_tokens"
    # the binding source (short: fewer total tokens) is kept whole
    assert plan["rates"]["short"] == 1.0
    n_short = (df["source"] == "short").sum()
    n_long = (df["source"] == "long").sum()
    assert n_long < n_short  # same token share -> far fewer long DOCS
    # determinism
    s2, _ = mixture_sample(rd.from_arrow(t), target, weight_col="n_tokens")
    assert sorted(s2.to_pandas()["doc_id"]) == sorted(df["doc_id"])


def test_mixture_sample_zero_weight_source_is_dropped(ray_session):
    """A 0.0 target proportion means 'drop that source' — it must not
    divide by zero sizing the sample; an all-zero or negative mix is a
    loud error."""
    ds = _docs()
    sampled, plan = mixture_sample(ds, {"a": 1.0, "b": 0.0})
    srcs = set(sampled.to_pandas()["source"])
    assert "b" not in srcs and "a" in srcs
    assert plan["rates"].keys() == {"a"}
    with pytest.raises(ValueError, match="positive"):
        mixture_sample(ds, {"a": 0.0})
    with pytest.raises(ValueError, match="non-negative"):
        mixture_sample(ds, {"a": 1.0, "b": -0.5})


def test_mixture_sample_null_source_rows_dropped(ray_session):
    """Rows with a NULL source get rate 0.0 like any unlisted source —
    np.unique would TypeError sorting None against str."""
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(40)]),
            "source": pa.array(
                ["a", "b", None, "a"] * 10, pa.string()
            ),
        }
    )
    sampled, _ = mixture_sample(rd.from_arrow(t), {"a": 0.5, "b": 0.5})
    df = sampled.to_pandas()
    assert not df["source"].isna().any()
    assert set(df["source"]) <= {"a", "b"}
