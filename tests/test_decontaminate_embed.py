"""decontaminate_embed gate: the semantic contamination filter equals
DuckDB's list_cosine_similarity NOT-EXISTS anti-join, and the audit
mode tags without dropping."""

import duckdb
import pytest

from glue_etl_pipeline_ray.pipelines.queries import q_decontaminate_embed

ORACLE = """
SELECT a.vec_id
FROM read_parquet('{sf}/embeddings.parquet') a
WHERE a.vec_id % 17 <> 0
  AND NOT EXISTS (
      SELECT 1 FROM read_parquet('{sf}/embeddings.parquet') b
      WHERE b.vec_id % 17 = 0
        AND list_cosine_similarity(a.embedding, b.embedding) >= 0.4
  )
ORDER BY a.vec_id
"""


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_decontaminate_embed_matches_duckdb(ray_session, sf):
    got = sorted(q_decontaminate_embed(sf).to_pandas()["vec_id"])
    exp = list(duckdb.sql(ORACLE.format(sf=sf)).df()["vec_id"])
    assert len(got) > 0
    assert got == exp
    # fixture must actually drop something, else the gate is vacuous
    n_train = duckdb.sql(
        f"SELECT count(*) c FROM read_parquet('{sf}/embeddings.parquet') "
        "WHERE vec_id % 17 <> 0"
    ).df()["c"][0]
    assert len(got) < n_train


def test_audit_mode_tags_without_dropping(ray_session):
    import numpy as np
    import pyarrow as pa

    from glue_etl_pipeline_ray.functions.decontaminate import (
        decontaminate_embed,
    )
    from glue_etl_pipeline_ray.pipelines.queries import _t

    sf = "/root/testdata/sf0.001"
    ds = _t(sf, "embeddings", ["vec_id", "embedding"])

    def _side(want):
        def f(t):
            ids = t["vec_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array((ids % 17 == 0) == want))

        return f

    bench = ds.map_batches(_side(True), batch_format="pyarrow", batch_size=None)
    train = ds.map_batches(_side(False), batch_format="pyarrow", batch_size=None)
    df = decontaminate_embed(train, bench, tau=0.4, drop=False).to_pandas()
    kept = sorted(q_decontaminate_embed(sf).to_pandas()["vec_id"])
    assert len(df) > len(kept)  # nothing dropped in audit mode
    assert sorted(df[df["max_bench_sim"] < 0.4]["vec_id"]) == kept
    assert (df["max_bench_sim"] >= -1).all() and (df["max_bench_sim"] <= 1 + 1e-12).all()
