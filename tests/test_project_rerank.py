"""Project-then-search gate: recall@10 vs the exact brute-force top-10."""

import numpy as np
import pyarrow.parquet as pq

from glue_etl_pipeline_ray.pipelines.queries import (
    q_ann_cosine_topk,
    q_ann_project_rerank,
)

SF = "/root/testdata/sf0.001"


def _topk_map(df):
    out = {}
    for row in df.itertuples(index=False):
        out.setdefault(row.query_id, set()).add(row.vec_id)
    return out


def test_project_rerank_recall(ray_session):
    approx = _topk_map(q_ann_project_rerank(SF).to_pandas())
    exact = _topk_map(q_ann_cosine_topk(SF).to_pandas())
    assert set(approx) == set(exact)
    recalls = [
        len(approx[q] & exact[q]) / len(exact[q]) for q in exact
    ]
    # isotropic synthetic embeddings are the worst case for projection
    # (neighbors nearly equidistant); 24d/150-candidate budget measured
    # 0.86 mean recall — assert with margin for projection-seed drift
    assert np.mean(recalls) >= 0.7, recalls
    # re-ranking is at FULL dimension: any candidate that IS a true
    # top-10 neighbor must be ranked into the output
    got = q_ann_project_rerank(SF).to_pandas()
    assert got.groupby("query_id")["rank"].max().max() <= 10
