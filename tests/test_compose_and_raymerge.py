"""Composed pipelines + the Ray-merge aggregation path."""

import pandas as pd
import ray.data

from gliner_transbronchialbiopsy_ray import fixtures
from gliner_transbronchialbiopsy_ray.pipelines.queries import _preagg
from gliner_transbronchialbiopsy_ray.stages.multimodal import media_features
from gliner_transbronchialbiopsy_ray.stages.similarity import brute_force_topk


def test_preagg_ray_merge_equals_driver_merge():
    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/lineitem.parquet",
        columns=["l_returnflag", "l_quantity"],
    )
    spec = {"sum_qty": ("l_quantity", "sum"), "n": ("l_quantity", "count")}
    a = _preagg(ds, ["l_returnflag"], spec, merge="driver")
    ds2 = ray.data.read_parquet(
        "/root/testdata/sf0.001/lineitem.parquet",
        columns=["l_returnflag", "l_quantity"],
    )
    b = _preagg(ds2, ["l_returnflag"], spec, merge="ray").to_pandas()
    a = a.sort_values("l_returnflag").reset_index(drop=True)
    b = b.sort_values("l_returnflag").reset_index(drop=True)[a.columns]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_media_similarity_composition():
    """Multimodal features -> ANN similarity over media (composed pipeline:
    spans -> media inventory -> feature extraction -> cosine top-k)."""
    path = fixtures.write_corpus(150, seed=42, shards=2)
    feats = media_features(ray.data.read_parquet(f"{path}/documents"), dim=16)
    ok = feats.filter(lambda r: r["decode_status"] == "ok")
    sample = ok.take(3)
    queries = {r["media_ref"]: r["feature"] for r in sample}
    out = brute_force_topk(
        ok, queries, k=3, id_col="media_ref", vec_col="feature",
    )
    assert set(out["query_id"]) == set(queries)
    assert (out.groupby("query_id").size() == 3).all()
    assert (out["score"] <= 1.000001).all()
