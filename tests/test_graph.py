"""Bipartite PageRank (stages/graph.py): distributed join+groupby power
iteration must match a dense NumPy reference on a small known graph."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gliner_transbronchialbiopsy_ray.stages.graph import bipartite_pagerank


def _numpy_reference(edges, iters, d=0.85):
    ls = sorted({l for l, _ in edges})
    rs = sorted({r for _, r in edges})
    li = {l: i for i, l in enumerate(ls)}
    ri = {r: i for i, r in enumerate(rs)}
    A = np.zeros((len(ls), len(rs)))
    for l, r in edges:
        A[li[l], ri[r]] = 1.0
    deg_l = A.sum(1)
    deg_r = A.sum(0)
    rank_l = np.full(len(ls), 1.0 / len(ls))
    for _ in range(iters):
        rank_r = (1 - d) / len(rs) + d * ((rank_l / deg_l) @ A)
        rank_l = (1 - d) / len(ls) + d * (A @ (rank_r / deg_r))
    return {r: rank_r[ri[r]] for r in rs}


@pytest.mark.parametrize("strategy", ["collapse", "broadcast", "join"])
def test_bipartite_pagerank_matches_numpy(ray_session, strategy):
    edges = [(1, "a"), (1, "b"), (2, "a"), (3, "a"), (3, "c"), (4, "c"),
             (1, "a")]  # duplicate edge must not double-count
    ds = rd.from_items([{"user_id": l, "event_type": r} for l, r in edges])
    out_r, ranks_l = bipartite_pagerank(ds, iters=2, num_partitions=2,
                                        strategy=strategy)
    ref = _numpy_reference(set(edges), iters=2)
    for _, row in out_r.iterrows():
        assert abs(row["rank"] - ref[row["event_type"]]) < 1e-6
    # hub 'a' (3 users) outranks 'b' (1 user)
    r = out_r.set_index("event_type")["rank"]
    assert r["a"] > r["b"]
    # left side stays a Dataset and covers every user
    lp = ranks_l.to_pandas()
    assert sorted(lp["user_id"]) == [1, 2, 3, 4]
    assert np.isclose(lp["rank"].sum() + out_r["rank"].sum(), 2.0, atol=0.31)
