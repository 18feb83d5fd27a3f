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


# --------------------------------------------------------------------------
# k-hop reachability (semi-naive BFS)


def test_k_hop_reachability_min_hops_and_early_exit():
    from gliner_transbronchialbiopsy_ray.stages.graph import k_hop_reachability

    # 1 -> 2 -> 3 -> 4 -> 5 (chain), plus shortcut 1 -> 3 and cycle 3 -> 1
    edges = rd.from_items([
        {"src": 1, "dst": 2}, {"src": 2, "dst": 3}, {"src": 3, "dst": 4},
        {"src": 4, "dst": 5}, {"src": 1, "dst": 3}, {"src": 3, "dst": 1},
        {"src": 9, "dst": 10},  # disconnected
    ])
    seeds = rd.from_items([{"node": 1}, {"node": 1}])  # dup seed rows
    out = (k_hop_reachability(edges, seeds, k=3, num_partitions=2)
           .to_pandas().sort_values("node").reset_index(drop=True))
    got = dict(zip(out["node"], out["hops"]))
    # min-hop: 3 reached via the shortcut (1 hop), not the chain (2)
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3}
    # k caps the radius
    out1 = (k_hop_reachability(edges, seeds, k=1, num_partitions=2)
            .to_pandas())
    assert dict(zip(out1["node"], out1["hops"])) == {1: 0, 2: 1, 3: 1}
    # frontier drains before k on a short component -> early exit, no error
    far = rd.from_items([{"node": 9}])
    out9 = (k_hop_reachability(edges, far, k=5, num_partitions=2)
            .to_pandas())
    assert dict(zip(out9["node"], out9["hops"])) == {9: 0, 10: 1}
