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


# --------------------------------------------------------------------------
# co-occurrence edges / triangle counts / ontology entailment


def test_cooccurrence_edges_counts_and_cap():
    from gliner_transbronchialbiopsy_ray.stages.graph import cooccurrence_edges

    # groups: g1={1,2,3}, g2={1,2}, g3={1,2,3,4} (dup rows must not inflate)
    rows = []
    for g, items in [(1, [1, 2, 3]), (2, [1, 2]), (3, [1, 2, 3, 4]),
                     (3, [1, 2])]:  # g3 repeated rows
        rows += [{"g": g, "i": i} for i in items]
    ds = rd.from_items(rows)
    out = (cooccurrence_edges(ds, "g", "i", min_count=2)
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    got = {(a, b): n for a, b, n in zip(out["a"], out["b"], out["n"])}
    assert got == {(1, 2): 3, (1, 3): 2, (2, 3): 2}
    # cap drops the 4-item group entirely: (1,2) loses one co-occurrence
    capped = (cooccurrence_edges(ds, "g", "i", min_count=1,
                                 max_items_per_group=3).to_pandas())
    gc = {(a, b): n for a, b, n in zip(capped["a"], capped["b"], capped["n"])}
    assert gc == {(1, 2): 2, (1, 3): 1, (2, 3): 1}


def test_cooccurrence_edges_pairless_buckets():
    from gliner_transbronchialbiopsy_ray.stages.graph import cooccurrence_edges

    # every group has ONE item -> every invoked LSH bucket emits zero
    # pairs, so gen_pairs takes its empty-return path; that path must
    # still carry the _bucket tag or the second groupby("_bucket")
    # raises "no such column" (the q246 full-suite failure)
    ds = rd.from_items([{"g": g, "i": g * 7} for g in range(40)])
    out = cooccurrence_edges(ds, "g", "i", min_count=1).to_pandas()
    assert len(out) == 0  # executing without "no such column" IS the test
    # (zero-row to_pandas drops columns — the Dataset schema is the
    # contract, asserted via the mixed case below)
    # mixed case: exactly one bucket has a real pair, the rest are empty
    ds2 = rd.from_items([{"g": g, "i": g * 7} for g in range(40)]
                        + [{"g": 0, "i": 999}])
    out2 = cooccurrence_edges(ds2, "g", "i", min_count=1).to_pandas()
    assert {(a, b): n for a, b, n in
            zip(out2["a"], out2["b"], out2["n"])} == {(0, 999): 1}


def test_label_propagation_hits_empty_vote_buckets():
    """The same empty-return hazard in label_propagation (neighbor_votes)
    and HITS (fold): a bucket whose rows are all label/score rows with no
    edge rows takes the empty path, which must keep the _bucket column."""
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        hits_int,
        label_propagation_communities,
    )

    # isolated-ish graph: single edge + far-apart node ids spread labels
    # across many buckets, so most vote buckets hold labels only
    e = rd.from_items([{"a": 1, "b": 33}, {"a": 2, "b": 66}])
    lp = label_propagation_communities(e, rounds=2).to_pandas()
    assert set(lp["node"]) == {1, 33, 2, 66}
    h = hits_int(e.map_batches(
        lambda b: b.rename_columns(["src", "dst"]),
        batch_format="pyarrow"), rounds=1).to_pandas()
    assert set(h["node"]) == {1, 33, 2, 66}


def test_triangle_counts_known_graph():
    from gliner_transbronchialbiopsy_ray.stages.graph import triangle_counts

    # K4 on {1,2,3,4} (every node in 3 triangles) plus pendant 4-5
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    ds = rd.from_items([{"a": a, "b": b} for a, b in edges])
    out = triangle_counts(ds).to_pandas()
    got = dict(zip(out["node"], out["triangles"]))
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}  # 5 is in no triangle -> absent


def test_subclass_closure_dag_and_cycle():
    import pytest
    from gliner_transbronchialbiopsy_ray.stages.graph import subclass_closure

    sub = pd.DataFrame({"child": ["a", "b", "b", "c"],
                        "parent": ["top", "a", "x", "b"]})  # DAG: b has 2 parents
    clos = subclass_closure(sub)
    anc = {c: set(g["anc"]) for c, g in clos.groupby("child")}
    assert anc["c"] == {"c", "b", "a", "x", "top"}
    assert anc["b"] == {"b", "a", "x", "top"}
    assert anc["a"] == {"a", "top"}
    with pytest.raises(ValueError, match="cycle"):
        subclass_closure(pd.DataFrame({"child": ["p", "q"],
                                       "parent": ["q", "p"]}))


def test_entail_types_expands_and_keeps_unknown_classes():
    from gliner_transbronchialbiopsy_ray.stages.graph import entail_types

    sub = pd.DataFrame({"child": ["dog", "cat", "mammal"],
                        "parent": ["mammal", "mammal", "animal"]})
    inst = rd.from_items([
        {"inst": 1, "cls": "dog"},
        {"inst": 2, "cls": "cat"},
        {"inst": 3, "cls": "rock"},  # class absent from the ontology
    ])
    out = entail_types(inst, sub).to_pandas()
    got = {(i, c) for i, c in zip(out["inst"], out["cls"])}
    assert got == {
        (1, "dog"), (1, "mammal"), (1, "animal"),
        (2, "cat"), (2, "mammal"), (2, "animal"),
        (3, "rock"),
    }


def test_triangle_counts_degree_order_matches_id_order():
    from gliner_transbronchialbiopsy_ray.stages.graph import triangle_counts

    # hub graph: node 100 connects to 1..12; ring 1-2, 2-3, 3-4 closes
    # triangles through the hub; plus K4 on {20,21,22,23}
    edges = [(i, 100) for i in range(1, 13)]
    edges += [(1, 2), (2, 3), (3, 4)]
    edges += [(20, 21), (20, 22), (20, 23), (21, 22), (21, 23), (22, 23)]
    ds = rd.from_items([{"a": min(a, b), "b": max(a, b)} for a, b in edges])
    by_id = (triangle_counts(ds, order="id").to_pandas()
             .sort_values("node").reset_index(drop=True))
    by_deg = (triangle_counts(rd.from_items(
        [{"a": min(a, b), "b": max(a, b)} for a, b in edges]),
        order="degree").to_pandas()
        .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(by_id, by_deg)
    got = dict(zip(by_id["node"], by_id["triangles"]))
    # hub sits in 3 triangles (1-2-100, 2-3-100, 3-4-100)
    assert got[100] == 3 and got[2] == 2 and got[20] == 3


def test_k_hop_min_cost_cheapest_path_beats_fewest_hops():
    from gliner_transbronchialbiopsy_ray.stages.graph import k_hop_min_cost

    # 1 -> 2 costs 10 direct, but 1 -> 3 -> 2 costs 2 + 3 = 5;
    # 2 -> 4 extends the cheap path within the hop budget
    edges = rd.from_items([
        {"src": 1, "dst": 2, "w": 10}, {"src": 1, "dst": 3, "w": 2},
        {"src": 3, "dst": 2, "w": 3}, {"src": 2, "dst": 4, "w": 1},
        {"src": 8, "dst": 9, "w": 7},  # unreachable from seed
    ])
    seeds = rd.from_items([{"node": 1}])
    out = (k_hop_min_cost(edges, seeds, k=3, num_partitions=2)
           .to_pandas())
    got = dict(zip(out["node"], out["cost"]))
    assert got == {1: 0, 2: 5, 3: 2, 4: 6}
    # hop budget of 1 can't take the detour: direct edge wins
    out1 = (k_hop_min_cost(edges, seeds, k=1, num_partitions=2)
            .to_pandas())
    assert dict(zip(out1["node"], out1["cost"])) == {1: 0, 2: 10, 3: 2}


def test_negative_sample_pairs_drops_accidental_positives():
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        negative_sample_pairs)

    # modulus 10: 2654435761 % 10 == 1, so corruption j shifts o by +j.
    # s=1 holds o={0,1}: corrupting o=0 with j=1 lands on the TRUE pair
    # (1,1) and must be dropped; everything else survives.
    pos = rd.from_items([{"s": 1, "o": 0}, {"s": 1, "o": 1},
                         {"s": 2, "o": 5}])
    out = (negative_sample_pairs(pos, "s", "o", k=3, modulus=10)
           .to_pandas())
    got = sorted(map(tuple, out[["s", "o_neg"]].to_numpy()))
    assert got == sorted([
        (1, 2), (1, 3),            # from (1,0): j=1 -> (1,1) dropped
        (1, 2), (1, 3), (1, 4),    # from (1,1)
        (2, 6), (2, 7), (2, 8),    # from (2,5)
    ])


def test_deterministic_walks_reproducible_and_dead_ends_drop():
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        deterministic_walks)

    # 1 has neighbors {2, 3}; 2 -> {4}; 3 -> {4}; 4 is a DEAD END.
    # 9 -> 10 -> (dead end before step 3): walk from 9 must vanish.
    edges_rows = [
        {"src": 1, "dst": 2}, {"src": 1, "dst": 3},
        {"src": 2, "dst": 4}, {"src": 3, "dst": 4},
        {"src": 4, "dst": 5}, {"src": 5, "dst": 6},
        {"src": 9, "dst": 10},
    ]
    seeds = rd.from_items([{"node": 1}, {"node": 9}])
    out1 = (deterministic_walks(rd.from_items(edges_rows), seeds, length=3,
                                num_partitions=2)
            .to_pandas().sort_values("n0").reset_index(drop=True))
    out2 = (deterministic_walks(rd.from_items(edges_rows),
                                rd.from_items([{"node": 1}, {"node": 9}]),
                                length=3, num_partitions=2)
            .to_pandas().sort_values("n0").reset_index(drop=True))
    pd.testing.assert_frame_equal(out1, out2)  # run-to-run deterministic
    assert list(out1["n0"]) == [1]             # 9's walk died at step 2
    # step 1 picked whichever of {2, 3} minimizes the hash — pin the
    # whole walk so any hash change is caught
    row = out1.iloc[0]
    assert row["n1"] in (2, 3) and row["n2"] == 4 and row["n3"] == 5


def test_k_core_peel_extracts_core_and_empties():
    from gliner_transbronchialbiopsy_ray.stages.graph import k_core_peel

    # K4 on {1,2,3,4} + pendant chain 4-5-6: the 3-core is exactly the K4
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5),
             (5, 6)]
    ds = rd.from_items([{"a": a, "b": b} for a, b in edges])
    out = (k_core_peel(ds, k=3, rounds=3).to_pandas()
           .sort_values("node"))
    assert dict(zip(out["node"], out["deg"])) == {1: 3, 2: 3, 3: 3, 4: 3}
    # k=4 peels everything away within the round budget
    ds2 = rd.from_items([{"a": a, "b": b} for a, b in edges])
    assert len(k_core_peel(ds2, k=4, rounds=3).to_pandas()) == 0


def test_clustering_coefficients_exact_small_graph():
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        clustering_coefficients,
    )
    # triangle 1-2-3 plus pendant 3-4: cc(1)=cc(2)=1.0, cc(3)=1/3, cc(4)=0
    edges = rd.from_items([
        {"a": 1, "b": 2}, {"a": 1, "b": 3}, {"a": 2, "b": 3},
        {"a": 3, "b": 4},
    ])
    out = clustering_coefficients(edges, num_partitions=2).to_pandas()
    got = {int(r.node): (int(r.degree), int(r.triangles), int(r.cc_ppm))
           for r in out.itertuples()}
    assert got == {1: (2, 1, 1_000_000), 2: (2, 1, 1_000_000),
                   3: (3, 1, 333_333), 4: (1, 0, 0)}


def test_clustering_coefficients_order_invariant():
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        clustering_coefficients,
    )
    edges = [{"a": i, "b": j} for i in range(1, 8)
             for j in range(i + 1, 8) if (i * 7 + j) % 3 != 0]
    a = clustering_coefficients(
        rd.from_items(edges), num_partitions=2, order="id").to_pandas()
    b = clustering_coefficients(
        rd.from_items(edges), num_partitions=2,
        order="degree").to_pandas()
    k = ["node", "degree", "triangles", "cc_ppm"]
    assert (sorted(map(tuple, a[k].to_numpy()))
            == sorted(map(tuple, b[k].to_numpy())))


def test_degree_assortativity_star_and_reference():
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        degree_assortativity)
    # star K1,3 is the textbook perfectly-disassortative graph
    star = rd.from_items([{"a": 0, "b": i} for i in (1, 2, 3)])
    out = degree_assortativity(star, num_partitions=2)
    assert list(out["m_directed"]) == [6]
    assert list(out["r_ppm"]) == [-1000000]
    # arbitrary graph vs an independent pure-python evaluation
    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (2, 6), (1, 6)]
    ds = rd.from_items([{"a": a, "b": b} for a, b in edges])
    got = degree_assortativity(ds, num_partitions=2)
    from collections import Counter
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    pairs = [(deg[a], deg[b]) for a, b in edges]
    pairs += [(y, x) for x, y in pairs]
    m = len(pairs)
    sx = sum(x for x, _ in pairs)
    sxy = sum(x * y for x, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    num, den = m * sxy - sx * sx, m * sxx - sx * sx
    expect = abs(1_000_000 * num) // den * (1 if num >= 0 else -1)
    assert list(got["r_ppm"]) == [expect]
    assert list(got["m_directed"]) == [m]


def test_degree_assortativity_regular_graph_reports_zero():
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        degree_assortativity)
    # 4-cycle: every degree 2 -> zero variance, r reported as 0
    cyc = rd.from_items([{"a": 1, "b": 2}, {"a": 2, "b": 3},
                         {"a": 3, "b": 4}, {"a": 1, "b": 4}])
    out = degree_assortativity(cyc, num_partitions=2)
    assert list(out["r_ppm"]) == [0]
    empty = cyc.filter(lambda r: False)
    out2 = degree_assortativity(empty, num_partitions=2)
    assert list(out2["m_directed"]) == [0]


def test_wl_refinement_distinguishes_structure():
    from gliner_transbronchialbiopsy_ray.stages.graph import wl_refinement
    import hashlib
    # path P4: 1-2-3-4  plus a disjoint triangle 10-11-12
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)]
    ds = rd.from_items([{"a": a, "b": b} for a, b in edges])
    out = wl_refinement(ds, rounds=2).to_pandas()
    colors = dict(zip(out["node"], out["color"]))
    # triangle nodes are mutually indistinguishable under 1-WL
    assert colors[10] == colors[11] == colors[12]
    # path ends match each other, middles match each other, and differ
    assert colors[1] == colors[4] and colors[2] == colors[3]
    assert colors[1] != colors[2]
    # degree-2 alone can't separate triangle from path-middle; 2 rounds do
    assert colors[10] != colors[2]
    # round-0 replay: color_0 = md5(str(degree))
    c0 = wl_refinement(ds, rounds=0).to_pandas()
    c0m = dict(zip(c0["node"], c0["color"]))
    assert c0m[1] == hashlib.md5(b"1").hexdigest()
    assert c0m[2] == hashlib.md5(b"2").hexdigest()


def test_wl_refinement_manual_round_parity():
    from gliner_transbronchialbiopsy_ray.stages.graph import wl_refinement
    import hashlib
    # star: center 5, leaves 6,7,8
    ds = rd.from_items([{"a": 5, "b": x} for x in (6, 7, 8)])
    out = wl_refinement(ds, rounds=1).to_pandas()
    colors = dict(zip(out["node"], out["color"]))
    d1 = hashlib.md5(b"1").hexdigest()
    d3 = hashlib.md5(b"3").hexdigest()
    exp_center = hashlib.md5(
        (d3 + "|" + ",".join(sorted([d1, d1, d1]))).encode()).hexdigest()
    exp_leaf = hashlib.md5((d1 + "|" + d3).encode()).hexdigest()
    assert colors[5] == exp_center
    assert colors[6] == colors[7] == colors[8] == exp_leaf


def test_multi_source_hops_per_seed_distances():
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        multi_source_hops)
    # chain 1->2->3->4 and branch 1->5; seeds 1 and 3
    edges = [(1, 2), (2, 3), (3, 4), (1, 5)]
    eds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
    seeds = rd.from_items([{"node": 1}, {"node": 3}])
    out = multi_source_hops(eds, seeds, k=3).to_pandas()
    got = {(r["seed"], r["node"]): r["hops"]
           for _, r in out.iterrows()}
    assert got == {(1, 1): 0, (1, 2): 1, (1, 5): 1, (1, 3): 2,
                   (1, 4): 3, (3, 3): 0, (3, 4): 1}
    # k caps the walk per seed
    out2 = multi_source_hops(eds, seeds, k=1).to_pandas()
    assert len(out2) == 5  # (1,1),(1,2),(1,5),(3,3),(3,4)


def test_k_hop_min_cost_pred_and_trace():
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        k_hop_min_cost_pred, trace_path)
    # 1 -> 2 (w1) -> 4 (w1); 1 -> 3 (w5); 3 -> 4 (w1): best 1-2-4 cost 2
    edges = [(1, 2, 1), (2, 4, 1), (1, 3, 5), (3, 4, 1)]
    eds = rd.from_items([{"src": a, "dst": b, "w": w}
                         for a, b, w in edges])
    seeds = rd.from_items([{"node": 1}])
    pred = k_hop_min_cost_pred(eds, seeds, k=4)
    out = pred.to_pandas().set_index("node")
    assert out.loc[4, "cost"] == 2 and out.loc[4, "via"] == 2
    assert out.loc[3, "cost"] == 5 and out.loc[3, "via"] == 1
    path = trace_path(pred, source=1, target=4)
    assert list(map(tuple, path[["step", "node", "cost"]].to_numpy())) \
        == [(0, 4, 2), (1, 2, 1), (2, 1, 0)]
    # unreachable target -> empty
    none = trace_path(pred, source=1, target=99)
    assert len(none) == 0


def test_k_hop_min_cost_pred_zigzag_tiebreak():
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        k_hop_min_cost_pred)
    # two equal-cost preds of node 7: +2 and -2; zigzag(-2)=3 < zig(2)=4
    edges = [(1, 2, 1), (1, -2, 1), (2, 7, 1), (-2, 7, 1)]
    eds = rd.from_items([{"src": a, "dst": b, "w": w}
                         for a, b, w in edges])
    pred = k_hop_min_cost_pred(
        eds, rd.from_items([{"node": 1}]), k=3).to_pandas()
    row = pred.set_index("node").loc[7]
    assert row["cost"] == 2 and row["via"] == -2


def test_wl_refinement_fixpoint_bisimulation():
    from gliner_transbronchialbiopsy_ray.stages.graph import wl_refinement
    # path P6: under fixpoint WL, positions pair up by distance to the
    # nearer end: {1,6}, {2,5}, {3,4} — 3 classes (needs 3 rounds;
    # rounds=1 cannot separate 2/5 from 3/4)
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
    ds = rd.from_items([{"a": a, "b": b} for a, b in edges])
    fx = wl_refinement(ds, rounds=None).to_pandas()
    colors = dict(zip(fx["node"], fx["color"]))
    classes = {}
    for n, c in colors.items():
        classes.setdefault(c, set()).add(n)
    assert sorted(map(sorted, classes.values())) == [
        [1, 6], [2, 5], [3, 4]]
    # regular graph (triangle): fixpoint = 1 class, converges round 1
    tri = rd.from_items([{"a": a, "b": b}
                         for a, b in [(7, 8), (8, 9), (7, 9)]])
    fx2 = wl_refinement(tri, rounds=None).to_pandas()
    assert fx2["color"].nunique() == 1


def test_k_core_peel_strategies_identical():
    from gliner_transbronchialbiopsy_ray.stages.graph import k_core_peel
    import numpy as np
    rng = np.random.RandomState(7)
    edges = sorted({(int(a), int(b)) for a, b in
                    rng.randint(0, 40, size=(120, 2)) if a < b})
    ds = rd.from_items([{"a": a, "b": b} for a, b in edges])
    bc = (k_core_peel(ds, k=3, rounds=3, strategy="broadcast")
          .to_pandas().sort_values("node").reset_index(drop=True))
    jn = (k_core_peel(ds, k=3, rounds=3, strategy="join")
          .to_pandas().sort_values("node").reset_index(drop=True))
    assert bc.equals(jn)
    import pytest
    with pytest.raises(ValueError, match="unknown strategy"):
        k_core_peel(ds, k=3, rounds=1, strategy="bogus")


def _kruskal(edges):
    """Independent reference MSF: Kruskal with union-find and the same
    (w, u, v) total order."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = []
    for w, u, v in sorted((w, u, v) for u, v, w in edges):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            forest.append((u, v, w))
    return sorted(forest)


def test_boruvka_msf_matches_kruskal():
    from gliner_transbronchialbiopsy_ray.stages.graph import boruvka_msf
    import numpy as np
    rng = np.random.RandomState(11)
    # random graph with UNIQUE weights (MSF unique -> algorithm-
    # independent comparison), plus a disjoint second component
    raw = {(int(a), int(b)) for a, b in rng.randint(0, 25, (80, 2))
           if a != b}
    edges = [(min(a, b), max(a, b), i * 7 + 3)
             for i, (a, b) in enumerate(sorted(raw))]
    edges += [(100, 101, 1), (101, 102, 2), (100, 102, 5)]
    ds = rd.from_items([{"a": a, "b": b, "w": w} for a, b, w in edges])
    out = boruvka_msf(ds).to_pandas()
    got = sorted(map(tuple, out[["u", "v", "w"]].to_numpy()))
    assert got == _kruskal(edges)


def test_boruvka_msf_tie_break_deterministic():
    from gliner_transbronchialbiopsy_ray.stages.graph import boruvka_msf
    # all weights equal: forest = spanning tree chosen by (w, u, v)
    # order — matches Kruskal under the same order
    edges = [(1, 2, 5), (2, 3, 5), (1, 3, 5), (3, 4, 5)]
    ds = rd.from_items([{"a": a, "b": b, "w": w} for a, b, w in edges])
    out = boruvka_msf(ds).to_pandas()
    got = sorted(map(tuple, out[["u", "v", "w"]].to_numpy()))
    assert got == _kruskal(edges)
    assert len(got) == 3  # spanning tree of 4 nodes


def test_temporal_reachability_respects_time():
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        temporal_reachability)
    # 1 -(t5)-> 2 -(t3)-> 3 : edge to 3 happens BEFORE arrival at 2,
    # so 3 is unreachable through it; 2 -(t8)-> 3 works.
    # 1 -(t2)-> 4 -(t2)-> 5 : equal times allowed (ts >= arr).
    edges = [(1, 2, 5), (2, 3, 3), (2, 3, 8), (1, 4, 2), (4, 5, 2)]
    eds = rd.from_items([{"src": a, "dst": b, "ts": t}
                         for a, b, t in edges])
    seeds = rd.from_items([{"node": 1}])
    out = temporal_reachability(eds, seeds, k=3).to_pandas()
    got = dict(zip(out["node"], out["arr"]))
    assert got == {1: 0, 2: 5, 3: 8, 4: 2, 5: 2}
    # k=1 cuts the two-hop arrivals
    out1 = temporal_reachability(eds, seeds, k=1).to_pandas()
    assert dict(zip(out1["node"], out1["arr"])) == {1: 0, 2: 5, 4: 2}


def test_personalized_pagerank_int_manual():
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        personalized_pagerank_int)
    # star out of seed 1: 1->2, 1->3, 2->1 ; seed {1}, 1 iteration
    edges = [(1, 2), (1, 3), (2, 1)]
    eds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
    seeds = rd.from_items([{"node": 1}])
    T = 1_000_000_000_000
    out = personalized_pagerank_int(eds, seeds, iters=1).to_pandas()
    got = dict(zip(out["node"], out["r"]))
    # r1(1) = 15%*T + 85%*(r0(2)//1) = 15%*T (r0(2)=0)
    # r1(2) = 85%*(T//2)//100... = (85*(T//2))//100 ; same for 3
    assert got[1] == (15 * T) // 100
    assert got[2] == (85 * (T // 2)) // 100
    assert got[3] == (85 * (T // 2)) // 100
    # two iterations: hand-fold round 2 from round-1 values
    out2 = personalized_pagerank_int(eds, seeds, iters=2).to_pandas()
    got2 = dict(zip(out2["node"], out2["r"]))
    r1_1, r1_2 = got[1], got[2]
    assert got2[1] == (15 * T) // 100 + (85 * (r1_2 // 1)) // 100
    assert got2[2] == (85 * (r1_1 // 2)) // 100
    # empty seeds -> typed empty
    none = personalized_pagerank_int(eds, seeds.limit(0), iters=1)
    assert none.count() == 0


def test_link_prediction_scores_manual():
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        link_prediction_scores)
    # path graph 1-2, 1-3, 2-3, 2-4 (+ a duplicate edge + self-loop)
    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (1, 2), (5, 5)]
    ds = rd.from_items([{"a": a, "b": b} for a, b in edges])
    out = link_prediction_scores(ds).to_pandas()
    out = out.sort_values(["a", "b"]).reset_index(drop=True)
    # degrees: 1->{2,3} d=2; 2->{1,3,4} d=3; 3->{1,2} d=2; 4->{2} d=1
    # pairs sharing a neighbor:
    #  (1,2) via 3: c=1 ra=500000 j=1e6*1//(2+3-1)=250000
    #  (1,3) via 2: c=1 ra=333333 j=1e6//(2+2-1)=333333
    #  (2,3) via 1: c=1 ra=500000 j=1e6//(3+2-1)=250000
    #  (1,4) via 2: c=1 ra=333333 j=1e6//(2+1-1)=500000
    #  (3,4) via 2: c=1 ra=333333 j=1e6//(2+1-1)=500000
    got = {(r.a, r.b): (r.common, r.ra_ppm, r.jaccard_ppm)
           for r in out.itertuples()}
    assert got == {
        (1, 2): (1, 500000, 250000),
        (1, 3): (1, 333333, 333333),
        (2, 3): (1, 500000, 250000),
        (1, 4): (1, 333333, 500000),
        (3, 4): (1, 333333, 500000),
    }


def test_link_prediction_max_degree_drops_hub():
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        link_prediction_scores)
    # hub 0 connects 1..5 (degree 5); 1-2 also direct via neighbor 6
    edges = [(0, i) for i in range(1, 6)] + [(6, 1), (6, 2)]
    ds = rd.from_items([{"a": a, "b": b} for a, b in edges])
    full = link_prediction_scores(ds).to_pandas()
    # C(5,2) via hub incl (1,2) merged with via-6, plus (0,6) via 1 & 2
    assert len(full) == 11
    capped = link_prediction_scores(ds, max_degree=4).to_pandas()
    # hub 0 dropped as a shared neighbor: (1,2) via 6 and (0,6) via 1,2
    got = {(r.a, r.b): r.common for r in capped.itertuples()}
    assert got == {(1, 2): 1, (0, 6): 2}


def test_hits_int_matches_numpy():
    from gliner_transbronchialbiopsy_ray.stages.graph import hits_int
    edges = [(1, 10), (1, 11), (2, 10), (3, 11), (3, 12), (10, 1)]
    ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
    out = hits_int(ds, rounds=2).to_pandas()
    nodes = sorted({n for e in edges for n in e})
    ni = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)), dtype=np.int64)
    for u, v in edges:
        A[ni[u], ni[v]] = 1
    h = np.ones(len(nodes), dtype=np.int64)
    for _ in range(2):
        a = A.T @ h
        h = A @ a
    got = {int(r.node): (int(r.hub), int(r.auth))
           for r in out.itertuples()}
    for n in nodes:
        eh, ea = int(h[ni[n]]), int(a[ni[n]])
        gh, ga = got.get(n, (0, 0))
        assert (gh, ga) == (eh, ea), (n, (gh, ga), (eh, ea))


def test_hits_int_rounds_validation():
    from gliner_transbronchialbiopsy_ray.stages.graph import hits_int
    ds = rd.from_items([{"src": 1, "dst": 2}])
    with pytest.raises(ValueError, match="rounds"):
        hits_int(ds, rounds=0)


def test_label_propagation_two_cliques():
    """Two triangles joined by one bridge edge: labels converge to the
    min node id of each triangle; the bridge does not merge them (each
    node has 2 in-clique votes vs 1 bridge vote)."""
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        label_propagation_communities)
    edges = rd.from_items([
        {"a": 1, "b": 2}, {"a": 2, "b": 3}, {"a": 1, "b": 3},
        {"a": 10, "b": 11}, {"a": 11, "b": 12}, {"a": 10, "b": 12},
        {"a": 3, "b": 10},  # bridge
    ])
    out = (label_propagation_communities(edges, rounds=3)
           .to_pandas().sort_values("node").reset_index(drop=True))
    lab = dict(zip(out["node"], out["label"]))
    assert lab[1] == lab[2] == lab[3] == 1
    assert lab[10] == lab[11] == lab[12]
    assert lab[10] != lab[1]


def test_label_propagation_matches_reference_loop():
    """Random graph vs an independent single-process simulation of the
    same synchronous min-tie self-vote rule."""
    import numpy as np

    from gliner_transbronchialbiopsy_ray.stages.graph import (
        label_propagation_communities)

    rng = np.random.RandomState(7)
    n = 40
    a = rng.randint(0, n, 120)
    b = rng.randint(0, n, 120)
    keep = a != b
    # canonical undirected pairs: the operator treats duplicate rows as
    # extra votes, so the fixture dedups (x,y)/(y,x) collisions
    pairs = sorted({(min(int(x), int(y)), max(int(x), int(y)))
                    for x, y in zip(a[keep], b[keep])})
    rounds = 3

    # reference simulation
    nbrs: dict[int, list[int]] = {}
    nodes = set()
    for x, y in pairs:
        nodes |= {x, y}
        nbrs.setdefault(x, []).append(y)
        nbrs.setdefault(y, []).append(x)
    lab = {v: v for v in nodes}
    for _ in range(rounds):
        new = {}
        for v in nodes:
            votes: dict[int, int] = {lab[v]: 1}
            for u in set(nbrs.get(v, [])):
                lu = lab[u]
                votes[lu] = votes.get(lu, 0) + 1
            best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        lab = new

    edges = rd.from_items(
        [{"a": x, "b": y} for x, y in pairs])
    out = (label_propagation_communities(edges, rounds=rounds)
           .to_pandas().sort_values("node"))
    got = dict(zip(out["node"], out["label"]))
    assert got == lab


def _tarjan(pairs):
    """Independent iterative Tarjan SCC; returns {node: min member}."""
    adj: dict[int, list[int]] = {}
    nodes = set()
    for u, v in pairs:
        nodes |= {u, v}
        if u != v:
            adj.setdefault(u, []).append(v)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on: set[int] = set()
    stack: list[int] = []
    out: dict[int, int] = {}
    counter = [0]

    def strongconnect(root):
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on.add(v)
            recurse = False
            for i in range(pi, len(adj.get(v, []))):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            work.pop()
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])

    for n in sorted(nodes):
        if n not in index:
            strongconnect(n)
    return out


def test_scc_labels_known_graph():
    """Two 3-cycles joined by a one-way bridge + a tail: cycles are
    separate SCCs, bridge/tail nodes are singletons."""
    from gliner_transbronchialbiopsy_ray.stages.graph import scc_labels
    pairs = [(1, 2), (2, 3), (3, 1),          # cycle A
             (3, 10),                          # one-way bridge
             (10, 11), (11, 12), (12, 10),     # cycle B
             (12, 20)]                         # tail
    out = (scc_labels(rd.from_items(
        [{"src": u, "dst": v} for u, v in pairs]), max_rounds=6,
        max_hops=12).to_pandas().sort_values("node"))
    got = dict(zip(out["node"], out["scc"]))
    assert got == _tarjan(pairs)
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == got[12] == 10
    assert got[20] == 20


def test_scc_labels_random_functional_graph():
    """Functional graph (every node 2 out-edges mod m) vs independent
    Tarjan — exercises multi-SCC peeling and rho-shaped tails; also
    negative node ids (the signed-encoding convention)."""
    from gliner_transbronchialbiopsy_ray.stages.graph import scc_labels
    m = 29
    pairs = sorted({(n, (3 * n + 7) % m) for n in range(m)}
                   | {(n, (n + 13) % m) for n in range(m)})
    # shift ids negative to prove sign-safety
    pairs = [(u - 15, v - 15) for u, v in pairs]
    out = (scc_labels(rd.from_items(
        [{"src": u, "dst": v} for u, v in pairs]), max_rounds=8,
        max_hops=30).to_pandas())
    got = dict(zip(out["node"], out["scc"]))
    assert got == _tarjan(pairs)


def _brute_truss(pairs, k, rounds):
    e = {(min(u, v), max(u, v)) for u, v in pairs if u != v}
    for _ in range(rounds):
        sup = {edge: 0 for edge in e}
        nbrs = {}
        for a, b in e:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        for a, b in e:
            common = nbrs[a] & nbrs[b]
            sup[(a, b)] = len(common)
        e = {edge for edge in e if sup[edge] >= k - 2}
    return e


def test_k_truss_known_graph():
    """K4 + a hanging triangle + a wedge: k=4 keeps exactly the K4
    (every K4 edge sits in 2 triangles); k=3 keeps both the K4 and the
    triangle; the wedge always dies."""
    from gliner_transbronchialbiopsy_ray.stages.graph import k_truss_edges
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),   # K4
             (4, 5), (5, 6), (4, 6),                            # triangle
             (6, 7), (7, 8)]                                    # wedge
    ds = rd.from_items([{"a": a, "b": b} for a, b in pairs])
    got4 = (k_truss_edges(ds, k=4, rounds=2).to_pandas()
            .sort_values(["a", "b"]).reset_index(drop=True))
    assert set(map(tuple, got4[["a", "b"]].to_numpy())) == \
        _brute_truss(pairs, 4, 2)
    assert set(map(tuple, got4[["a", "b"]].to_numpy())) == {
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}
    got3 = k_truss_edges(rd.from_items(
        [{"a": a, "b": b} for a, b in pairs]), k=3, rounds=2).to_pandas()
    assert set(map(tuple, got3[["a", "b"]].to_numpy())) == \
        _brute_truss(pairs, 3, 2)


def test_k_truss_cascade_matches_brute_force():
    """Random graph, 3 rounds: cascading edge removal matches the
    brute-force round-for-round reference."""
    from gliner_transbronchialbiopsy_ray.stages.graph import k_truss_edges
    rng = np.random.RandomState(11)
    a = rng.randint(0, 25, 140)
    b = rng.randint(0, 25, 140)
    pairs = sorted({(min(int(x), int(y)), max(int(x), int(y)))
                    for x, y in zip(a, b) if x != y})
    ds = rd.from_items([{"a": u, "b": v} for u, v in pairs])
    got = k_truss_edges(ds, k=4, rounds=3).to_pandas()
    assert set(map(tuple, got[["a", "b"]].to_numpy())) == \
        _brute_truss(pairs, 4, 3)


def _brute_widest(edges, seeds, k):
    """(node, width) best max-min bottleneck within k hops."""
    BIG = 2**62
    best = {s: BIG for s in seeds}
    adj = {}
    for u, v, c in edges:
        adj.setdefault(u, []).append((v, c))
    for _ in range(k):
        new = dict(best)
        for u, w in best.items():
            for v, c in adj.get(u, []):
                cand = min(w, c)
                if cand > new.get(v, -1):
                    new[v] = cand
        best = new
    return best


def test_widest_path_matches_brute_force():
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        k_hop_widest_path)
    rng = np.random.RandomState(7)
    edges = [(int(u), int(v), int(c)) for u, v, c in zip(
        rng.randint(0, 20, 120), rng.randint(0, 20, 120),
        rng.randint(1, 50, 120)) if u != v]
    ds = rd.from_items([{"src": u, "dst": v, "cap": c}
                        for u, v, c in edges])
    seeds = rd.from_items([{"node": 0}, {"node": 13}])
    out = k_hop_widest_path(ds, seeds, k=3).to_pandas()
    got = dict(zip(out["node"], out["width"]))
    assert got == _brute_widest(edges, [0, 13], 3)
    assert got[0] == 2**62    # seed sentinel


def test_widest_path_parallel_edges_take_max():
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        k_hop_widest_path)
    ds = rd.from_items([
        {"src": 0, "dst": 1, "cap": 3},
        {"src": 0, "dst": 1, "cap": 9},     # parallel edge dominates
        {"src": 1, "dst": 2, "cap": 5},
    ])
    out = k_hop_widest_path(
        ds, rd.from_items([{"node": 0}]), k=2).to_pandas()
    got = dict(zip(out["node"], out["width"]))
    assert got[1] == 9 and got[2] == 5


def test_double_sweep_diameter_on_path_graph():
    """Path 0-1-2-3-4 plus a branch at 2: sweep from 0 reaches 4
    (hops 4, beats branch tie by distance); sweep back from 4 gives
    the true diameter 4 (double sweep is exact on trees)."""
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        double_sweep_diameter)
    und = [(0, 1), (1, 2), (2, 3), (3, 4), (2, 9)]
    ds = rd.from_items(
        [{"src": u, "dst": v} for a, b in und for u, v in ((a, b), (b, a))])
    out = double_sweep_diameter(ds, start=0, k=6).to_pandas()
    row = out.iloc[0]
    assert row["far_node"] == 4 and row["ecc_start"] == 4
    assert row["diameter_lb"] == 4


def test_double_sweep_tie_break_min_node():
    """Two nodes at max distance: the smaller id seeds sweep 2."""
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        double_sweep_diameter)
    und = [(0, 5), (0, 3)]   # 3 and 5 both at hops 1
    ds = rd.from_items(
        [{"src": u, "dst": v} for a, b in und for u, v in ((a, b), (b, a))])
    out = double_sweep_diameter(ds, start=0, k=3).to_pandas()
    row = out.iloc[0]
    assert row["far_node"] == 3 and row["diameter_lb"] == 2


def test_bipartite_components_mixed():
    """Even cycle (bipartite), odd cycle (not), and a path: per-component
    verdicts with node counts and distinct witness edges."""
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        bipartite_components)
    und = [
        (0, 1), (1, 2), (2, 3), (3, 0),        # C4: bipartite
        (10, 11), (11, 12), (12, 10),           # C3: odd cycle
        (20, 21), (21, 22),                     # path: bipartite
    ]
    ds = rd.from_items([{"a": u, "b": v} for u, v in und])
    out = (bipartite_components(ds, rounds=6).to_pandas()
           .sort_values("component").reset_index(drop=True))
    got = {int(r.component): (int(r.n_nodes), int(r.odd_edges),
                              int(r.is_bipartite))
           for r in out.itertuples()}
    assert got[0] == (4, 0, 1)
    assert got[20] == (3, 0, 1)
    n_nodes, odd, flag = got[10]
    assert n_nodes == 3 and flag == 0 and odd >= 1


def test_bipartite_components_odd_even_join():
    """Two triangles sharing a vertex: one component, not bipartite;
    duplicate and reversed edges collapse."""
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        bipartite_components)
    und = [(0, 1), (1, 2), (2, 0), (2, 0),      # dup edge
           (2, 3), (3, 4), (4, 2), (2, 4)]      # reversed dup
    ds = rd.from_items([{"a": u, "b": v} for u, v in und])
    out = bipartite_components(ds, rounds=6).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (int(r.component), int(r.n_nodes), int(r.is_bipartite)) == \
        (0, 5, 0)


def _brute_longest(edges, k):
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    indeg = {n: 0 for n in nodes}
    for _, v in set(edges):
        indeg[v] += 1
    layer = {n: 0 for n in nodes if indeg[n] == 0}
    for _ in range(k):
        new = dict(layer)
        for u, v in edges:
            if u in layer and layer[u] + 1 > new.get(v, -1):
                new[v] = layer[u] + 1
        layer = new
    return layer


def test_dag_longest_path_diamond():
    """Diamond 0->1->3, 0->2->3 plus the shortcut 0->3: node 3's layer
    is 2 (longest), not 1 (BFS would say 1)."""
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        dag_longest_path)
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (0, 3), (3, 4)]
    ds = rd.from_items([{"src": u, "dst": v} for u, v in edges])
    out = dag_longest_path(ds, k=6).to_pandas()
    got = dict(zip(out["node"], out["layer"]))
    assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}


def test_dag_longest_path_random_dag_matches_brute():
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        dag_longest_path)
    rng = np.random.RandomState(5)
    # random DAG: edges always low -> high id
    edges = sorted({(int(min(a, b)), int(max(a, b))) for a, b in zip(
        rng.randint(0, 30, 150), rng.randint(0, 30, 150)) if a != b})
    ds = rd.from_items([{"src": u, "dst": v} for u, v in edges])
    out = dag_longest_path(ds, k=30).to_pandas()
    got = dict(zip(out["node"], out["layer"]))
    assert got == _brute_longest(edges, 30)


def test_dag_longest_path_strategies_equal():
    """Broadcast (driver-state) and join paths are frame-identical —
    the k_core_peel auto-strategy discipline."""
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        dag_longest_path)
    rng = np.random.RandomState(12)
    edges = sorted({(int(min(a, b)), int(max(a, b))) for a, b in zip(
        rng.randint(0, 25, 120), rng.randint(0, 25, 120)) if a != b})

    def run(strategy):
        ds = rd.from_items([{"src": u, "dst": v} for u, v in edges])
        return (dag_longest_path(ds, k=25, strategy=strategy)
                .to_pandas().sort_values("node")
                .reset_index(drop=True))

    a = run("broadcast")
    b = run("join")
    assert a.equals(b)
    assert dict(zip(a["node"], a["layer"])) == _brute_longest(edges, 25)


def test_k_hop_reachability_strategies_equal():
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        k_hop_reachability)
    rng = np.random.RandomState(13)
    edges = [(int(a), int(b)) for a, b in zip(
        rng.randint(0, 30, 150), rng.randint(0, 30, 150)) if a != b]

    def run(strategy, **kw):
        ds = rd.from_items([{"src": u, "dst": v} for u, v in edges])
        seeds = rd.from_items([{"node": 0}, {"node": 7}])
        return (k_hop_reachability(ds, seeds, 5, strategy=strategy, **kw)
                .to_pandas().sort_values("node")
                .reset_index(drop=True))

    a = run("broadcast")
    b = run("join")
    assert a.equals(b)
    # mid-run overflow falls back to the join path, same answer
    c = run("auto", broadcast_threshold=5)
    assert c.equals(b)


def test_k_hop_min_cost_strategies_equal():
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        k_hop_min_cost)
    rng = np.random.RandomState(14)
    edges = [(int(a), int(b), int(w)) for a, b, w in zip(
        rng.randint(0, 25, 120), rng.randint(0, 25, 120),
        rng.randint(1, 20, 120)) if a != b]

    def run(strategy, **kw):
        ds = rd.from_items([{"src": u, "dst": v, "w": w}
                            for u, v, w in edges])
        seeds = rd.from_items([{"node": 0}, {"node": 11}])
        return (k_hop_min_cost(ds, seeds, 4, strategy=strategy, **kw)
                .to_pandas().sort_values("node")
                .reset_index(drop=True))

    a = run("broadcast")
    b = run("join")
    assert a.equals(b)
    c = run("auto", broadcast_threshold=4)   # overflow fallback
    assert c.equals(b)


def test_dag_path_counts_diamond_and_multigraph(ray_session):
    import pandas as pd
    import ray.data as rd

    from gliner_transbronchialbiopsy_ray.stages.graph import (
        dag_path_counts,
    )

    # diamond 0->{1,2}->3 plus a parallel edge 0->1 (multigraph: the
    # parallel edge doubles every path through it) and a second root 9
    edges = rd.from_items([
        {"src": 0, "dst": 1}, {"src": 0, "dst": 1},  # parallel
        {"src": 0, "dst": 2},
        {"src": 1, "dst": 3}, {"src": 2, "dst": 3},
        {"src": 9, "dst": 3},
    ])
    exp = pd.DataFrame({
        "node": [0, 1, 2, 3, 9],
        # 3: 2 via node1 + 1 via node2 + 1 via root 9
        "n_paths": [1, 2, 1, 4, 1],
    })
    for strategy in ("broadcast", "join"):
        out = (dag_path_counts(edges, k=3, strategy=strategy)
               .to_pandas().sort_values("node").reset_index(drop=True))
        out["node"] = out["node"].astype("int64")
        out["n_paths"] = out["n_paths"].astype("int64")
        pd.testing.assert_frame_equal(out, exp.astype("int64"), )

    # k smaller than the longest path truncates (documented bound)
    out = (dag_path_counts(edges, k=1, strategy="broadcast")
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert out.set_index("node")["n_paths"].to_dict() == {
        0: 1, 1: 2, 2: 1, 3: 1, 9: 1}

    # empty input -> typed empty
    empty = dag_path_counts(
        rd.from_arrow(__import__("pyarrow").table(
            {"src": [], "dst": []})), k=2)
    assert empty.schema().names == ["node", "n_paths"]
    assert empty.count() == 0


def test_luby_mis_independence_and_maximality():
    from gliner_transbronchialbiopsy_ray.stages.graph import luby_mis

    # path 1-2-3-4-5 plus a disconnected edge 10-11
    edges = rd.from_items([
        {"a": 1, "b": 2}, {"a": 2, "b": 3}, {"a": 3, "b": 4},
        {"a": 4, "b": 5}, {"a": 10, "b": 11},
    ])
    out = luby_mis(edges, rounds=6).to_pandas()
    assert sorted(out["node"]) == [1, 2, 3, 4, 5, 10, 11]
    assert set(out["status"]) <= {"mis", "removed"}  # converged: no alive
    mis = set(out.loc[out["status"] == "mis", "node"])
    adj = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)]
    # independence: no edge inside the MIS
    assert not any(u in mis and v in mis for u, v in adj)
    # maximality: every non-MIS node has a MIS neighbour
    for n in set(out["node"]) - mis:
        assert any((u == n and v in mis) or (v == n and u in mis)
                   for u, v in adj)
    # determinism: same input -> identical frame
    out2 = luby_mis(edges, rounds=6).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("node").reset_index(drop=True),
        out2.sort_values("node").reset_index(drop=True))


def test_luby_mis_bounded_rounds_leave_alive_rows():
    from gliner_transbronchialbiopsy_ray.stages.graph import luby_mis

    # star: center 0 vs leaves -- leaves whose only neighbour (0) was
    # merely REMOVED are still alive after round 1 and join the MIS as
    # isolated nodes in round 2
    star = rd.from_items([{"a": 0, "b": i} for i in range(1, 6)])
    one = luby_mis(star, rounds=1).to_pandas()
    assert (one["status"] == "alive").any()
    two = luby_mis(star, rounds=2).to_pandas()
    assert (two["status"] != "alive").all()
    alive_r1 = set(one.loc[one["status"] == "alive", "node"])
    late = two[two["node"].isin(alive_r1)]
    assert (late["status"] == "mis").all()
    assert (late["decided_round"] == 2).all()
    # round-0 contract: everything still alive, decided_round -1
    zero = luby_mis(star, rounds=0).to_pandas()
    assert (zero["status"] == "alive").all()
    assert (zero["decided_round"] == -1).all()


def test_temporal_earliest_arrival_respects_time_order():
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        temporal_earliest_arrival)

    edges = rd.from_items([
        {"src": 1, "dst": 2, "t": 5},
        {"src": 2, "dst": 3, "t": 3},   # decreasing after 5: unusable
        {"src": 2, "dst": 3, "t": 7},
        {"src": 1, "dst": 4, "t": 1},
        {"src": 4, "dst": 3, "t": 2},
        {"src": 3, "dst": 5, "t": 1},   # before any arrival at 3
    ])
    seeds = rd.from_items([{"node": 1, "t0": 0}])
    out = (temporal_earliest_arrival(edges, seeds, rounds=4)
           .to_pandas().set_index("node")["t_arr"].to_dict())
    # static BFS would reach 5; temporal order forbids it (3 arrives
    # at t=2 earliest, the 3->5 edge fired at t=1)
    assert out == {1: 0, 2: 5, 3: 2, 4: 1}

    # a later seed start invalidates early edges
    late = rd.from_items([{"node": 1, "t0": 6}])
    out2 = (temporal_earliest_arrival(edges, late, rounds=4)
            .to_pandas().set_index("node")["t_arr"].to_dict())
    assert out2 == {1: 6}

    # waiting is allowed: equal times chain (non-strict >=)
    eq = rd.from_items([{"src": 1, "dst": 2, "t": 4},
                        {"src": 2, "dst": 3, "t": 4}])
    out3 = (temporal_earliest_arrival(
        eq, rd.from_items([{"node": 1, "t0": 4}]), rounds=2)
        .to_pandas().set_index("node")["t_arr"].to_dict())
    assert out3 == {1: 4, 2: 4, 3: 4}
