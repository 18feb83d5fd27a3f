"""BGP matcher: pattern compilation to joins, constant pushdown,
existence patterns, cross-join rejection."""

import pandas as pd
import pytest
import ray.data as rd

from gliner_transbronchialbiopsy_ray.stages.bgp import match_bgp

TRIPLES = [
    # knows graph: 1->2, 2->3, 1->3; likes: 2->9; type markers
    {"s": 1, "p": "knows", "o": 2},
    {"s": 2, "p": "knows", "o": 3},
    {"s": 1, "p": "knows", "o": 3},
    {"s": 2, "p": "likes", "o": 9},
    {"s": 1, "p": "is_admin", "o": 1},
]


def _ds():
    return rd.from_items(TRIPLES)


def test_two_hop_pattern_joins_on_shared_var():
    out = match_bgp(_ds(), [("?x", "knows", "?y"), ("?y", "knows", "?z")],
                    num_partitions=2).to_pandas()
    got = sorted(map(tuple, out[["x", "y", "z"]].to_numpy()))
    assert got == [(1, 2, 3)]


def test_constant_object_filters():
    out = match_bgp(_ds(), [("?x", "knows", 3)],
                    num_partitions=2).to_pandas()
    assert sorted(out["x"]) == [1, 2]


def test_existence_pattern_gates_results():
    # admin marker exists -> bindings survive
    out = match_bgp(_ds(), [("?x", "knows", "?y"), (1, "is_admin", 1)],
                    num_partitions=2).to_pandas()
    assert len(out) == 3
    # non-existent marker -> empty result, schema preserved
    out2 = match_bgp(_ds(), [("?x", "knows", "?y"), (5, "is_admin", 1)],
                     num_partitions=2).to_pandas()
    assert len(out2) == 0


def test_distinct_semantics_and_cross_join_rejected():
    # duplicate triples collapse (SELECT DISTINCT)
    dup = rd.from_items(TRIPLES + TRIPLES)
    out = match_bgp(dup, [("?x", "knows", "?y")],
                    num_partitions=2).to_pandas()
    assert len(out) == 3
    with pytest.raises(ValueError, match="cross join"):
        match_bgp(_ds(), [("?x", "knows", "?y"), ("?a", "likes", "?b")],
                  num_partitions=2)


def test_transitive_predicate_bounded_closure():
    # chain 1->2->3->4 plus cycle 4->1: closure is hop-capped, cycles safe
    rows = [{"s": a, "p": "next", "o": b}
            for a, b in [(1, 2), (2, 3), (3, 4), (4, 1)]]
    out = match_bgp(rd.from_items(rows), [(1, "next+", "?y")],
                    max_hops=2, num_partitions=2).to_pandas()
    assert sorted(out["y"]) == [2, 3]  # 2 hops from 1
    out3 = match_bgp(rd.from_items(rows), [(1, "next+", "?y")],
                     max_hops=8, num_partitions=2).to_pandas()
    assert sorted(out3["y"]) == [1, 2, 3, 4]  # cycle closes, distinct


def test_optional_pattern_keeps_unmatched_with_null():
    rows = TRIPLES + [{"s": 2, "p": "age", "o": 40}]
    out = match_bgp(rd.from_items(rows), [("?x", "knows", "?y")],
                    optional=[("?y", "age", "?a")],
                    num_partitions=2).to_pandas()
    got = {(x, y): a for x, y, a in zip(out["x"], out["y"],
                                        out["a"].fillna(-1).astype(int))}
    assert got == {(1, 2): 40, (2, 3): -1, (1, 3): -1}


def test_broadcast_strategy_matches_hash():
    # same bindings from both fold strategies, incl. existence + optional
    for patterns, optional in [
        ([("?x", "knows", "?y"), ("?y", "knows", "?z")], None),
        ([("?x", "knows", "?y"), (1, "is_admin", 1)], None),
        ([("?x", "knows", "?y"), (5, "is_admin", 1)], None),
        ([("?x", "knows", "?y")], [("?y", "age", "?a")]),
        ([("?x", "knows", 3)], None),
    ]:
        rows = TRIPLES + [{"s": 2, "p": "age", "o": 40}]
        h = match_bgp(rd.from_items(rows), patterns, optional=optional,
                      num_partitions=2).to_pandas()
        b = match_bgp(rd.from_items(rows), patterns, optional=optional,
                      num_partitions=2,
                      join_strategy="broadcast").to_pandas()
        cols = sorted(h.columns)
        assert sorted(b.columns) == cols
        hv = sorted(map(tuple, h[cols].fillna(-1).to_numpy().tolist()))
        bv = sorted(map(tuple, b[cols].fillna(-1).to_numpy().tolist()))
        assert hv == bv, (patterns, optional)


def test_predicate_variable_binds():
    out = match_bgp(_ds(), [("?x", "?p", 9)],
                    num_partitions=2).to_pandas()
    assert sorted(map(tuple, out[["x", "p"]].to_numpy())) == [(2, "likes")]
    # joining ON the predicate variable: rdfs2-style domain entailment
    rows = [
        {"s": "placed", "p": "domain", "o": "Customer"},
        {"s": "cust:1", "p": "placed", "o": "order:7"},
        {"s": "cust:2", "p": "placed", "o": "order:8"},
        {"s": "cust:2", "p": "untyped_pred", "o": "x"},
    ]
    out2 = match_bgp(rd.from_items(rows),
                     [("?x", "?pp", "?y"), ("?pp", "domain", "?c")],
                     cast_nodes=False, num_partitions=2).to_pandas()
    got = sorted(map(tuple, out2[["x", "c"]].to_numpy()))
    assert got == [("cust:1", "Customer"), ("cust:2", "Customer")]


def test_inverse_predicate_swaps_roles():
    out = match_bgp(_ds(), [("?y", "^knows", "?x")],
                    num_partitions=2).to_pandas()
    got = sorted(map(tuple, out[["x", "y"]].to_numpy()))
    assert got == [(1, 2), (1, 3), (2, 3)]
    # inverse transitive: who can reach 3 going backwards
    out2 = match_bgp(_ds(), [(3, "^knows+", "?x")],
                     num_partitions=2).to_pandas()
    assert sorted(out2["x"]) == [1, 2]


def test_alternative_predicates():
    out = match_bgp(_ds(), [("?x", "likes|is_admin", "?v")],
                    num_partitions=2).to_pandas()
    got = sorted(map(tuple, out[["x", "v"]].to_numpy()))
    assert got == [(1, 1), (2, 9)]
    with pytest.raises(ValueError, match="alternatives inside"):
        match_bgp(_ds(), [("?x", "likes|knows+", "?v")],
                  num_partitions=2)


def test_sequence_path_expands_and_hides_intermediate():
    # knows/likes: x knows y, y likes z -> only 1 knows 2 likes 9
    out = match_bgp(_ds(), [("?x", "knows/likes", "?z")],
                    num_partitions=2).to_pandas()
    assert sorted(out.columns) == ["x", "z"]  # intermediate hidden
    assert sorted(map(tuple, out[["x", "z"]].to_numpy())) == [(1, 9)]
    # distinct endpoints even when multiple paths connect them
    rows = TRIPLES + [{"s": 3, "p": "likes", "o": 9}]
    out2 = match_bgp(rd.from_items(rows), [("?x", "knows/likes", "?z")],
                     num_partitions=2).to_pandas()
    got = sorted(map(tuple, out2[["x", "z"]].to_numpy()))
    assert got == [(1, 9), (2, 9)]  # 1->2->9 and 1->3->9 collapse
    with pytest.raises(ValueError, match="required"):
        match_bgp(_ds(), [("?x", "knows", "?y")],
                  minus=[("?y", "knows/likes", "?z")], num_partitions=2)


def test_zero_or_more_path():
    # chain 1->2->3->4: `next*` = zero-length pairs UNION bounded closure
    rows = [{"s": a, "p": "next", "o": b}
            for a, b in [(1, 2), (2, 3), (3, 4)]]
    out = match_bgp(rd.from_items(rows), [(1, "next*", "?y")],
                    max_hops=2, num_partitions=2).to_pandas()
    assert sorted(out["y"]) == [1, 2, 3]  # self + <=2 hops
    # var-var: every term self-paired plus all reachable pairs
    out2 = match_bgp(rd.from_items(rows), [("?x", "next*", "?y")],
                     max_hops=8, num_partitions=2).to_pandas()
    got = sorted(map(tuple, out2[["x", "y"]].to_numpy()))
    selfp = [(n, n) for n in (1, 2, 3, 4)]
    hops = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    assert got == sorted(selfp + hops)
    # constant-constant existence gate: zero-length matches iff equal
    assert match_bgp(rd.from_items(rows), [("?x", "next", "?y"),
                                           (9, "next*", 9)],
                     num_partitions=2).count() == 3
    assert match_bgp(rd.from_items(rows), [("?x", "next", "?y"),
                                           (9, "next*", 5)],
                     num_partitions=2).count() == 0


def test_zero_or_one_path():
    rows = [{"s": a, "p": "next", "o": b}
            for a, b in [(1, 2), (2, 3), (3, 4)]]
    out = match_bgp(rd.from_items(rows), [(1, "next?", "?y")],
                    num_partitions=2).to_pandas()
    assert sorted(out["y"]) == [1, 2]  # self + the direct edge only
    out2 = match_bgp(rd.from_items(rows), [("?x", "next?", "?y")],
                     num_partitions=2).to_pandas()
    got = sorted(map(tuple, out2[["x", "y"]].to_numpy()))
    assert got == sorted([(n, n) for n in (1, 2, 3, 4)]
                         + [(1, 2), (2, 3), (3, 4)])


def test_zero_length_path_scoped_by_constant_graph():
    rows = [
        {"s": 1, "p": "knows", "o": 2, "g": "g1"},
        {"s": 3, "p": "knows", "o": 4, "g": "g2"},
    ]
    # var-var zero-length pairs come only from terms IN graph g2
    out = match_bgp(rd.from_items(rows), [("?x", "likes*", "?y", "g2")],
                    g_col="g", num_partitions=2).to_pandas()
    got = sorted(map(tuple, out[["x", "y"]].to_numpy()))
    assert got == [(3, 3), (4, 4)]  # no likes edges; g1 terms excluded


def test_path_operators_broadcast_matches_hash():
    for patterns in [
        [("?y", "^knows", "?x")],
        [("?x", "likes|is_admin", "?v")],
        [("?x", "knows/likes", "?z")],
        [("?x", "knows/^knows", "?z")],
        [("?x", "knows*", "?z")],
        [(1, "knows?", "?z")],
    ]:
        h = match_bgp(_ds(), patterns, num_partitions=2).to_pandas()
        b = match_bgp(_ds(), patterns, num_partitions=2,
                      join_strategy="broadcast").to_pandas()
        cols = sorted(h.columns)
        assert sorted(b.columns) == cols, patterns
        hv = sorted(map(tuple, h[cols].to_numpy().tolist()))
        bv = sorted(map(tuple, b[cols].to_numpy().tolist()))
        assert hv == bv, patterns


def test_filter_restricts_bindings():
    out = match_bgp(_ds(), [("?x", "knows", "?y")],
                    filters=[("y", ">=", 3)],
                    num_partitions=2).to_pandas()
    got = sorted(map(tuple, out[["x", "y"]].to_numpy()))
    assert got == [(1, 3), (2, 3)]
    # conjunction of two filters
    out2 = match_bgp(_ds(), [("?x", "knows", "?y")],
                     filters=[("y", ">=", 3), ("x", "==", 2)],
                     num_partitions=2).to_pandas()
    assert sorted(map(tuple, out2[["x", "y"]].to_numpy())) == [(2, 3)]


def test_filter_unbound_var_rejected():
    with pytest.raises(ValueError, match="unbound"):
        match_bgp(_ds(), [("?x", "knows", "?y")],
                  filters=[("z", "==", 1)], num_partitions=2)


def test_minus_removes_matching_bindings():
    # MINUS (?y likes ?w): drop bindings whose y has any `likes` triple
    out = match_bgp(_ds(), [("?x", "knows", "?y")],
                    minus=[("?y", "likes", "?w")],
                    num_partitions=2).to_pandas()
    got = sorted(map(tuple, out[["x", "y"]].to_numpy()))
    assert got == [(1, 3), (2, 3)]  # (1,2) removed: 2 likes 9
    # MINUS pattern matching nothing leaves bindings intact
    out2 = match_bgp(_ds(), [("?x", "knows", "?y")],
                     minus=[("?y", "admired_by", "?w")],
                     num_partitions=2).to_pandas()
    assert len(out2) == 3


def test_minus_no_shared_var_rejected():
    with pytest.raises(ValueError, match="shares no variable"):
        match_bgp(_ds(), [("?x", "knows", "?y")],
                  minus=[("?a", "likes", "?b")], num_partitions=2)


def test_filter_minus_broadcast_matches_hash():
    for filters, minus in [
        ([("y", ">=", 3)], None),
        (None, [("?y", "likes", "?w")]),
        ([("x", "<", 2)], [("?y", "likes", "?w")]),
        (None, [("?y", "admired_by", "?w")]),
    ]:
        h = match_bgp(_ds(), [("?x", "knows", "?y")],
                      filters=filters, minus=minus,
                      num_partitions=2).to_pandas()
        b = match_bgp(_ds(), [("?x", "knows", "?y")],
                      filters=filters, minus=minus, num_partitions=2,
                      join_strategy="broadcast").to_pandas()
        cols = sorted(h.columns)
        hv = sorted(map(tuple, h[cols].to_numpy().tolist()))
        bv = sorted(map(tuple, b[cols].to_numpy().tolist()))
        assert hv == bv, (filters, minus)


def test_broadcast_threshold_enforced():
    with pytest.raises(ValueError, match="broadcast_threshold"):
        match_bgp(_ds(), [("?x", "knows", "?y"), ("?y", "knows", "?z")],
                  join_strategy="broadcast", broadcast_threshold=1,
                  num_partitions=2).to_pandas()


def test_saturate_transitive_fixpoint():
    from gliner_transbronchialbiopsy_ray.stages.bgp import saturate

    # parent chain 1->2->3->4: ancestor closure = all 6 pairs
    rows = [{"s": a, "p": "parent", "o": b}
            for a, b in [(1, 2), (2, 3), (3, 4)]]
    out = saturate(rd.from_items(rows), rules=[
        ([("?x", "parent", "?y")], ("?x", "anc", "?y")),
        ([("?x", "anc", "?y"), ("?y", "anc", "?z")],
         ("?x", "anc", "?z")),
    ]).to_pandas()
    anc = out[out["p"] == "anc"]
    got = sorted(map(tuple, anc[["s", "o"]].to_numpy().tolist()))
    assert got == [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    # base triples are preserved in the store
    assert (out["p"] == "parent").sum() == 3


def test_semi_naive_matches_naive_round_for_round():
    from gliner_transbronchialbiopsy_ray.stages.bgp import saturate

    # chain 1->2->3->4->5 plus a disjoint edge; linear rule set
    rows = [{"s": a, "p": "parent", "o": b}
            for a, b in [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)]]
    rules = [
        ([("?x", "parent", "?y")], ("?x", "anc", "?y")),
        ([("?x", "anc", "?y"), ("?y", "parent", "?z")],
         ("?x", "anc", "?z")),
    ]

    def run(strategy, max_rounds):
        out = saturate(rd.from_items(rows), rules, max_rounds=max_rounds,
                       strategy=strategy, num_partitions=2).to_pandas()
        return sorted(map(tuple, out[["s", "p", "o"]].to_numpy().tolist()))

    # fixpoint: full ancestor closure (10 chain pairs + 1 + 5 base)
    full_naive = run("naive", 12)
    assert run("semi_naive", 12) == full_naive
    assert len(full_naive) == 16
    # capped rounds must agree too (same round semantics, store_k == store_k)
    assert run("semi_naive", 3) == run("naive", 3)


def test_incremental_saturation_matches_batch():
    from gliner_transbronchialbiopsy_ray.stages.bgp import (
        saturate, saturate_incremental)

    rules = [
        ([("?x", "next", "?y")], ("?x", "succ", "?y")),
        ([("?x", "succ", "?y"), ("?y", "succ", "?z")],
         ("?x", "succ", "?z")),
    ]
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11), (11, 12)]
    base_e = [e for e in edges if e[0] % 3 != 0]
    new_e = [e for e in edges if e[0] % 3 == 0]
    mk = lambda es: rd.from_items(
        [{"s": a, "p": "next", "o": b} for a, b in es])

    def canon(ds):
        df = ds.to_pandas()
        return sorted(map(tuple, df[["s", "p", "o"]].to_numpy().tolist()))

    batch_all = canon(saturate(mk(edges), rules, strategy="semi_naive",
                               num_partitions=2))
    closed = saturate(mk(base_e), rules, strategy="semi_naive",
                      num_partitions=2).materialize()
    inc = canon(saturate_incremental(closed, mk(new_e), rules,
                                     num_partitions=2))
    assert inc == batch_all
    # re-sending already-known facts is a no-op (delta empties out)
    noop = canon(saturate_incremental(closed, mk(base_e[:2]), rules,
                                      num_partitions=2))
    assert noop == canon(closed)


def test_construct_multi_head_single_fold():
    from gliner_transbronchialbiopsy_ray.stages.bgp import construct

    out = construct(_ds(), [("?x", "knows", "?y")], heads=[
        ("?y", "known_by", "?x"),
        ("?x", "social", 1),       # drops ?y: dedupes
        ("?y", "known_by", "?x"),  # duplicate head: dedupes
    ]).to_pandas()
    got = sorted(map(tuple, out[["s", "p", "o"]].to_numpy()))
    assert got == sorted([
        (2, "known_by", 1), (3, "known_by", 2), (3, "known_by", 1),
        (1, "social", 1), (2, "social", 1),
    ])
    import pytest as _pt
    with _pt.raises(ValueError, match="empty head"):
        construct(_ds(), [("?x", "knows", "?y")], heads=[])


def test_values_inline_bindings():
    vals = pd.DataFrame({"y": [3, 9]})
    out = match_bgp(_ds(), [("?x", "knows", "?y")], values=vals,
                    num_partitions=2).to_pandas()
    got = sorted(map(tuple, out[["x", "y"]].to_numpy()))
    assert got == [(1, 3), (2, 3)]
    # multi-column VALUES constrain tuples, not columns independently
    vals2 = pd.DataFrame({"x": [1, 2], "y": [2, 3]})
    out2 = match_bgp(_ds(), [("?x", "knows", "?y")], values=vals2,
                     num_partitions=2).to_pandas()
    assert sorted(map(tuple, out2[["x", "y"]].to_numpy())) == [(1, 2),
                                                               (2, 3)]
    with pytest.raises(ValueError, match="not bound"):
        match_bgp(_ds(), [("?x", "knows", "?y")],
                  values=pd.DataFrame({"z": [1]}), num_partitions=2)
    # both strategies agree
    b = match_bgp(_ds(), [("?x", "knows", "?y")], values=vals,
                  join_strategy="broadcast",
                  num_partitions=2).to_pandas()
    assert (sorted(map(tuple, b[["x", "y"]].to_numpy())) == got)


QUADS = [
    {"s": 1, "p": "knows", "o": 2, "g": "g1"},
    {"s": 1, "p": "knows", "o": 2, "g": "g2"},  # same fact, other graph
    {"s": 2, "p": "knows", "o": 3, "g": "g2"},
    {"s": 1, "p": "flag", "o": 1, "g": "web"},
    {"s": 2, "p": "flag", "o": 1, "g": "crm"},
]


def _qds():
    return rd.from_items(QUADS)


def test_named_graph_constant_scopes_pattern():
    out = match_bgp(_qds(), [("?x", "knows", "?y", "g2")], g_col="g",
                    num_partitions=2).to_pandas()
    got = sorted(map(tuple, out[["x", "y"]].to_numpy()))
    assert got == [(1, 2), (2, 3)]
    # no graph term: any graph, cross-graph duplicates collapse
    out2 = match_bgp(_qds(), [("?x", "knows", "?y")], g_col="g",
                     num_partitions=2).to_pandas()
    assert len(out2) == 2


def test_named_graph_variable_binds_provenance():
    out = match_bgp(_qds(), [("?x", "flag", 1, "?src")], g_col="g",
                    num_partitions=2).to_pandas()
    got = sorted(map(tuple, out[["x", "src"]].to_numpy()))
    assert got == [(1, "web"), (2, "crm")]


def test_named_graph_cross_graph_join_and_errors():
    out = match_bgp(_qds(), [
        ("?x", "knows", "?y", "g1"),
        ("?x", "flag", 1, "web"),
    ], g_col="g", num_partitions=2).to_pandas()
    assert sorted(map(tuple, out[["x", "y"]].to_numpy())) == [(1, 2)]
    with pytest.raises(ValueError, match="g_col"):
        match_bgp(_qds(), [("?x", "knows", "?y", "g1")],
                  num_partitions=2)
    with pytest.raises(ValueError, match="quantified"):
        match_bgp(_qds(), [(1, "knows+", "?y", "?src")], g_col="g",
                  num_partitions=2)
    # constant graph DOES scope a transitive path
    out3 = match_bgp(_qds(), [(1, "knows+", "?y", "g2")], g_col="g",
                     max_hops=3, num_partitions=2).to_pandas()
    assert sorted(out3["y"]) == [2, 3]
    out4 = match_bgp(_qds(), [(1, "knows+", "?y", "g1")], g_col="g",
                     max_hops=3, num_partitions=2).to_pandas()
    assert sorted(out4["y"]) == [2]


def test_named_graph_broadcast_matches_hash():
    for patterns in [
        [("?x", "knows", "?y", "g2")],
        [("?x", "flag", 1, "?src")],
        [("?x", "knows", "?y", "g1"), ("?x", "flag", 1, "web")],
    ]:
        h = match_bgp(_qds(), patterns, g_col="g",
                      num_partitions=2).to_pandas()
        b = match_bgp(_qds(), patterns, g_col="g", num_partitions=2,
                      join_strategy="broadcast").to_pandas()
        cols = sorted(h.columns)
        assert sorted(b.columns) == cols, patterns
        hv = sorted(map(tuple, h[cols].to_numpy().tolist()))
        bv = sorted(map(tuple, b[cols].to_numpy().tolist()))
        assert hv == bv, patterns


def test_reorder_stats_is_result_invariant():
    # lopsided store: 'knows' dominates, 'is_admin' is rare — the
    # optimizer should not change WHAT comes back, only the plan
    rows = ([{"s": i % 9 + 1, "p": "knows", "o": (i * 3) % 9 + 1}
             for i in range(60)]
            + [{"s": 1, "p": "is_admin", "o": 1},
               {"s": 2, "p": "is_admin", "o": 1}])
    patterns = [("?x", "knows", "?y"), ("?x", "is_admin", 1)]
    base = match_bgp(rd.from_items(rows), patterns,
                     num_partitions=2).to_pandas()
    for strategy in ("hash", "broadcast"):
        opt = match_bgp(rd.from_items(rows), patterns,
                        num_partitions=2, join_strategy=strategy,
                        reorder="stats").to_pandas()
        cols = sorted(base.columns)
        assert sorted(opt.columns) == cols, strategy
        bv = sorted(map(tuple, base[cols].to_numpy().tolist()))
        ov = sorted(map(tuple, opt[cols].to_numpy().tolist()))
        assert bv == ov, strategy
    with pytest.raises(ValueError, match="unknown reorder"):
        match_bgp(rd.from_items(rows), patterns, reorder="magic",
                  num_partitions=2)


def test_reorder_by_stats_unit():
    from gliner_transbronchialbiopsy_ray.stages.bgp import (
        _reorder_by_stats,
    )
    hist = {"big": 1000, "small": 3}
    pats = [("?a", "big", "?b"), ("?b", "small", "?c")]
    # hash: smallest first
    assert _reorder_by_stats(pats, hist, 1003)[0][1] == "small"
    # broadcast: largest first (it streams)
    assert _reorder_by_stats(pats, hist, 1003,
                             big_first=True)[0][1] == "big"
    # connectivity wins over raw size: a disconnected-smaller pattern
    # must not jump ahead of a connected one
    pats2 = [("?a", "big", "?b"), ("?x", "small", "?y"),
             ("?b", "big", "?x")]
    got = _reorder_by_stats(pats2, hist, 2003)
    assert got[0][1] == "small"          # smallest starts
    assert got[1] == ("?b", "big", "?x")  # shares ?x with it


def test_entail_transitive_declaration_driven():
    from gliner_transbronchialbiopsy_ray.stages.bgp import (
        entail_transitive,
    )
    rows = [
        {"s": "a", "p": "part_of", "o": "b"},
        {"s": "b", "p": "part_of", "o": "c"},
        {"s": "x", "p": "serves", "o": "y"},
        {"s": "y", "p": "serves", "o": "z"},
        {"s": "part_of", "p": "a", "o": "TransitiveProperty"},
    ]
    out = entail_transitive(rd.from_items(rows),
                            num_partitions=2).to_pandas()
    got = sorted(map(tuple, out[["s", "p", "o"]].to_numpy()))
    # only the DECLARED predicate closes; serves is untouched
    assert got == [("a", "part_of", "b"), ("a", "part_of", "c"),
                   ("b", "part_of", "c")]
    # no declarations at all -> empty dataset, store-layout SCHEMA
    # intact (Ray's to_pandas drops columns on empty datasets — check
    # the Dataset schema, which is what downstream unions consume)
    out2 = entail_transitive(rd.from_items(rows[:4]),
                             num_partitions=2)
    assert out2.count() == 0
    assert out2.schema().names == ["s", "p", "o"]


def test_entail_transitive_hop_cap_and_multi_decl():
    from gliner_transbronchialbiopsy_ray.stages.bgp import (
        entail_transitive,
    )
    chain = [{"s": f"n{i}", "p": "next", "o": f"n{i+1}"}
             for i in range(4)]
    rows = chain + [
        {"s": "p", "p": "anc", "o": "q"},
        {"s": "q", "p": "anc", "o": "r"},
        {"s": "next", "p": "a", "o": "TransitiveProperty"},
        {"s": "anc", "p": "a", "o": "TransitiveProperty"},
    ]
    out = entail_transitive(rd.from_items(rows), max_hops=2,
                            num_partitions=2).to_pandas()
    nxt = out[out["p"] == "next"]
    anc = out[out["p"] == "anc"]
    # hop cap bounds the closure: pairs at distance <= 2 only
    assert sorted(map(tuple, nxt[["s", "o"]].to_numpy())) == [
        ("n0", "n1"), ("n0", "n2"), ("n1", "n2"), ("n1", "n3"),
        ("n2", "n3"), ("n2", "n4"), ("n3", "n4")]
    assert sorted(map(tuple, anc[["s", "o"]].to_numpy())) == [
        ("p", "q"), ("p", "r"), ("q", "r")]


def test_union_dedups_across_same_var_branches():
    from gliner_transbronchialbiopsy_ray.stages.bgp import match_bgp_union
    # both branches bind (?x ?y); (1,3) matches both -> one row
    out = match_bgp_union(_ds(), [
        [("?x", "knows", "?y")],
        [("?x", "knows", 3), ("?x", "knows", "?y")],
    ], num_partitions=2).to_pandas()
    got = sorted(map(tuple, out[["x", "y"]].to_numpy()))
    assert got == [(1, 2), (1, 3), (2, 3)]


def test_union_pads_disjoint_vars_with_null():
    from gliner_transbronchialbiopsy_ray.stages.bgp import match_bgp_union
    out = match_bgp_union(_ds(), [
        [("?x", "knows", "?y")],
        [("?x", "likes", 9)],
    ], num_partitions=2).to_pandas()
    assert sorted(out.columns) == ["x", "y"]
    with_y = out[out["y"].notna()]
    no_y = out[out["y"].isna()]
    assert sorted(map(tuple, with_y[["x", "y"]].to_numpy())) == [
        (1, 2), (1, 3), (2, 3)]
    assert sorted(no_y["x"]) == [2]  # only 2 likes 9; y unbound


def test_union_branch_kwargs_and_unbound_identity():
    from gliner_transbronchialbiopsy_ray.stages.bgp import match_bgp_union
    # per-branch FILTER dict; two branches emitting the SAME row with
    # the same unbound column collapse (unbound == unbound)
    out = match_bgp_union(_ds(), [
        {"patterns": [("?x", "knows", "?y")],
         "filters": [("y", ">=", 3)]},
        [("?x", "likes", 9)],
        [("?x", "likes", "?z")],   # also binds z for x=2
    ], num_partitions=2).to_pandas()
    # branch 2 (x=2, y/z null) and branch 3 (x=2, z=9, y null) differ
    rows = sorted(map(tuple, out.fillna(-1)[["x", "y", "z"]]
                      .to_numpy().tolist()))
    assert rows == [(1, 3, -1), (2, -1, -1), (2, -1, 9), (2, 3, -1)]


def test_bind_computed_vars_and_validation():
    from gliner_transbronchialbiopsy_ray.stages.bgp import (
        bind_bindings, match_bgp,
    )
    base = match_bgp(_ds(), [("?x", "knows", "?y")], num_partitions=2)
    out = bind_bindings(base, [
        ("sum", "+", "x", "y"),
        ("double_sum", "*", "sum", 2),   # chained ref to earlier bind
    ]).to_pandas()
    got = sorted(map(tuple, out[["x", "y", "sum", "double_sum"]]
                     .to_numpy()))
    assert got == [(1, 2, 3, 6), (1, 3, 4, 8), (2, 3, 5, 10)]
    with pytest.raises(ValueError, match="unbound"):
        bind_bindings(base, [("q", "+", "nope", 1)])
    with pytest.raises(ValueError, match="BIND op"):
        bind_bindings(base, [("q", "**", "x", 2)])


def test_negated_property_set():
    from gliner_transbronchialbiopsy_ray.stages.bgp import match_bgp
    # !knows: every edge whose predicate is NOT knows
    out = match_bgp(_ds(), [("?x", "!knows", "?v")],
                    num_partitions=2).to_pandas()
    got = sorted(map(tuple, out[["x", "v"]].to_numpy()))
    assert got == [(1, 1), (2, 9)]  # is_admin + likes rows
    # negated set with two members
    out2 = match_bgp(_ds(), [("?x", "!likes|is_admin", "?v")],
                     num_partitions=2).to_pandas()
    got2 = sorted(map(tuple, out2[["x", "v"]].to_numpy()))
    assert got2 == [(1, 2), (1, 3), (2, 3)]  # only knows rows survive
    # inverse composes: ^!knows swaps roles of the non-knows edges
    out3 = match_bgp(_ds(), [("?v", "^!knows", "?x")],
                     num_partitions=2).to_pandas()
    got3 = sorted(map(tuple, out3[["x", "v"]].to_numpy()))
    assert got3 == [(1, 1), (2, 9)]
    with pytest.raises(ValueError, match="negated"):
        match_bgp(_ds(), [("?x", "!knows+", "?v")], num_partitions=2)
    # a range quantifier on a negated set must also fail loudly (it
    # used to be silently read as a literal predicate named "knows{1,2}")
    with pytest.raises(ValueError, match="negated"):
        match_bgp(_ds(), [("?x", "!knows{1,2}", "?v")], num_partitions=2)


def test_negated_set_broadcast_and_reorder_parity():
    from gliner_transbronchialbiopsy_ray.stages.bgp import match_bgp
    pats = [("?x", "knows", "?y"), ("?y", "!knows", "?v")]
    h = match_bgp(_ds(), pats, num_partitions=2).to_pandas()
    b = match_bgp(_ds(), pats, num_partitions=2,
                  join_strategy="broadcast").to_pandas()
    r = match_bgp(_ds(), pats, num_partitions=2,
                  reorder="stats").to_pandas()
    cols = sorted(h.columns)
    hv = sorted(map(tuple, h[cols].to_numpy().tolist()))
    assert hv == sorted(map(tuple, b[cols].to_numpy().tolist()))
    assert hv == sorted(map(tuple, r[cols].to_numpy().tolist()))


def test_quantified_range_paths():
    # chain 1->2->3->4->5 (no cycle): exact lengths are easy to read off
    rows = [{"s": a, "p": "next", "o": b}
            for a, b in [(1, 2), (2, 3), (3, 4), (4, 5)]]
    ds = rd.from_items(rows)
    # exact length {2,2}
    out = match_bgp(ds, [(1, "next{2,2}", "?y")],
                    num_partitions=2).to_pandas()
    assert sorted(out["y"]) == [3]
    # range {1,3}
    out = match_bgp(ds, [(1, "next{1,3}", "?y")],
                    num_partitions=2).to_pandas()
    assert sorted(out["y"]) == [2, 3, 4]
    # {2,3} skips the direct edge
    out = match_bgp(ds, [(1, "next{2,3}", "?y")],
                    num_partitions=2).to_pandas()
    assert sorted(out["y"]) == [3, 4]
    # {0,1} includes the zero-length pair (the node itself)
    out = match_bgp(ds, [(1, "next{0,1}", "?y")],
                    num_partitions=2).to_pandas()
    assert sorted(out["y"]) == [1, 2]
    # {0,0} is ONLY the zero-length path
    out = match_bgp(ds, [(1, "next{0,0}", "?y")],
                    num_partitions=2).to_pandas()
    assert sorted(out["y"]) == [1]
    # inverse composes: ^next{2,2} walks backwards two hops
    out = match_bgp(ds, [(5, "^next{2,2}", "?y")],
                    num_partitions=2).to_pandas()
    assert sorted(out["y"]) == [3]


def test_quantified_range_validation_and_unreachable():
    rows = [{"s": 1, "p": "next", "o": 2}]
    ds = rd.from_items(rows)
    with pytest.raises(ValueError, match="bad path range"):
        match_bgp(ds, [(1, "next{3,2}", "?y")], num_partitions=2)
    # min length longer than any path -> empty, schema intact
    out = match_bgp(ds, [(1, "next{4,6}", "?y")],
                    num_partitions=2).to_pandas()
    assert len(out) == 0
    # absent predicate with n=0 still yields the zero-length pair
    out = match_bgp(ds, [(1, "ghost{0,2}", "?y")],
                    num_partitions=2).to_pandas()
    assert sorted(out["y"]) == [1]


def test_stratified_negation_basic_and_fixpoint():
    from gliner_transbronchialbiopsy_ray.stages.bgp import (
        saturate_stratified)
    # edges n1->n2->n3 plus n9->n3; stratum 1 closes reach, stratum 2
    # marks reached nodes with no outgoing reach edge as sinks (string
    # nodes: head constants must share the store's node type)
    rows = [{"s": "n1", "p": "edge", "o": "n2"},
            {"s": "n2", "p": "edge", "o": "n3"},
            {"s": "n9", "p": "edge", "o": "n3"}]
    store = rd.from_items(rows)
    out = saturate_stratified(store, [
        [  # stratum 1: recursive closure
            ([("?x", "edge", "?y")], ("?x", "reach", "?y")),
            ([("?x", "reach", "?y"), ("?y", "edge", "?z")],
             ("?x", "reach", "?z")),
        ],
        [  # stratum 2: targets with NO outgoing reach edge are sinks
            ([("?w", "reach", "?x"), ("not", ("?x", "reach", "?z"))],
             ("?x", "is", "sink")),
        ],
    ], cast_nodes=False).to_pandas()
    reach = out[out["p"] == "reach"]
    assert sorted(map(tuple, reach[["s", "o"]].to_numpy())) == [
        ("n1", "n2"), ("n1", "n3"), ("n2", "n3"), ("n9", "n3")]
    sinks = out[out["p"] == "is"]
    assert sorted(sinks["s"]) == ["n3"]


def test_stratified_negation_rejects_unstratifiable():
    from gliner_transbronchialbiopsy_ray.stages.bgp import (
        saturate_stratified)
    store = rd.from_items([{"s": 1, "p": "edge", "o": 2}])
    # negating a predicate derived in the SAME stratum
    with pytest.raises(ValueError, match="not stratified"):
        saturate_stratified(store, [[
            ([("?x", "edge", "?y"), ("not", ("?y", "odd", "?z"))],
             ("?x", "odd", "?y")),
        ]])
    # negating a predicate derived in a LATER stratum
    with pytest.raises(ValueError, match="not stratified"):
        saturate_stratified(store, [
            [([("?x", "edge", "?y"), ("not", ("?x", "m", "?u"))],
              ("?x", "t", "?y"))],
            [([("?x", "edge", "?y")], ("?x", "m", "?y"))],
        ])
    # variable negated predicate
    with pytest.raises(ValueError, match="variable predicate"):
        saturate_stratified(store, [[
            ([("?x", "edge", "?y"), ("not", ("?x", "?p", "?y"))],
             ("?x", "t", "?y")),
        ]])
    # all-negative body
    with pytest.raises(ValueError, match="positive atom"):
        saturate_stratified(store, [[
            ([("not", ("?x", "e2", "?y"))], ("?x", "t", "?y")),
        ]])


def test_stratified_negation_empty_and_round_budget():
    from gliner_transbronchialbiopsy_ray.stages.bgp import (
        saturate_stratified)
    store = rd.from_items([
        {"s": a, "p": "edge", "o": b}
        for a, b in [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]])
    closure = [
        ([("?x", "edge", "?y")], ("?x", "reach", "?y")),
        ([("?x", "reach", "?y"), ("?y", "edge", "?z")],
         ("?x", "reach", "?z")),
    ]
    # an empty stratum is rejected, not union(None)-crashed
    with pytest.raises(ValueError, match="no rules"):
        saturate_stratified(store, [closure, []])
    # exiting a stratum by round budget instead of fixpoint is an
    # error: later strata would negate an incomplete derivation
    with pytest.raises(RuntimeError, match="fixpoint"):
        saturate_stratified(store, [closure], max_rounds=2)
    # enough rounds converges fine on the same program
    out = saturate_stratified(store, [closure], max_rounds=10)
    assert out.to_pandas()["p"].eq("reach").sum() == 15


_ANC_RULES = [
    ([("?x", "parent", "?y")], ("?x", "anc", "?y")),
    ([("?x", "parent", "?y"), ("?y", "anc", "?z")],
     ("?x", "anc", "?z")),
]


def _spo_set(ds):
    df = ds.to_pandas()
    return set(map(tuple, df[["s", "p", "o"]].astype(str).to_numpy()))


def test_dred_matches_full_resaturation_random_graph():
    """DRed deletion over a random parent graph == saturating the
    remaining base from scratch."""
    import numpy as np
    from gliner_transbronchialbiopsy_ray.stages.bgp import (
        saturate, saturate_decremental)
    rng = np.random.RandomState(3)
    edges = sorted({(f"n{a}", f"n{b}") for a, b in zip(
        rng.randint(0, 18, 40), rng.randint(0, 18, 40)) if a < b})
    base = rd.from_items(
        [{"s": s, "p": "parent", "o": o} for s, o in edges])
    closed = saturate(base, _ANC_RULES, max_rounds=10,
                      cast_nodes=False).materialize()
    dele = [e for i, e in enumerate(edges) if i % 4 == 0]
    deleted = rd.from_items(
        [{"s": s, "p": "parent", "o": o} for s, o in dele])
    kept = rd.from_items(
        [{"s": s, "p": "parent", "o": o} for s, o in edges
         if (s, o) not in set(dele)])
    got = saturate_decremental(closed, base, deleted, _ANC_RULES,
                               max_rounds=10, cast_nodes=False)
    want = saturate(kept, _ANC_RULES, max_rounds=10, cast_nodes=False)
    assert _spo_set(got) == _spo_set(want)


def test_dred_rederives_alternative_support():
    """anc(a,c) holds via a->b->c AND a->d->c; deleting a->b must keep
    anc(a,c) (rederived through the surviving path) — the unrestricted
    first rederive round."""
    from gliner_transbronchialbiopsy_ray.stages.bgp import (
        saturate, saturate_decremental)
    edges = [("a", "b"), ("b", "c"), ("a", "d"), ("d", "c")]
    base = rd.from_items(
        [{"s": s, "p": "parent", "o": o} for s, o in edges])
    closed = saturate(base, _ANC_RULES, max_rounds=6,
                      cast_nodes=False).materialize()
    deleted = rd.from_items([{"s": "a", "p": "parent", "o": "b"}])
    got = _spo_set(saturate_decremental(
        closed, base, deleted, _ANC_RULES, max_rounds=6,
        cast_nodes=False))
    assert ("a", "anc", "c") in got          # alternative support
    assert ("a", "anc", "b") not in got      # gone with the edge
    assert ("a", "parent", "b") not in got
    assert ("b", "anc", "c") in got          # untouched subtree


def test_dred_noop_deletion_returns_store():
    from gliner_transbronchialbiopsy_ray.stages.bgp import (
        saturate, saturate_decremental)
    base = rd.from_items([{"s": "a", "p": "parent", "o": "b"}])
    closed = saturate(base, _ANC_RULES, max_rounds=4,
                      cast_nodes=False).materialize()
    deleted = rd.from_items([{"s": "zz", "p": "parent", "o": "qq"}])
    got = saturate_decremental(closed, base, deleted, _ANC_RULES,
                               cast_nodes=False)
    assert _spo_set(got) == _spo_set(closed)


def test_update_store_delete_insert_where():
    from gliner_transbronchialbiopsy_ray.stages.bgp import update_store
    store = rd.from_items([{"s": s, "p": p, "o": o} for s, p, o in [
        ("o1", "status", "open"), ("o2", "status", "open"),
        ("o3", "status", "closed"),
        ("o1", "kind", "big"), ("o2", "kind", "small"),
    ]])
    # close every open big order: DELETE {?o status open}
    # INSERT {?o status closed . ?o closed_from open} WHERE {...}
    out = update_store(
        store,
        where=[("?o", "status", "open"), ("?o", "kind", "big")],
        delete=[("?o", "status", "open")],
        insert=[("?o", "status", "closed"),
                ("?o", "closed_from", "open")],
        cast_nodes=False)
    got = sorted(map(tuple,
                     out.to_pandas()[["s", "p", "o"]].to_numpy()))
    assert got == sorted([
        ("o1", "status", "closed"), ("o1", "closed_from", "open"),
        ("o1", "kind", "big"),
        ("o2", "status", "open"), ("o2", "kind", "small"),
        ("o3", "status", "closed"),
    ])


def test_update_store_delete_and_insert_same_triple_survives():
    from gliner_transbronchialbiopsy_ray.stages.bgp import update_store
    store = rd.from_items([{"s": "a", "p": "v", "o": "1"}])
    out = update_store(
        store, where=[("?x", "v", "1")],
        delete=[("?x", "v", "1")], insert=[("?x", "v", "1")],
        cast_nodes=False)
    assert sorted(map(tuple, out.to_pandas().to_numpy())) == \
        [("a", "v", "1")]


def test_update_store_empty_where_is_noop():
    from gliner_transbronchialbiopsy_ray.stages.bgp import update_store
    store = rd.from_items([{"s": "a", "p": "v", "o": "1"}])
    out = update_store(
        store, where=[("?x", "v", "nope")],
        delete=[("?x", "v", "nope")], insert=[("?x", "w", "2")],
        cast_nodes=False)
    assert sorted(map(tuple, out.to_pandas().to_numpy())) == \
        [("a", "v", "1")]
    import pytest as _pt
    with _pt.raises(ValueError, match="delete and/or insert"):
        update_store(store, where=[("?x", "v", "1")])
