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
