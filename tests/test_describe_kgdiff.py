"""SPARQL query forms (ASK, DESCRIBE/CBD) and KG maintenance utilities
(literal parsing, skolemization, graph diff)."""

import pandas as pd
import pytest
import ray.data as rd

from gliner_transbronchialbiopsy_ray.stages.kgprep import (
    graph_diff, parse_literals, skolemize)
from gliner_transbronchialbiopsy_ray.stages.solutions import ask, describe


def _store(rows):
    return rd.from_items([{"s": s, "p": p, "o": o} for s, p, o in rows])


STORE = [
    ("ord:1", "placed_by", "cust:1"),
    ("ord:1", "addr", "_:a1"),
    ("_:a1", "city", "Lyon"),
    ("_:a1", "geo", "_:g1"),
    ("_:g1", "lat", "45.7"),
    ("ord:2", "placed_by", "cust:2"),
    ("cust:1", "name", "Ada"),
]


def test_ask_polarity():
    st = _store(STORE)
    assert ask(st, [("?o", "placed_by", "cust:1")], cast_nodes=False)
    assert not ask(st, [("?o", "placed_by", "cust:99")], cast_nodes=False)
    # bindings-dataset form
    from gliner_transbronchialbiopsy_ray.stages.bgp import match_bgp
    b = match_bgp(st, [("?o", "addr", "?a")], cast_nodes=False)
    assert ask(b)


def test_describe_follows_blank_nodes_only():
    st = _store(STORE)
    out = describe(st, nodes=["ord:1"]).to_pandas()
    got = sorted(map(tuple, out[["s", "p", "o"]].to_numpy()))
    # cust:1 is an IRI -> NOT recursed; blank chain a1 -> g1 is
    assert got == [
        ("_:a1", "city", "Lyon"),
        ("_:a1", "geo", "_:g1"),
        ("_:g1", "lat", "45.7"),
        ("ord:1", "addr", "_:a1"),
        ("ord:1", "placed_by", "cust:1"),
    ]


def test_describe_depth_cap_and_pattern_targets():
    st = _store(STORE)
    shallow = describe(st, nodes=["ord:1"], max_depth=2).to_pandas()
    assert ("_:g1", "lat", "45.7") not in set(
        map(tuple, shallow[["s", "p", "o"]].to_numpy()))
    # pattern-form targets: every order node
    out = describe(st, patterns=[("?x", "placed_by", "?c")], var="x",
                   cast_nodes=False).to_pandas()
    subjects = set(out["s"])
    assert {"ord:1", "ord:2", "_:a1", "_:g1"} == subjects


def test_describe_cyclic_blanks_terminate():
    rows = [("n:1", "p", "_:x"), ("_:x", "q", "_:y"),
            ("_:y", "q", "_:x")]
    out = describe(_store(rows), nodes=["n:1"], max_depth=8).to_pandas()
    assert len(out) == 3
    with pytest.raises(ValueError, match="exactly one"):
        describe(_store(rows))
    missing = describe(_store(rows), nodes=["n:404"]).to_pandas()
    assert len(missing) == 0


def test_parse_literals_forms():
    rows = [("a", "v", '"5"^^xsd:integer'),
            ("a", "v", '"bonjour"@fr'),
            ("a", "v", '"plain"'),
            ("a", "ref", "n:1")]
    out = (parse_literals(_store(rows)).to_pandas()
           .sort_values("o").reset_index(drop=True))
    byo = {r["o"]: r for _, r in out.iterrows()}
    assert byo['"5"^^xsd:integer']["lexical"] == "5"
    assert byo['"5"^^xsd:integer']["datatype"] == "xsd:integer"
    assert byo['"bonjour"@fr']["lang"] == "fr"
    assert byo['"bonjour"@fr']["datatype"] == ""
    assert byo['"plain"']["lexical"] == "plain"
    assert byo["n:1"]["is_literal"] == 0
    assert byo['"plain"']["is_literal"] == 1


def test_skolemize_rewrites_both_positions():
    rows = [("_:b1", "p", "_:b2"), ("n:1", "q", "_:b1"),
            ("n:1", "r", "lit")]
    out = skolemize(_store(rows)).to_pandas()
    got = sorted(map(tuple, out[["s", "p", "o"]].to_numpy()))
    assert got == [
        ("n:1", "q", "skolem:b1"), ("n:1", "r", "lit"),
        ("skolem:b1", "p", "skolem:b2"),
    ]


def test_graph_diff_added_removed_and_dups_collapse():
    old = _store([("a", "p", "1"), ("a", "p", "2"), ("a", "p", "2")])
    new = _store([("a", "p", "2"), ("b", "q", "3")])
    out = graph_diff(old, new).to_pandas()
    got = sorted(map(tuple, out[["s", "p", "o", "change"]].to_numpy()))
    assert got == [("a", "p", "1", "removed"), ("b", "q", "3", "added")]
    same = graph_diff(old, old).to_pandas()
    assert len(same) == 0
