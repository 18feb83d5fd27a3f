"""OWL 2 RL entailment rules (stages/owl.py): property chains
(prp-spo2), symmetric properties (prp-symp), and subPropertyOf
hierarchy closure (rdfs5 + rdfs7)."""

import pandas as pd
import pytest
import ray.data as rd

from gliner_transbronchialbiopsy_ray.stages.owl import (
    entail_property_chain, entail_subproperty, entail_symmetric)


def _triples(rows):
    return rd.from_items([{"s": s, "p": p, "o": o} for s, p, o in rows])


def test_property_chain_composes():
    store = _triples([
        ("orderNation", "propertyChainAxiom", "placed_by/in_nation"),
        ("o1", "placed_by", "c1"),
        ("o2", "placed_by", "c2"),
        ("c1", "in_nation", "FR"),
    ])
    out = entail_property_chain(store).to_pandas()
    got = sorted(map(tuple, out[["s", "p", "o"]].to_numpy()))
    assert got == [("o1", "orderNation", "FR")]


def test_property_chain_three_step_and_multiple_axioms():
    store = _triples([
        ("gp", "propertyChainAxiom", "parent/parent"),
        ("ggp", "propertyChainAxiom", "parent/parent/parent"),
        ("a", "parent", "b"),
        ("b", "parent", "c"),
        ("c", "parent", "d"),
    ])
    out = entail_property_chain(store).to_pandas()
    got = sorted(map(tuple, out[["s", "p", "o"]].to_numpy()))
    assert got == [("a", "ggp", "d"), ("a", "gp", "c"), ("b", "gp", "d")]


def test_property_chain_rejects_unary_and_empty_is_typed():
    bad = _triples([("h", "propertyChainAxiom", "solo"),
                    ("a", "solo", "b")])
    with pytest.raises(ValueError, match="compose"):
        entail_property_chain(bad).to_pandas()
    none = _triples([("a", "p", "b")])
    out = entail_property_chain(none)
    assert out.count() == 0
    assert set(out.schema().names) == {"s", "p", "o"}


def test_symmetric_mirrors_declared_predicates_only():
    store = _triples([
        ("adjacent", "a", "SymmetricProperty"),
        ("x", "adjacent", "y"),
        ("x", "likes", "y"),
    ])
    out = entail_symmetric(store).to_pandas()
    got = sorted(map(tuple, out[["s", "p", "o"]].to_numpy()))
    assert got == [("y", "adjacent", "x")]
    empty = entail_symmetric(_triples([("x", "likes", "y")]))
    assert empty.count() == 0


def test_subproperty_hierarchy_closure_and_cycles():
    store = _triples([
        ("ships_to", "subPropertyOf", "connected"),
        ("connected", "subPropertyOf", "related"),
        ("s1", "ships_to", "n1"),
        ("s2", "connected", "n2"),
    ])
    out = entail_subproperty(store).to_pandas()
    got = sorted(map(tuple, out[["s", "p", "o"]].to_numpy()))
    # ships_to fans to BOTH supers (rdfs5 closure), connected to one
    assert got == [("s1", "connected", "n1"), ("s1", "related", "n1"),
                   ("s2", "related", "n2")]
    # a cycle never emits the predicate itself
    cyc = _triples([
        ("a", "subPropertyOf", "b"), ("b", "subPropertyOf", "a"),
        ("x", "a", "y"),
    ])
    got2 = sorted(map(tuple, entail_subproperty(cyc)
                      .to_pandas()[["s", "p", "o"]].to_numpy()))
    assert got2 == [("x", "b", "y")]


def test_subproperty_no_declarations_typed_empty():
    out = entail_subproperty(_triples([("x", "p", "y")]))
    assert out.count() == 0
    assert set(out.schema().names) == {"s", "p", "o"}


def test_inverse_functional_star_edges():
    from gliner_transbronchialbiopsy_ray.stages.owl import (
        entail_inverse_functional)
    store = _triples([
        ("phone_sig", "a", "InverseFunctionalProperty"),
        ("c3", "phone_sig", "555"),
        ("c1", "phone_sig", "555"),
        ("c2", "phone_sig", "555"),
        ("c4", "phone_sig", "777"),          # singleton: no edge
        ("c5", "email", "x@y"),              # not declared IFP
        ("c6", "email", "x@y"),
        # second witness for the same pair: distinct fold collapses it
        ("mac", "a", "InverseFunctionalProperty"),
        ("c1", "mac", "aa"),
        ("c2", "mac", "aa"),
    ])
    out = entail_inverse_functional(store).to_pandas()
    got = sorted(map(tuple, out[["s", "p", "o"]].to_numpy()))
    assert got == [("c1", "sameAs", "c2"), ("c1", "sameAs", "c3")]


def test_inverse_functional_closure_equivalence():
    # star edges + sameAs closure give the same classes as the clique
    from gliner_transbronchialbiopsy_ray.stages.owl import (
        entail_inverse_functional)
    from gliner_transbronchialbiopsy_ray.stages.sameas import canonical_map
    store = _triples([
        ("k", "a", "InverseFunctionalProperty"),
        ("b", "k", "v1"), ("c", "k", "v1"),   # b~c
        ("c", "k", "v2"), ("d", "k", "v2"),   # c~d  -> {b,c,d}
    ])
    links = entail_inverse_functional(store)
    cmap = canonical_map(links, left_col="s", right_col="o").to_pandas()
    canon = dict(zip(cmap["node"], cmap["canon"]))
    assert canon.get("c", "c") == "b" and canon.get("d", "d") == "b"


def test_inverse_functional_no_declarations_empty():
    from gliner_transbronchialbiopsy_ray.stages.owl import (
        entail_inverse_functional)
    out = entail_inverse_functional(_triples([("a", "p", "b")]))
    assert out.count() == 0
    assert set(out.schema().names) == {"s", "p", "o"}


def test_functional_violations_counts():
    from gliner_transbronchialbiopsy_ray.stages.owl import (
        functional_violations)
    store = _triples([
        ("located_in", "a", "FunctionalProperty"),
        ("s1", "located_in", "n1"),
        ("s1", "located_in", "n2"),
        ("s1", "located_in", "n2"),          # duplicate: still 2 distinct
        ("s2", "located_in", "n1"),          # conformant
        ("s3", "other_pred", "n1"),          # not declared
        ("s3", "other_pred", "n2"),
    ])
    out = functional_violations(store).to_pandas()
    got = sorted(map(tuple, out[["s", "p", "n_objects"]].to_numpy()))
    assert got == [("s1", "located_in", 2)]
    assert out["n_objects"].dtype == "int64"


def test_functional_violations_none_declared_typed_empty():
    from gliner_transbronchialbiopsy_ray.stages.owl import (
        functional_violations)
    out = functional_violations(_triples([("a", "p", "b")]))
    assert out.count() == 0
    assert set(out.schema().names) == {"s", "p", "n_objects"}


def test_inverse_property_both_directions():
    from gliner_transbronchialbiopsy_ray.stages.owl import entail_inverse
    store = _triples([
        ("placed_by", "inverseOf", "placed"),
        ("o1", "placed_by", "c1"),      # -> (c1, placed, o1)
        ("c2", "placed", "o2"),         # -> (o2, placed_by, c2)
        ("o3", "other_pred", "c3"),     # not declared: no entailment
    ])
    out = entail_inverse(store).to_pandas()
    got = sorted(map(tuple, out[["s", "p", "o"]].to_numpy()))
    assert got == [("c1", "placed", "o1"), ("o2", "placed_by", "c2")]


def test_inverse_property_no_declarations_empty():
    from gliner_transbronchialbiopsy_ray.stages.owl import entail_inverse
    store = _triples([("o1", "placed_by", "c1")])
    out = entail_inverse(store)
    assert out.count() == 0
    assert set(out.schema().names) == {"s", "p", "o"}


def test_entail_has_value_both_directions():
    from gliner_transbronchialbiopsy_ray.stages.owl import entail_has_value
    store = rd.from_items([
        {"s": "VIP", "p": "onProperty", "o": "status"},
        {"s": "VIP", "p": "hasValue", "o": "gold"},
        {"s": "u1", "p": "status", "o": "gold"},     # hv1 -> u1 a VIP
        {"s": "u2", "p": "status", "o": "silver"},   # no
        {"s": "u3", "p": "a", "o": "VIP"},           # hv2 -> u3 status gold
    ])
    out = (entail_has_value(store).to_pandas().astype(str)
           .sort_values(["s", "p", "o"]).reset_index(drop=True))
    got = set(map(tuple, out.to_numpy()))
    assert got == {("u1", "a", "VIP"), ("u3", "status", "gold")}

    # no declarations -> typed empty
    empty = entail_has_value(rd.from_items(
        [{"s": "x", "p": "q", "o": "y"}]))
    assert empty.count() == 0
    assert [f.name for f in empty.schema().base_schema] == ["s", "p", "o"]


def test_entail_some_values_from():
    from gliner_transbronchialbiopsy_ray.stages.owl import (
        entail_some_values_from)
    store = rd.from_items([
        {"s": "ParentOfDoc", "p": "onProperty", "o": "hasChild"},
        {"s": "ParentOfDoc", "p": "someValuesFrom", "o": "Doctor"},
        {"s": "p1", "p": "hasChild", "o": "c1"},
        {"s": "c1", "p": "a", "o": "Doctor"},
        {"s": "p2", "p": "hasChild", "o": "c2"},
        {"s": "c2", "p": "a", "o": "Nurse"},
        {"s": "p3", "p": "hasChild", "o": "c1"},  # same witness, 2nd parent
    ])
    out = entail_some_values_from(store).to_pandas().astype(str)
    got = set(map(tuple, out.drop_duplicates().to_numpy()))
    assert got == {("p1", "a", "ParentOfDoc"), ("p3", "a", "ParentOfDoc")}


def test_different_from_violations_closure():
    from gliner_transbronchialbiopsy_ray.stages.owl import (
        different_from_violations)
    store = rd.from_items([
        {"s": "a", "p": "sameAs", "o": "b"},
        {"s": "b", "p": "sameAs", "o": "c"},
        # violated: a ~ c through the chain
        {"s": "c", "p": "differentFrom", "o": "a"},
        # not violated: d is in no component with a
        {"s": "a", "p": "differentFrom", "o": "d"},
    ])
    out = different_from_violations(store).to_pandas().astype(str)
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["a"], row["b"], row["canon"]) == ("a", "c", "a")


def test_all_values_from_violations():
    from gliner_transbronchialbiopsy_ray.stages.owl import (
        all_values_from_violations)
    store = rd.from_items([
        {"s": "LocalOnly", "p": "onProperty", "o": "ships_to"},
        {"s": "LocalOnly", "p": "allValuesFrom", "o": "Euro"},
        {"s": "s1", "p": "a", "o": "LocalOnly"},
        {"s": "s1", "p": "ships_to", "o": "n1"},   # n1 typed Euro: ok
        {"s": "s1", "p": "ships_to", "o": "n2"},   # n2 not Euro: BAD
        {"s": "s2", "p": "ships_to", "o": "n2"},   # s2 not LocalOnly: ok
        {"s": "n1", "p": "a", "o": "Euro"},
    ])
    out = (all_values_from_violations(store).to_pandas().astype(str)
           .sort_values(["node", "value"]).reset_index(drop=True))
    assert out.to_numpy().tolist() == [["s1", "ships_to", "n2",
                                        "LocalOnly"]]

    # no declarations -> typed empty frame
    e = all_values_from_violations(rd.from_items(
        [{"s": "x", "p": "q", "o": "y"}]))
    assert e.count() == 0


def test_class_expressions_int1_int2_uni():
    from gliner_transbronchialbiopsy_ray.stages.owl import (
        entail_class_expressions)
    store = rd.from_items([{"s": s, "p": p, "o": o} for s, p, o in [
        # ontology: I = intersectionOf(A, B, C); U = unionOf(B, D)
        ("I", "intersectionOf", "l1"),
        ("l1", "first", "A"), ("l1", "rest", "l2"),
        ("l2", "first", "B"), ("l2", "rest", "l3"),
        ("l3", "first", "C"), ("l3", "rest", "nil"),
        ("U", "unionOf", "u1"),
        ("u1", "first", "B"), ("u1", "rest", "u2"),
        ("u2", "first", "D"), ("u2", "rest", "nil"),
        # x1 typed all three members -> int1 derives I
        ("x1", "a", "A"), ("x1", "a", "B"), ("x1", "a", "C"),
        # x2 misses C -> nothing from int1; B gives AnyFlag-style U
        ("x2", "a", "A"), ("x2", "a", "B"),
        # x3 directly typed I -> int2 derives A, B, C
        ("x3", "a", "I"),
        # x4 typed D -> uni derives U
        ("x4", "a", "D"),
    ]])
    out = entail_class_expressions(store).to_pandas()
    got = sorted(map(tuple, out[["s", "o"]].to_numpy()))
    assert got == [
        ("x1", "I"), ("x1", "U"),   # int1 + uni (via B)
        ("x2", "U"),                # uni only
        ("x3", "A"), ("x3", "B"), ("x3", "C"),   # int2
        ("x4", "U"),
    ]
    assert set(out["p"]) == {"a"}


def test_class_expressions_single_application_no_fixpoint():
    """int2-derived members do NOT feed uni in the same pass."""
    from gliner_transbronchialbiopsy_ray.stages.owl import (
        entail_class_expressions)
    store = rd.from_items([{"s": s, "p": p, "o": o} for s, p, o in [
        ("I", "intersectionOf", "l1"),
        ("l1", "first", "A"), ("l1", "rest", "nil"),
        ("U", "unionOf", "u1"),
        ("u1", "first", "A"), ("u1", "rest", "nil"),
        ("x", "a", "I"),     # int2 derives (x a A); uni must NOT fire
    ]])
    out = entail_class_expressions(store).to_pandas()
    assert sorted(map(tuple, out[["s", "o"]].to_numpy())) == [("x", "A")]


def test_class_expressions_empty_declarations():
    from gliner_transbronchialbiopsy_ray.stages.owl import (
        entail_class_expressions)
    e = entail_class_expressions(rd.from_items(
        [{"s": "x", "p": "a", "o": "A"}]))
    assert e.count() == 0


def test_max_cardinality_violations_both_kinds():
    from gliner_transbronchialbiopsy_ray.stages.owl import (
        max_cardinality_violations)
    store = rd.from_items([{"s": s, "p": p, "o": o} for s, p, o in [
        # r1: at most 2 'likes' values of class Hot (qualified)
        ("r1", "onProperty", "likes"),
        ("r1", "maxQualifiedCardinality", "2"),
        ("r1", "onClass", "Hot"),
        # r2: at most 1 'owns' value of any kind (unqualified)
        ("r2", "onProperty", "owns"),
        ("r2", "maxCardinality", "1"),
        # instances
        ("u1", "a", "r1"), ("u2", "a", "r1"), ("u3", "a", "r2"),
        ("u4", "a", "r2"),
        # u1 likes 3 Hot things -> violates (3 > 2)
        ("u1", "likes", "x1"), ("u1", "likes", "x2"),
        ("u1", "likes", "x3"), ("u1", "likes", "cold1"),
        # u2 likes 2 Hot + plenty cold -> conforms
        ("u2", "likes", "x1"), ("u2", "likes", "x2"),
        ("u2", "likes", "cold1"), ("u2", "likes", "cold2"),
        # u3 owns 2 -> violates; u4 owns 1 -> conforms
        ("u3", "owns", "h1"), ("u3", "owns", "h2"),
        ("u4", "owns", "h1"),
        # typing for the qualified class
        ("x1", "a", "Hot"), ("x2", "a", "Hot"), ("x3", "a", "Hot"),
    ]])
    out = max_cardinality_violations(store).to_pandas()
    got = sorted(map(tuple, out[["node", "restriction", "n_values",
                                 "max_n"]].to_numpy()))
    assert got == [("u1", "r1", 3, 2), ("u3", "r2", 2, 1)]


def test_max_cardinality_duplicate_triples_count_once():
    from gliner_transbronchialbiopsy_ray.stages.owl import (
        max_cardinality_violations)
    store = rd.from_items([{"s": s, "p": p, "o": o} for s, p, o in [
        ("r", "onProperty", "p"), ("r", "maxCardinality", "1"),
        ("u", "a", "r"),
        ("u", "p", "v1"), ("u", "p", "v1"),   # duplicate: 1 distinct
    ]])
    assert max_cardinality_violations(store).count() == 0


def test_max_cardinality_no_declarations():
    from gliner_transbronchialbiopsy_ray.stages.owl import (
        max_cardinality_violations)
    e = max_cardinality_violations(
        rd.from_items([{"s": "u", "p": "p", "o": "v"}]))
    assert e.count() == 0


def test_has_key_star_edges_and_composite_tuple():
    from gliner_transbronchialbiopsy_ray.stages.owl import has_key_sameas

    store = _triples([
        ("Person", "hasKey", "ssn/country"),
        ("a", "a", "Person"), ("b", "a", "Person"),
        ("c", "a", "Person"), ("d", "a", "Person"),
        # a and b share the FULL key tuple; c shares only ssn with a;
        # d is a member with a unique tuple
        ("a", "ssn", "123"), ("a", "country", "FR"),
        ("b", "ssn", "123"), ("b", "country", "FR"),
        ("c", "ssn", "123"), ("c", "country", "DE"),
        ("d", "ssn", "999"), ("d", "country", "FR"),
        # e matches a's tuple but is NOT typed Person
        ("e", "ssn", "123"), ("e", "country", "FR"),
    ])
    out = has_key_sameas(store).to_pandas()
    got = sorted(map(tuple, out[["s", "p", "o"]].to_numpy()))
    assert got == [("a", "sameAs", "b")]


def test_has_key_multi_valued_and_multiple_axioms():
    from gliner_transbronchialbiopsy_ray.stages.owl import has_key_sameas

    store = _triples([
        ("Acct", "hasKey", "iban"),
        ("Dev", "hasKey", "mac/site"),
        ("x", "a", "Acct"), ("y", "a", "Acct"), ("z", "a", "Acct"),
        # multi-valued iban: x and y share ONE of x's two values ->
        # the formal any-shared-tuple semantics still fires
        ("x", "iban", "I1"), ("x", "iban", "I2"),
        ("y", "iban", "I2"), ("z", "iban", "I9"),
        ("m1", "a", "Dev"), ("m2", "a", "Dev"),
        ("m1", "mac", "AA"), ("m1", "site", "s1"),
        ("m2", "mac", "AA"), ("m2", "site", "s1"),
    ])
    out = has_key_sameas(store).to_pandas()
    got = sorted(map(tuple, out[["s", "p", "o"]].to_numpy()))
    assert got == [("m1", "sameAs", "m2"), ("x", "sameAs", "y")]

    # closure equivalence: star edges close to the expected classes
    from gliner_transbronchialbiopsy_ray.stages.sameas import (
        canonical_map)
    cm = canonical_map(rd.from_items(
        [{"a": s, "b": o} for s, _p, o in got])).to_pandas()
    assert dict(zip(cm["node"], cm["canon"])) == {"y": "x", "m2": "m1"}


def test_has_key_empty_and_error_paths():
    from gliner_transbronchialbiopsy_ray.stages.owl import has_key_sameas

    # no axioms -> typed empty store (assert on the Dataset schema:
    # to_pandas() on an empty dataset drops columns, the q164 quirk)
    store = _triples([("a", "p", "b")])
    out = has_key_sameas(store)
    assert out.count() == 0 and out.schema().names == ["s", "p", "o"]
    # axiom naming no properties fails loudly
    bad = _triples([("C", "hasKey", "")])
    with pytest.raises(ValueError, match="names no properties"):
        has_key_sameas(bad)


def test_property_axiom_violations_kinds(ray_session):
    import pandas as pd
    import ray.data as rd

    from gliner_transbronchialbiopsy_ray.stages.owl import (
        property_axiom_violations,
    )

    store = rd.from_items([
        # declarations
        {"s": "knows", "p": "a", "o": "AsymmetricProperty"},
        {"s": "parentOf", "p": "a", "o": "IrreflexiveProperty"},
        {"s": "likes", "p": "propertyDisjointWith", "o": "hates"},
        # asymmetric: x<->y both ways, plus a reflexive hit, plus a
        # clean one-way edge
        {"s": "x", "p": "knows", "o": "y"},
        {"s": "y", "p": "knows", "o": "x"},
        {"s": "z", "p": "knows", "o": "z"},     # x==y counts (prp-asyp)
        {"s": "x", "p": "knows", "o": "w"},     # clean
        {"s": "x", "p": "knows", "o": "y"},     # duplicate: set semantics
        # irreflexive
        {"s": "a", "p": "parentOf", "o": "a"},
        {"s": "a", "p": "parentOf", "o": "b"},  # clean
        # disjoint: same (s, o) under both preds; one clean pair
        {"s": "u", "p": "likes", "o": "v"},
        {"s": "u", "p": "hates", "o": "v"},
        {"s": "u", "p": "likes", "o": "q"},     # clean
    ])
    out = (property_axiom_violations(store).to_pandas()
           .sort_values(["kind", "s", "p", "o"]).reset_index(drop=True))
    exp = pd.DataFrame({
        "s": ["x", "y", "z", "a", "u", "u"],
        "p": ["knows", "knows", "knows", "parentOf", "hates", "likes"],
        "o": ["y", "x", "z", "a", "v", "v"],
        "kind": ["asymmetric"] * 3 + ["irreflexive"] + ["disjoint"] * 2,
    }).sort_values(["kind", "s", "p", "o"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out[["s", "p", "o", "kind"]], exp)

    # no declarations -> typed empty result, schema kept (Ray's
    # to_pandas drops columns on zero blocks, so assert the schema)
    clean = rd.from_items([{"s": "x", "p": "knows", "o": "y"}])
    empty = property_axiom_violations(clean)
    assert empty.schema().names == ["s", "p", "o", "kind"]
    assert empty.count() == 0
