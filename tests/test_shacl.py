"""SHACL-lite validation (stages/shacl.py): cardinality, enum, regex
and class-reference constraints over a subject-bucketed store."""

import pandas as pd
import pytest
import ray.data as rd

from gliner_transbronchialbiopsy_ray.stages.shacl import (
    Shape, validate_shapes,
)

STORE = [
    # customers: c1 conforms; c2 has no orders; c3 double nation + bad ref
    ("c1", "type", "Customer"), ("c2", "type", "Customer"),
    ("c3", "type", "Customer"),
    ("c1", "in_nation", "n1"), ("c2", "in_nation", "n1"),
    ("c3", "in_nation", "n1"), ("c3", "in_nation", "nX"),
    ("c1", "placed", "o1"), ("c3", "placed", "o2"),
    # orders: o1 ok, o2 bad status
    ("o1", "type", "Order"), ("o2", "type", "Order"),
    ("o1", "status", "O"), ("o2", "status", "Z"),
    # nations: n1 typed; nX NOT typed Nation
    ("n1", "type", "Nation"),
]


def _store():
    return rd.from_items([{"s": s, "p": p, "o": o} for s, p, o in STORE])


CUSTOMER = Shape("CustomerShape", "Customer", [
    ("min_count", "placed", 1),
    ("max_count", "in_nation", 1),
    ("class_ref", "in_nation", "Nation"),
])
ORDER = Shape("OrderShape", "Order", [
    ("in_set", "status", {"O", "F", "P"}),
    ("pattern", "status", r"[A-Z]"),
])


def test_violations_reported_per_constraint():
    out = validate_shapes(_store(), [CUSTOMER, ORDER]).to_pandas()
    got = set(map(tuple,
                  out[["node", "constraint", "pred"]].to_numpy()))
    assert got == {
        ("c2", "min_count", "placed"),
        ("c3", "max_count", "in_nation"),
        ("c3", "class_ref", "in_nation"),
        ("o2", "in_set", "status"),
    }
    # detail column carries the offending count/value
    d = {(r.node, r.constraint): r.detail for r in out.itertuples()}
    assert d[("c2", "min_count")] == "0"
    assert d[("c3", "max_count")] == "2"
    assert d[("o2", "in_set")] == "Z"


def test_conforming_store_is_empty():
    rows = [("c1", "type", "Customer"), ("c1", "placed", "o1"),
            ("c1", "in_nation", "n1"), ("n1", "type", "Nation")]
    out = validate_shapes(
        rd.from_items([{"s": s, "p": p, "o": o} for s, p, o in rows]),
        [CUSTOMER]).to_pandas()
    assert len(out) == 0


def test_min_count_zero_and_bad_kind_rejected():
    with pytest.raises(ValueError, match="unknown constraint"):
        validate_shapes(_store(), [Shape("S", "Customer",
                                         [("exactly", "p", 1)])])
    with pytest.raises(ValueError, match=">= 0"):
        validate_shapes(_store(), [Shape("S", "Customer",
                                         [("min_count", "p", -1)])])


def test_class_ref_threshold_enforced():
    with pytest.raises(ValueError, match="class_ref_threshold"):
        validate_shapes(_store(), [CUSTOMER],
                        class_ref_threshold=0).to_pandas()


def test_bucketing_invariant_to_n_buckets():
    a = validate_shapes(_store(), [CUSTOMER, ORDER],
                        n_buckets=1).to_pandas()
    b = validate_shapes(_store(), [CUSTOMER, ORDER],
                        n_buckets=32).to_pandas()
    key = ["node", "shape", "constraint", "pred", "detail"]
    assert (sorted(map(tuple, a[key].to_numpy()))
            == sorted(map(tuple, b[key].to_numpy())))


def test_datatype_constraint_kinds():
    from gliner_transbronchialbiopsy_ray.stages.shacl import (
        Shape, validate_shapes,
    )
    rows = [
        {"s": "a", "p": "type", "o": "T"},
        {"s": "a", "p": "n", "o": "42"},
        {"s": "a", "p": "d", "o": "3.14"},
        {"s": "a", "p": "when", "o": "2024-01-31"},
        {"s": "b", "p": "type", "o": "T"},
        {"s": "b", "p": "n", "o": "4.5"},          # not an integer
        {"s": "b", "p": "d", "o": "abc"},          # not a decimal
        {"s": "b", "p": "when", "o": "31/01/2024"},  # not ISO date
    ]
    out = validate_shapes(rd.from_items(rows), [Shape("S", "T", [
        ("datatype", "n", "integer"),
        ("datatype", "d", "decimal"),
        ("datatype", "when", "date"),
    ])]).to_pandas()
    got = sorted(map(tuple,
                     out[["node", "pred", "detail"]].to_numpy()))
    assert got == [("b", "d", "abc"), ("b", "n", "4.5"),
                   ("b", "when", "31/01/2024")]
    with pytest.raises(ValueError, match="unknown datatype"):
        validate_shapes(rd.from_items(rows), [Shape("S", "T", [
            ("datatype", "n", "float128")])])


def test_less_than_constraint():
    from gliner_transbronchialbiopsy_ray.stages.shacl import (
        Shape, validate_shapes,
    )
    rows = [
        {"s": "a", "p": "type", "o": "T"},
        {"s": "a", "p": "lo", "o": "3"},
        {"s": "a", "p": "hi", "o": "10"},     # 3 < 10: conforms
        {"s": "b", "p": "type", "o": "T"},
        {"s": "b", "p": "lo", "o": "7"},
        {"s": "b", "p": "lo", "o": "12"},     # max(lo)=12 >= min(hi)=9
        {"s": "b", "p": "hi", "o": "9"},
        {"s": "c", "p": "type", "o": "T"},
        {"s": "c", "p": "lo", "o": "5"},      # no hi: conforms
        {"s": "d", "p": "type", "o": "T"},
        {"s": "d", "p": "lo", "o": "oops"},   # unparseable: violation
        {"s": "d", "p": "hi", "o": "1"},
    ]
    out = validate_shapes(rd.from_items(rows), [Shape("S", "T", [
        ("less_than", "lo", "hi"),
    ])]).to_pandas()
    got = sorted(map(tuple, out[["node", "detail"]].to_numpy()))
    assert got == [("b", "12"), ("d", "oops")]


def test_has_value_equals_disjoint_node_kind():
    rows = [
        ("c1", "type", "C"), ("c2", "type", "C"), ("c3", "type", "C"),
        # has_value: c1 has the flag, c2/c3 don't
        ("c1", "flag", "on"),
        ("c2", "flag", "off"),
        # equals: c1 ships==bills; c2 differs both ways; c3 has neither
        ("c1", "ships", "n:1"), ("c1", "bills", "n:1"),
        ("c2", "ships", "n:2"), ("c2", "bills", "n:3"),
        # disjoint: c1 overlaps likes/hates on "x"
        ("c1", "likes", "x"), ("c1", "hates", "x"),
        ("c2", "likes", "y"), ("c2", "hates", "z"),
        # node_kind: ships values are IRIs; c3's is a bare literal
        ("c3", "ships", "just text"),
    ]
    store = rd.from_items([{"s": s, "p": p, "o": o} for s, p, o in rows])
    out = validate_shapes(store, [Shape("S", "C", [
        ("has_value", "flag", "on"),
        ("equals", "ships", "bills"),
        ("disjoint", "likes", "hates"),
        ("node_kind", "ships", "iri"),
    ])]).to_pandas()
    got = sorted(map(tuple, out[
        ["node", "constraint", "pred", "detail"]].to_numpy()))
    assert got == [
        ("c1", "disjoint", "likes", "x"),
        ("c2", "equals", "ships", "n:2"),
        ("c2", "equals", "ships", "n:3"),
        ("c2", "has_value", "flag", "on"),
        ("c3", "equals", "ships", "just text"),
        ("c3", "has_value", "flag", "on"),
        ("c3", "node_kind", "ships", "just text"),
    ]


def test_node_kind_literal_and_spec_validation():
    rows = [("c1", "type", "C"), ("c1", "score", "12"),
            ("c1", "ref", "n:1")]
    store = rd.from_items([{"s": s, "p": p, "o": o} for s, p, o in rows])
    out = validate_shapes(store, [Shape("S", "C", [
        ("node_kind", "score", "literal"),   # conforms
        ("node_kind", "ref", "literal"),     # violates (IRI-like)
    ])]).to_pandas()
    assert list(out["detail"]) == ["n:1"]
    with pytest.raises(ValueError, match="node_kind"):
        Shape("S", "C", [("node_kind", "p", "blank")]).validate_spec()


def test_closed_shape_flags_undeclared_predicates():
    rows = [
        ("s1", "type", "Widget"),
        ("s1", "name", "alpha"),
        ("s1", "color", "red"),          # undeclared -> violation
        ("s1", "weight", "3"),           # undeclared -> violation
        ("s2", "type", "Widget"),
        ("s2", "name", "beta"),          # fully conformant
        ("x1", "color", "blue"),         # not a target: ignored
    ]
    ds = rd.from_items([{"s": s, "p": p, "o": o} for s, p, o in rows])
    shape = Shape("widget", "Widget",
                  [("closed", None, ["name"])])
    out = validate_shapes(ds, [shape]).to_pandas()
    got = sorted(map(tuple, out[["node", "pred", "detail"]].to_numpy()))
    assert got == [("s1", "color", "red"), ("s1", "weight", "3")]
    assert set(out["constraint"]) == {"closed"}


def test_closed_shape_validation_error():
    import pytest
    shape = Shape("w", "W", [("closed", None, "name")])
    with pytest.raises(ValueError, match="allowed predicates"):
        shape.validate_spec()


def test_qualified_value_shape_counting():
    from gliner_transbronchialbiopsy_ray.stages.shacl import (
        Shape, validate_shapes)
    store = rd.from_items([{"s": s, "p": p, "o": o} for s, p, o in [
        ("c1", "type", "Customer"), ("c2", "type", "Customer"),
        ("c3", "type", "Customer"), ("c4", "type", "Customer"),
        # c1: 2 conforming F orders (in range [1,3]) -> conforms
        ("c1", "st", "F"), ("c1", "st", "F"), ("c1", "st", "O"),
        # c2: 0 conforming (only O) -> min violation, detail 0
        ("c2", "st", "O"),
        # c3: 4 conforming -> max violation, detail 4
        ("c3", "st", "F"), ("c3", "st", "F"),
        ("c3", "st", "F"), ("c3", "st", "F"),
        # c4: NO st triples at all -> min violation, detail 0
    ]])
    shape = Shape("active", "Customer",
                  [("qualified", "st", ("in_set", ["F"]), 1, 3)])
    out = validate_shapes(store, [shape]).to_pandas()
    got = sorted(map(tuple, out[["node", "detail"]].to_numpy()))
    assert got == [("c2", "0"), ("c3", "4"), ("c4", "0")]
    assert set(out["constraint"]) == {"qualified"}


def test_qualified_pattern_inner_and_min_only():
    from gliner_transbronchialbiopsy_ray.stages.shacl import (
        Shape, validate_shapes)
    store = rd.from_items([{"s": s, "p": p, "o": o} for s, p, o in [
        ("c1", "type", "C"), ("c2", "type", "C"),
        ("c1", "code", "AB-1"), ("c1", "code", "zz"),
        ("c2", "code", "zz"),
    ]])
    # min 1 value matching [A-Z]+-\d ; max unbounded
    shape = Shape("coded", "C",
                  [("qualified", "code", ("pattern", r"[A-Z]+-\d"),
                    1, None)])
    out = validate_shapes(store, [shape]).to_pandas()
    assert list(out["node"]) == ["c2"]


def test_qualified_spec_validation():
    from gliner_transbronchialbiopsy_ray.stages.shacl import Shape
    with pytest.raises(ValueError, match="inner shape"):
        Shape("x", "C", [("qualified", "p", ("class_ref", "D"), 1, None)]
              ).validate_spec()
    with pytest.raises(ValueError, match="min_n and/or max_n"):
        Shape("x", "C", [("qualified", "p", ("in_set", ["a"]),
                          None, None)]).validate_spec()
    with pytest.raises(ValueError, match="takes"):
        Shape("x", "C", [("qualified", "p", ("in_set", ["a"]))]
              ).validate_spec()


def test_range_constraints_all_four_bounds():
    from gliner_transbronchialbiopsy_ray.stages.shacl import (
        Shape, validate_shapes)
    store = rd.from_items([{"s": s, "p": p, "o": o} for s, p, o in [
        ("n1", "type", "C"), ("n2", "type", "C"), ("n3", "type", "C"),
        ("n1", "v", "5"),        # conforms to all four below
        ("n2", "v", "10"),       # violates max_inclusive 9 & max_exclusive 10
        ("n3", "v", "oops"),     # unparseable -> violates every range check
        ("n1", "w", "1"),        # violates min_exclusive 1
        ("n2", "w", "0"),        # violates min_inclusive 1 too
    ]])
    shape = Shape("R", "C", [
        ("min_inclusive", "v", 1),
        ("max_inclusive", "v", 9),
        ("min_exclusive", "w", 1),
        ("max_exclusive", "v", 10),
    ])
    out = validate_shapes(store, [shape]).to_pandas()
    got = sorted(map(tuple,
                     out[["node", "constraint", "detail"]].to_numpy()))
    assert got == [
        ("n1", "min_exclusive", "1"),
        ("n2", "max_exclusive", "10"),
        ("n2", "max_inclusive", "10"),
        ("n2", "min_exclusive", "0"),
        ("n3", "max_exclusive", "oops"),
        ("n3", "max_inclusive", "oops"),
        ("n3", "min_inclusive", "oops"),
    ]


def test_length_constraints():
    from gliner_transbronchialbiopsy_ray.stages.shacl import (
        Shape, validate_shapes)
    store = rd.from_items([{"s": s, "p": p, "o": o} for s, p, o in [
        ("n1", "type", "C"), ("n2", "type", "C"),
        ("n1", "name", "abc"),
        ("n2", "name", "toolongvalue"),
        ("n2", "name", "x"),
    ]])
    shape = Shape("L", "C", [
        ("min_length", "name", 2),
        ("max_length", "name", 8),
    ])
    out = validate_shapes(store, [shape]).to_pandas()
    got = sorted(map(tuple,
                     out[["node", "constraint", "detail"]].to_numpy()))
    assert got == [("n2", "max_length", "toolongvalue"),
                   ("n2", "min_length", "x")]


def test_range_length_spec_validation():
    from gliner_transbronchialbiopsy_ray.stages.shacl import Shape
    with pytest.raises(ValueError, match="numeric"):
        Shape("x", "C", [("min_inclusive", "p", "abc")]).validate_spec()
    with pytest.raises(ValueError, match=">= 0"):
        Shape("x", "C", [("min_length", "p", -1)]).validate_spec()


def test_induce_shapes_counts_and_datatypes():
    from gliner_transbronchialbiopsy_ray.stages.shacl import induce_shapes
    store = rd.from_items([{"s": s, "p": p, "o": o} for s, p, o in [
        ("c1", "a", "C"), ("c2", "a", "C"), ("c3", "a", "C"),
        # bal: all integers, c3 lacks it -> min_count 0
        ("c1", "bal", "10"), ("c2", "bal", "-3"),
        # name: strings, everyone has exactly one
        ("c1", "name", "alice"), ("c2", "name", "bob"),
        ("c3", "name", "carol"),
        # ref: iri values, c1 has two (max_count 2)
        ("c1", "ref", "n:1"), ("c1", "ref", "n:2"),
        ("c2", "ref", "n:1"), ("c3", "ref", "n:3"),
        # mixed: integer + string -> string
        ("c1", "mixed", "5"), ("c2", "mixed", "xx"),
        ("c3", "mixed", "7"),
        # a second class with decimals and dates
        ("d1", "a", "D"), ("d1", "price", "1.5"),
        ("d1", "day", "2024-01-02"),
    ]])
    out = induce_shapes(store).to_pandas()
    rows = {(r.cls, r.pred): r for r in out.itertuples()}
    r = rows[("C", "bal")]
    assert (r.n_subjects, r.n_triples, r.min_count, r.max_count,
            r.datatype) == (2, 2, 0, 1, "integer")
    r = rows[("C", "name")]
    assert (r.n_subjects, r.min_count, r.max_count, r.datatype) == \
        (3, 1, 1, "string")
    r = rows[("C", "ref")]
    assert (r.n_subjects, r.min_count, r.max_count, r.datatype) == \
        (3, 1, 2, "iri")
    assert rows[("C", "mixed")].datatype == "string"
    assert rows[("D", "price")].datatype == "decimal"
    assert rows[("D", "day")].datatype == "date"


def test_induce_shapes_roundtrip_with_validator():
    """Shapes induced from clean data validate that same data clean."""
    from gliner_transbronchialbiopsy_ray.stages.shacl import (
        Shape, induce_shapes, validate_shapes)
    triples = [("x1", "a", "T"), ("x2", "a", "T"),
               ("x1", "n", "1"), ("x2", "n", "2")]
    store = rd.from_items([{"s": s, "p": p, "o": o}
                           for s, p, o in triples])
    ind = induce_shapes(store).to_pandas()
    r = ind.iloc[0]
    shape = Shape("induced", r.cls, [
        ("min_count", r.pred, int(r.min_count)),
        ("max_count", r.pred, int(r.max_count)),
        ("datatype", r.pred, r.datatype),
    ])
    assert validate_shapes(store, [shape]).count() == 0
