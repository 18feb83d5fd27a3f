"""Declarative relational->KG mapping (stages/triplify.py): term
constructors, row filters, NULL-object skipping, multi-table union,
and composition with match_bgp."""

import pandas as pd
import pytest
import ray.data as rd

from gliner_transbronchialbiopsy_ray.stages.triplify import (
    TripleMap, col, const, node, row_filter, triplify, triplify_tables,
)

ORDERS = pd.DataFrame({
    "okey": [1, 2, 3],
    "ckey": [10, 20, 10],
    "status": ["O", "F", "O"],
    "comment": ["a", None, "c"],
})


def _orders():
    return rd.from_pandas(ORDERS)


def test_triplify_emits_per_mapping_rows():
    tm = TripleMap(
        subject=node("order", "okey"),
        mappings=[
            ("by_customer", node("cust", "ckey")),
            ("has_status", col("status")),
        ])
    out = triplify(_orders(), tm).to_pandas()
    got = sorted(map(tuple, out[["s", "p", "o"]].to_numpy()))
    assert got == sorted([
        ("order:1", "by_customer", "cust:10"),
        ("order:2", "by_customer", "cust:20"),
        ("order:3", "by_customer", "cust:10"),
        ("order:1", "has_status", "O"),
        ("order:2", "has_status", "F"),
        ("order:3", "has_status", "O"),
    ])


def test_row_filter_and_const_and_null_skip():
    tm = TripleMap(
        subject=node("order", "okey"),
        mappings=[
            ("is_open", const(1), row_filter("status", "==", "O")),
            ("has_comment", col("comment")),  # NULL object skipped
        ])
    out = triplify(_orders(), tm).to_pandas()
    got = sorted(map(tuple, out[["s", "p", "o"]].to_numpy()))
    # mixed object types (int const + string col) -> all string
    assert got == sorted([
        ("order:1", "is_open", "1"),
        ("order:3", "is_open", "1"),
        ("order:1", "has_comment", "a"),
        ("order:3", "has_comment", "c"),
    ])


def test_uniform_object_type_is_preserved():
    tm = TripleMap(subject=col("okey"),
                   mappings=[("by_customer", col("ckey"))])
    out = triplify(_orders(), tm).to_pandas()
    assert out["s"].dtype == "int64" and out["o"].dtype == "int64"


def test_columns_lists_pruning_set():
    tm = TripleMap(
        subject=node("order", "okey"),
        mappings=[("is_open", const(1), row_filter("status", "==", "O")),
                  ("by_customer", node("cust", "ckey"))])
    assert tm.columns() == ["okey", "status", "ckey"]


def test_multi_table_union_and_bgp_composition():
    from gliner_transbronchialbiopsy_ray.stages.bgp import match_bgp

    cust = pd.DataFrame({"ckey": [10, 20], "nation": [7, 8]})
    store = triplify_tables([
        (_orders(), TripleMap(
            subject=node("order", "okey"),
            mappings=[
                ("by_customer", node("cust", "ckey")),
                ("is_open", const("1"), row_filter("status", "==", "O")),
            ])),
        (rd.from_pandas(cust), TripleMap(
            subject=node("cust", "ckey"),
            mappings=[("in_nation", node("nation", "nation"))])),
    ])
    out = match_bgp(store, [
        ("?o", "by_customer", "?c"),
        ("?c", "in_nation", "nation:7"),
        ("?o", "is_open", "1"),
    ], cast_nodes=False, num_partitions=2).to_pandas()
    got = sorted(map(tuple, out[["o", "c"]].to_numpy()))
    assert got == [("order:1", "cust:10"), ("order:3", "cust:10")]


def test_empty_mappings_rejected():
    with pytest.raises(ValueError, match="no mappings"):
        triplify(_orders(), TripleMap(subject=col("okey"), mappings=[]))


def test_reify_statements_content_ids_and_qualifiers():
    import hashlib

    from gliner_transbronchialbiopsy_ray.stages.triplify import (
        reify_statements,
    )
    rows = [{"s": "sup:1", "p": "in_nation", "o": "nation:7", "q": 42}]
    out = reify_statements(rd.from_items(rows),
                           qualifiers=["q"]).to_pandas()
    sid = "stmt:" + hashlib.md5(b"sup:1|in_nation|nation:7").hexdigest()
    got = sorted(map(tuple, out[["s", "p", "o"]].to_numpy()))
    assert got == sorted([
        (sid, "rdf_subject", "sup:1"),
        (sid, "rdf_predicate", "in_nation"),
        (sid, "rdf_object", "nation:7"),
        (sid, "q", "42"),
    ])
    # duplicate input triples share the statement node
    out2 = reify_statements(
        rd.from_items(rows + rows)).to_pandas()
    assert out2["s"].nunique() == 1
