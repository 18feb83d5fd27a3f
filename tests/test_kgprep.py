"""KG-embedding prep (stages/kgprep.py): dense id dictionaries and
(h, r, t) encoding."""

import pandas as pd
import pytest
import ray.data as rd

from gliner_transbronchialbiopsy_ray.stages.kgprep import (
    encode_entities, encode_relations, encode_triples,
)

STORE = [
    {"s": "b", "p": "knows", "o": "a"},
    {"s": "a", "p": "knows", "o": "c"},
    {"s": "c", "p": "likes", "o": "a"},
    {"s": "c", "p": "likes", "o": "a"},  # multiplicity preserved
]


def test_entity_ids_dense_sorted():
    ids = encode_entities(rd.from_items(STORE)).to_pandas()
    got = dict(zip(ids["node"], ids["id"]))
    assert got == {"a": 0, "b": 1, "c": 2}
    assert ids["id"].dtype == "int64"


def test_relation_ids_sorted():
    rels = encode_relations(rd.from_items(STORE))
    assert dict(zip(rels["rel"], rels["id"])) == {"knows": 0, "likes": 1}


def test_encode_triples_preserves_multiplicity():
    enc = encode_triples(rd.from_items(STORE),
                         num_partitions=2).to_pandas()
    got = sorted(map(tuple, enc[["h", "r", "t"]].to_numpy()))
    # b-knows-a=(1,0,0), a-knows-c=(0,0,2), c-likes-a=(2,1,0) twice
    assert got == [(0, 0, 2), (1, 0, 0), (2, 1, 0), (2, 1, 0)]
    assert list(enc.dtypes) == [pd.Int64Dtype.type] * 0 or all(
        str(t) == "int64" for t in enc.dtypes)


def test_encoding_invariant_to_block_layout():
    a = encode_entities(rd.from_items(STORE).repartition(1)).to_pandas()
    b = encode_entities(rd.from_items(STORE).repartition(7)).to_pandas()
    da = dict(zip(a["node"], a["id"]))
    db = dict(zip(b["node"], b["id"]))
    assert da == db


def test_predicate_profile_counts_and_functionality():
    from gliner_transbronchialbiopsy_ray.stages.kgprep import (
        predicate_profile,
    )
    rows = [
        # works_at: functional (each s one o)
        {"s": "a", "p": "works_at", "o": "x"},
        {"s": "b", "p": "works_at", "o": "x"},
        # knows: NOT functional (a knows two people); dup row ignored
        {"s": "a", "p": "knows", "o": "b"},
        {"s": "a", "p": "knows", "o": "c"},
        {"s": "a", "p": "knows", "o": "c"},
    ]
    prof = predicate_profile(rd.from_items(rows))
    got = {r.p: (r.n, r.nd_s, r.nd_o, r.nd_so, r.is_functional)
           for r in prof.itertuples()}
    assert got == {"knows": (3, 1, 2, 2, 0),
                   "works_at": (2, 2, 1, 2, 1)}


def test_node_property_table_pivot_min_and_fill():
    from gliner_transbronchialbiopsy_ray.stages.kgprep import (
        node_property_table,
    )
    rows = [
        {"s": "c1", "p": "in_nation", "o": "n7"},
        {"s": "c1", "p": "placed", "o": "o9"},
        {"s": "c1", "p": "placed", "o": "o2"},   # min wins
        {"s": "c2", "p": "in_nation", "o": "n3"},
        {"s": "c3", "p": "other", "o": "x"},      # no requested pred
    ]
    out = node_property_table(
        rd.from_items(rows), ["in_nation", "placed"]).to_pandas()
    got = {r.node: (r.in_nation, r.placed) for r in out.itertuples()}
    assert got == {"c1": ("n7", "o2"), "c2": ("n3", "-")}


def test_link_prediction_split_filtered_invariant():
    from gliner_transbronchialbiopsy_ray.stages.kgprep import (
        encode_triples, link_prediction_split,
    )
    rows = [{"s": f"e{i % 40}", "p": "r", "o": f"e{(i * 7) % 40 + 1}"}
            for i in range(200)]
    split = link_prediction_split(
        encode_triples(rd.from_items(rows), num_partitions=2)
    ).to_pandas()
    assert set(split["split"]) <= {"train", "valid", "test"}
    assert (split["split"] == "train").sum() > 0
    tr = split[split["split"] == "train"]
    seen = set(tr["h"]) | set(tr["t"])
    ev = split[split["split"] != "train"]
    # FILTERED protocol: no eval triple touches an unseen entity
    assert ev["h"].isin(seen).all() and ev["t"].isin(seen).all()
    # deterministic across block layouts
    split2 = link_prediction_split(
        encode_triples(rd.from_items(rows).repartition(7),
                       num_partitions=2)).to_pandas()
    k = ["h", "r", "t", "split"]
    assert (sorted(map(tuple, split[k].to_numpy()))
            == sorted(map(tuple, split2[k].to_numpy())))


def test_characteristic_sets_groups_by_predicate_set():
    from gliner_transbronchialbiopsy_ray.stages.kgprep import (
        characteristic_sets,
    )
    rows = [
        {"s": "a", "p": "name", "o": "x"},
        {"s": "a", "p": "age", "o": "1"},
        {"s": "b", "p": "age", "o": "2"},
        {"s": "b", "p": "name", "o": "y"},
        {"s": "b", "p": "name", "o": "z"},   # duplicate pred: one set
        {"s": "c", "p": "name", "o": "w"},
    ]
    out = characteristic_sets(rd.from_items(rows))
    got = {r.charset: (r.n_subjects, r.n_triples)
           for r in out.itertuples()}
    # a and b share {age,name} (b has 3 triples); c is {name} alone
    assert got == {"age,name": (2, 5), "name": (1, 1)}
    assert list(out["charset"]) == sorted(out["charset"])


def test_characteristic_sets_empty_input():
    from gliner_transbronchialbiopsy_ray.stages.kgprep import (
        characteristic_sets,
    )
    empty = rd.from_items([{"s": "a", "p": "q", "o": "x"}]).filter(
        lambda r: False)
    out = characteristic_sets(empty)
    assert len(out) == 0
    assert list(out.columns) == ["charset", "n_subjects", "n_triples"]


def test_class_summary_typed_untyped_multitype():
    from gliner_transbronchialbiopsy_ray.stages.kgprep import class_summary
    rows = [
        # type declarations (one duplicated — must not double count)
        ("o1", "a", "Order"), ("o2", "a", "Order"), ("o2", "a", "Order"),
        ("c1", "a", "Customer"),
        ("c2", "a", "Customer"), ("c2", "a", "VIP"),   # multi-typed
        # data edges
        ("o1", "placed_by", "c1"),
        ("o2", "placed_by", "c2"),   # fans out to Customer AND VIP
        ("o1", "status", "F"),       # literal object -> (untyped)
        ("x9", "status", "F"),       # untyped subject
    ]
    ds = rd.from_items([{"s": s, "p": p, "o": o} for s, p, o in rows])
    out = class_summary(ds).to_pandas()
    got = sorted(map(tuple,
                     out[["s_type", "p", "o_type", "n"]].to_numpy()))
    assert got == [
        ("(untyped)", "status", "(untyped)", 1),
        ("Order", "placed_by", "Customer", 2),
        ("Order", "placed_by", "VIP", 1),
        ("Order", "status", "(untyped)", 1),
    ]
    assert out["n"].dtype == "int64"


def test_class_summary_no_data_edges_typed_empty():
    from gliner_transbronchialbiopsy_ray.stages.kgprep import class_summary
    ds = rd.from_items([{"s": "x", "p": "a", "o": "T"}])
    out = class_summary(ds)
    assert out.count() == 0
    assert set(out.schema().names) == {"s_type", "p", "o_type", "n"}


def test_rdf_list_unroll_two_lists_and_noise():
    from gliner_transbronchialbiopsy_ray.stages.kgprep import (
        rdf_list_unroll)
    rows = [
        # list A: m1, m2, m3
        ("a0", "first", "m1"), ("a0", "rest", "a1"),
        ("a1", "first", "m2"), ("a1", "rest", "a2"),
        ("a2", "first", "m3"), ("a2", "rest", "nil"),
        # list B: single cell
        ("b0", "first", "x"), ("b0", "rest", "nil"),
        # unrelated triples
        ("s", "p", "o"),
    ]
    ds = rd.from_items([{"s": s, "p": p, "o": o} for s, p, o in rows])
    out = rdf_list_unroll(ds).to_pandas()
    got = sorted(map(tuple, out[["head", "idx", "member"]].to_numpy()))
    assert got == [("a0", 0, "m1"), ("a0", 1, "m2"), ("a0", 2, "m3"),
                   ("b0", 0, "x")]
    assert out["idx"].dtype == "int64"


def test_rdf_list_unroll_max_len_and_empty():
    from gliner_transbronchialbiopsy_ray.stages.kgprep import (
        rdf_list_unroll)
    rows = [("a0", "first", "m1"), ("a0", "rest", "a1"),
            ("a1", "first", "m2"), ("a1", "rest", "a2"),
            ("a2", "first", "m3"), ("a2", "rest", "nil")]
    ds = rd.from_items([{"s": s, "p": p, "o": o} for s, p, o in rows])
    out = rdf_list_unroll(ds, max_len=2).to_pandas()
    assert sorted(out["idx"]) == [0, 1]
    none = rdf_list_unroll(
        rd.from_items([{"s": "s", "p": "p", "o": "o"}]))
    assert none.count() == 0
    assert set(none.schema().names) == {"head", "idx", "member"}


def test_link_prediction_rank_bruteforce_parity():
    import numpy as np
    from gliner_transbronchialbiopsy_ray.stages.kgprep import (
        hash_embedding, link_prediction_rank)
    rng = [(-3, 1, 7), (5, 2, -4), (9, 1, 9)]
    ents = [-4, -3, 1, 5, 7, 9, 12]
    test = rd.from_items([{"h": h, "r": r, "t": t} for h, r, t in rng])
    eds = rd.from_items([{"e": e} for e in ents]).repartition(3)
    out = link_prediction_rank(test, eds)
    # brute force
    em = {e: hash_embedding(np.array([e]), 8)[0] for e in ents}
    for _, row in out.iterrows():
        q = (hash_embedding(np.array([row["h"]]), 8)[0]
             + hash_embedding(np.array([row["r"]]), 8, salt=13)[0])
        ts = np.abs(q - hash_embedding(np.array([row["t"]]), 8)[0]).sum()
        exp = 1 + sum(np.abs(q - em[e]).sum() < ts for e in ents)
        assert row["rank"] == exp
    assert out["rank"].dtype == "int64"


def test_link_prediction_rank_guards():
    from gliner_transbronchialbiopsy_ray.stages.kgprep import (
        link_prediction_rank)
    test = rd.from_items([{"h": 1, "r": 1, "t": 2}] * 5)
    ents = rd.from_items([{"e": 1}, {"e": 2}])
    with pytest.raises(ValueError, match="max_test"):
        link_prediction_rank(test, ents, max_test=2)
    empty = link_prediction_rank(test.limit(0), ents)
    assert len(empty) == 0 and "rank" in empty.columns


def test_export_property_graph_roundtrip(tmp_path):
    import ray.data
    from gliner_transbronchialbiopsy_ray.stages.kgprep import (
        export_property_graph)
    rows = [
        ("n1", "type", "Person"), ("n1", "name", "ada"),
        ("n1", "knows", "n2"),
        ("n2", "type", "Person"),               # no name -> fill
        ("n2", "knows", "n1"),
        ("n1", "age", "36"),                    # not exported
    ]
    ds = rd.from_items([{"s": s, "p": p, "o": o} for s, p, o in rows])
    out = export_property_graph(
        ds, str(tmp_path), rel_preds=["knows"], prop_preds=["name"])
    nodes = (ray.data.read_csv(out["nodes_dir"]).to_pandas()
             .sort_values("node").reset_index(drop=True))
    assert list(map(tuple, nodes[["node", "label", "name"]]
                    .to_numpy())) == [("n1", "Person", "ada"),
                                      ("n2", "Person", "-")]
    rels = (ray.data.read_csv(out["rels_dir"]).to_pandas()
            .sort_values(["src", "dst"]).reset_index(drop=True))
    assert list(map(tuple, rels[["src", "rel_type", "dst"]]
                    .to_numpy())) == [("n1", "knows", "n2"),
                                      ("n2", "knows", "n1")]


def test_import_property_graph_lossless_and_fill(ray_session, tmp_path):
    """export -> import is lossless up to the export's documented lossy
    steps; `fill` cells emit no triple."""
    import ray.data as rd

    from gliner_transbronchialbiopsy_ray.stages.kgprep import (
        export_property_graph,
        import_property_graph,
    )

    triples = rd.from_items([
        {"s": "a", "p": "type", "o": "T"},
        {"s": "a", "p": "name", "o": "Alice"},
        {"s": "a", "p": "knows", "o": "b"},
        {"s": "b", "p": "type", "o": "T"},
        # b has NO name -> fill cell in the node table -> no triple back
        {"s": "b", "p": "knows", "o": "a"},
    ])
    out = export_property_graph(
        triples, str(tmp_path / "pg"), rel_preds=["knows"],
        prop_preds=["name"])
    back = import_property_graph(
        out["nodes_dir"], out["rels_dir"], prop_preds=["name"])
    got = sorted(map(tuple, back.to_pandas()[["s", "p", "o"]].to_numpy()))
    assert got == [("a", "knows", "b"), ("a", "name", "Alice"),
                   ("a", "type", "T"), ("b", "knows", "a"),
                   ("b", "type", "T")]
