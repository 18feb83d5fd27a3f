"""Empty-input behavior of the KG-construction operator family
(repo discipline: an empty dataset emits column-less batches — every
partial-collecting operator needs a guard; see tests/test_empty_inputs.py
for the round-1 family)."""

import pandas as pd
import pyarrow as pa
import ray.data as rd


def _empty_triples():
    return rd.from_pandas(pd.DataFrame({
        "s": pd.Series(dtype=object),
        "p": pd.Series(dtype=object),
        "o": pd.Series(dtype=object)}))


def test_match_bgp_empty_store():
    from gliner_transbronchialbiopsy_ray.stages.bgp import match_bgp
    out = match_bgp(_empty_triples(), [("?x", "knows", "?y")],
                    cast_nodes=False, num_partitions=2).to_pandas()
    assert len(out) == 0
    out2 = match_bgp(_empty_triples(),
                     [("?x", "knows", "?y"), ("?y", "knows", "?z")],
                     cast_nodes=False, num_partitions=2).to_pandas()
    assert len(out2) == 0


def test_saturate_empty_store():
    from gliner_transbronchialbiopsy_ray.stages.bgp import saturate
    out = saturate(_empty_triples(),
                   rules=[([("?x", "e", "?y")], ("?x", "r", "?y"))],
                   max_rounds=2).to_pandas()
    assert len(out) == 0


def test_triplify_empty_table():
    from gliner_transbronchialbiopsy_ray.stages.triplify import (
        TripleMap, node, triplify,
    )
    empty = rd.from_pandas(pd.DataFrame({
        "a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")}))
    tm = TripleMap(subject=node("x", "a"),
                   mappings=[("p", node("y", "b"))])
    out = triplify(empty, tm).to_pandas()
    assert len(out) == 0


def test_validate_shapes_empty_store():
    from gliner_transbronchialbiopsy_ray.stages.shacl import (
        Shape, validate_shapes,
    )
    out = validate_shapes(
        _empty_triples(),
        [Shape("S", "C", [("min_count", "p", 1)])]).to_pandas()
    assert len(out) == 0


def test_resolve_conflicts_empty():
    from gliner_transbronchialbiopsy_ray.stages.fusion import (
        resolve_conflicts,
    )
    empty = rd.from_pandas(pd.DataFrame({
        "s": pd.Series(dtype=object), "p": pd.Series(dtype=object),
        "o": pd.Series(dtype=object),
        "source": pd.Series(dtype=object)}))
    out = resolve_conflicts(empty).to_pandas()
    assert len(out) == 0


def test_kgprep_empty():
    from gliner_transbronchialbiopsy_ray.stages.kgprep import (
        encode_entities, encode_relations, predicate_profile,
    )
    assert len(encode_entities(_empty_triples()).to_pandas()) == 0
    assert len(encode_relations(_empty_triples())) == 0
    assert len(predicate_profile(_empty_triples())) == 0


def test_temporal_empty():
    from gliner_transbronchialbiopsy_ray.stages.temporal_kg import (
        intervalize_facts, snapshot_at,
    )
    empty = rd.from_pandas(pd.DataFrame({
        "s": pd.Series(dtype=object), "p": pd.Series(dtype=object),
        "o": pd.Series(dtype=object),
        "ts": pd.Series(dtype="int64"),
        "eid": pd.Series(dtype="int64")}))
    iv = intervalize_facts(empty, ["s", "p"], "ts", "o", "eid")
    assert len(snapshot_at(iv, 5).to_pandas()) == 0


def test_apply_sameas_empty_store():
    from gliner_transbronchialbiopsy_ray.stages.sameas import (
        apply_sameas,
    )
    links = rd.from_items([{"a": "x", "b": "y"}])
    out = apply_sameas(_empty_triples(), links).to_pandas()
    assert len(out) == 0
