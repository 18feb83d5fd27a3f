"""Flat JSON-LD (NDJSON node object) source/sink round trip."""

import json
import os
import tempfile

import ray.data as rd

from gliner_transbronchialbiopsy_ray.sources.jsonld import (
    read_jsonld,
    write_jsonld,
)


def _spo(ds):
    df = ds.to_pandas()
    df = df[df["error"].isna()]
    return sorted(map(tuple, df[["s", "p", "o"]].to_numpy()))


def test_read_jsonld_shapes_and_errors():
    d = tempfile.mkdtemp()
    lines = [
        json.dumps({"@id": "cust:1", "@type": "Customer",
                    "name": "alice", "ordered": {"@id": "order:9"},
                    "score": 7, "vip": True}),
        json.dumps({"@id": "cust:2",
                    "tags": ["a", "b"],
                    "knows": [{"@id": "cust:1"}, {"@id": "cust:3"}]}),
        "{not json",
        json.dumps({"no_at_id": 1}),
        json.dumps({"@id": "cust:4", "nested": {"deep": 1}}),
    ]
    with open(os.path.join(d, "x.jsonld"), "w") as f:
        f.write("\n".join(lines) + "\n")
    out = read_jsonld(os.path.join(d, "x.jsonld")).to_pandas()
    ok = out[out["error"].isna()]
    got = sorted(map(tuple, ok[["s", "p", "o", "o_kind"]].to_numpy()))
    assert got == sorted([
        ("cust:1", "a", "Customer", "iri"),
        ("cust:1", "name", "alice", "literal"),
        ("cust:1", "ordered", "order:9", "iri"),
        ("cust:1", "score", "7", "literal"),
        ("cust:1", "vip", "true", "literal"),
        ("cust:2", "tags", "a", "literal"),
        ("cust:2", "tags", "b", "literal"),
        ("cust:2", "knows", "cust:1", "iri"),
        ("cust:2", "knows", "cust:3", "iri"),
    ])
    errs = out[out["error"].notna()]["error"].tolist()
    assert any("jsonld_parse" in e for e in errs)       # bad json + no @id
    assert sum("jsonld_parse" in e for e in errs) == 2
    assert any("nested_object" in e for e in errs)      # kept, flagged


def test_jsonld_round_trip():
    triples = [
        ("cust:1", "a", "Customer"), ("cust:1", "name", "alice"),
        ("cust:1", "ordered", "order:9"), ("cust:1", "ordered", "order:8"),
        ("cust:2", "name", "bob with spaces"),
        ("order:9", "a", "Order"),
    ]
    ds = rd.from_items([{"s": s, "p": p, "o": o} for s, p, o in triples])
    d = tempfile.mkdtemp()
    manifest = write_jsonld(ds, d, n_buckets=4)
    assert manifest["rows"].sum() == 3          # 3 distinct subjects
    back = read_jsonld([p for p in manifest["path"]])
    assert _spo(back) == sorted(triples)


def test_write_jsonld_deterministic_bytes():
    triples = [("s:1", "p", "b"), ("s:1", "p", "a"), ("s:2", "q", "x")]
    import pandas as pd
    names = []
    for _ in range(2):
        ds = rd.from_items(
            [{"s": s, "p": p, "o": o} for s, p, o in triples]
        ).repartition(3)
        d = tempfile.mkdtemp()
        m = write_jsonld(ds, d, n_buckets=2)
        names.append(sorted(os.path.basename(p) for p in m["path"]))
    assert names[0] == names[1]     # content-hash names stable
