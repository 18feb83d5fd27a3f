"""Turtle reader (sources/turtle.py): prefixes, continuation lists,
term kinds, typed/lang literals, error resynchronization."""

import os

from gliner_transbronchialbiopsy_ray.sources.turtle import (
    parse_turtle, read_turtle,
)

TTL = """\
@prefix ex: <http://ex/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
# a comment
ex:alice a ex:Person ;
    ex:knows ex:bob , _:anon1 ;
    ex:name "Alice \\"A\\"" ;
    ex:age 42 ;
    ex:height 1.75 ;
    ex:label "bonjour"@fr ;
    ex:joined "2020-01-02"^^xsd:date .
_:anon1 ex:knows ex:alice .
"""


def test_parse_turtle_statements():
    rows = [r for r in parse_turtle(TTL) if r["error"] is None]
    by = {(r["s"], r["p"]): r for r in rows}
    E = "http://ex/"
    assert by[(E + "alice",
               "http://www.w3.org/1999/02/22-rdf-syntax-ns#type")][
        "o"] == E + "Person"
    knows = [r for r in rows if r["p"] == E + "knows"
             and r["s"] == E + "alice"]
    assert sorted(r["o"] for r in knows) == ["_:anon1", E + "bob"]
    assert by[(E + "alice", E + "name")]["o"] == 'Alice "A"'
    age = by[(E + "alice", E + "age")]
    assert (age["o"], age["o_datatype"]) == (
        "42", "http://www.w3.org/2001/XMLSchema#integer")
    ht = by[(E + "alice", E + "height")]
    assert ht["o_datatype"].endswith("decimal")
    lab = by[(E + "alice", E + "label")]
    assert (lab["o"], lab["o_lang"]) == ("bonjour", "fr")
    joined = by[(E + "alice", E + "joined")]
    assert joined["o_datatype"] == \
        "http://www.w3.org/2001/XMLSchema#date"
    assert by[("_:anon1", E + "knows")]["o"] == E + "alice"
    assert len(rows) == 9


def test_parse_error_resync_keeps_later_statements():
    bad = """\
@prefix ex: <http://ex/> .
ex:a ex:broken [ ] .
ex:b ex:ok ex:c .
"""
    rows = parse_turtle(bad)
    errs = [r for r in rows if r["error"]]
    ok = [r for r in rows if not r["error"]]
    assert len(errs) == 1 and "ttl_parse_error" in errs[0]["error"]
    assert len(ok) == 1 and ok[0]["s"] == "http://ex/b"
    # undeclared prefix is an error, not a crash
    rows2 = parse_turtle("nope:a nope:b nope:c .")
    assert rows2[0]["error"] and "prefix" in rows2[0]["error"]


def test_read_turtle_dataset(tmp_path):
    p = os.path.join(str(tmp_path), "kg.ttl")
    with open(p, "w") as f:
        f.write(TTL)
    out = read_turtle(p).to_pandas()
    assert out["error"].isna().all()
    assert len(out) == 9
    assert set(out["o_kind"]) == {"iri", "bnode", "literal"}
    assert (out["path"] == out["path"].iloc[0]).all()


def test_write_turtle_roundtrip(tmp_path):
    import pandas as pd
    import ray.data as rd

    from gliner_transbronchialbiopsy_ray.sources.turtle import (
        write_turtle,
    )

    rows = [
        {"s": "http://ex/a", "p": "http://ex/knows",
         "o": "http://ex/b", "o_kind": "iri",
         "o_datatype": None, "o_lang": None},
        {"s": "http://ex/a", "p": "http://ex/name",
         "o": 'weird "q"\nline', "o_kind": "literal",
         "o_datatype": None, "o_lang": None},
        {"s": "http://ex/a", "p": "http://ex/age", "o": "42",
         "o_kind": "literal",
         "o_datatype": "http://www.w3.org/2001/XMLSchema#integer",
         "o_lang": None},
        {"s": "_:n1", "p": "http://ex/label", "o": "salut",
         "o_kind": "literal", "o_datatype": None, "o_lang": "fr"},
        {"s": "http://other/x", "p": "http://ex/knows",
         "o": "http://ex/a", "o_kind": "iri",
         "o_datatype": None, "o_lang": None},  # uncompressible subject
    ]
    out_dir = os.path.join(str(tmp_path), "ttl")
    manifest = write_turtle(
        rd.from_items(rows), out_dir,
        prefixes={"ex": "http://ex/",
                  "xsd": "http://www.w3.org/2001/XMLSchema#"})
    assert manifest["rows"].sum() == 5
    files = sorted(os.path.join(out_dir, f)
                   for f in os.listdir(out_dir) if f.endswith(".ttl"))
    back = read_turtle(files).to_pandas()
    assert back["error"].isna().all()
    key = ["s", "p", "o", "o_kind", "o_datatype", "o_lang"]
    orig = pd.DataFrame(rows)[key].fillna("-")
    got = back[key].fillna("-")
    assert (sorted(map(tuple, orig.to_numpy()))
            == sorted(map(tuple, got.to_numpy())))
