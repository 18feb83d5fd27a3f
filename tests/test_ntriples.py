"""N-Triples source/sink (sources/ntriples.py): parse, escapes,
literals, malformed-line keeping, write round-trip."""

import os

import pandas as pd
import ray.data as rd

from gliner_transbronchialbiopsy_ray.sources.ntriples import (
    _escape, _unescape, read_ntriples, write_ntriples,
)

NT = """\
# a comment line

<http://ex/a> <http://ex/knows> <http://ex/b> .
_:b0 <http://ex/knows> _:b1 .
<http://ex/a> <http://ex/name> "Alice \\"A\\"\\nSecond" .
<http://ex/a> <http://ex/age> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://ex/a> <http://ex/label> "bonjour"@fr .
this line is garbage
"""


def _write(tmp_path, text):
    p = os.path.join(str(tmp_path), "in.nt")
    with open(p, "w") as f:
        f.write(text)
    return p


def test_parse_kinds_literals_and_errors(tmp_path):
    out = read_ntriples(_write(tmp_path, NT)).to_pandas()
    ok = out[out["error"].isna()]
    bad = out[out["error"].notna()]
    assert len(ok) == 5 and len(bad) == 1
    assert bad.iloc[0]["error"] == "nt_parse_error"
    rows = {(r.s, r.p): r for r in ok.itertuples()}
    assert rows[("http://ex/a", "http://ex/knows")].o == "http://ex/b"
    assert rows[("http://ex/a", "http://ex/knows")].o_kind == "iri"
    assert rows[("_:b0", "http://ex/knows")].o == "_:b1"
    assert rows[("_:b0", "http://ex/knows")].o_kind == "bnode"
    name = rows[("http://ex/a", "http://ex/name")]
    assert name.o == 'Alice "A"\nSecond' and name.o_kind == "literal"
    age = rows[("http://ex/a", "http://ex/age")]
    assert age.o == "42"
    assert age.o_datatype == "http://www.w3.org/2001/XMLSchema#integer"
    lab = rows[("http://ex/a", "http://ex/label")]
    assert lab.o == "bonjour" and lab.o_lang == "fr"


def test_unescape_escape_inverse():
    for v in ['plain', 'quo"te', 'back\\slash', 'nl\nnl', 'tab\tx',
              'uni€']:
        assert _unescape(_escape(v)) == v
    assert _unescape("\\u20ac") == "€"
    assert _unescape("\\U0001F600") == "\U0001F600"


def test_write_read_roundtrip(tmp_path):
    rows = [
        {"s": "http://ex/a", "p": "http://ex/knows",
         "o": "http://ex/b", "o_kind": "iri",
         "o_datatype": None, "o_lang": None},
        {"s": "_:n1", "p": "http://ex/name",
         "o": 'weird "quote"\nline', "o_kind": "literal",
         "o_datatype": None, "o_lang": None},
        {"s": "http://ex/a", "p": "http://ex/age", "o": "42",
         "o_kind": "literal",
         "o_datatype": "http://www.w3.org/2001/XMLSchema#integer",
         "o_lang": None},
    ]
    out_dir = os.path.join(str(tmp_path), "out")
    manifest = write_ntriples(rd.from_items(rows), out_dir)
    assert manifest["rows"].sum() == 3
    back = read_ntriples(sorted(
        os.path.join(out_dir, f) for f in os.listdir(out_dir)
    )).to_pandas()
    assert back["error"].isna().all()
    key = ["s", "p", "o", "o_kind", "o_datatype", "o_lang"]
    orig = pd.DataFrame(rows)[key].fillna("-")
    got = back[key].fillna("-")
    assert (sorted(map(tuple, orig.to_numpy()))
            == sorted(map(tuple, got.to_numpy())))
