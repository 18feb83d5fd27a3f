"""N-Quads source/sink (sources/nquads.py): graph-term parse, default
graph, literals, error keeping, round trip."""

import pandas as pd
import ray.data as rd

from gliner_transbronchialbiopsy_ray.sources.nquads import (
    read_nquads, write_nquads)


def test_read_nquads_graphs_literals_errors(tmp_path):
    p = tmp_path / "a.nq"
    p.write_text(
        '<http://e/s1> <http://e/p> <http://e/o1> <http://e/g1> .\n'
        '# comment line\n'
        '<http://e/s2> <http://e/p> "v\\n2"^^<http://e/int> '
        '<http://e/g2> .\n'
        '<http://e/s3> <http://e/p> "hi"@en .\n'          # default graph
        '_:b1 <http://e/p> _:b2 <http://e/g1> .\n'
        'this is garbage\n')
    out = read_nquads(str(p)).to_pandas()
    ok = out[out["error"].isna()].set_index("s")
    assert ok.loc["http://e/s1", "g"] == "http://e/g1"
    assert ok.loc["http://e/s2", "o"] == "v\n2"
    assert ok.loc["http://e/s2", "o_datatype"] == "http://e/int"
    assert ok.loc["http://e/s3", "g"] is None
    assert ok.loc["http://e/s3", "o_lang"] == "en"
    assert ok.loc["_:b1", "o"] == "_:b2"
    bad = out[out["error"].notna()]
    assert list(bad["error"]) == ["nq_parse_error"]


def test_nquads_round_trip(tmp_path):
    rows = [
        {"s": "http://e/s1", "p": "http://e/p", "o": "http://e/o",
         "g": "http://e/g1", "o_kind": "iri",
         "o_datatype": None, "o_lang": None},
        {"s": "http://e/s2", "p": "http://e/p", "o": 'tricky "lit"\n',
         "g": None, "o_kind": "literal",
         "o_datatype": None, "o_lang": "fr"},
    ]
    ds = rd.from_items(rows)
    man = write_nquads(ds, str(tmp_path / "out"))
    assert man["rows"].sum() == 2
    back = (read_nquads(sorted(man["path"])).to_pandas()
            .sort_values("s").reset_index(drop=True))
    assert back["error"].isna().all()
    assert list(back["s"]) == ["http://e/s1", "http://e/s2"]
    assert back.loc[0, "g"] == "http://e/g1"
    assert back.loc[1, "g"] is None
    assert back.loc[1, "o"] == 'tricky "lit"\n'
    assert back.loc[1, "o_lang"] == "fr"
