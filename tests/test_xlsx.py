"""Pure-stdlib XLSX source/sink (S3/K2, reference json_convertissor.py:40
and dashboard_v1.py:487-519): round-trip, sharedStrings fixture, and the
full S3 path (annotation sheet -> Dataset -> training records)."""

import zipfile

import pandas as pd
import ray.data

from gliner_transbronchialbiopsy_ray.functions.annotation import (
    annotations_to_records,
)
from gliner_transbronchialbiopsy_ray.sources.xlsx import (
    read_xlsx_dataset,
    read_xlsx_rows,
    results_to_xlsx,
    write_xlsx,
)


def test_write_read_roundtrip(tmp_path):
    df = pd.DataFrame({
        "name": ["alice", "bob", None],
        "n": [1, 2, 3],
        "score": [0.5, 1.25, -3.0],
        "note": ["é & <xml>", "", "plain"],
    })
    p = str(tmp_path / "t.xlsx")
    write_xlsx(df, p)
    rows = read_xlsx_rows(p)
    assert [r["name"] for r in rows] == ["alice", "bob", None]
    assert [r["n"] for r in rows] == [1, 2, 3]
    assert [r["score"] for r in rows] == [0.5, 1.25, -3]
    assert rows[0]["note"] == "é & <xml>"  # escaping survives


def test_styled_workbook(tmp_path):
    """K2 styling (reference dashboard_v1.py:497-515): header cells carry
    the style-1 xf (bold / wrapped / #D9EAD3 fill / thin border), columns
    are auto-sized, every part is well-formed XML, and the styled file
    round-trips through the reader identically to the unstyled one."""
    import zipfile
    from xml.etree import ElementTree as ET

    df = pd.DataFrame({"doc_id": [1, 2], "label": ["Grade A", None],
                       "score": [0.5, 2]})
    ps = str(tmp_path / "styled.xlsx")
    pu = str(tmp_path / "plain.xlsx")
    write_xlsx(df, ps)                  # styled is the default
    write_xlsx(df, pu, styled=False)
    with zipfile.ZipFile(ps) as zf:
        for n in zf.namelist():
            ET.fromstring(zf.read(n))   # every part well-formed
        assert "xl/styles.xml" in zf.namelist()
        styles = zf.read("xl/styles.xml").decode()
        assert "D9EAD3" in styles and "<b/>" in styles and "wrapText" in styles
        sheet = zf.read("xl/worksheets/sheet1.xml").decode()
        # all 3 header cells styled; data cells not
        assert sheet.count('s="1"') == 3
        assert "<cols>" in sheet and 'customWidth="1"' in sheet
    with zipfile.ZipFile(pu) as zf:
        assert "xl/styles.xml" not in zf.namelist()
        assert 's="1"' not in zf.read("xl/worksheets/sheet1.xml").decode()
    assert read_xlsx_rows(ps) == read_xlsx_rows(pu)


def test_shared_strings_fixture(tmp_path):
    """Reader handles the sharedStrings encoding real writers emit (our
    own writer uses inlineStr, so this path needs its own fixture)."""
    p = str(tmp_path / "ss.xlsx")
    sheet = (
        '<?xml version="1.0"?><worksheet xmlns="http://schemas.openxml'
        'formats.org/spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>7</v></c></row>'
        '<row r="3"><c r="B3"><v>8.5</v></c></row>'  # A3 missing -> None
        "</sheetData></worksheet>"
    )
    ss = (
        '<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats'
        '.org/spreadsheetml/2006/main" count="3" uniqueCount="3">'
        "<si><t>text</t></si><si><t>grade_a</t></si>"
        "<si><r><t>rich </t></r><r><t>runs</t></r></si></sst>"
    )
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
        zf.writestr("xl/sharedStrings.xml", ss)
    rows = read_xlsx_rows(p)
    assert rows == [
        {"text": "rich runs", "grade_a": 7},
        {"text": None, "grade_a": 8.5},
    ]


def test_s3_annotation_sheet_to_training_records(tmp_path):
    """End-to-end S3: wide gold sheet -> Dataset -> tokenized records."""
    df = pd.DataFrame({
        "text": ["Grade A2 rejection seen.", "No rejection."],
        "Grade A": ["A2", None],
    })
    p = str(tmp_path / "gold.xlsx")
    write_xlsx(df, p)
    ds = read_xlsx_dataset(p)
    recs = ds.map_batches(annotations_to_records, batch_format="pyarrow")
    out = sorted(recs.take_all(),
                 key=lambda r: list(r["tokenized_text"])[0])
    assert len(out) == 2
    toks = list(out[0]["tokenized_text"])
    assert toks[:2] == ["Grade", "A2"]
    ner = list(out[0]["ner"])
    assert any(sp["label"] == "grade_a" for sp in ner)
    assert list(out[1]["ner"]) == []


def test_results_sink(tmp_path):
    ds = ray.data.from_pandas(pd.DataFrame({"doc": ["d1"], "grade_a": ["A2"]}))
    p = results_to_xlsx(ds, str(tmp_path / "out.xlsx"))
    rows = read_xlsx_rows(p)
    assert rows == [{"doc": "d1", "grade_a": "A2"}]
    # the workbook is a well-formed zip with the parts a reader needs
    with zipfile.ZipFile(p) as zf:
        names = set(zf.namelist())
    assert {"[Content_Types].xml", "xl/workbook.xml",
            "xl/worksheets/sheet1.xml"} <= names
