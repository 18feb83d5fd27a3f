"""Minimal pure-stdlib XLSX read/write (SURVEY §2.1 S3, §2.1 K2).

The reference ingests gold annotations with `pd.read_excel`
(json_convertissor.py:40) and exports styled results via xlsxwriter
(dashboard_v1.py:487-519).  Neither openpyxl nor xlsxwriter exists in this
sandbox, but XLSX is a zip of XML — the subset those flows need (one
worksheet, header row + typed cells: shared/inline strings, numbers,
blanks) parses and writes with `zipfile` + `xml.etree` alone.

Reader semantics: first row = column names; missing cells -> None; numeric
cells -> float (int when integral), matching pandas' read_excel defaults
closely enough for the annotation ETL.  The sink replicates the reference
export's styling (K2, dashboard_v1.py:497-515): bold/wrapped/top-aligned
header with the #D9EAD3 fill and thin borders, plus auto-sized columns —
via a minimal styles.xml, still pure stdlib.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

import pandas as pd
import pyarrow as pa
import ray.data

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(letters: str) -> int:
    i = 0
    for ch in letters:
        i = i * 26 + (ord(ch) - 64)
    return i - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    out = []
    for si in root.findall(f"{_NS}si"):
        # plain <t> or rich-text runs <r><t>
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _cell_value(c, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        return "".join(tt.text or "" for tt in c.iter(f"{_NS}t"))
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "str":
        return v.text
    if t == "b":
        return bool(int(v.text))
    num = float(v.text)
    return int(num) if num.is_integer() else num


def read_xlsx_rows(path: str) -> list[dict]:
    """First sheet -> list of {header: value} dicts (header = row 1)."""
    with zipfile.ZipFile(path) as zf:
        shared = _shared_strings(zf)
        sheet_names = sorted(
            n for n in zf.namelist()
            if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        if not sheet_names:
            raise ValueError(f"no worksheet in {path}")
        root = ET.fromstring(zf.read(sheet_names[0]))
    rows: list[dict[int, object]] = []
    for row_el in root.iter(f"{_NS}row"):
        cells: dict[int, object] = {}
        for c in row_el.findall(f"{_NS}c"):
            ref = c.get("r", "")
            m = _CELL_REF.fullmatch(ref)
            if not m:
                continue
            cells[_col_index(m.group(1))] = _cell_value(c, shared)
        rows.append(cells)
    if not rows:
        return []
    header = rows[0]
    ncols = max(header) + 1 if header else 0
    names = [str(header.get(i, f"col{i}")) for i in range(ncols)]
    return [
        {names[i]: r.get(i) for i in range(ncols)}
        for r in rows[1:]
    ]


def read_xlsx_dataset(path: str) -> ray.data.Dataset:
    """Annotation-sheet source (S3): one small gold file -> Dataset.
    The file is a SMALL side input (gold annotations, not corpus data) —
    a driver-side parse feeding `from_items` is the right scale shape;
    the heavy ETL (tokenize/align) runs distributed downstream."""
    rows = read_xlsx_rows(path)
    if not rows:
        return ray.data.from_items([])
    return ray.data.from_items(rows)


def _sheet_xml(df: pd.DataFrame, styled: bool = False) -> str:
    hdr_s = ' s="1"' if styled else ""

    def cell(ref: str, v, style: str = "") -> str:
        if v is None or (isinstance(v, float) and v != v):  # NaN
            return f'<c r="{ref}"{style}/>' if style else ""
        if isinstance(v, bool):
            return f'<c r="{ref}"{style} t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"{style}><v>{v}</v></c>'
        return (
            f'<c r="{ref}"{style} t="inlineStr"><is><t xml:space="preserve">'
            f"{escape(str(v))}</t></is></c>"
        )

    def col_letter(i: int) -> str:
        s = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            s = chr(65 + r) + s
        return s

    lines = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             '<worksheet xmlns="http://schemas.openxmlformats.org/'
             'spreadsheetml/2006/main">']
    if styled:
        # auto-sized columns, reference dashboard_v1.py:509-515 semantics:
        # width = max cell/header string length + 2 (capped — a 10k-char
        # document cell should not produce a 10k-wide column)
        widths = []
        for j, c in enumerate(df.columns):
            w = len(str(c))
            if len(df):
                w = max(w, int(df[c].astype(str).str.len().max()))
            widths.append(min(w + 2, 80))
        lines.append("<cols>" + "".join(
            f'<col min="{j + 1}" max="{j + 1}" width="{w}" customWidth="1"/>'
            for j, w in enumerate(widths)) + "</cols>")
    lines.append("<sheetData>")
    header = '<row r="1">' + "".join(
        cell(f"{col_letter(j)}1", str(c), hdr_s) for j, c in enumerate(df.columns)
    ) + "</row>"
    lines.append(header)
    for i, row in enumerate(df.itertuples(index=False), start=2):
        lines.append(
            f'<row r="{i}">'
            + "".join(cell(f"{col_letter(j)}{i}", v) for j, v in enumerate(row))
            + "</row>"
        )
    lines.append("</sheetData></worksheet>")
    return "".join(lines)


# minimal stylesheet replicating the reference export's header format
# (dashboard_v1.py:497-504: bold, wrapped, top-aligned, #D9EAD3 fill,
# thin border).  fill 0/1 are the spec-mandated none/gray125 slots;
# cellXfs 0 = default, 1 = header.
_STYLES_XML = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
    '<fonts count="2"><font/><font><b/></font></fonts>'
    '<fills count="3">'
    '<fill><patternFill patternType="none"/></fill>'
    '<fill><patternFill patternType="gray125"/></fill>'
    '<fill><patternFill patternType="solid"><fgColor rgb="FFD9EAD3"/>'
    '<bgColor indexed="64"/></patternFill></fill>'
    "</fills>"
    '<borders count="2"><border/>'
    '<border><left style="thin"/><right style="thin"/>'
    '<top style="thin"/><bottom style="thin"/></border></borders>'
    '<cellStyleXfs count="1"><xf/></cellStyleXfs>'
    '<cellXfs count="2"><xf/>'
    '<xf fontId="1" fillId="2" borderId="1" applyFont="1" applyFill="1" '
    'applyBorder="1" applyAlignment="1">'
    '<alignment vertical="top" wrapText="1"/></xf></cellXfs>'
    "</styleSheet>"
)


def write_xlsx(df: pd.DataFrame, path: str, sheet_name: str = "Résultats",
               styled: bool = True) -> str:
    """Results sink (K2): one-sheet workbook; `styled` (default) applies
    the reference export's presentation — bold/wrapped/filled header row
    with thin borders and auto-sized columns."""
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        + ('<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
           if styled else "")
        + "</Types>"
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{escape(sheet_name)}" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        + ('<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>'
           if styled else "")
        + "</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        if styled:
            zf.writestr("xl/styles.xml", _STYLES_XML)
        zf.writestr("xl/worksheets/sheet1.xml", _sheet_xml(df, styled=styled))
    return path


def results_to_xlsx(ds: ray.data.Dataset, path: str,
                    sheet_name: str = "Résultats") -> str:
    """K2 sink: a RESULTS dataset (bounded presentation output — per-doc
    summary rows, not corpus-scale data) -> one workbook."""
    return write_xlsx(ds.to_pandas(), path, sheet_name=sheet_name)
