"""Pure-Python PDF fallback extractor (S1, reference
text_processor.py:29-49): fixture PDFs are built programmatically — one
uncompressed, one FlateDecode — and must round-trip their text through
`validate_and_decode` (i.e. S1 is a working source, not a stub)."""

import zlib

import pyarrow as pa

from gliner_transbronchialbiopsy_ray.sources.readers import (
    extract_pdf_text,
    validate_and_decode,
)


def _make_pdf(content: bytes, compress: bool) -> bytes:
    """Minimal single-page PDF with one content stream."""
    if compress:
        data = zlib.compress(content)
        filt = b"/Filter /FlateDecode "
    else:
        data = content
        filt = b""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< " + filt + b"/Length " + str(len(data)).encode() + b" >>\n"
        b"stream\n" + data + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, o in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + o + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs)+1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs)+1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


CONTENT = (
    b"BT /F1 12 Tf 72 720 Td (CONCLUSION :) Tj T* "
    b"(Grade A1 \\(minimal\\) rejection) Tj ET\n"
    b"BT /F1 12 Tf 72 680 Td [(No evidence of) ( chronic rejection)] TJ ET"
)
EXPECTED_LINES = [
    "CONCLUSION :",
    "Grade A1 (minimal) rejection",
    "No evidence of chronic rejection",
]


def test_minimal_extractor_uncompressed():
    txt = extract_pdf_text(_make_pdf(CONTENT, compress=False))
    for line in EXPECTED_LINES:
        assert line in txt
    # Td/T* positioning becomes line breaks
    assert txt.splitlines()[0] == "CONCLUSION :"


def test_minimal_extractor_flate():
    txt = extract_pdf_text(_make_pdf(CONTENT, compress=True))
    for line in EXPECTED_LINES:
        assert line in txt


def test_hex_strings_and_escapes():
    content = (
        b"BT (octal: \\101\\102) Tj T* <48454C4C4F> Tj "
        b"(paren \\( nested (inner) ok) Tj ET"
    )
    txt = extract_pdf_text(_make_pdf(content, compress=False))
    assert "octal: AB" in txt
    assert "HELLO" in txt
    assert "paren ( nested (inner) ok" in txt


def test_validate_and_decode_extracts_pdf_rows():
    """S1 end-to-end: a real fixture PDF produces text (not an error) in
    the validated batch — the VERDICT r1 'done' criterion."""
    pdf = _make_pdf(CONTENT, compress=True)
    batch = pa.table({"path": ["report.pdf"], "bytes": [pdf]})
    out = validate_and_decode(batch)
    assert out.column("error").to_pylist() == [None]
    assert "Grade A1 (minimal) rejection" in out.column("text").to_pylist()[0]
    assert out.column("file_type").to_pylist() == ["pdf"]


def test_image_only_pdf_flagged_no_text():
    """An image-only scan extracts no text; reference parity maps that to
    text=None + pdf_no_text (pdfplumber's ``text.strip() if text else
    None``, text_processor.py:45), not a silently-empty document."""
    pdf = _make_pdf(b"q 612 0 0 792 0 0 cm /Im0 Do Q", compress=False)
    batch = pa.table({"path": ["scan.pdf"], "bytes": [pdf]})
    out = validate_and_decode(batch)
    assert out.column("error").to_pylist() == ["pdf_no_text"]
    assert out.column("text").to_pylist() == [None]


def test_pdf_with_no_text_flagged_not_silently_empty():
    """Reference parity (text_processor.py:45): a PDF whose extraction
    yields nothing maps to text=None + an explicit error flag."""
    t = pa.table({"path": ["x.pdf"],
                  "bytes": [b"%PDF-1.4 garbage no streams"]})
    out = validate_and_decode(t).to_pylist()[0]
    assert out["text"] is None
    assert out["error"] == "pdf_no_text"


def _make_cmap_pdf() -> bytes:
    """Single-page PDF whose /F1 is a glyph-coded (subset-font-style)
    font carrying a /ToUnicode CMap — 2-byte codes, bfchar + both
    bfrange forms — while /F2 stays a plain latin-1 font.  Without CMap
    resolution the F1 bytes decode to control-character garbage."""
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"begincmap\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"2 beginbfchar\n"
        b"<0003> <0047>\n"          # 0003 -> 'G'
        b"<0004> <0072>\n"          # 0004 -> 'r'
        b"endbfchar\n"
        b"2 beginbfrange\n"
        b"<0010> <0012> <0061>\n"   # 0010..0012 -> 'a' 'b' 'c'
        b"<0020> <0021> [<0064> <0065>]\n"  # 0020 'd', 0021 'e'
        b"endbfrange\n"
        b"endcmap\nend\n"
    )
    content = (
        b"BT /F1 12 Tf 72 720 Td <0003 0004 0010 0011 0012> Tj T* "
        b"<00200021> Tj ET\n"
        b"BT /F2 10 Tf 72 680 Td (plain latin) Tj ET"
    )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R /F2 7 0 R "
        b">> >> >>",
        b"<< /Length " + str(len(content)).encode() + b" >>\n"
        b"stream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type0 /BaseFont /ABCDEF+Subset "
        b"/ToUnicode 6 0 R >>",
        b"<< /Length " + str(len(cmap)).encode() + b" >>\n"
        b"stream\n" + cmap + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, o in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + o + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs)+1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs)+1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def test_tounicode_cmap_glyph_codes():
    """Glyph-coded hex strings resolve through the font's ToUnicode
    CMap (bfchar + arithmetic and array bfrange); a plain font in the
    same stream keeps latin-1; codes missing from the map degrade to
    latin-1 bytes instead of dropping the text."""
    txt = extract_pdf_text(_make_cmap_pdf())
    lines = txt.splitlines()
    assert lines[0] == "Grabc"      # bfchar + arithmetic bfrange
    assert lines[1] == "de"         # array bfrange
    assert "plain latin" in txt     # non-CMap font untouched

    # unmapped code: falls back to the raw bytes, text survives
    from gliner_transbronchialbiopsy_ray.sources.readers import (
        _decode_shown,
        _parse_tounicode_cmap,
    )
    code_len, mapping = _parse_tounicode_cmap(
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"1 beginbfchar <0041> <005A> endbfchar")
    assert code_len == 2 and mapping == {0x41: "Z"}
    assert _decode_shown(b"\x00\x41\x00\x42", (code_len, mapping)) == "Z\x00B"


def test_tounicode_cmap_error_paths():
    """A corrupt CMap stream must not kill extraction: the file still
    yields its plain-font text."""
    pdf = _make_cmap_pdf().replace(b"beginbfchar", b"beginbfchXX")
    txt = extract_pdf_text(pdf)
    assert "plain latin" in txt


def _make_objstm_pdf(predictor: bool = False) -> bytes:
    """PDF 1.5-style file: the page tree, font dict (with /ToUnicode)
    and resource dict all live inside a Flate-compressed OBJECT STREAM
    — only the content stream, the CMap stream and the ObjStm itself
    are top-level.  Without ObjStm expansion the font resolution finds
    nothing and the glyph-coded text degrades to control bytes.
    predictor=True additionally runs the ObjStm payload through PNG
    row filtering (/DecodeParms /Predictor 12)."""
    import zlib

    cmap = (
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"2 beginbfchar\n<0001> <0048>\n<0002> <0069>\nendbfchar\n"
    )  # 0001 -> 'H', 0002 -> 'i'
    content = b"BT /F9 12 Tf 72 720 Td <00010002> Tj ET"

    # compressed objects: 1=catalog 2=pages 3=page 5=font
    inner = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F9 5 0 R >> >> >>"),
        (5, b"<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>"),
    ]
    bodies = b" ".join(b for _, b in inner)
    offsets, pos = [], 0
    for num, b in inner:
        offsets.append((num, pos))
        pos += len(b) + 1
    header = " ".join(f"{n} {o}" for n, o in offsets).encode() + b" "
    payload = header + bodies
    first = len(header)
    if predictor:
        cols = 16
        rows = bytearray()
        prev = bytearray(cols)
        padded = payload + bytes(-len(payload) % cols)
        for r in range(0, len(padded), cols):
            row = padded[r:r + cols]
            rows.append(2)  # Up filter
            rows += bytes((row[i] - prev[i]) & 0xFF for i in range(cols))
            prev = row
        stm_raw = zlib.compress(bytes(rows))
        parms = (b" /DecodeParms << /Predictor 12 /Columns 16 >>"
                 b" /Filter /FlateDecode")
    else:
        stm_raw = zlib.compress(payload)
        parms = b" /Filter /FlateDecode"

    objstm = (
        b"<< /Type /ObjStm /N " + str(len(inner)).encode()
        + b" /First " + str(first).encode() + parms
        + b" /Length " + str(len(stm_raw)).encode() + b" >>\n"
        b"stream\n" + stm_raw + b"\nendstream")
    top = [
        (7, objstm),
        (4, b"<< /Length " + str(len(content)).encode() + b" >>\n"
            b"stream\n" + content + b"\nendstream"),
        (6, b"<< /Length " + str(len(cmap)).encode() + b" >>\n"
            b"stream\n" + cmap + b"\nendstream"),
    ]
    out = bytearray(b"%PDF-1.5\n")
    for num, o in top:
        out += f"{num} 0 obj\n".encode() + o + b"\nendobj\n"
    out += b"%%EOF\n"
    return bytes(out)


def test_objstm_font_resolution():
    """Font + resource dicts inside a compressed object stream still
    resolve the ToUnicode CMap (PDF 1.5 ObjStm expansion)."""
    assert extract_pdf_text(_make_objstm_pdf()) == "Hi"


def test_objstm_png_predictor():
    """ObjStm payloads behind /Predictor 12 (PNG Up row filter) decode
    through the predictor-removal path."""
    assert extract_pdf_text(_make_objstm_pdf(predictor=True)) == "Hi"


def test_objstm_malformed_keeps_text():
    """A corrupt ObjStm never takes down extraction — the content
    stream's unmapped codes degrade to latin-1 instead."""
    import re

    pdf = _make_objstm_pdf()
    # corrupt the ObjStm /First offset so header parsing fails
    broken = re.sub(rb"/First \d+", b"/First 999999", pdf)
    txt = extract_pdf_text(broken)
    assert txt == "\x00\x01\x00\x02"  # raw glyph codes, text kept
