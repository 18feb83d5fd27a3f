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
