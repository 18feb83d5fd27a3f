"""Document sources (SURVEY §2.1 S1/S2/S5).

- TXT bytes -> text with the reference's 7-encoding fallback chain
  (text_processor.py:51-68; encodings config.py:93-102), vectorized per
  batch inside `map_batches` (decode is a pure function).
- File validation as a gatekeeper *filter stage* that KEEPS rows and emits
  an `error` column (the reference drops invalid files with a UI warning,
  file_handler.py:45-90; an engine never drops silently).
- PDF extraction uses pdfplumber when importable; without it (this
  sandbox) a pure-Python fallback parses uncompressed/FlateDecode content
  streams and the Tj/TJ/'/" text-showing operators — the common
  digitally-born-report case.  Contract: bytes -> page texts joined by
  newline (text_processor.py:29-49).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..config import ALLOWED_FILE_TYPES, ENCODING_ATTEMPTS, MAX_FILE_SIZE

_PDF_MAGIC = b"%PDF"


def decode_with_fallback(data: bytes) -> tuple[str, str]:
    """Try each encoding in the reference's chain; final fallback decodes
    utf-8 with errors='replace'."""
    for enc in ENCODING_ATTEMPTS:
        try:
            return data.decode(enc), enc
        except (UnicodeDecodeError, LookupError):
            continue
    return data.decode("utf-8", errors="replace"), "utf-8+replace"


def sniff_type(data: bytes, name: str) -> str:
    """Magic-byte + extension sniff (libmagic-lite)."""
    if data[:4] == _PDF_MAGIC:
        return "pdf"
    ext = name.rsplit(".", 1)[-1].lower() if "." in name else ""
    return ext or "unknown"


def extract_pdf_text(data: bytes) -> str:
    """Page-loop text extraction ('\\n'.join of page texts).

    Uses pdfplumber when available (full fidelity, mirrors the reference's
    text_processor.py:29-49 page loop); otherwise falls back to the
    pure-Python extractor below, which handles the common digitally-born
    case (uncompressed / FlateDecode content streams, literal + hex
    strings under Tj/TJ/'/\" operators with simple single-byte fonts).
    Scanned or CID-keyed-font PDFs yield '' under the fallback."""
    try:
        import pdfplumber  # type: ignore
    except ImportError:
        return _extract_pdf_text_minimal(data)
    import io  # pragma: no cover - pdfplumber absent in this sandbox

    with pdfplumber.open(io.BytesIO(data)) as pdf:  # pragma: no cover
        return "\n".join(page.extract_text() or "" for page in pdf.pages)


# ---------------------------------------------------------------------------
# Pure-Python PDF content-stream text extraction (fallback kernel).

_STREAM_RE = None  # compiled lazily (module import stays cheap)


def _pdf_streams(data: bytes):
    """Yield decoded candidate content streams: bytes between stream /
    endstream keywords, zlib-inflated when FlateDecode'd (inflate is tried
    unconditionally; non-Flate binary streams that fail stay raw)."""
    import re
    import zlib

    global _STREAM_RE
    if _STREAM_RE is None:
        _STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
    for m in _STREAM_RE.finditer(data):
        raw = m.group(1)
        try:
            yield zlib.decompress(raw)
        except zlib.error:
            yield raw


def _pdf_literal_string(content: bytes, i: int) -> tuple[bytes, int]:
    """Parse a PDF literal string starting at the '(' at index i; returns
    (decoded bytes, index past the closing ')').  Handles nesting and the
    \\-escapes of the PDF spec (incl. octal and line continuations)."""
    assert content[i : i + 1] == b"("
    out = bytearray()
    depth = 1
    i += 1
    n = len(content)
    esc = {ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
           ord("b"): b"\b", ord("f"): b"\f", ord("("): b"(",
           ord(")"): b")", ord("\\"): b"\\"}
    while i < n and depth:
        c = content[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            c2 = content[i]
            if c2 in esc:
                out += esc[c2]
                i += 1
            elif 0x30 <= c2 <= 0x37:  # octal \ddd (1-3 digits)
                j = i
                while j < min(i + 3, n) and 0x30 <= content[j] <= 0x37:
                    j += 1
                out.append(int(content[i:j], 8) & 0xFF)
                i = j
            elif c2 in (0x0A, 0x0D):  # line continuation
                i += 1
                if c2 == 0x0D and i < n and content[i] == 0x0A:
                    i += 1
            else:  # unknown escape: keep the char
                out.append(c2)
                i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


def _pdf_hex_string(content: bytes, i: int) -> tuple[bytes, int]:
    """Parse <hex...> starting at '<'; odd digit count pads with 0."""
    j = content.find(b">", i)
    if j < 0:
        return b"", len(content)
    hx = bytes(c for c in content[i + 1 : j]
               if c in b"0123456789abcdefABCDEF")
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")), j + 1


_DELIMS = b"()<>[]{}/%"
_WS = b"\x00\t\n\x0c\r "


# --- ToUnicode CMap support (simple subset) --------------------------------
#
# Embedded/subset fonts show GLYPH CODES, not character codes — without the
# font's /ToUnicode CMap the bytes decode to garbage.  The reference gets
# this free via pdfplumber (text_processor.py:29-49); this fallback parses
# the common CMap subset: one codespacerange (code width), bfchar pairs,
# and bfrange in both arithmetic (<lo> <hi> <dst0>) and array
# (<lo> <hi> [<d0> <d1> ...]) forms, destinations UTF-16BE.  Fonts are
# resolved resource-name -> font object -> ToUnicode stream via a flat
# object scan; codes missing from the map fall back to latin-1 so wild
# files degrade instead of dropping text.


def _png_unpredict(data: bytes, columns: int, bpp: int = 1) -> bytes:
    """PNG-predictor (/Predictor >= 10) removal for decoded PDF streams:
    rows of `columns` bytes each prefixed by a filter byte
    (None/Sub/Up/Average/Paeth).  bpp=1 covers the /Colors 1
    /BitsPerComponent 8 case object/xref streams use."""
    row_len = columns + 1
    out = bytearray()
    prev = bytearray(columns)
    for r in range(0, len(data) - (len(data) % row_len), row_len):
        ft = data[r]
        row = bytearray(data[r + 1:r + row_len])
        for i in range(columns):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            if ft == 1:
                row[i] = (row[i] + a) & 0xFF
            elif ft == 2:
                row[i] = (row[i] + b) & 0xFF
            elif ft == 3:
                row[i] = (row[i] + ((a + b) >> 1)) & 0xFF
            elif ft == 4:
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (
                    b if pb_ <= pc_ else c)
                row[i] = (row[i] + pred) & 0xFF
        out += row
        prev = row
    return bytes(out)


def _pdf_objects_ex(data: bytes) -> tuple[dict[int, bytes], list[bytes]]:
    """Flat `N G obj ... endobj` scan expanded with PDF 1.5 OBJECT
    STREAMS -> ({object number: body bytes}, [decoded ObjStm payloads]).

    Compressed objects live inside a stream whose dict carries
    /Type /ObjStm /N n /First f; the decoded payload starts with n
    whitespace-separated (objnum, offset) integer pairs, offsets
    relative to f.  A /Predictor >= 10 DecodeParms (PNG row filters)
    is removed before slicing.  Top-level objects win number clashes
    (a well-formed file has none).  No xref walking — the flat scan
    finds every top-level object, and ObjStm expansion recovers the
    compressed ones the xref table would have pointed into."""
    import re

    objs = {int(m.group(1)): m.group(2)
            for m in re.finditer(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj",
                                 data, re.DOTALL)}
    payloads: list[bytes] = []
    for body in list(objs.values()):
        head = body.split(b"stream", 1)[0]
        if re.search(rb"/Type\s*/ObjStm\b", head) is None:
            continue
        sb = _obj_stream_bytes(body)
        if sb is None:
            continue
        mp = re.search(rb"/Predictor\s+(\d+)", head)
        if mp is not None and int(mp.group(1)) >= 10:
            mc = re.search(rb"/Columns\s+(\d+)", head)
            sb = _png_unpredict(sb, int(mc.group(1)) if mc else 1)
        mn = re.search(rb"/N\s+(\d+)", head)
        mf = re.search(rb"/First\s+(\d+)", head)
        if mn is None or mf is None:
            continue
        count, first = int(mn.group(1)), int(mf.group(1))
        try:
            header = sb[:first].split()
            pairs = [(int(header[k]), int(header[k + 1]))
                     for k in range(0, min(len(header), 2 * count), 2)]
        except (ValueError, IndexError):
            continue
        payloads.append(sb)
        for k, (onum, off) in enumerate(pairs):
            end = (first + pairs[k + 1][1] if k + 1 < len(pairs)
                   else len(sb))
            objs.setdefault(onum, sb[first + off:end])
    return objs, payloads


def _pdf_objects(data: bytes) -> dict[int, bytes]:
    """`N G obj` scan + ObjStm expansion -> {object number: body}."""
    return _pdf_objects_ex(data)[0]


def _obj_stream_bytes(body: bytes) -> bytes | None:
    import re
    import zlib

    m = re.search(rb"stream\r?\n(.*?)endstream", body, re.DOTALL)
    if m is None:
        return None
    raw = m.group(1)
    try:
        return zlib.decompress(raw)
    except zlib.error:
        return raw


def _parse_tounicode_cmap(cm: bytes) -> tuple[int, dict[int, str]]:
    """ToUnicode CMap stream -> (code byte-width, {code: unicode str})."""
    import re

    m = re.search(rb"begincodespacerange\s*<([0-9A-Fa-f]+)>", cm)
    code_len = max(1, len(m.group(1)) // 2) if m else 2

    def dst(h: bytes) -> str:
        b = bytes.fromhex(h.decode("ascii"))
        try:
            return b.decode("utf-16-be")
        except UnicodeDecodeError:
            return b.decode("latin-1")

    mapping: dict[int, str] = {}
    for sec in re.finditer(rb"beginbfchar(.*?)endbfchar", cm, re.DOTALL):
        for pm in re.finditer(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>",
                              sec.group(1)):
            mapping[int(pm.group(1), 16)] = dst(pm.group(2))
    for sec in re.finditer(rb"beginbfrange(.*?)endbfrange", cm, re.DOTALL):
        body = sec.group(1)
        for rm in re.finditer(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*\[(.*?)\]",
                body, re.DOTALL):
            lo, hi = int(rm.group(1), 16), int(rm.group(2), 16)
            dsts = re.findall(rb"<([0-9A-Fa-f]+)>", rm.group(3))
            for code, h in zip(range(lo, hi + 1), dsts):
                mapping[code] = dst(h)
        for rm in re.finditer(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>",
                body):
            lo, hi = int(rm.group(1), 16), int(rm.group(2), 16)
            base = int(rm.group(3), 16)
            width = max(2, len(rm.group(3)) // 2)
            for code in range(lo, min(hi, lo + 0xFFFF) + 1):
                b = (base + code - lo).to_bytes(width, "big")
                try:
                    mapping[code] = b.decode("utf-16-be")
                except UnicodeDecodeError:
                    mapping[code] = b.decode("latin-1")
    return code_len, mapping


def _pdf_font_cmaps(data: bytes) -> dict[str, tuple[int, dict[int, str]]]:
    """{content-stream font resource name (e.g. 'F1'): parsed CMap} for
    every font object that carries a /ToUnicode reference.  Resource
    names are collected from every /Font <<...>> dict in the file —
    including dicts living INSIDE object streams (PDF 1.5 ObjStm, where
    Resources routinely hide); a name bound to different fonts on
    different pages keeps the first CMap-bearing binding (simple-file
    assumption, documented)."""
    import re

    objs, objstm_payloads = _pdf_objects_ex(data)
    cmaps: dict[int, tuple[int, dict[int, str]]] = {}
    for num, body in objs.items():
        head = body.split(b"stream", 1)[0]
        m = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", head)
        if m is None:
            continue
        ubody = objs.get(int(m.group(1)))
        sb = _obj_stream_bytes(ubody) if ubody is not None else None
        if sb is None:
            continue
        try:
            cmaps[num] = _parse_tounicode_cmap(sb)
        except Exception:
            continue
    if not cmaps:
        return {}
    out: dict[str, tuple[int, dict[int, str]]] = {}
    for space in [data, *objstm_payloads]:
        for m in re.finditer(rb"/Font\s*<<(.*?)>>", space, re.DOTALL):
            for em in re.finditer(
                    rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R",
                    m.group(1)):
                name = em.group(1).decode("latin-1")
                fnum = int(em.group(2))
                if fnum in cmaps and name not in out:
                    out[name] = cmaps[fnum]
    return out


def _decode_shown(s: bytes,
                  cmap: tuple[int, dict[int, str]] | None) -> str:
    if cmap is None:
        return s.decode("latin-1")
    code_len, mapping = cmap
    parts = []
    for i in range(0, len(s), code_len):
        chunk = s[i:i + code_len]
        got = mapping.get(int.from_bytes(chunk, "big"))
        parts.append(got if got is not None else chunk.decode("latin-1"))
    return "".join(parts)


def _content_stream_text(
    content: bytes,
    font_cmaps: dict[str, tuple[int, dict[int, str]]] | None = None,
) -> str:
    """Tiny interpreter over a decoded content stream: collect strings and
    emit them when a text-showing operator (Tj, ', \", TJ) consumes them;
    text-positioning ops (Td, TD, T*) and ET become newlines.  The `Tf`
    operator tracks the current font so shown strings decode through its
    ToUnicode CMap when one exists (glyph-coded subset fonts), latin-1
    otherwise."""
    out: list[str] = []
    pending: list[bytes] = []
    last_name: str | None = None
    cur_cmap: tuple[int, dict[int, str]] | None = None
    i, n = 0, len(content)
    while i < n:
        c = content[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # % comment
            j = content.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c == 0x28:  # ( literal string
            s, i = _pdf_literal_string(content, i)
            pending.append(s)
        elif c == 0x3C:  # < hex string or << dict
            if content[i : i + 2] == b"<<":
                i += 2
            else:
                s, i = _pdf_hex_string(content, i)
                pending.append(s)
        elif c in _DELIMS:  # [, ], >, /name, {, }
            if c == 0x2F:  # /Name token
                i += 1
                j = i
                while j < n and content[j] not in _WS and content[j] not in _DELIMS:
                    j += 1
                last_name = content[i:j].decode("latin-1")
                i = j
            else:
                i += 1
        else:  # number or operator token
            j = i
            while j < n and content[j] not in _WS and content[j] not in _DELIMS:
                j += 1
            tok = content[i:j]
            i = j
            if tok in (b"Tj", b"'", b'"', b"TJ"):
                for s in pending:
                    out.append(_decode_shown(s, cur_cmap))
                pending.clear()
                if tok in (b"'", b'"'):
                    out.append("\n")
            elif tok == b"Tf":
                cur_cmap = (font_cmaps or {}).get(last_name or "")
            elif tok in (b"Td", b"TD", b"T*", b"ET"):
                pending.clear()
                if out and not out[-1].endswith("\n"):
                    out.append("\n")
            elif tok in (b"BT",):
                pending.clear()
    return "".join(out)


def _extract_pdf_text_minimal(data: bytes) -> str:
    """Pure-Python fallback: text of every content stream containing a
    BT/ET text block, file order, pages joined by newline; glyph-coded
    strings resolve through their font's ToUnicode CMap when present."""
    try:
        font_cmaps = _pdf_font_cmaps(data)
    except Exception:
        font_cmaps = {}
    pages = []
    for stream in _pdf_streams(data):
        if b"BT" not in stream:
            continue  # font programs / images / xref streams
        txt = _content_stream_text(stream, font_cmaps).strip("\n")
        if txt:
            pages.append(txt)
    return "\n".join(pages)


def validate_and_decode(batch: pa.Table) -> pa.Table:
    """(path, bytes) -> + (file_type, error, text, encoding).

    Validation: size <= 10 MB, allowed type {pdf, txt}; rows are kept with
    an error string rather than dropped."""
    paths = batch.column("path").to_pylist()
    blobs = batch.column("bytes").to_pylist()
    types, errors, texts, encodings = [], [], [], []
    for p, b in zip(paths, blobs):
        b = b or b""
        t = sniff_type(b, p)
        types.append(t)
        if len(b) > MAX_FILE_SIZE:
            errors.append(f"file_too_large:{len(b)}")
            texts.append(None)
            encodings.append(None)
            continue
        if t not in ALLOWED_FILE_TYPES:
            errors.append(f"unsupported_type:{t}")
            texts.append(None)
            encodings.append(None)
            continue
        if t == "pdf":
            try:
                txt = extract_pdf_text(b)
            except Exception as e:  # malformed file: keep row + error
                texts.append(None)
                encodings.append(None)
                errors.append(f"pdf_extract_failed:{type(e).__name__}")
                continue
            if txt:
                texts.append(txt)
                encodings.append("pdf")
                errors.append(None)
            else:
                # reference parity (text_processor.py:45): empty extraction
                # -> None, flagged — a garbage/imageless PDF is not a
                # silently-empty document
                texts.append(None)
                encodings.append(None)
                errors.append("pdf_no_text")
            continue
        txt, enc = decode_with_fallback(b)
        texts.append(txt)
        encodings.append(enc)
        errors.append(None)
    return (
        batch.append_column("file_type", pa.array(types, type=pa.string()))
        .append_column("error", pa.array(errors, type=pa.string()))
        .append_column("text", pa.array(texts, type=pa.string()))
        .append_column("encoding", pa.array(encodings, type=pa.string()))
    )


def read_text_documents(paths: str | list[str]) -> ray.data.Dataset:
    """Binary-file source -> validated, decoded document rows
    (doc_id = file path)."""
    ds = ray.data.read_binary_files(paths, include_paths=True)
    out = ds.map_batches(validate_and_decode, batch_format="pyarrow")
    out = out.drop_columns(["bytes"])
    return out.rename_columns({"path": "doc_id"})
