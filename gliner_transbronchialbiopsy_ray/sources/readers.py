"""Document sources (SURVEY §2.1 S1/S2/S5).

- TXT bytes -> text with the reference's 7-encoding fallback chain
  (text_processor.py:51-68; encodings config.py:93-102), vectorized per
  batch inside `map_batches` (decode is a pure function).
- File validation as a gatekeeper *filter stage* that KEEPS rows and emits
  an `error` column (the reference drops invalid files with a UI warning,
  file_handler.py:45-90; an engine never drops silently).
- PDF extraction is import-gated (pdfplumber is not in this sandbox): the
  stage contract (bytes -> page texts joined by newline) is real, the
  kernel raises NotImplementedError without the library.
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


def extract_pdf_text(data: bytes) -> str:  # pragma: no cover - no pdfplumber
    """Page-loop text extraction ('\\n'.join of page texts).  Import-gated."""
    try:
        import pdfplumber  # type: ignore
    except ImportError as e:
        raise NotImplementedError(
            "PDF extraction requires pdfplumber; not available in this sandbox"
        ) from e
    import io

    with pdfplumber.open(io.BytesIO(data)) as pdf:
        return "\n".join(page.extract_text() or "" for page in pdf.pages)


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
                texts.append(extract_pdf_text(b))
                encodings.append("pdf")
                errors.append(None)
            except NotImplementedError:
                texts.append(None)
                encodings.append(None)
                errors.append("pdf_backend_unavailable")
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
