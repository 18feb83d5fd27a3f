"""WARC / WET ingest (the Common Crawl container every large-scale
text pipeline reads) — pure stdlib, no warcio.

WARC/1.0 per the public ISO 28500 spec: each record is a version line,
CRLF-separated named headers (WARC-Type, WARC-Target-URI, WARC-Date,
Content-Length, ...), a blank line, `Content-Length` bytes of block,
and a CRLF CRLF trailer.  WET files are WARC files whose `conversion`
records carry extracted plain text (the leading `warcinfo` record is
file metadata).  `.warc.gz`/`.wet.gz` files are CONCATENATED gzip
members (commonly one member per record, the layout that makes range
reads possible) — the decompressor loops zlib members.

Design mirrors sources/readers.py: parsing is a pure function applied
inside `map_batches` over `read_binary_files` rows; malformed records
become rows with the `error` column set (never a silent drop), and a
truncated tail stops the scan with a per-FILE error row so partial
fetches surface.
"""

from __future__ import annotations

import zlib

import pandas as pd
import pyarrow as pa
import ray.data

_GZ_MAGIC = b"\x1f\x8b"
_BZ2_MAGIC = b"BZh"
_XZ_MAGIC = b"\xfd7zXZ\x00"


def decompress_payload(data: bytes) -> bytes:
    """Transparent decompression by magic: gzip (member-concatenated),
    bz2, xz/lzma — the three stdlib codecs crawl dumps actually ship
    in (.warc.gz, wiki .bz2, .xz).  Plain data passes through.
    Raises ValueError on corrupt streams."""
    if data[:2] == _GZ_MAGIC:
        return gunzip_members(data)
    if data[:3] == _BZ2_MAGIC:
        import bz2
        try:
            return bz2.decompress(data)
        except (OSError, ValueError) as exc:
            raise ValueError(f"warc: bad bz2 stream: {exc}")
    if data[:6] == _XZ_MAGIC:
        import lzma
        try:
            return lzma.decompress(data)
        except lzma.LZMAError as exc:
            raise ValueError(f"warc: bad xz stream: {exc}")
    return data


def gunzip_members(data: bytes) -> bytes:
    """Decompress a stream of CONCATENATED gzip members (the .warc.gz
    layout).  Raises ValueError on corrupt data."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)  # gzip wrapper
        try:
            out.append(d.decompress(data[pos:]))
        except zlib.error as exc:
            raise ValueError(f"warc: bad gzip member: {exc}")
        if not d.eof:
            raise ValueError("warc: truncated gzip member")
        consumed = n - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return b"".join(out)


def parse_warc(payload: bytes) -> list[dict]:
    """WARC bytes -> record dicts (warc_type, url, date, text, error).

    Decodes gzip (member-concatenated) transparently.  Block text
    decodes as utf-8 with replacement (WET blocks are declared utf-8).
    A malformed record appends ONE error row and stops (framing is
    lost beyond a bad Content-Length)."""
    rows: list[dict] = []
    if payload is None:
        return [{"warc_type": None, "url": None, "date": None,
                 "text": None, "error": "warc: empty payload"}]
    try:
        payload = decompress_payload(payload)
    except ValueError as exc:
        return [{"warc_type": None, "url": None, "date": None,
                 "text": None, "error": str(exc)}]
    pos = 0
    n = len(payload)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and payload[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = payload.find(b"\r\n\r\n", pos)
        if head_end < 0:
            rows.append({"warc_type": None, "url": None, "date": None,
                         "text": None,
                         "error": "warc: truncated record header"})
            break
        head_lines = payload[pos:head_end].split(b"\r\n")
        version = head_lines[0].strip()
        if not version.startswith(b"WARC/"):
            rows.append({"warc_type": None, "url": None, "date": None,
                         "text": None,
                         "error": f"warc: bad version line "
                                  f"{version[:20]!r}"})
            break
        headers: dict[str, str] = {}
        for line in head_lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.decode("latin-1").strip().lower()] = \
                v.decode("latin-1").strip()
        try:
            clen = int(headers["content-length"])
            if clen < 0:
                raise ValueError
        except (KeyError, ValueError):
            rows.append({"warc_type": headers.get("warc-type"),
                         "url": headers.get("warc-target-uri"),
                         "date": headers.get("warc-date"),
                         "text": None,
                         "error": "warc: missing/bad Content-Length"})
            break
        block_start = head_end + 4
        if block_start + clen > n:
            rows.append({"warc_type": headers.get("warc-type"),
                         "url": headers.get("warc-target-uri"),
                         "date": headers.get("warc-date"),
                         "text": None,
                         "error": "warc: truncated record block"})
            break
        block = payload[block_start:block_start + clen]
        rows.append({
            "warc_type": headers.get("warc-type"),
            "url": headers.get("warc-target-uri"),
            "date": headers.get("warc-date"),
            "text": block.decode("utf-8", errors="replace"),
            "error": None,
        })
        pos = block_start + clen
    return rows


def read_wet_documents(
    paths: str | list[str],
    keep_types: tuple = ("conversion",),
) -> ray.data.Dataset:
    """WET/WARC files -> one row per text record:
    (doc_id = path#index, url, date, text, error).  `warcinfo` and
    other non-`keep_types` records are dropped (they are file
    metadata, not documents); error rows are always kept."""

    def explode(batch: pa.Table) -> pd.DataFrame:
        out = {"doc_id": [], "url": [], "date": [], "text": [],
               "error": []}
        for path, data in zip(batch.column("path").to_pylist(),
                              batch.column("bytes").to_pylist()):
            for i, r in enumerate(parse_warc(data)):
                if r["error"] is None and \
                        r["warc_type"] not in keep_types:
                    continue
                out["doc_id"].append(f"{path}#{i}")
                out["url"].append(r["url"])
                out["date"].append(r["date"])
                out["text"].append(r["text"])
                out["error"].append(r["error"])
        return pd.DataFrame(out)

    ds = ray.data.read_binary_files(paths, include_paths=True)
    return ds.map_batches(explode, batch_format="pyarrow")


def build_wet_bytes(records: list[dict], gzip_members: bool = False,
                    info: str = "synthetic-wet") -> bytes:
    """Fixture/sink writer: records [{url, date, text}] -> WET bytes
    (leading warcinfo record + one conversion record each), optionally
    as one gzip member PER RECORD (the .wet.gz layout)."""

    def record(rtype: str, headers: list[tuple[str, str]],
               block: bytes) -> bytes:
        head = [b"WARC/1.0", f"WARC-Type: {rtype}".encode()]
        for k, v in headers:
            head.append(f"{k}: {v}".encode())
        head.append(f"Content-Length: {len(block)}".encode())
        return b"\r\n".join(head) + b"\r\n\r\n" + block + b"\r\n\r\n"

    chunks = [record("warcinfo", [("WARC-Filename", info)],
                     f"software: {info}\r\n".encode())]
    for r in records:
        chunks.append(record(
            "conversion",
            [("WARC-Target-URI", r["url"]),
             ("WARC-Date", r["date"])],
            (r["text"] or "").encode("utf-8")))
    if gzip_members:
        import gzip as _gzip
        return b"".join(_gzip.compress(c) for c in chunks)
    return b"".join(chunks)
