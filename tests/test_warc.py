"""WARC/WET ingest: record framing, gzip-member concatenation, error
rows (never drops), Ray source end to end."""
import gzip

import numpy as np
import pytest
import ray.data

from gliner_transbronchialbiopsy_ray.sources.warc import (
    build_wet_bytes, gunzip_members, parse_warc, read_wet_documents,
)

RECS = [
    {"url": "http://ex/a", "date": "2026-01-01T00:00:00Z",
     "text": "hello world"},
    {"url": "http://ex/b", "date": "2026-01-02T00:00:00Z",
     "text": "café résumé\nsecond line"},
    {"url": "http://ex/c", "date": "2026-01-03T00:00:00Z", "text": ""},
]


def test_parse_warc_plain_and_gz():
    for gz in (False, True):
        data = build_wet_bytes(RECS, gzip_members=gz)
        rows = parse_warc(data)
        assert [r["warc_type"] for r in rows] == \
            ["warcinfo"] + ["conversion"] * 3
        assert all(r["error"] is None for r in rows)
        assert [r["text"] for r in rows[1:]] == [r["text"] for r in RECS]
        assert [r["url"] for r in rows[1:]] == [r["url"] for r in RECS]


def test_parse_warc_error_rows():
    data = build_wet_bytes(RECS)
    # truncated block: one error row, scan stops
    rows = parse_warc(data[:len(data) - 30])
    assert rows[-1]["error"] is not None
    assert all(r["error"] is None for r in rows[:-1])
    # bad version line
    assert parse_warc(b"HTTP/1.1 200\r\n\r\n")[0]["error"].startswith(
        "warc: bad version")
    # missing content-length
    bad = b"WARC/1.0\r\nWARC-Type: conversion\r\n\r\nxx\r\n\r\n"
    assert "Content-Length" in parse_warc(bad)[0]["error"]
    # corrupt gzip
    gz = build_wet_bytes(RECS, gzip_members=True)
    assert parse_warc(gz[:10])[0]["error"].startswith("warc:")
    # empty
    assert parse_warc(None)[0]["error"]


def test_gunzip_members_concatenated():
    members = [gzip.compress(bytes([i]) * 100) for i in range(5)]
    assert gunzip_members(b"".join(members)) == b"".join(
        bytes([i]) * 100 for i in range(5))
    with pytest.raises(ValueError):
        gunzip_members(b"".join(members)[:-8])


def test_read_wet_documents_end_to_end(ray_session, tmp_path):
    (tmp_path / "a.wet").write_bytes(build_wet_bytes(RECS))
    (tmp_path / "b.wet.gz").write_bytes(
        build_wet_bytes(RECS[:1], gzip_members=True))
    (tmp_path / "c.wet").write_bytes(b"garbage not warc")
    out = (read_wet_documents(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # a.wet: 3 conversions (warcinfo dropped); b: 1; c: 1 error row
    ok = out[out["error"].isnull()]
    assert len(ok) == 4
    assert set(ok["url"]) == {"http://ex/a", "http://ex/b", "http://ex/c"}
    errs = out[out["error"].notnull()]
    assert len(errs) == 1 and errs.iloc[0]["doc_id"].endswith("c.wet#0")
    texts = ok[ok["url"] == "http://ex/b"]["text"]
    assert list(texts) == ["café résumé\nsecond line"]


def test_normalize_url_rules():
    from gliner_transbronchialbiopsy_ray.stages.urls import normalize_url

    n, d = normalize_url(
        "HTTPS://Shop3.Example.COM:443/item/7?utm_source=m&id=2&ref=x#s")
    assert n == "https://shop3.example.com/item/7?id=2"
    assert d == "example.com"
    # default port 80, empty path, param sorting
    n, d = normalize_url("http://A.B.org:80?b=2&a=1")
    assert n == "http://a.b.org/?a=1&b=2"
    assert d == "b.org"
    # non-default port survives; single-label host
    n, d = normalize_url("http://localhost:8080/x")
    assert n == "http://localhost:8080/x" and d == "localhost"
    # unparseable -> (None, None), rows kept by callers
    assert normalize_url("not a url") == (None, None)
    assert normalize_url(None) == (None, None)
    assert normalize_url("ftp:/missing-slashes") == (None, None)


def test_url_dedup_stats_counts(ray_session):
    import ray.data as rd

    from gliner_transbronchialbiopsy_ray.stages.urls import (
        url_dedup_stats,
    )

    rows = [
        {"url": "http://a.com/x?utm_source=1"},
        {"url": "HTTP://A.com/x"},            # same canonical as above
        {"url": "http://a.com/y"},
        {"url": "https://b.net:443/"},
        {"url": "https://b.net/"},            # same canonical
    ]
    for parts in (1, 3):
        out = (url_dedup_stats(rd.from_items(rows).repartition(parts))
               .to_pandas().sort_values("domain").reset_index(drop=True))
        assert list(out["domain"]) == ["a.com", "b.net"]
        assert list(out["n_rows"]) == [3, 2]
        assert list(out["n_unique"]) == [2, 1]


def test_parse_warc_bz2_and_xz():
    import bz2
    import lzma

    data = build_wet_bytes(RECS)
    for blob in (bz2.compress(data), lzma.compress(data)):
        rows = parse_warc(blob)
        assert [r["text"] for r in rows[1:]] == [r["text"] for r in RECS]
        assert all(r["error"] is None for r in rows)
    assert parse_warc(b"BZh9garbage")[0]["error"].startswith("warc:")
    assert parse_warc(b"\xfd7zXZ\x00junk")[0]["error"].startswith("warc:")
