"""PII redaction (stages/redact.py) and chunk-level dedup rewrite
(substring.dedup_rewrite_docs): planted fixtures with known outcomes."""

import hashlib

import pandas as pd
import ray.data

from gliner_transbronchialbiopsy_ray.stages.redact import (
    DEFAULT_PII_PATTERNS,
    redact_text,
)
from gliner_transbronchialbiopsy_ray.stages.substring import (
    dedup_rewrite_docs,
)


def test_redact_default_pii_patterns():
    docs = ray.data.from_items([
        {"doc_id": 1, "text": "mail bob@example.com or 555-123-4567 now"},
        {"doc_id": 2, "text": "server 10.0.0.1 ssn 123-45-6789 end"},
        {"doc_id": 3, "text": "nothing sensitive here"},
    ])
    out = (redact_text(docs, digest=False).to_pandas()
           .set_index("doc_id").sort_index())
    assert out.loc[1, "redacted_text"] == "mail [EMAIL] or [PHONE] now"
    assert out.loc[2, "redacted_text"] == "server [IP] ssn [SSN] end"
    assert out.loc[3, "redacted_text"] == "nothing sensitive here"
    assert out["n_redactions"].tolist() == [2, 2, 0]
    assert str(out["n_redactions"].dtype) == "int64"


def test_redact_sequential_pattern_semantics_and_digest():
    # pattern 2 runs on pattern 1's OUTPUT: 'aa'->'b' first creates a new
    # 'b' that pattern 2 ('b'->'c') then also rewrites and counts
    docs = ray.data.from_items([{"doc_id": 1, "text": "aa b"}])
    out = redact_text(docs, patterns=[("aa", "b"), ("b", "c")],
                      digest=False).to_pandas()
    assert out["redacted_text"].iloc[0] == "c c"
    assert out["n_redactions"].iloc[0] == 3  # 1x aa + 2x b
    dig = redact_text(docs, patterns=[("aa", "b"), ("b", "c")]).to_pandas()
    assert dig["redacted_md5"].iloc[0] == hashlib.md5(b"c c").hexdigest()
    assert "redacted_text" not in dig.columns


BLOCK = "L" * 10 + "COMMON-LICENSE-HEADER-BLOCK-40-CHARS" "XY"  # 48 chars
CHUNK = BLOCK[:40]


def test_dedup_rewrite_removes_non_canonical_occurrences():
    assert len(CHUNK) == 40
    docs = ray.data.from_items([
        {"doc_id": 1, "text": CHUNK + "tail-one"},
        {"doc_id": 2, "text": CHUNK + "tail-two"},
        {"doc_id": 3, "text": "x" * 40 + "zz"},
    ])
    out = (dedup_rewrite_docs(docs, window=40, digest=False).to_pandas()
           .set_index("doc_id").sort_index())
    # doc 1 holds the canonical occurrence (min doc_id), keeps everything
    assert out.loc[1, "new_text"] == CHUNK + "tail-one"
    assert out.loc[1, "n_removed"] == 0
    # doc 2's copy is removed; its tail survives
    assert out.loc[2, "new_text"] == "tail-two"
    assert out.loc[2, "n_removed"] == 1
    # unique chunk untouched
    assert out.loc[3, "new_text"] == "x" * 40 + "zz"
    assert out.loc[3, "n_removed"] == 0
    assert str(out["n_removed"].dtype) == "int64"
    assert str(out["new_len"].dtype) == "int64"
    assert out.loc[2, "new_len"] == len("tail-two")


def test_dedup_rewrite_in_doc_repeats_and_short_docs():
    docs = ray.data.from_items([
        # 3 identical tiling chunks IN ONE DOC: keep offset 0, remove 2
        {"doc_id": 5, "text": "ab" * 60},  # 120 chars = 3x 40-char chunk
        {"doc_id": 6, "text": "short doc"},  # < window: tail only
        {"doc_id": 7, "text": ""},  # empty: still one output row
    ])
    out = (dedup_rewrite_docs(docs, window=40, digest=False).to_pandas()
           .set_index("doc_id").sort_index())
    assert out.loc[5, "new_text"] == "ab" * 20
    assert out.loc[5, "n_removed"] == 2
    assert out.loc[6, "new_text"] == "short doc"
    assert out.loc[6, "n_removed"] == 0
    assert out.loc[7, "new_text"] == ""
    assert len(out) == 3


def test_dedup_rewrite_digest_matches_text_md5():
    docs = ray.data.from_items([
        {"doc_id": 1, "text": CHUNK + "tail-one"},
        {"doc_id": 2, "text": CHUNK + "tail-two"},
    ])
    txt = (dedup_rewrite_docs(docs, window=40, digest=False).to_pandas()
           .set_index("doc_id").sort_index())
    dig = (dedup_rewrite_docs(docs, window=40).to_pandas()
           .set_index("doc_id").sort_index())
    for d in (1, 2):
        assert dig.loc[d, "text_md5"] == hashlib.md5(
            txt.loc[d, "new_text"].encode()).hexdigest()


def test_q107_non_vacuous_on_fixture_corpus():
    """The registry instance's patterns must actually hit the synthetic
    corpus — a zero-hit redaction oracle proves nothing."""
    from gliner_transbronchialbiopsy_ray.pipelines.queries import (
        q107_pii_redact,
    )

    out = q107_pii_redact("/root/testdata/sf0.001").to_pandas()
    assert (out["n_redactions"] > 0).any()


def test_inverted_index_df_exact_postings_capped():
    from gliner_transbronchialbiopsy_ray.stages.text_analysis import (
        inverted_index,
    )

    docs = ray.data.from_items(
        [{"doc_id": i, "text": "common word" if i <= 12 else "rare word"}
         for i in range(1, 15)])
    out = (inverted_index(docs, postings_cap=10).to_pandas()
           .set_index("token").sort_index())
    assert out.loc["common", "df"] == 12
    # capped at 10 ascending ids even though df=12
    assert out.loc["common", "postings"] == ",".join(map(str, range(1, 11)))
    assert out.loc["rare", "df"] == 2
    assert out.loc["rare", "postings"] == "13,14"
    assert out.loc["word", "df"] == 14
    assert str(out["df"].dtype) == "int64"


def test_inverted_index_empty_token_parity():
    # 'a  b' splits to ['a', '', 'b'] under the q25 single-space contract;
    # the empty token is a real index entry (DuckDB string_split parity)
    from gliner_transbronchialbiopsy_ray.stages.text_analysis import (
        inverted_index,
    )

    docs = ray.data.from_items([{"doc_id": 1, "text": "a  b"},
                                {"doc_id": 2, "text": ""}])
    out = (inverted_index(docs).to_pandas()
           .set_index("token").sort_index())
    assert out.loc["", "df"] == 2
    assert out.loc["", "postings"] == "1,2"


def test_compression_signal_matches_direct_zlib():
    import zlib

    from gliner_transbronchialbiopsy_ray.stages.text_analysis import (
        compression_signal,
    )

    rows = [{"doc_id": 1, "text": "abc " * 200},       # repetitive
            {"doc_id": 2, "text": "k9$Qz!7w@Xp#4"},    # short, incompressible
            {"doc_id": 3, "text": ""}]                  # empty
    out = (compression_signal(ray.data.from_items(rows)).to_pandas()
           .set_index("doc_id").sort_index())
    for r in rows:
        raw = r["text"].encode()
        comp = len(zlib.compress(raw, 6))
        d = r["doc_id"]
        assert out.loc[d, "orig_bytes"] == len(raw)
        assert out.loc[d, "comp_bytes"] == comp
        expect = (1_000_000 * comp) // len(raw) if raw else 0
        assert out.loc[d, "ratio_ppm"] == expect
    # the repetitive doc compresses far better than the noise doc
    assert out.loc[1, "ratio_ppm"] < out.loc[2, "ratio_ppm"]
