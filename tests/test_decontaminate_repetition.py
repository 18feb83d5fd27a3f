"""Gopher-style repetition stats + benchmark n-gram decontamination
(the train/test-overlap hygiene ops of a training-data pipeline)."""

import pyarrow as pa
import ray.data as rd

from gliner_transbronchialbiopsy_ray.stages.decontaminate import (
    benchmark_ngram_set,
    decontaminate,
)
from gliner_transbronchialbiopsy_ray.stages.text_analysis import repetition_stats


def test_repetition_stats_values(ray_session):
    batch = pa.table({
        "doc_id": [1, 2, 3],
        "text": [
            "a a a a b",            # 5 words, 2 distinct, top 'a' x4
            "one two three four",   # all distinct
            "x x x x x x x x x x",  # fully repeated
        ],
    })
    out = repetition_stats(batch).to_pandas().set_index("doc_id")
    assert out.loc[1, "total_words"] == 5
    assert out.loc[1, "distinct_words"] == 2
    assert out.loc[1, "dup_word_ppm"] == (1_000_000 * 3) // 5
    assert out.loc[1, "top_word_ppm"] == (1_000_000 * 4) // 5
    assert not out.loc[1, "keep"]
    assert out.loc[2, "dup_word_ppm"] == 0
    assert out.loc[2, "top_word_ppm"] == 250_000  # 1/4 > default 200k cap
    assert out.loc[3, "dup_word_ppm"] == 900_000
    assert not out.loc[3, "keep"]


def test_decontaminate_flags_overlap(ray_session):
    bench = rd.from_items([
        {"doc_id": 100, "text": "the quick brown fox jumps over the lazy dog tonight"},
    ])
    corpus = rd.from_items([
        # contains the benchmark's first 8-gram verbatim
        {"doc_id": 1, "text": "prefix the quick brown fox jumps over the lazy suffix"},
        # no shared 8-gram (only shorter overlaps)
        {"doc_id": 2, "text": "the quick brown fox sat still"},
        # shorter than 8 words -> zero grams, never contaminated
        {"doc_id": 3, "text": "too short"},
    ])
    out = decontaminate(corpus, bench, n=8, concurrency=1).to_pandas()
    out = out.set_index("doc_id")
    assert out.loc[1, "contaminated"] and out.loc[1, "hit_grams"] == 1
    assert not out.loc[2, "contaminated"]
    assert not out.loc[3, "contaminated"]
    assert len(out) == 3  # no rows dropped


def test_decontaminate_hashed_matches_exact(ray_session):
    bench = rd.from_items([
        {"doc_id": 100, "text": "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"},
    ])
    corpus = rd.from_items([
        {"doc_id": i, "text": f"pad{i} w2 w3 w4 w5 w6 w7 w8 w9 tail{i}"}
        for i in range(6)
    ])
    exact = decontaminate(corpus, bench, n=8, concurrency=1).to_pandas()
    hashed = decontaminate(corpus, bench, n=8, hashed=True,
                           concurrency=1).to_pandas()
    key = exact.sort_values("doc_id").reset_index(drop=True)
    assert key.equals(hashed.sort_values("doc_id").reset_index(drop=True))


def test_benchmark_ngram_set_empty(ray_session):
    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    }))
    assert benchmark_ngram_set(empty) == set()


def test_chunk_documents_edges(ray_session):
    """Chunker invariants: empty doc -> one empty chunk; short doc -> one
    chunk; overlap reconstructs the doc exactly (stride < size)."""
    import hashlib

    import pyarrow as pa

    from gliner_transbronchialbiopsy_ray.stages.text_analysis import (
        chunk_documents,
    )

    text = "abcdefghij" * 45  # 450 chars -> starts 0,150,300 (size 200)
    batch = pa.table({"doc_id": [1, 2, 3],
                      "text": [text, "tiny", ""]})
    out = chunk_documents(batch).to_pandas()
    d1 = out[out["doc_id"] == 1]
    assert d1["start"].tolist() == [0, 150, 300]
    assert d1["chunk_chars"].tolist() == [200, 200, 150]
    # chunk content is the real substring (md5-pinned)
    assert (d1["chunk_md5"].iloc[1]
            == hashlib.md5(text[150:350].encode()).hexdigest())
    # stride overlap covers every char: stitching chunk starts covers len
    assert d1["start"].iloc[-1] + d1["chunk_chars"].iloc[-1] == len(text)
    assert out[out["doc_id"] == 2]["chunk_chars"].tolist() == [4]
    d3 = out[out["doc_id"] == 3]
    assert len(d3) == 1 and d3["chunk_chars"].iloc[0] == 0  # row never dropped


def test_levenshtein_kernel():
    """Wagner-Fischer kernel matches known distances (and DuckDB's
    levenshtein, asserted cell-by-cell in the q75 oracle test)."""
    from gliner_transbronchialbiopsy_ray.pipelines.queries import _levenshtein

    assert _levenshtein("", "") == 0
    assert _levenshtein("abc", "abc") == 0
    assert _levenshtein("kitten", "sitting") == 3
    assert _levenshtein("flaw", "lawn") == 2
    assert _levenshtein("", "xyz") == 3
    assert _levenshtein("ab", "ba") == 2  # no transposition shortcut


def test_curate_corpus_funnel_each_gate(ray_session):
    """Composite curation: one crafted doc fails each gate, survivors are
    counted and packed; the funnel is monotone nonincreasing."""
    import ray.data

    from gliner_transbronchialbiopsy_ray.pipelines.docs import curate_corpus

    good = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        {"doc_id": "d1", "text": good},                        # keeper
        {"doc_id": "d2", "text": "tiny doc"},                  # fails min_tokens
        {"doc_id": "d3", "text": " ".join(["spam"] * 10)},     # fails repetition
        {"doc_id": "d4", "text": good},                        # exact dup of d1
        {"doc_id": "d5", "text": good.replace("india juliet",
                                              "kilo lima")},   # contaminated
    ]
    # shares an 8-gram with d5 ("bravo ... kilo") but none with d1/d4
    # (the leading "xray" breaks d1's only candidate gram)
    bench = ray.data.from_items(
        [{"doc_id": "b1",
          "text": "xray bravo charlie delta echo foxtrot golf hotel "
                  "kilo lima zulu"}])
    out = curate_corpus(ray.data.from_items(rows), bench,
                        min_tokens=10, dup_ppm_max=300_000,
                        decontam_n=8, pack_cap=8)
    row = out.iloc[0]
    assert row["n_total"] == 5
    assert row["n_after_quality"] == 4       # d2 out
    assert row["n_after_repetition"] == 3    # d3 out
    assert row["n_after_dedup"] == 2         # d4 out (d1 kept: min doc_id)
    assert row["n_kept"] == 1                # d5 out (8-gram hit vs bench)
    assert row["kept_tokens"] == 10 and row["n_windows"] == 2
    assert all(str(t) == "int64" for t in out.dtypes)


def test_dsir_importance_scores_ranks_targetlike_docs(ray_session):
    import numpy as np
    import ray.data as rd

    from gliner_transbronchialbiopsy_ray.stages.text_analysis import (
        dsir_importance_scores,
    )

    # target docs share the bigram "alpha beta"; decoys share "zzz qqq";
    # a mixed doc carries both -> middle score; empty text scores 0
    rows = []
    for i in range(4):
        rows.append({"doc_id": i, "text": "alpha beta " * 5,
                     "is_target": 1})
    for i in range(4, 10):
        rows.append({"doc_id": i, "text": "zzz qqq " * 5,
                     "is_target": 0})
    rows.append({"doc_id": 10, "text": "alpha beta zzz qqq",
                 "is_target": 0})
    rows.append({"doc_id": 11, "text": "", "is_target": 0})
    out = (dsir_importance_scores(rd.from_items(rows), n_buckets=64)
           .to_pandas().set_index("doc_id")["score"])
    assert out.loc[11] == 0
    # every pure-target doc outranks every decoy and the mixed doc
    assert out.loc[list(range(4))].min() > out.loc[10]
    assert out.loc[10] > out.loc[list(range(4, 10))].max()
    # deterministic across reruns (pure integer arithmetic)
    out2 = (dsir_importance_scores(rd.from_items(rows), n_buckets=64)
            .to_pandas().set_index("doc_id")["score"])
    assert (out.sort_index() == out2.sort_index()).all()
