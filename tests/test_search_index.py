"""Persisted positional inverted index (state/search_index.py):
incremental commits, marker discipline, n_buckets pinning, and exact
phrase semantics (contiguity, repeats, case folding, overlaps)."""

import json
import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gliner_transbronchialbiopsy_ray.state.search_index import (
    commit_snapshot,
    phrase_search,
    tokenize,
)


def _docs():
    return rd.from_items([
        {"doc_id": 1, "text": "the quick brown fox jumps over the "
                              "quick brown dog"},
        {"doc_id": 2, "text": "Quick Brown foxes are not quick brown"},
        {"doc_id": 3, "text": "nothing to see here"},
        {"doc_id": 4, "text": "aa aa aa aa"},     # overlapping matches
        {"doc_id": 5, "text": None},              # null text tolerated
    ])


def test_tokenize_ascii_lower():
    assert tokenize("Hello, World-42!") == ["hello", "world", "42"]
    assert tokenize(None) == []
    assert tokenize("") == []


def test_phrase_search_semantics(ray_session, tmp_path):
    state = str(tmp_path / "idx")
    docs = _docs()
    assert commit_snapshot(
        docs.filter(lambda r: (r["doc_id"] or 0) % 2 == 0), state, "even")
    assert commit_snapshot(
        docs.filter(lambda r: (r["doc_id"] or 0) % 2 == 1), state, "odd")
    # re-commit is a no-op
    assert commit_snapshot(docs, state, "even") is False

    got = phrase_search(state, "quick brown").set_index("doc_id")
    assert got.loc[1, "n_matches"] == 2 and got.loc[1, "first_pos"] == 1
    assert got.loc[2, "n_matches"] == 2 and got.loc[2, "first_pos"] == 0
    assert 3 not in got.index
    # case folding: query case is irrelevant
    pd.testing.assert_frame_equal(
        phrase_search(state, "QUICK Brown"),
        phrase_search(state, "quick brown"))
    # longer phrase, single hit
    p4 = phrase_search(state, "quick brown dog")
    assert p4.to_dict("records") == [
        {"doc_id": 1, "n_matches": 1, "first_pos": 7}]
    # repeated-token phrase with overlapping occurrences: 'aa aa' in
    # 'aa aa aa aa' matches at 0,1,2
    rep = phrase_search(state, "aa aa")
    assert rep.to_dict("records") == [
        {"doc_id": 4, "n_matches": 3, "first_pos": 0}]
    # absent term -> typed empty
    none = phrase_search(state, "zebra stripes")
    assert list(none.columns) == ["doc_id", "n_matches", "first_pos"]
    assert len(none) == 0
    with pytest.raises(ValueError, match="empty phrase"):
        phrase_search(state, "!!!")


def test_n_buckets_pinned_and_crash_recovery(ray_session, tmp_path):
    state = str(tmp_path / "idx")
    docs = _docs()
    commit_snapshot(docs, state, "a", n_buckets=8)
    with pytest.raises(ValueError, match="n_buckets=8"):
        commit_snapshot(docs, state, "b", n_buckets=16)
    # crashed partial commit (no marker) is invisible, then rewritten
    partial = os.path.join(state, "postings", "snap=crash")
    os.makedirs(os.path.join(partial, "bucket=0"), exist_ok=True)
    before = phrase_search(state, "quick brown")
    assert commit_snapshot(docs.filter(
        lambda r: r["doc_id"] == 3), state, "crash")
    assert os.path.exists(os.path.join(partial, "_SUCCESS"))
    after = phrase_search(state, "quick brown")
    pd.testing.assert_frame_equal(before, after)
    meta = json.load(open(os.path.join(state, "postings", "_meta.json")))
    assert meta["n_buckets"] == 8


def test_ranked_search_weights_and_ties(ray_session, tmp_path):
    state = str(tmp_path / "idx")
    docs = rd.from_items([
        {"doc_id": 1, "text": "rare common common"},
        {"doc_id": 2, "text": "common common common"},
        {"doc_id": 3, "text": "rare rare"},
        {"doc_id": 4, "text": "unrelated words"},
    ])
    from gliner_transbronchialbiopsy_ray.state.search_index import (
        ranked_search)

    commit_snapshot(docs, state, "a")
    out = ranked_search(state, "rare common", k=10)
    # df(rare)=2 -> w=500000; df(common)=2 -> w=500000
    scores = dict(zip(out["doc_id"], out["score"]))
    assert scores == {1: 3 * 500_000, 2: 3 * 500_000, 3: 2 * 500_000}
    # tie between docs 1 and 2 breaks on doc_id ascending
    assert list(out["doc_id"][:2]) == [1, 2]
    # k truncates
    assert len(ranked_search(state, "rare common", k=1)) == 1
    # duplicate query terms don't double-count (DISTINCT terms)
    pd.testing.assert_frame_equal(
        ranked_search(state, "rare rare common"),
        ranked_search(state, "rare common"))
    # absent vocabulary -> typed empty
    none = ranked_search(state, "zebra")
    assert list(none.columns) == ["doc_id", "score"] and len(none) == 0
    with pytest.raises(ValueError, match="empty query"):
        ranked_search(state, "  ")
