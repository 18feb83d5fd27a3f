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


def test_compact_index_equality_and_recovery(ray_session, tmp_path):
    from gliner_transbronchialbiopsy_ray.state.search_index import (
        _COMPACTING,
        _recover_compaction,
        compact_index,
        ranked_search,
    )

    state = str(tmp_path / "cidx")
    docs = _docs()
    commit_snapshot(docs.filter(lambda r: (r["doc_id"] or 0) % 2 == 0),
                    state, "even")
    commit_snapshot(docs.filter(lambda r: (r["doc_id"] or 0) % 2 == 1),
                    state, "odd")
    before_p = phrase_search(state, "quick brown")
    before_r = ranked_search(state, "quick fox nothing", k=5)
    stats = compact_index(state)
    assert stats == {"snapshots_before": 2, "snapshots_after": 1}
    # queries identical over the single compacted snapshot
    pd.testing.assert_frame_equal(phrase_search(state, "quick brown"),
                                  before_p)
    pd.testing.assert_frame_equal(
        ranked_search(state, "quick fox nothing", k=5), before_r)
    # idempotent (single snapshot -> no-op)
    assert compact_index(state)["snapshots_after"] == 1
    # commits after compaction keep working
    commit_snapshot(rd.from_items(
        [{"doc_id": 9, "text": "quick brown newcomer"}]), state, "late")
    got = phrase_search(state, "quick brown").set_index("doc_id")
    assert 9 in got.index and 1 in got.index

    # crash window A: manifest written, target NOT committed -> roll back
    root = os.path.join(state, "postings")
    snaps = sorted(d for d in os.listdir(root) if d.startswith("snap="))
    fake_target = "snap=compacted-99-x"
    os.makedirs(os.path.join(root, fake_target, "bucket=0"), exist_ok=True)
    with open(os.path.join(root, _COMPACTING), "w") as f:
        json.dump({"sources": snaps, "target": fake_target}, f)
    _recover_compaction(state)
    assert not os.path.isdir(os.path.join(root, fake_target))
    assert sorted(d for d in os.listdir(root)
                  if d.startswith("snap=")) == snaps  # sources intact

    # crash window B: target committed, sources not yet deleted ->
    # recovery (triggered via the search path) finishes the deletes
    stats2 = compact_index(state)
    assert stats2["snapshots_after"] == 1
    target = [d for d in os.listdir(root) if d.startswith("snap=")][0]
    ghost = os.path.join(root, "snap=ghost")
    os.makedirs(os.path.join(ghost, "bucket=0"), exist_ok=True)
    open(os.path.join(ghost, "_SUCCESS"), "w").close()
    with open(os.path.join(root, _COMPACTING), "w") as f:
        json.dump({"sources": ["snap=ghost"], "target": target}, f)
    got2 = phrase_search(state, "quick brown")  # search runs recovery
    assert not os.path.isdir(ghost)
    assert got2.set_index("doc_id").index.tolist() == got.index.tolist()


def test_compact_index_target_never_collides_with_source(
        ray_session, tmp_path):
    """ADVICE r4: with committed snapshots [compacted-2-x, x] the naive
    target id f"compacted-{len}-{last}" equals the FIRST source, and the
    pre-merge rmtree deleted a live snapshot's postings.  The generation
    now bumps past any committed source id."""
    from gliner_transbronchialbiopsy_ray.state.search_index import (
        compact_index,
        phrase_search,
        ranked_search,
    )

    state = str(tmp_path / "collide")
    docs = _docs()
    # ids chosen so sorted() yields [snap=compacted-2-x, snap=x] and the
    # naive target f"snap=compacted-2-{'x'}" == the first source
    commit_snapshot(docs.filter(lambda r: (r["doc_id"] or 0) % 2 == 0),
                    state, "compacted-2-x")
    commit_snapshot(docs.filter(lambda r: (r["doc_id"] or 0) % 2 == 1),
                    state, "x")
    before_p = phrase_search(state, "quick brown")
    before_r = ranked_search(state, "quick fox nothing", k=5)
    stats = compact_index(state)
    assert stats == {"snapshots_before": 2, "snapshots_after": 1}
    pd.testing.assert_frame_equal(phrase_search(state, "quick brown"),
                                  before_p)
    pd.testing.assert_frame_equal(
        ranked_search(state, "quick fox nothing", k=5), before_r)
