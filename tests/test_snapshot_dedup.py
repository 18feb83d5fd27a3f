"""Incremental snapshot-over-state exact dedup (state/snapshot_dedup.py):
verdict semantics, commit idempotency, crashed-commit cleanup."""

import os

import pandas as pd
import ray.data

from gliner_transbronchialbiopsy_ray.state.snapshot_dedup import (
    _committed_snapshots,
    _read_state_bucket,
    commit_snapshot,
    incremental_dedup_verdicts,
    incremental_exact_dedup,
)


def _docs(rows):
    return ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in rows])


def _verdicts_df(ds):
    return (ds.to_pandas().sort_values("doc_id").reset_index(drop=True))


def test_verdict_statuses_across_and_within_snapshot(tmp_path):
    state = str(tmp_path / "state")
    # bootstrap corpus: "alpha" kept by doc 2 (min id of its dup group)
    base = _docs([(2, "alpha"), (4, "alpha"), (6, "beta")])
    v0 = _verdicts_df(incremental_exact_dedup(base, state, "base"))
    assert v0["status"].tolist() == ["unique", "dup_in_snapshot", "unique"]
    assert v0["keeper_id"].tolist() == [2, 2, 6]
    # day1: 1 duplicates state ("alpha" -> keeper 2), 3/5 duplicate each
    # other within the snapshot, 7 is fresh
    day1 = _docs([(1, "alpha"), (3, "gamma"), (5, "gamma"), (7, "delta")])
    v1 = _verdicts_df(incremental_exact_dedup(day1, state, "day1"))
    assert list(v1.columns) == ["doc_id", "status", "keeper_id"]
    assert v1["status"].tolist() == [
        "dup_of_state", "unique", "dup_in_snapshot", "unique"]
    assert v1["keeper_id"].tolist() == [2, 3, 3, 7]
    # day2 sees day1's accepted content as state
    day2 = _docs([(9, "gamma"), (11, "beta")])
    v2 = _verdicts_df(incremental_exact_dedup(day2, state, "day2"))
    assert v2["status"].tolist() == ["dup_of_state", "dup_of_state"]
    assert v2["keeper_id"].tolist() == [3, 6]


def test_commit_idempotent_and_state_hash_unique(tmp_path):
    state = str(tmp_path / "state")
    base = _docs([(2, "alpha"), (4, "alpha")])
    incremental_exact_dedup(base, state, "base")
    # re-running the same snapshot id: commit is a no-op, verdicts identical
    v = incremental_dedup_verdicts(base, state)
    assert commit_snapshot(v, state, "base") is False
    assert _committed_snapshots(state) == ["snap=base"]
    # each content_hash appears at most once across the whole state
    seen = pd.concat(
        [_read_state_bucket(state, b) for b in range(256)],
        ignore_index=True)
    assert len(seen) == 1  # only "alpha"'s keeper row
    assert seen["keeper_id"].iloc[0] == 2
    # NOTE: re-running base as verdicts-only against its own committed
    # state flips its rows to dup_of_state — correct: the content IS in
    # state now.  Idempotent re-runs are about the commit, not the labels.
    vdf = _verdicts_df(v)
    assert set(vdf["status"]) == {"dup_of_state"}


def test_crashed_partial_commit_invisible_then_rewritten(tmp_path):
    state = str(tmp_path / "state")
    incremental_exact_dedup(_docs([(2, "alpha")]), state, "base")
    # fake a crashed partial commit: directory exists, no _SUCCESS marker
    part = os.path.join(state, "seen", "snap=day1", "bucket=0")
    os.makedirs(part)
    with open(os.path.join(part, "junk.parquet"), "wb") as f:
        f.write(b"not parquet")
    assert _committed_snapshots(state) == ["snap=base"]  # invisible
    # verdict pass ignores the partial dir; commit cleans and rewrites it
    day1 = _docs([(3, "beta")])
    v1 = _verdicts_df(incremental_exact_dedup(day1, state, "day1"))
    assert v1["status"].tolist() == ["unique"]
    assert _committed_snapshots(state) == ["snap=base", "snap=day1"]
    assert not os.path.exists(os.path.join(part, "junk.parquet"))


def test_first_snapshot_against_empty_state(tmp_path):
    state = str(tmp_path / "fresh")
    v = _verdicts_df(incremental_exact_dedup(
        _docs([(1, "a"), (2, "a"), (3, "b")]), state, "s0"))
    assert v["status"].tolist() == ["unique", "dup_in_snapshot", "unique"]
    assert v["keeper_id"].tolist() == [1, 1, 3]


# --------------------------------------------------------------------------
# incremental MinHash-LSH near-dup state (incremental_lsh_dedup)

BASE = (
    "the quick brown fox jumps over the lazy dog while the sun sets "
    "slowly behind the quiet hills and the river keeps flowing north "
) * 3
NEAR = BASE.replace("quiet hills", "silent hills")
OTHER = (
    "completely different content about distributed data processing "
    "engines with arrow batches actors and shuffles everywhere "
) * 3


def _lsh(tmp, rows, sid, **kw):
    from gliner_transbronchialbiopsy_ray.state.snapshot_dedup import (
        incremental_lsh_dedup,
    )
    return (incremental_lsh_dedup(_docs(rows), str(tmp / "state"), sid,
                                  threshold_ppm=500_000, **kw)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))


def test_lsh_verdicts_across_and_within_snapshot(tmp_path):
    # bootstrap: BASE accepted (doc 2), its exact dup 4 flagged in-snapshot
    v0 = _lsh(tmp_path, [(2, BASE), (4, BASE), (6, OTHER)], "base")
    assert v0["status"].tolist() == ["unique", "dup_in_snapshot", "unique"]
    assert v0["keeper_id"].tolist() == [2, 2, 6]
    assert v0["est_ppm"].tolist()[:2] == [1_000_000, 1_000_000]
    # day1: exact dup of state, NEAR dup of state, fresh doc
    v1 = _lsh(tmp_path, [(1, BASE), (3, NEAR), (7, "fresh " * 40)], "day1")
    assert v1["status"].tolist() == ["dup_of_state", "dup_of_state", "unique"]
    assert v1["keeper_id"].tolist() == [2, 2, 7]
    assert v1.loc[0, "est_ppm"] == 1_000_000       # exact dup: all perms agree
    assert 500_000 <= v1.loc[1, "est_ppm"] < 1_000_000  # near dup: most agree
    # day2 sees day1's accepted fresh doc as state
    v2 = _lsh(tmp_path, [(9, "fresh " * 40)], "day2")
    assert v2["status"].tolist() == ["dup_of_state"]
    assert v2["keeper_id"].tolist() == [7]


def test_lsh_commit_idempotent_and_empty_snapshot(tmp_path):
    from gliner_transbronchialbiopsy_ray.state.snapshot_dedup import (
        _committed_snapshots,
    )
    _lsh(tmp_path, [(2, BASE)], "base")
    # all-dup snapshot commits an (empty) marker-only snapshot dir
    v = _lsh(tmp_path, [(5, BASE)], "day1")
    assert v["status"].tolist() == ["dup_of_state"]
    assert _committed_snapshots(str(tmp_path / "state"), "lsh") == [
        "snap=base", "snap=day1"]
    # rerunning a committed snapshot id: commit is a no-op, verdicts flip
    # to dup_of_state (content now in state) — same contract as exact
    _lsh(tmp_path, [(2, BASE)], "base")
    assert _committed_snapshots(str(tmp_path / "state"), "lsh") == [
        "snap=base", "snap=day1"]


def test_lsh_exact_and_lsh_state_dirs_coexist(tmp_path):
    # both operators share one state_dir without clashing (seen/ vs lsh/)
    state = str(tmp_path / "state")
    incremental_exact_dedup(_docs([(2, BASE)]), state, "base")
    _lsh(tmp_path, [(2, BASE)], "base")
    assert os.path.isdir(os.path.join(state, "seen"))
    assert os.path.isdir(os.path.join(state, "lsh"))


def test_incremental_equals_batch_exact_dedup(tmp_path):
    """Equivalence invariant: processing id-ordered snapshot splits
    incrementally accepts EXACTLY the ids batch exact_dedup keeps on the
    union (first-arrival == min-id when ids grow across snapshots)."""
    import random

    from gliner_transbronchialbiopsy_ray.stages.dedup import exact_dedup

    rng = random.Random(7)
    pool = [f"text variant {i} " * 3 for i in range(8)]  # dup-heavy
    rows = [(i, rng.choice(pool)) for i in range(30)]
    state = str(tmp_path / "state")
    accepted = []
    for s, (lo, hi) in enumerate([(0, 10), (10, 20), (20, 30)]):
        v = _verdicts_df(incremental_exact_dedup(
            _docs(rows[lo:hi]), state, f"snap{s}"))
        assert len(v) == hi - lo  # every row gets a verdict
        accepted += v.loc[v["status"] == "unique", "doc_id"].tolist()
    batch = exact_dedup(_docs(rows)).to_pandas()
    assert sorted(accepted) == sorted(batch["doc_id"].tolist())


def test_lsh_layout_params_persisted_and_verified(tmp_path):
    """num_perm/bands are part of the persisted LSH state layout: the
    first commit records them in _meta.json and a later call with
    different values errors instead of silently comparing mis-shaped
    signatures against the wrong buckets."""
    import pytest

    _lsh(tmp_path, [(1, BASE), (2, OTHER)], "d0")
    meta = tmp_path / "state" / "lsh" / "_meta.json"
    assert meta.exists()
    with pytest.raises(ValueError, match="num_perm=64"):
        _lsh(tmp_path, [(3, BASE)], "d1", num_perm=32, bands=8)
    # same values keep working
    out = _lsh(tmp_path, [(3, BASE)], "d1")
    assert out.loc[0, "status"] == "dup_of_state"
