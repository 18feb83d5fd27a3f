"""Incremental connected components over persisted state
(state/snapshot_cc.py): maintained labels must equal a from-scratch
re-cluster of all edges ever committed, across merge cascades."""

import tempfile

import numpy as np
import pytest
import ray.data as rd


def _labels_df(state_dir):
    from gliner_transbronchialbiopsy_ray.state.snapshot_cc import (
        current_labels)
    df = current_labels(state_dir).to_pandas()
    return dict(zip(df["node"].astype(int), df["component"].astype(int)))


def _scratch(edges):
    from gliner_transbronchialbiopsy_ray.stages.dedup import (
        connected_components)
    ds = rd.from_items([{"a": a, "b": b} for a, b in edges])
    df = connected_components(ds, max_iterations=12, left_col="a",
                              right_col="b").to_pandas()
    return dict(zip(df["node"].astype(int), df["component"].astype(int)))


def test_incremental_cc_matches_scratch_across_merges():
    from gliner_transbronchialbiopsy_ray.state.snapshot_cc import (
        commit_edges)
    d = tempfile.mkdtemp()
    # batch 1: two separate chains
    b1 = [(10, 11), (11, 12), (20, 21)]
    # batch 2: bridges the chains (components 10 and 20 merge) + new
    b2 = [(12, 20), (30, 31)]
    # batch 3: merges everything via a smaller node id
    b3 = [(5, 31), (5, 10)]
    assert commit_edges(d, rd.from_items(
        [{"a": a, "b": b} for a, b in b1]), "s1")
    assert _labels_df(d) == _scratch(b1)
    assert commit_edges(d, rd.from_items(
        [{"a": a, "b": b} for a, b in b2]), "s2")
    assert _labels_df(d) == _scratch(b1 + b2)
    assert commit_edges(d, rd.from_items(
        [{"a": a, "b": b} for a, b in b3]), "s3")
    assert _labels_df(d) == _scratch(b1 + b2 + b3)


def test_incremental_cc_random_matches_scratch_and_compact():
    from gliner_transbronchialbiopsy_ray.state.snapshot_cc import (
        commit_edges, compact)
    rng = np.random.RandomState(6)
    edges = sorted({(int(min(a, b)), int(max(a, b))) for a, b in zip(
        rng.randint(0, 40, 80), rng.randint(0, 40, 80)) if a != b})
    d = tempfile.mkdtemp()
    thirds = [edges[0::3], edges[1::3], edges[2::3]]
    acc = []
    for i, part in enumerate(thirds):
        commit_edges(d, rd.from_items(
            [{"a": a, "b": b} for a, b in part]), f"s{i}")
        acc += part
        assert _labels_df(d) == _scratch(acc)
    compact(d)
    assert _labels_df(d) == _scratch(acc)


def test_incremental_cc_idempotent_and_meta_guard():
    from gliner_transbronchialbiopsy_ray.state.snapshot_cc import (
        commit_edges)
    d = tempfile.mkdtemp()
    e = rd.from_items([{"a": 1, "b": 2}])
    assert commit_edges(d, e, "s1", n_buckets=8)
    assert not commit_edges(d, e, "s1", n_buckets=8)   # already there
    with pytest.raises(ValueError, match="n_buckets=8"):
        commit_edges(d, e, "s2", n_buckets=16)
