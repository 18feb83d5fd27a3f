"""Incremental SHACL validation over persisted bucketed snapshot state
(state/snapshot_shacl.py)."""

import os

import pandas as pd
import pytest
import ray.data as rd

from gliner_transbronchialbiopsy_ray.stages.shacl import (
    Shape, validate_shapes)
from gliner_transbronchialbiopsy_ray.state.snapshot_shacl import (
    commit_snapshot, incremental_validate)


def _triples(rows):
    return rd.from_items([{"s": s, "p": p, "o": o} for s, p, o in rows])


SHAPES = [Shape("widget", "Widget",
                [("min_count", "name", 1), ("max_count", "name", 1),
                 ("in_set", "color", ["red", "blue"])])]


def test_incremental_matches_full_revalidation(tmp_path):
    state = str(tmp_path / "state")
    day0 = [
        ("w1", "type", "Widget"), ("w1", "name", "a"),
        ("w2", "type", "Widget"),                      # missing name
        ("w3", "type", "Widget"), ("w3", "name", "c"),
    ]
    commit_snapshot(_triples(day0), state, "day0")
    # day1 touches w1 (second name -> NEW violation), fixes w2 (adds
    # name), adds w4 with a bad color; w3 untouched
    day1 = [
        ("w1", "name", "a2"),
        ("w2", "name", "b"),
        ("w4", "type", "Widget"), ("w4", "name", "d"),
        ("w4", "color", "green"),
    ]
    delta = incremental_validate(
        _triples(day1), SHAPES, state).to_pandas()
    got = sorted(map(tuple,
                     delta[["node", "constraint", "detail"]].to_numpy()))
    assert got == [("w1", "max_count", "2"), ("w4", "in_set", "green")]
    assert "w3" not in set(delta["node"])  # untouched: no re-check

    # the delta equals the full revalidation restricted to touched subjects
    commit_snapshot(_triples(day1), state, "day1")
    full = validate_shapes(
        _triples(day0 + day1), SHAPES).to_pandas()
    touched = {"w1", "w2", "w4"}
    exp = (full[full["node"].isin(touched)]
           .sort_values(["node", "constraint"]).reset_index(drop=True))
    d2 = (delta.sort_values(["node", "constraint"])
          .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        d2[exp.columns].astype(str), exp.astype(str))


def test_commit_idempotent_and_crash_cleanup(tmp_path):
    state = str(tmp_path / "state")
    rows = [("w1", "type", "Widget"), ("w1", "name", "x")]
    n = commit_snapshot(_triples(rows), state, "d0")
    assert n == 2
    assert commit_snapshot(_triples(rows), state, "d0") == 0  # no-op
    # crashed partial: dir without marker is cleaned and rewritten
    root = os.path.join(state, "triples", "snap=d1")
    os.makedirs(os.path.join(root, "bucket=0"), exist_ok=True)
    n2 = commit_snapshot(_triples(rows), state, "d1")
    assert n2 == 2
    assert os.path.exists(os.path.join(root, "_SUCCESS"))


def test_class_ref_rejected(tmp_path):
    shp = Shape("w", "W", [("class_ref", "p", "Other")])
    with pytest.raises(ValueError, match="store-global"):
        incremental_validate(
            _triples([("a", "type", "W")]), [shp], str(tmp_path))


def test_n_buckets_persisted_and_verified(tmp_path):
    state = str(tmp_path / "state")
    rows = [("w1", "type", "Widget"), ("w1", "name", "x")]
    commit_snapshot(_triples(rows), state, "d0", n_buckets=8)
    meta = os.path.join(state, "triples", "_meta.json")
    assert os.path.exists(meta)
    # a mismatching layout value is an error on commit AND validate
    with pytest.raises(ValueError, match="n_buckets=8"):
        commit_snapshot(_triples(rows), state, "d1", n_buckets=16)
    with pytest.raises(ValueError, match="n_buckets=8"):
        incremental_validate(_triples(rows), SHAPES, state, n_buckets=16)
    # None adopts the persisted value — same results as explicit 8
    a = incremental_validate(
        _triples([("w1", "name", "y")]), SHAPES, state).to_pandas()
    b = incremental_validate(
        _triples([("w1", "name", "y")]), SHAPES, state,
        n_buckets=8).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values(list(a.columns)).reset_index(drop=True),
        b.sort_values(list(b.columns)).reset_index(drop=True))
    assert (a["constraint"] == "max_count").any()
