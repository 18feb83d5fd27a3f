"""Incremental join maintenance: delta identity, idempotent commits,
n_buckets pinning, scratch-equivalence vs a full recompute."""
import os

import pandas as pd
import pytest
import ray.data as rd

from gliner_transbronchialbiopsy_ray.state.snapshot_join import (
    incremental_join,
)


def _ds(rows):
    return rd.from_items(rows)


def test_delta_join_three_terms(ray_session, tmp_path):
    state = str(tmp_path / "st")
    d1 = incremental_join(
        _ds([{"k": 1, "l": "a"}, {"k": 2, "l": "b"}]),
        _ds([{"k": 1, "r": "X"}]),
        state, "s1", key="k")
    out1 = d1.to_pandas()
    assert len(out1) == 1 and out1.iloc[0]["l"] == "a"

    # s2: dL hits prior R (term 1), prior L hits dR (term 2),
    # dL hits dR (term 3)
    d2 = incremental_join(
        _ds([{"k": 1, "l": "c"}, {"k": 3, "l": "d"}]),
        _ds([{"k": 2, "r": "Y"}, {"k": 3, "r": "Z"}]),
        state, "s2", key="k")
    out2 = (d2.to_pandas().sort_values(["k", "l", "r"])
            .reset_index(drop=True))
    assert [tuple(r) for r in out2[["k", "l", "r"]].to_numpy()] == [
        (1, "c", "X"),   # dL @ prior R
        (2, "b", "Y"),   # prior L @ dR
        (3, "d", "Z"),   # dL @ dR
    ]

    # cumulative delta union == full join from scratch
    full = (pd.concat([out1, out2])
            .sort_values(["k", "l", "r"]).reset_index(drop=True))
    L = pd.DataFrame({"k": [1, 2, 1, 3], "l": ["a", "b", "c", "d"]})
    R = pd.DataFrame({"k": [1, 2, 3], "r": ["X", "Y", "Z"]})
    exp = (L.merge(R, on="k").sort_values(["k", "l", "r"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(full, exp, check_dtype=False)

    # idempotent re-run of s2: same delta, no state double-count
    d2b = incremental_join(
        _ds([{"k": 1, "l": "c"}, {"k": 3, "l": "d"}]),
        _ds([{"k": 2, "r": "Y"}, {"k": 3, "r": "Z"}]),
        state, "s2", key="k")
    pd.testing.assert_frame_equal(
        d2b.to_pandas().sort_values(["k", "l", "r"])
        .reset_index(drop=True), out2, check_dtype=False)


def test_snapshot_join_guards(ray_session, tmp_path):
    state = str(tmp_path / "st2")
    incremental_join(_ds([{"k": 1, "l": "a"}]),
                     _ds([{"k": 1, "r": "X"}]), state, "s1", key="k")
    # n_buckets pin
    with pytest.raises(ValueError, match="n_buckets"):
        incremental_join(_ds([{"k": 1, "l": "a"}]),
                         _ds([{"k": 1, "r": "X"}]),
                         state, "s2", key="k", n_buckets=8)
    # overlapping payload columns
    with pytest.raises(ValueError, match="overlapping"):
        incremental_join(_ds([{"k": 1, "v": 1}]),
                         _ds([{"k": 1, "v": 2}]), state, "s3", key="k")
    assert os.path.exists(os.path.join(state, "_meta.json"))
