"""Temporal KG (stages/temporal_kg.py): run collapse, same-instant
supersession, open intervals, snapshots."""

import pandas as pd
import ray.data as rd

from gliner_transbronchialbiopsy_ray.stages.temporal_kg import (
    intervalize_facts, snapshot_at,
)

FACTS = [
    # user u1: A at 10, A again at 20 (collapses), B at 30
    {"s": "u1", "p": "state", "o": "A", "ts": 10, "eid": 1},
    {"s": "u1", "p": "state", "o": "A", "ts": 20, "eid": 2},
    {"s": "u1", "p": "state", "o": "B", "ts": 30, "eid": 3},
    # user u2: two assertions at the SAME instant — higher eid wins
    {"s": "u2", "p": "state", "o": "X", "ts": 10, "eid": 4},
    {"s": "u2", "p": "state", "o": "Y", "ts": 10, "eid": 5},
]


def _iv():
    return intervalize_facts(rd.from_items(FACTS),
                             key_cols=["s", "p"], ts_col="ts",
                             value_col="o", tiebreak_col="eid")


def test_runs_collapse_and_intervals_chain():
    iv = _iv().to_pandas()
    u1 = iv[iv["s"] == "u1"].sort_values("valid_from")
    assert list(u1["o"]) == ["A", "B"]
    assert list(u1["valid_from"]) == [10, 30]
    assert u1.iloc[0]["valid_to"] == 30
    assert pd.isna(u1.iloc[1]["valid_to"])  # open interval


def test_same_instant_supersession():
    iv = _iv().to_pandas()
    u2 = iv[iv["s"] == "u2"]
    assert len(u2) == 1 and u2.iloc[0]["o"] == "Y"


def test_snapshots():
    iv = _iv()

    def at(t):
        df = snapshot_at(iv, t).to_pandas()
        if len(df) == 0:  # fully-empty results may come back columnless
            return {}
        return dict(zip(df["s"], df["o"]))
    assert at(5) == {}                      # before any assertion
    assert at(15) == {"u1": "A", "u2": "Y"}
    assert at(30) == {"u1": "B", "u2": "Y"}  # boundary: new run wins
    assert at(999) == {"u1": "B", "u2": "Y"}  # open intervals persist


def test_bucketing_invariant():
    a = intervalize_facts(rd.from_items(FACTS), ["s", "p"], "ts", "o",
                          "eid", n_buckets=1).to_pandas()
    b = intervalize_facts(rd.from_items(FACTS), ["s", "p"], "ts", "o",
                          "eid", n_buckets=32).to_pandas()
    key = ["s", "p", "o", "valid_from"]
    assert (sorted(map(tuple, a[key].to_numpy()))
            == sorted(map(tuple, b[key].to_numpy())))
