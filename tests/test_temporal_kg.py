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


def test_allen_interval_join_all_13_relations():
    from gliner_transbronchialbiopsy_ray.stages.temporal_kg import (
        allen_interval_join)
    # one left interval [10, 20); rights chosen to hit every relation
    rights = {
        1: (25, 30, "before"), 2: (20, 25, "meets"),
        3: (15, 25, "overlaps"), 4: (10, 25, "starts"),
        5: (5, 25, "during"),   # left strictly inside right
        6: (5, 20, "finishes"), 7: (10, 20, "equals"),
        8: (2, 5, "after"), 9: (5, 10, "met_by"),
        10: (5, 15, "overlapped_by"), 11: (10, 15, "started_by"),
        12: (12, 18, "contains"), 13: (15, 20, "finished_by"),
    }
    left = rd.from_items([{"key": "k", "id": 0, "start": 10, "end": 20}])
    right = rd.from_items([{"key": "k", "id": i, "start": s, "end": e}
                           for i, (s, e, _) in rights.items()])
    out = allen_interval_join(left, right).to_pandas()
    got = dict(zip(out["r_id"], out["relation"]))
    assert got == {i: rel for i, (_, _, rel) in rights.items()}
    # keys never mix
    other = rd.from_items([{"key": "z", "id": 99, "start": 10,
                            "end": 20}])
    out2 = allen_interval_join(left, other)
    assert out2.count() == 0


def test_allen_interval_join_rejects_improper():
    from gliner_transbronchialbiopsy_ray.stages.temporal_kg import (
        allen_interval_join)
    import pytest
    bad = rd.from_items([{"key": "k", "id": 1, "start": 5, "end": 5}])
    ok = rd.from_items([{"key": "k", "id": 2, "start": 1, "end": 2}])
    with pytest.raises(Exception, match="improper interval"):
        allen_interval_join(bad, ok).materialize()


def test_coalesce_intervals_islands():
    from gliner_transbronchialbiopsy_ray.stages.temporal_kg import (
        coalesce_intervals)
    rows = [
        # key a: [1,5) + [3,7) overlap; [7,9) touches -> one island
        ("a", 1, 5), ("a", 3, 7), ("a", 7, 9),
        # gap, then [12,13)
        ("a", 12, 13),
        # containment: [2,10) swallows [4,6)
        ("b", 2, 10), ("b", 4, 6),
    ]
    ds = rd.from_items([{"key": k, "start": s, "end": e}
                        for k, s, e in rows]).repartition(3)
    out = coalesce_intervals(ds).to_pandas()
    got = sorted(map(tuple,
                     out[["key", "start", "end", "n_merged"]].to_numpy()))
    assert got == [("a", 1, 9, 3), ("a", 12, 13, 1), ("b", 2, 10, 2)]


def test_coalesce_intervals_rejects_improper():
    from gliner_transbronchialbiopsy_ray.stages.temporal_kg import (
        coalesce_intervals)
    import pytest
    bad = rd.from_items([{"key": "a", "start": 5, "end": 4}])
    with pytest.raises(Exception, match="improper interval"):
        coalesce_intervals(bad).materialize()
