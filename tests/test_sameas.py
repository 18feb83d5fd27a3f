"""sameAs canonicalization (stages/sameas.py): closure via connected
components, broadcast rewrite, distinct fold."""

import pandas as pd
import pytest
import ray.data as rd

from gliner_transbronchialbiopsy_ray.stages.sameas import (
    apply_sameas, canonical_map,
)


def _links(pairs):
    return rd.from_items([{"a": a, "b": b} for a, b in pairs])


def _store(rows):
    return rd.from_items([{"s": s, "p": p, "o": o} for s, p, o in rows])


def test_canonical_map_closes_chains_and_drops_identity():
    # chain x=y, y=z -> all map to min ("x"); identity rows dropped
    cm = canonical_map(_links([("x", "y"), ("y", "z")])).to_pandas()
    got = dict(zip(cm["node"], cm["canon"]))
    assert got == {"y": "x", "z": "x"}


def test_rewrite_merges_subjects_and_objects():
    store = _store([
        ("custA:2", "placed", "order:7"),
        ("custB:2", "in_nation", "nation:1"),
        ("order:7", "by", "custB:2"),   # object side rewritten too
        ("custA:3", "placed", "order:9"),  # no alias: untouched
    ])
    out = apply_sameas(store, _links([("custA:2", "custB:2")])).to_pandas()
    got = sorted(map(tuple, out[["s", "p", "o"]].to_numpy()))
    assert got == sorted([
        ("custA:2", "placed", "order:7"),
        ("custA:2", "in_nation", "nation:1"),
        ("order:7", "by", "custA:2"),
        ("custA:3", "placed", "order:9"),
    ])


def test_merged_duplicate_triples_fold():
    store = _store([
        ("a", "knows", "q"),
        ("b", "knows", "q"),  # merges with the row above
    ])
    out = apply_sameas(store, _links([("a", "b")])).to_pandas()
    assert len(out) == 1
    assert tuple(out.iloc[0][["s", "p", "o"]]) == ("a", "knows", "q")
    # final_distinct=False keeps both physical rows
    raw = apply_sameas(store, _links([("a", "b")]),
                       final_distinct=False).to_pandas()
    assert len(raw) == 2


def test_threshold_enforced():
    store = _store([("a", "p", "b")])
    with pytest.raises(ValueError, match="broadcast_threshold"):
        apply_sameas(store, _links([("a", "b")]), broadcast_threshold=0)


def test_distributed_cc_matches_driver():
    links = [("n1", "n2"), ("n2", "n3"), ("n8", "n9")]
    a = canonical_map(_links(links)).to_pandas()
    b = canonical_map(_links(links), distributed=True).to_pandas()
    ka = sorted(map(tuple, a[["node", "canon"]].to_numpy()))
    kb = sorted(map(tuple, b[["node", "canon"]].to_numpy()))
    assert ka == kb


def test_shuffle_rewrite_matches_broadcast():
    store = _store([
        ("custA:2", "placed", "order:7"),
        ("custB:2", "in_nation", "nation:1"),
        ("order:7", "by", "custB:2"),
        ("custA:3", "placed", "order:9"),
        ("a", "knows", "q"), ("b", "knows", "q"),
    ])
    links = _links([("custA:2", "custB:2"), ("a", "b")])
    bc = apply_sameas(store, links).to_pandas()
    sh = apply_sameas(store, links, strategy="shuffle").to_pandas()
    key = ["s", "p", "o"]
    assert (sorted(map(tuple, bc[key].to_numpy()))
            == sorted(map(tuple, sh[key].to_numpy())))
    # empty link set: store unchanged
    sh2 = apply_sameas(store, _links([]), strategy="shuffle").to_pandas()
    assert len(sh2) == 6


def test_distributed_cc_contraction_rounds_match_driver(ray_session):
    """Force the DISTRIBUTED contraction rounds (driver_finish_threshold
    0) on a graph that needs several rounds — a long chain plus cliques
    — and require exact agreement with the driver-side path, plus the
    contract-then-solve default on the same input."""
    import ray.data as rd

    from gliner_transbronchialbiopsy_ray.stages.dedup import (
        _cc_distributed,
        connected_components,
    )

    pairs = []
    # chain n00-n01-...-n07 (diameter forces multiple rounds)
    for i in range(7):
        pairs.append({"left_id": f"n{i:02d}", "right_id": f"n{i+1:02d}"})
    # two cliques
    for ids in (["c10", "c11", "c12", "c13"], ["d20", "d21", "d22"]):
        for a in ids:
            for b in ids:
                if a < b:
                    pairs.append({"left_id": a, "right_id": b})
    ds = rd.from_items(pairs)
    want = sorted(map(tuple, connected_components(ds).to_pandas()
                      [["node", "component"]].to_numpy()))
    forced = _cc_distributed(ds, 20, "left_id", "right_id",
                             num_partitions=3,
                             driver_finish_threshold=0).to_pandas()
    assert sorted(map(tuple, forced[["node", "component"]]
                      .to_numpy())) == want
    solved = connected_components(ds, distributed=True).to_pandas()
    assert sorted(map(tuple, solved[["node", "component"]]
                      .to_numpy())) == want
    # every chain node landed on the chain minimum
    assert set(forced[forced["node"].str.startswith("n")]["component"]) \
        == {"n00"}
