"""SPARQL solution modifiers: GROUP BY aggregates (+HAVING) and
FILTER (NOT) EXISTS — parity against pandas references, both aggregate
paths (combiner-distributive and holistic exchange), empty inputs, and
the no-shared-variable EXISTS degenerate cases."""

import pandas as pd
import pytest
import ray.data as rd

from gliner_transbronchialbiopsy_ray.stages.bgp import match_bgp
from gliner_transbronchialbiopsy_ray.stages.solutions import (
    aggregate_bindings, filter_exists)

TRIPLES = [
    {"s": 1, "p": "knows", "o": 2},
    {"s": 1, "p": "knows", "o": 3},
    {"s": 2, "p": "knows", "o": 3},
    {"s": 2, "p": "knows", "o": 4},
    {"s": 3, "p": "knows", "o": 4},
    {"s": 1, "p": "likes", "o": 9},
    {"s": 4, "p": "likes", "o": 9},
]


def _bindings():
    return match_bgp(rd.from_items(TRIPLES), [("?x", "knows", "?y")],
                     num_partitions=2)


def test_distributive_aggregates_match_pandas():
    out = (aggregate_bindings(_bindings(), ["x"], [
        ("n", "count", None),
        ("total", "sum", "y"),
        ("lo", "min", "y"),
        ("hi", "max", "y"),
        ("avg_ppm", "avg_ppm", "y"),
    ]).to_pandas().sort_values("x").reset_index(drop=True))
    ref = (pd.DataFrame([(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)],
                        columns=["x", "y"])
           .groupby("x")
           .agg(n=("y", "size"), total=("y", "sum"), lo=("y", "min"),
                hi=("y", "max"))
           .reset_index())
    ref["avg_ppm"] = (1_000_000 * ref["total"]) // ref["n"]
    for c in ("n", "total", "lo", "hi", "avg_ppm"):
        assert list(out[c].astype("int64")) == list(ref[c].astype("int64")), c


def test_holistic_aggregates_and_group_concat_order():
    ds = rd.from_items([
        {"g": "a", "v": 3}, {"g": "a", "v": 1}, {"g": "a", "v": 3},
        {"g": "b", "v": 2},
    ])
    out = (aggregate_bindings(ds, ["g"], [
        ("nd", "count_distinct", "v"),
        ("cat", "group_concat", "v", "|"),
        ("any", "sample", "v"),
        ("n", "count", "v"),           # distributive mixed in
    ]).to_pandas().sort_values("g").reset_index(drop=True))
    assert list(out["nd"]) == [2, 1]
    assert list(out["cat"]) == ["1|3|3", "2"]   # sorted, keeps dups
    assert list(out["any"]) == [1, 2]           # deterministic = min
    assert list(out["n"]) == [3, 1]


def test_having_filters_groups_both_paths():
    b = _bindings()
    dist = aggregate_bindings(b, ["x"], [("n", "count", None)],
                              having=[("n", ">=", 2)]).to_pandas()
    assert sorted(dist["x"]) == [1, 2]
    hol = aggregate_bindings(b, ["x"], [("n", "count_distinct", "y")],
                             having=[("n", ">=", 2)]).to_pandas()
    assert sorted(hol["x"]) == [1, 2]


def test_avg_ppm_negative_numerator_truncates_toward_zero():
    ds = rd.from_items([{"g": "a", "v": -1}, {"g": "a", "v": -2},
                        {"g": "a", "v": -2}])
    out = aggregate_bindings(ds, ["g"], [("a", "avg_ppm", "v")]).to_pandas()
    # DuckDB: (1000000 * -5) // 3 truncates to -1666666 (not -1666667)
    assert list(out["a"]) == [-1666666]


def test_aggregate_multi_group_vars_and_empty_input():
    ds = rd.from_items([{"a": 1, "b": "x", "v": 5},
                        {"a": 1, "b": "x", "v": 7},
                        {"a": 1, "b": "y", "v": 1}])
    out = (aggregate_bindings(ds, ["a", "b"], [("s", "sum", "v")])
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    assert list(out["s"]) == [12, 1]
    empty = ds.filter(lambda r: False)
    for aggs in ([("s", "sum", "v")], [("nd", "count_distinct", "v")]):
        got = aggregate_bindings(empty, ["a"], aggs).to_pandas()
        assert len(got) == 0


def test_bad_agg_specs_rejected():
    ds = rd.from_items([{"g": 1, "v": 1}])
    with pytest.raises(ValueError, match="bad aggregate"):
        aggregate_bindings(ds, ["g"], [("o", "median", "v")])
    with pytest.raises(ValueError, match="separator"):
        aggregate_bindings(ds, ["g"], [("o", "sum", "v", ",")])
    with pytest.raises(ValueError, match="var=None"):
        aggregate_bindings(ds, ["g"], [("o", "sum", None)])
    with pytest.raises(ValueError, match="group_vars"):
        aggregate_bindings(ds, [], [("o", "sum", "v")])


def test_filter_exists_shared_var_semi_join():
    store = rd.from_items(TRIPLES)
    b = match_bgp(store, [("?x", "knows", "?y")], num_partitions=2)
    # keep solutions whose ?x also likes something
    out = filter_exists(b, store, [("?x", "likes", "?z")],
                        num_partitions=2).to_pandas()
    assert set(out["x"]) == {1}
    assert sorted(out["y"]) == [2, 3]
    assert set(out.columns) == {"x", "y"}  # inner-only vars projected out


def test_filter_not_exists_anti_join_differs_from_minus():
    store = rd.from_items(TRIPLES)
    b = match_bgp(store, [("?x", "knows", "?y")], num_partitions=2)
    out = filter_exists(b, store, [("?x", "likes", "?z")], negate=True,
                        num_partitions=2).to_pandas()
    assert set(out["x"]) == {2, 3}
    assert len(out) == 3


def test_filter_exists_no_shared_vars_degenerate():
    store = rd.from_items(TRIPLES)
    b = match_bgp(store, [("?x", "knows", "?y")], num_partitions=2)
    # inner pattern matches something -> EXISTS keeps all
    keep = filter_exists(b, store, [("?a", "likes", 9)],
                         num_partitions=2).to_pandas()
    assert len(keep) == 5
    # ... and NOT EXISTS drops all (MINUS would be identity here)
    drop = filter_exists(b, store, [("?a", "likes", 9)], negate=True,
                         num_partitions=2).to_pandas()
    assert len(drop) == 0
    # inner pattern matches nothing -> polarity flips
    none = filter_exists(b, store, [("?a", "likes", 77)],
                         num_partitions=2).to_pandas()
    assert len(none) == 0
    allkept = filter_exists(b, store, [("?a", "likes", 77)], negate=True,
                            num_partitions=2).to_pandas()
    assert len(allkept) == 5


def test_filter_exists_matches_pandas_reference():
    store = rd.from_items(TRIPLES)
    b = match_bgp(store, [("?x", "knows", "?y")], num_partitions=2)
    t = pd.DataFrame(TRIPLES)
    knows = (t[t["p"] == "knows"][["s", "o"]]
             .rename(columns={"s": "x", "o": "y"}).drop_duplicates())
    likers = set(t[t["p"] == "likes"]["s"])
    for negate in (False, True):
        got = (filter_exists(b, store, [("?x", "likes", "?z")],
                             negate=negate, num_partitions=2)
               .to_pandas().sort_values(["x", "y"]).reset_index(drop=True))
        mask = knows["x"].isin(likers)
        ref = (knows[~mask if negate else mask]
               .sort_values(["x", "y"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype("int64"), ref.astype("int64"))


def test_order_limit_bindings_topk_pages():
    from gliner_transbronchialbiopsy_ray.stages.solutions import (
        order_limit_bindings)
    import ray.data as rd
    rows = [{"c": i, "b": (i * 7) % 5} for i in range(1, 21)]
    ds = rd.from_items(rows).repartition(6)   # force multi-block top-k
    out = order_limit_bindings(
        ds, [("b", "desc"), ("c", "asc")], limit=5, offset=3)
    exp = sorted(rows, key=lambda r: (-r["b"], r["c"]))[3:8]
    assert list(map(tuple, out[["b", "c"]].to_numpy())) == [
        (r["b"], r["c"]) for r in exp]
    # offset past the end -> empty page, columns intact
    far = order_limit_bindings(ds, [("c", "asc")], limit=5, offset=100)
    assert len(far) == 0 and set(far.columns) == {"b", "c"}
    # limit 0 -> empty
    assert len(order_limit_bindings(ds, [("c", "asc")], 0)) == 0


def test_order_limit_bindings_validation():
    from gliner_transbronchialbiopsy_ray.stages.solutions import (
        order_limit_bindings)
    import ray.data as rd
    import pytest
    ds = rd.from_items([{"c": 1}])
    with pytest.raises(ValueError, match="asc|desc"):
        order_limit_bindings(ds, [("c", "up")], 1)
    with pytest.raises(ValueError, match=">= 0"):
        order_limit_bindings(ds, [("c", "asc")], -1)
    with pytest.raises(ValueError, match="at least one"):
        order_limit_bindings(ds, [], 1)


def test_join_bindings_shared_vars():
    from gliner_transbronchialbiopsy_ray.stages.solutions import (
        join_bindings)
    import ray.data as rd
    left = rd.from_items([{"c": 1, "o": 10}, {"c": 1, "o": 11},
                          {"c": 2, "o": 20}, {"c": 3, "o": 30}])
    right = rd.from_items([{"c": 1, "avg": 5}, {"c": 2, "avg": 7}])
    out = join_bindings(left, right).to_pandas()
    got = sorted(map(tuple, out[["c", "o", "avg"]].to_numpy()))
    assert got == [(1, 10, 5), (1, 11, 5), (2, 20, 7)]


def test_join_bindings_cross_product_and_threshold():
    from gliner_transbronchialbiopsy_ray.stages.solutions import (
        join_bindings)
    import ray.data as rd
    import pytest
    a = rd.from_items([{"x": i} for i in range(3)])
    b = rd.from_items([{"y": j} for j in range(2)])
    out = join_bindings(a, b).to_pandas()
    assert sorted(map(tuple, out[["x", "y"]].to_numpy())) == [
        (i, j) for i in range(3) for j in range(2)]
    with pytest.raises(ValueError, match="cross_threshold"):
        join_bindings(a, b, cross_threshold=1)
