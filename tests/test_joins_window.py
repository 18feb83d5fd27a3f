"""Temporal joins (stages/joins.py) and window scans (stages/window.py):
semantics beyond the DuckDB oracle — boundary conditions, empty sides,
non-sum aggregates, int dtypes — on tiny synthetic inputs."""

import numpy as np
import pandas as pd
import ray.data

from gliner_transbronchialbiopsy_ray.stages.joins import asof_join, range_join_count
from gliner_transbronchialbiopsy_ray.stages.window import (
    global_prefix_scan,
    keyed_running_agg,
)


def _ts(s):
    return pd.Timestamp(s)


def test_asof_join_semantics():
    left = ray.data.from_pandas(pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "user_id": [7, 7, 7, 9],
        "ts": [_ts("2024-01-10"), _ts("2024-01-20"), _ts("2024-01-05"),
               _ts("2024-01-10")],
    }))
    right = ray.data.from_pandas(pd.DataFrame({
        "o_custkey": [7, 7, 8],
        "o_orderdate": [_ts("2024-01-10"), _ts("2024-01-15"),
                        _ts("2024-01-01")],
        "o_orderkey": [100, 200, 300],
    }))
    out = asof_join(
        left, right, left_key="user_id", right_key="o_custkey",
        left_time="ts", right_time="o_orderdate",
        right_payload=["o_orderdate", "o_orderkey"], n_buckets=4,
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    # event 1: exact match on 01-10 allowed -> order 100
    # event 2: latest <= 01-20 -> order 200
    # event 3: before any order -> dropped (inner)
    # event 4: user 9 has no orders -> dropped
    assert out["event_id"].tolist() == [1, 2]
    assert out["o_orderkey"].tolist() == [100, 200]


def test_range_join_count_boundaries_and_zero():
    orders = ray.data.from_pandas(pd.DataFrame({
        "o_orderkey": [1, 2],
        "o_custkey": [5, 6],
        "o_orderdate": [_ts("2024-01-01"), _ts("2024-01-01")],
    }))
    events = ray.data.from_pandas(pd.DataFrame({
        "user_id": [5, 5, 5, 5],
        "ts": [_ts("2024-01-01"),            # inclusive start
               _ts("2024-01-07 23:59:59"),   # inside
               _ts("2024-01-08"),            # exclusive end (start + 7d)
               _ts("2023-12-31")],           # before
    }))
    out = range_join_count(
        orders, events, left_key="o_custkey", right_key="user_id",
        left_time="o_orderdate", right_time="ts",
        window=pd.Timedelta(days=7), out_cols=["o_orderkey"], n_buckets=4,
    ).to_pandas().sort_values("o_orderkey").reset_index(drop=True)
    assert out.loc[out["o_orderkey"] == 1, "n_in_window"].iloc[0] == 2
    # zero-match left row KEPT with count 0
    assert out.loc[out["o_orderkey"] == 2, "n_in_window"].iloc[0] == 0


def test_keyed_running_agg_max():
    ds = ray.data.from_pandas(pd.DataFrame({
        "k": [1, 1, 1, 2], "o": [1, 2, 3, 1], "v": [5.0, 3.0, 9.0, 4.0],
    }))
    out = keyed_running_agg(
        ds, key="k", order_by=["o"], value="v", out_col="rm", agg="max",
        n_buckets=2,
    ).to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    assert out["rm"].tolist() == [5.0, 5.0, 9.0, 4.0]


def test_global_prefix_scan_int_strict_and_inclusive():
    df = pd.DataFrame({"seq": list(range(10)),
                       "v": [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]})
    ds = ray.data.from_pandas(df).repartition(4)  # force multiple blocks
    strict = global_prefix_scan(ds, "seq", "v", out_col="pm",
                                inclusive=False).to_pandas().sort_values("seq")
    exp = df["v"].cummax().shift(1)
    assert strict["pm"].tolist()[1:] == exp[1:].astype(int).tolist()
    assert strict["pm"].iloc[0] == np.iinfo(np.int64).min

    incl = global_prefix_scan(ds, "seq", "v", out_col="pm",
                              inclusive=True).to_pandas().sort_values("seq")
    assert incl["pm"].tolist() == df["v"].cummax().tolist()


def test_global_prefix_sum_matches_pandas_cumsum():
    from gliner_transbronchialbiopsy_ray.stages.window import global_prefix_sum

    df = pd.DataFrame({"seq": list(range(11)),
                       "v": [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 7]})
    ds = ray.data.from_pandas(df).repartition(4)  # carry must cross blocks
    incl = (global_prefix_sum(ds, "seq", "v", out_col="ps", inclusive=True)
            .to_pandas().sort_values("seq"))
    assert incl["ps"].tolist() == df["v"].cumsum().tolist()
    excl = (global_prefix_sum(ds, "seq", "v", out_col="ps", inclusive=False)
            .to_pandas().sort_values("seq"))
    assert excl["ps"].tolist() == (df["v"].cumsum() - df["v"]).tolist()
    # empty input -> clean empty result
    empty = ray.data.from_pandas(df.iloc[:0])
    assert len(global_prefix_sum(empty, "seq", "v").to_pandas()) == 0
    # STRING order keys work too (carry map keyed by str)
    sdf = pd.DataFrame({"seq": [f"k{i:03d}" for i in range(11)],
                        "v": df["v"]})
    got = (global_prefix_sum(ray.data.from_pandas(sdf).repartition(3),
                             "seq", "v", out_col="ps")
           .to_pandas().sort_values("seq"))
    assert got["ps"].tolist() == sdf["v"].cumsum().tolist()


def test_simhash_neardup_pairs_planted():
    from gliner_transbronchialbiopsy_ray.stages.dedup import (
        simhash_neardup_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog " * 20
    near = base.replace("lazy", "sleepy", 1)  # one token of ~180 changed
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": near},
        {"doc_id": 3, "text": "completely unrelated legal boilerplate " * 30},
    ]
    out = simhash_neardup_pairs(
        ray.data.from_items(rows), max_hamming=3, bands=4, concurrency=1
    ).to_pandas()
    pairs = set(zip(out["left_id"], out["right_id"]))
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)
    h = out[(out["left_id"] == 1) & (out["right_id"] == 2)]["hamming"].iloc[0]
    assert 0 <= h <= 3


def test_ntile_tiny_groups_match_sql_rule(ray_session):
    """NTILE with fewer rows than buckets: each row gets its own tile
    (1..n), never an empty-bucket division error; percent_rank of a
    single-row group is 0."""
    from gliner_transbronchialbiopsy_ray.pipelines.queries import q76_ntile_rank
    import duckdb
    import tempfile, os

    df = pd.DataFrame({
        "event_type": ["a", "a", "b"],
        "event_id": [1, 2, 3],
        "value": [5.0, 1.0, 9.0],
    })
    d = tempfile.mkdtemp()
    df.to_parquet(os.path.join(d, "events.parquet"))
    got = q76_ntile_rank(d)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    from gliner_transbronchialbiopsy_ray.pipelines.queries import Q76_SQL
    want = con.execute(Q76_SQL).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False)
    assert got[got["event_type"] == "b"]["pct_rank"].iloc[0] == 0.0


def test_grouped_ordered_concat_stitches_groups_spanning_blocks(ray_session):
    """Boundary-stitch contract: with many tiny blocks, a single group's
    rows land in several adjacent sorted blocks; the stitched result must
    equal the single-partition answer — order within the group derived
    from the order column, never from block layout."""
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.stages.window import (
        grouped_ordered_concat,
    )

    rows = []
    # group 'g0' is huge (spans many blocks); others are small
    for i in range(40):
        rows.append({"k": "g0", "o": i, "v": chr(65 + i % 26)})
    for g in range(1, 6):
        for i in range(3):
            rows.append({"k": f"g{g}", "o": i, "v": str(i)})
    ds = rd.from_items(rows).repartition(12)
    out = (grouped_ordered_concat(ds, key="k", order="o", val="v")
           .to_pandas().sort_values("k").reset_index(drop=True))

    expect_g0 = ";".join(chr(65 + i % 26) for i in range(40))
    got = out.set_index("k")
    assert got.loc["g0", "concat"] == expect_g0
    assert int(got.loc["g0", "n"]) == 40
    for g in range(1, 6):
        assert got.loc[f"g{g}", "concat"] == "0;1;2"
    # scrambled input order must not change the result
    ds2 = rd.from_items(rows[::-1]).repartition(7)
    out2 = (grouped_ordered_concat(ds2, key="k", order="o", val="v")
            .to_pandas().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, out2)


def test_coalesce_for_join_empty_block_workaround(ray_session):
    """Ray 2.49's native join raises ArrowInvalid when an input dataset
    carries EMPTY blocks (map_groups emits them for empty groups);
    coalesce_for_join rebuilds even, non-empty blocks so the join runs."""
    import pyarrow as pa

    from gliner_transbronchialbiopsy_ray.stages.joins import coalesce_for_join

    empty = pa.table({"k": pa.array([], type=pa.int64())})
    full = pa.table({"k": pa.array([1], type=pa.int64())})
    left = ray.data.from_arrow([empty, full, empty])
    right = ray.data.from_items([{"kk": 1, "v": "x"}])
    fixed = coalesce_for_join(left, 4)
    j = fixed.join(right, join_type="inner", num_partitions=4,
                   on=("k",), right_on=("kk",),
                   left_suffix="", right_suffix="_r")
    assert j.to_pandas().to_dict("records") == [{"k": 1, "v": "x"}]


def test_dataset_diff_symmetric_difference():
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.stages.joins import dataset_diff

    a = rd.from_items([{"k": 1, "v": "x"}, {"k": 2, "v": "y"},
                       {"k": 2, "v": "y"},  # dup rows collapse
                       {"k": 3, "v": "z"}])
    b = rd.from_items([{"k": 2, "v": "y"}, {"k": 3, "v": "ZZ"},
                       {"k": 4, "v": "w"}])
    out = dataset_diff(a, b, ["k", "v"]).to_pandas()
    got = sorted(map(tuple, out[["k", "v", "change"]].to_numpy()))
    assert got == [
        (1, "x", "removed"),
        (3, "ZZ", "added"), (3, "z", "removed"),  # value change = both
        (4, "w", "added"),
    ]


def test_smart_join_broadcast_and_shuffle_paths_agree():
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.stages.joins import smart_join

    left = rd.from_items([{"k": i % 5, "v": i} for i in range(40)])
    right = rd.from_items([{"rk": k, "name": f"n{k}"} for k in range(4)])

    def run(threshold):
        l2 = rd.from_items([{"k": i % 5, "v": i} for i in range(40)])
        r2 = rd.from_items([{"rk": k, "name": f"n{k}"} for k in range(4)])
        out = smart_join(l2, r2, on="k", right_on="rk",
                         broadcast_threshold=threshold,
                         num_partitions=2).to_pandas()
        return (out[["k", "v", "name"]]
                .sort_values(["k", "v"]).reset_index(drop=True))

    bc = run(threshold=1000)   # broadcast path (right is tiny)
    sh = run(threshold=0)      # forced shuffle path
    pd.testing.assert_frame_equal(bc, sh)
    assert len(bc) == 32  # k=4 left rows (8 of them) have no match


def test_keyed_topk_matches_row_number():
    from gliner_transbronchialbiopsy_ray.stages.window import keyed_topk
    import ray.data as rd
    rows = [{"k": i % 3, "v": (i * 7) % 11, "id": i} for i in range(30)]
    ds = rd.from_items(rows).repartition(5)
    out = keyed_topk(ds, "k", [("v", "asc"), ("id", "asc")],
                     k=2).to_pandas()
    import pandas as pd
    exp = (pd.DataFrame(rows)
           .sort_values(["v", "id"], kind="stable")
           .groupby("k", sort=False).head(2))
    got = sorted(map(tuple, out[["k", "v", "id"]].to_numpy()))
    want = sorted(map(tuple, exp[["k", "v", "id"]].to_numpy()))
    assert got == want
    # desc direction + validation
    top1 = keyed_topk(ds, "k", [("v", "desc"), ("id", "asc")],
                      k=1).to_pandas()
    exp1 = (pd.DataFrame(rows)
            .sort_values(["v", "id"], ascending=[False, True],
                         kind="stable").groupby("k", sort=False).head(1))
    assert sorted(map(tuple, top1[["k", "v", "id"]].to_numpy())) \
        == sorted(map(tuple, exp1[["k", "v", "id"]].to_numpy()))
    import pytest
    with pytest.raises(ValueError, match="asc|desc"):
        keyed_topk(ds, "k", [("v", "up")], 1)
    with pytest.raises(ValueError, match=">= 1"):
        keyed_topk(ds, "k", [("v", "asc")], 0)


def test_keyed_ranks_matches_duckdb():
    import duckdb
    import pandas as pd
    import numpy as np
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.stages.window import keyed_ranks
    rng = np.random.RandomState(4)
    df = pd.DataFrame({
        "id": np.arange(80, dtype="int64"),
        "k": rng.choice(["a", "b", "c"], 80),
        "v": rng.randint(0, 9, 80).astype("int64")})   # heavy ties
    got = (keyed_ranks(rd.from_pandas(df).repartition(5),
                       "k", "v", ["id"]).to_pandas()
           .sort_values("id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT id, k, v,
               RANK() OVER w AS rank,
               DENSE_RANK() OVER w AS dense_rank,
               CAST((1000000 * (RANK() OVER w - 1)) //
                    GREATEST(COUNT(*) OVER (PARTITION BY k) - 1, 1)
                    AS BIGINT) AS percent_rank_ppm
        FROM t
        WINDOW w AS (PARTITION BY k ORDER BY v)
        ORDER BY id
    """).df()
    for c in ("rank", "dense_rank", "percent_rank_ppm"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_keyed_ranks_single_row_partition():
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.stages.window import keyed_ranks
    ds = rd.from_items([{"id": 0, "k": "solo", "v": 5}])
    out = keyed_ranks(ds, "k", "v", ["id"]).to_pandas().iloc[0]
    assert (out["rank"], out["dense_rank"],
            out["percent_rank_ppm"]) == (1, 1, 0)


def test_keyed_lag_matches_duckdb():
    import duckdb
    import pandas as pd
    import numpy as np
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.stages.window import keyed_lag
    rng = np.random.RandomState(8)
    df = pd.DataFrame({
        "id": np.arange(60, dtype="int64"),
        "k": rng.choice(["a", "b"], 60),
        "t": rng.randint(0, 30, 60).astype("int64"),   # ties
        "v": rng.randint(0, 100, 60).astype("int64")})
    got = (keyed_lag(rd.from_pandas(df).repartition(4),
                     "k", "t", "v", ["id"]).to_pandas()
           .sort_values("id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t2", df)
    want = con.execute("""
        SELECT id,
               LAG(v) OVER w AS prev_value,
               LEAD(v) OVER w AS next_value
        FROM t2 WINDOW w AS (PARTITION BY k ORDER BY t, id)
        ORDER BY id
    """).df()
    for c in ("prev_value", "next_value"):
        g = got[c].to_numpy()
        w = want[c].to_numpy("float64")
        assert ((np.isnan(g) & np.isnan(w)) | (g == w)).all(), c
    d = got["delta"].to_numpy()
    p = got["prev_value"].to_numpy()
    assert ((np.isnan(d) & np.isnan(p))
            | (d == got["v"].to_numpy() - p)).all()


def test_keyed_running_agg_count_distinct(ray_session):
    import pandas as pd
    import ray.data as rd

    from gliner_transbronchialbiopsy_ray.stages.window import (
        keyed_running_agg,
    )

    rows = [
        {"k": "a", "o": 1, "v": 10},
        {"k": "a", "o": 2, "v": 20},
        {"k": "a", "o": 3, "v": 10},  # repeat: count stays
        {"k": "a", "o": 4, "v": 30},
        {"k": "b", "o": 1, "v": 10},
        {"k": "b", "o": 2, "v": 10},
    ]
    for parts in (1, 3):
        ds = rd.from_items(rows).repartition(parts)
        out = (keyed_running_agg(ds, key="k", order_by=["o"], value="v",
                                 out_col="rd", agg="count_distinct")
               .to_pandas().sort_values(["k", "o"]))
        assert list(out["rd"]) == [1, 2, 2, 3, 1, 1], parts


def test_keyed_range_frame_sum_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gliner_transbronchialbiopsy_ray.stages.window import (
        keyed_range_frame_sum,
    )

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "k": rng.integers(0, 4, 300).astype("int64"),
        # duplicate order values exercise peer inclusion
        "o": rng.integers(0, 60, 300).astype("int64"),
        "v": rng.integers(-9, 10, 300).astype("int64"),
    })
    df["rid"] = np.arange(300, dtype="int64")
    for parts in (1, 4):
        got = (keyed_range_frame_sum(
            rd.from_pandas(df).repartition(parts),
            key="k", order="o", value="v", range_width=10)
            .to_pandas().sort_values("rid").reset_index(drop=True))
        exp = duckdb.sql("""
            SELECT rid, CAST(sum(v) OVER (
                PARTITION BY k ORDER BY o
                RANGE BETWEEN 10 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS w
            FROM df ORDER BY rid""").fetchdf()
        assert list(got["w_sum"].astype("int64")) == \
            list(exp["w"].astype("int64")), parts


def test_bloom_semijoin_prunes_and_is_exact(ray_session):
    """The q276 bloom prefilter must (a) never drop a true match and
    (b) actually prune: FP rate of a 2^20-bit/4-hash bloom at ~3k keys
    is way under 1%, so non-qualifying rows surviving the prefilter
    should be rare."""
    import numpy as np

    sf = "/root/testdata/sf0.001"
    import duckdb
    truth = duckdb.sql(f"""
        SELECT count(*) FROM read_parquet('{sf}/lineitem.parquet')
        WHERE l_orderkey IN (
          SELECT o_orderkey FROM read_parquet('{sf}/orders.parquet')
          WHERE o_totalprice > 400000)""").fetchone()[0]
    total = duckdb.sql(f"""
        SELECT count(*) FROM read_parquet('{sf}/lineitem.parquet')
        """).fetchone()[0]

    # replicate the query's bloom inline to measure the prefilter
    M_BITS = 1 << 20
    MULTS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
             0x165667B19E3779F9, 0x27D4EB2F165667C5)

    def positions(keys):
        k = keys.astype(np.uint64)
        return [((k * np.uint64(m)) >> np.uint64(40)).astype(np.int64)
                % M_BITS for m in MULTS]

    qual = duckdb.sql(f"""
        SELECT o_orderkey FROM read_parquet('{sf}/orders.parquet')
        WHERE o_totalprice > 400000""").fetchdf()[
            "o_orderkey"].to_numpy("int64")
    li = duckdb.sql(f"""
        SELECT l_orderkey FROM read_parquet('{sf}/lineitem.parquet')
        """).fetchdf()["l_orderkey"].to_numpy("int64")
    bits = np.zeros(M_BITS // 64, dtype=np.uint64)
    for pos in positions(qual):
        np.bitwise_or.at(bits, pos >> 6,
                         np.uint64(1) << (pos & 63).astype(np.uint64))
    mask = np.ones(len(li), dtype=bool)
    for pos in positions(li):
        mask &= (bits[pos >> 6]
                 >> (pos & 63).astype(np.uint64)) & 1 != 0
    survivors = int(mask.sum())
    qual_set = set(qual.tolist())
    true_mask = np.fromiter((k in qual_set for k in li), dtype=bool,
                            count=len(li))
    # no false negatives
    assert (mask | ~true_mask).all() and survivors >= truth
    # and real pruning: survivors are close to the true matches,
    # far below the full table
    assert survivors < total * 0.6
    fp = survivors - int(true_mask.sum())
    assert fp <= max(10, 0.01 * total)


def test_snapshot_diff_change_types_and_mask(ray_session):
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.stages.joins import snapshot_diff

    a = rd.from_items([
        {"k": 1, "x": 10, "y": "a"},
        {"k": 2, "x": 20, "y": "b"},
        {"k": 3, "x": 30, "y": "c"},
        {"k": 4, "x": 40, "y": "d"},
    ])
    b = rd.from_items([
        {"k": 1, "x": 10, "y": "a"},     # unchanged
        {"k": 2, "x": 99, "y": "b"},     # changed: x
        {"k": 3, "x": 31, "y": "z"},     # changed: x,y
        {"k": 5, "x": 50, "y": "e"},     # added (4 removed)
    ])
    out = (snapshot_diff(a, b, key="k", cols=["x", "y"]).to_pandas()
           .set_index("k").sort_index())
    assert out.loc[1, "change_type"] == "unchanged"
    assert out.loc[2, "change_type"] == "changed"
    assert out.loc[2, "changed_cols"] == "x"
    assert out.loc[3, "changed_cols"] == "x,y"
    assert out.loc[4, "change_type"] == "removed"
    assert out.loc[5, "change_type"] == "added"
    assert (out.loc[[1, 4, 5], "changed_cols"] == "").all()


def test_snapshot_diff_null_semantics(ray_session):
    """ADVICE r3: IS DISTINCT FROM semantics — a column null in BOTH
    snapshots is unchanged (plain != would report NaN != NaN as
    changed); null vs value IS a change."""
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.stages.joins import snapshot_diff

    a = rd.from_items([
        {"k": 1, "x": None, "y": "a"},   # null in both -> unchanged
        {"k": 2, "x": None, "y": "b"},   # null -> value: changed (x)
        {"k": 3, "x": 3.0, "y": None},   # value -> null: changed (x)
        {"k": 4, "x": None, "y": None},  # all-null in both -> unchanged
    ])
    b = rd.from_items([
        {"k": 1, "x": None, "y": "a"},
        {"k": 2, "x": 2.0, "y": "b"},
        {"k": 3, "x": None, "y": None},
        {"k": 4, "x": None, "y": None},
    ])
    out = (snapshot_diff(a, b, key="k", cols=["x", "y"]).to_pandas()
           .set_index("k").sort_index())
    assert out.loc[1, "change_type"] == "unchanged"
    assert out.loc[2, "change_type"] == "changed"
    assert out.loc[2, "changed_cols"] == "x"
    assert out.loc[3, "change_type"] == "changed"
    assert out.loc[3, "changed_cols"] == "x"
    assert out.loc[4, "change_type"] == "unchanged"
    assert out.loc[4, "changed_cols"] == ""


def test_snapshot_diff_duplicate_key_raises(ray_session):
    import pytest
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.stages.joins import snapshot_diff

    a = rd.from_items([{"k": 1, "x": 1}, {"k": 1, "x": 2}])
    b = rd.from_items([{"k": 1, "x": 1}])
    with pytest.raises(Exception, match="duplicate"):
        snapshot_diff(a, b, key="k", cols=["x"]).to_pandas()


def test_grid_distance_join_exact_and_edges(ray_session):
    import itertools

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gliner_transbronchialbiopsy_ray.stages.joins import grid_distance_join

    # planted layout: a tight cluster, a boundary-straddling pair (cells
    # differ), an exact-radius pair, and an isolated far point
    pts = pd.DataFrame({
        "id": [1, 2, 3, 10, 11, 20, 21, 99],
        "x":  [0, 3, 4, 29, 31, 50, 50, 500],
        "y":  [0, 4, 3, 0,  0,  70, 85, 500],
    })
    got = (grid_distance_join(rd.from_pandas(pts), radius=15)
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    # brute-force reference
    exp = []
    for (i, r1), (j, r2) in itertools.combinations(pts.iterrows(), 2):
        d2 = (r1["x"] - r2["x"]) ** 2 + (r1["y"] - r2["y"]) ** 2
        if d2 <= 225:
            a, b = sorted((r1["id"], r2["id"]))
            exp.append((a, b, d2))
    exp = sorted(exp)
    assert list(map(tuple, got[["a", "b", "dist_sq"]].to_numpy())) == exp
    # the boundary pair (10, 11) crosses cells 1 and 2 — found once
    assert (10, 11, 4) in exp and ((got["a"] == 10) & (got["b"] == 11)).sum() == 1
    # exact-radius inclusivity: (20, 21) at distance exactly 15
    assert (20, 21, 225) in exp
    # empty input
    empty = rd.from_pandas(pd.DataFrame({"id": pd.Series(dtype="int64"),
                                         "x": pd.Series(dtype="int64"),
                                         "y": pd.Series(dtype="int64")}))
    assert grid_distance_join(empty, radius=5).count() == 0
