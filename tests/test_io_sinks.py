"""Store-layer IO round-trips (K1/K3/K4 analogs)."""

import glob

import pandas as pd
import ray.data

from gliner_transbronchialbiopsy_ray import fixtures
from gliner_transbronchialbiopsy_ray.config import PipelineConfig
from gliner_transbronchialbiopsy_ray.pipelines.btb import triples_dataset
from gliner_transbronchialbiopsy_ray.sources.io import (
    read_table,
    write_csv,
    write_json,
    write_triples,
)


def _tri():
    path = fixtures.write_corpus(80, seed=42, shards=1)
    return triples_dataset(
        ray.data.read_parquet(f"{path}/documents"),
        PipelineConfig(ner_concurrency=1, ner_num_cpus=0.5),
    )


def test_triples_parquet_roundtrip(tmp_path):
    out = str(tmp_path / "triples")
    write_triples(_tri(), out)
    back = read_table(out).to_pandas()
    orig = _tri().to_pandas()
    key = ["subj", "pred", "obj"]
    pd.testing.assert_frame_equal(
        back.sort_values(key).reset_index(drop=True)[sorted(back.columns)],
        orig.sort_values(key).reset_index(drop=True)[sorted(orig.columns)],
        check_dtype=False,
    )


def test_csv_and_json_sinks(tmp_path):
    ds = ray.data.from_items([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
    write_csv(ds, str(tmp_path / "csv"))
    write_json(ray.data.from_items([{"a": 1}]), str(tmp_path / "json"))
    assert glob.glob(str(tmp_path / "csv" / "*"))
    assert glob.glob(str(tmp_path / "json" / "*"))
    back = ray.data.read_csv(str(tmp_path / "csv")).to_pandas()
    assert sorted(back["a"].tolist()) == [1, 2]


def test_partitioned_triple_store_roundtrip_and_pruning(ray_session, tmp_path):
    """K4 partitioned layout: hive dirs per predicate; single-predicate
    read lists ONLY that directory and re-attaches the partition col."""
    import os

    import pyarrow as pa
    import ray.data

    from gliner_transbronchialbiopsy_ray.sources.io import (
        read_triples_predicate,
        write_triples_partitioned,
    )

    tri = ray.data.from_arrow(pa.table({
        "subj": ["d1", "d2", "d3", "d4"],
        "pred": ["grade", "grade", "site", "infection"],
        "obj": ["A2", "A1", "LSD", "CMV"],
    }))
    store = str(tmp_path / "tri_store")
    write_triples_partitioned(tri, store)
    assert sorted(os.listdir(store)) == [
        "pred=grade", "pred=infection", "pred=site"]
    back = read_triples_predicate(store, "grade").to_pandas()
    assert sorted(back["obj"]) == ["A1", "A2"]
    assert set(back["pred"]) == {"grade"}
    assert sorted(back.columns) == ["obj", "pred", "subj"]


def test_zonemap_roundtrip_and_pruning():
    import tempfile

    import numpy as np
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.sources.io import (
        read_zonemapped, write_zonemapped)
    rng = np.random.RandomState(3)
    keys = rng.randint(0, 10_000, 5000).astype("int64")
    ds = rd.from_items([{"k": int(k), "v": int(k) * 2} for k in keys]
                       ).repartition(8)
    d = tempfile.mkdtemp()
    zones = write_zonemapped(ds, d, "k", n_ranges=8)
    assert zones["rows"].sum() == 5000
    assert len(zones) >= 4          # ranges actually split

    # narrow range query: prunes most ranges, values exact
    out, nread = read_zonemapped(d, lo=1000, hi=1500)
    df = out.to_pandas()
    want = np.sort(keys[(keys >= 1000) & (keys <= 1500)])
    assert np.array_equal(np.sort(df["k"].to_numpy()), want)
    assert (df["v"].to_numpy() == df["k"].to_numpy() * 2).all()
    assert nread < len(zones)       # data skipping really happened

    # unbounded read returns everything
    out_all, nall = read_zonemapped(d)
    assert out_all.count() == 5000 and nall == len(zones)


def test_zorder_box_query_prunes_and_is_exact():
    import tempfile

    import numpy as np
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.sources.io import (
        morton2, read_zordered_box, write_zordered)
    # morton monotonicity sanity
    assert int(morton2(np.array([0]), np.array([0]))[0]) == 0
    assert int(morton2(np.array([1]), np.array([0]))[0]) == 1
    assert int(morton2(np.array([0]), np.array([1]))[0]) == 2
    assert int(morton2(np.array([1]), np.array([1]))[0]) == 3

    rng = np.random.RandomState(5)
    xs = rng.randint(0, 1000, 4000).astype("int64")
    ys = rng.randint(0, 1000, 4000).astype("int64")
    ds = rd.from_items([{"x": int(a), "y": int(b), "v": int(a + b)}
                        for a, b in zip(xs, ys)]).repartition(6)
    d = tempfile.mkdtemp()
    zones = write_zordered(ds, d, "x", "y", n_ranges=16)
    out, nread = read_zordered_box(d, "x", 100, 200, "y", 100, 200)
    df = out.to_pandas()
    inside = (xs >= 100) & (xs <= 200) & (ys >= 100) & (ys <= 200)
    assert len(df) == inside.sum()
    assert (df["v"].to_numpy() ==
            df["x"].to_numpy() + df["y"].to_numpy()).all()
    assert nread < len(zones)      # 2-D skipping really pruned


def test_arrow_ipc_roundtrip_and_atomic_names(ray_session, tmp_path):
    import pandas as pd
    import ray.data as rd

    from gliner_transbronchialbiopsy_ray.sources.io import (
        read_arrow_ipc, write_arrow_ipc,
    )

    rows = [{"a": i, "b": f"s{i}"} for i in range(57)]
    ds = rd.from_items(rows).repartition(3)
    paths = write_arrow_ipc(ds, str(tmp_path / "ipc"), rows_per_file=20)
    assert paths and all(p.endswith(".arrows") for p in paths)
    back = (read_arrow_ipc(paths).to_pandas()
            .sort_values("a").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        back, pd.DataFrame(rows), check_dtype=False)
    # content-addressed: a re-run publishes the SAME file set (no dupes)
    paths2 = write_arrow_ipc(ds, str(tmp_path / "ipc"), rows_per_file=20)
    assert set(paths2) == set(paths)


def test_unify_schemas_widening_and_conflicts():
    import pyarrow as pa
    import pytest

    from gliner_transbronchialbiopsy_ray.sources.io import unify_schemas

    a = pa.schema([("k", pa.int32()), ("x", pa.float32())])
    b = pa.schema([("k", pa.int64()), ("y", pa.string())])
    u = unify_schemas([a, b])
    assert u.names == ["k", "x", "y"]          # first-seen order
    assert u.field("k").type == pa.int64()     # int widens
    c = pa.schema([("x", pa.int16())])
    u2 = unify_schemas([a, c])
    assert u2.field("x").type == pa.float64()  # int+float -> float64
    with pytest.raises(ValueError, match="conflict"):
        unify_schemas([a, pa.schema([("x", pa.string())])])
    # mixed signedness widens to the smallest signed type holding BOTH
    # ranges (ADVICE r4: bit-width-alone kept first-seen arbitrarily)
    mix = unify_schemas([pa.schema([("k", pa.uint32())]),
                         pa.schema([("k", pa.int32())])])
    assert mix.field("k").type == pa.int64()
    mix2 = unify_schemas([pa.schema([("k", pa.int64())]),
                          pa.schema([("k", pa.uint8())])])
    assert mix2.field("k").type == pa.int64()
    mix3 = unify_schemas([pa.schema([("k", pa.uint8())]),
                          pa.schema([("k", pa.int8())])])
    assert mix3.field("k").type == pa.int16()
    # uint64 + signed has no 128-bit home: loud error both directions
    for pair in ([("k", pa.uint64())], [("k", pa.int8())]):
        with pytest.raises(ValueError, match="uint64"):
            unify_schemas([pa.schema([("k", pa.uint64())]),
                           pa.schema([("k", pa.int64())])])
    # same-signedness unsigned still takes the wider unsigned
    mix4 = unify_schemas([pa.schema([("k", pa.uint16())]),
                          pa.schema([("k", pa.uint64())])])
    assert mix4.field("k").type == pa.uint64()


def test_read_parquet_evolving_pads_and_casts(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gliner_transbronchialbiopsy_ray.sources.io import read_parquet_evolving

    pq.write_table(pa.table({"id": pa.array([1, 2], pa.int32()),
                             "a": pa.array([10, 20], pa.int64())}),
                   str(tmp_path / "f1.parquet"))
    pq.write_table(pa.table({"id": pa.array([3], pa.int64()),
                             "b": pa.array(["z"], pa.string())}),
                   str(tmp_path / "f2.parquet"))
    out = read_parquet_evolving(str(tmp_path)).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    assert list(out["id"]) == [1, 2, 3]          # int32 widened into int64
    assert list(out["a"].fillna(-1)) == [10, 20, -1]
    assert list(out["b"].fillna("")) == ["", "", "z"]
    # column pruning: only the requested subset survives
    sub = read_parquet_evolving(str(tmp_path), columns=["id", "b"]).to_pandas()
    assert sorted(sub.columns) == ["b", "id"]
