"""Local mirror of the driver's correctness gate: run every query's Ray
implementation AND its DuckDB oracle on the same parquet tables, compare
row-count + schema + values (order-insensitive, columns sorted by name).
Runs at sf0.001 to stay fast; the driver runs sf0.01."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from gliner_transbronchialbiopsy_ray.pipelines.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

ORACLE_QUERIES = sorted(name for name, (_, sql) in QUERIES.items() if sql)
ROWS_ONLY_QUERIES = sorted(name for name, (_, sql) in QUERIES.items() if not sql)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:  # list/array cells aren't sortable — stringify
        if df[c].map(lambda v: isinstance(v, (list, tuple, np.ndarray, dict))).any():
            df[c] = df[c].map(lambda v: str(list(v)) if v is not None else None)
    if len(df):
        df = df.sort_values(list(df.columns), kind="stable")
    return df.reset_index(drop=True)


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pd.DataFrame):
        return result
    return result.to_pandas()  # pyarrow.Table


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(name, con):
    fn, sql = QUERIES[name]
    got = _normalize(_to_df(fn(SF_DIR)))
    exp = _normalize(con.execute(sql).fetchdf())
    assert list(got.columns) == list(exp.columns), (
        f"{name} schema mismatch: {list(got.columns)} vs {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name} row count {len(got)} vs {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
    # Driver's value-hash is dtype-sensitive (int 278928571 vs float
    # 278928571.0 hash differently) — mirror that by comparing the repr
    # of every cell, which distinguishes int/float/str even when values
    # compare equal numerically.
    def _cell_repr(v):
        # numpy scalar -> python native first, so int32 vs int64 (which the
        # driver's hash treats as equal) doesn't false-alarm, while
        # int-vs-float (which it doesn't) is caught.
        return repr(v.item() if hasattr(v, "item") else v)

    got_repr = got.map(_cell_repr)
    exp_repr = exp.map(_cell_repr)
    mism = (got_repr != exp_repr)
    assert not mism.to_numpy().any(), (
        f"{name} value-repr mismatch (dtype drift?): "
        f"{[(c, got_repr[c][mism[c]].head(3).tolist(), exp_repr[c][mism[c]].head(3).tolist()) for c in got.columns if mism[c].any()]}"
    )


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run_and_are_deterministic(name):
    fn, _ = QUERIES[name]
    a = _normalize(_to_df(fn(SF_DIR)))
    b = _normalize(_to_df(fn(SF_DIR)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert len(a) >= 0
