"""Driver-contract meta-tests: registry shape, oracle SQL validity."""

import inspect

import duckdb

from gliner_transbronchialbiopsy_ray.pipelines.queries import QUERIES

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def test_registry_shape():
    assert len(QUERIES) >= 50
    for name, (fn, sql) in QUERIES.items():
        assert callable(fn), name
        params = [
            p for p in inspect.signature(fn).parameters.values()
            if p.default is inspect.Parameter.empty
        ]
        assert len(params) == 1, f"{name} must take exactly sf_dir"
        assert sql is None or isinstance(sql, str)


def test_oracle_sql_parses_and_plans():
    """Every oracle string must at least EXPLAIN against the driver's
    pre-registered views (catches typos before the driver does)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    for name, (_fn, sql) in QUERIES.items():
        if sql:
            con.execute(f"EXPLAIN {sql}")  # raises on invalid SQL
