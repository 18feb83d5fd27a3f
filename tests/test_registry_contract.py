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


def test_no_duplicate_toplevel_definitions():
    """A second top-level def/class/constant with the same name silently
    shadows the first (a duplicate `_order_chain_triples` once emptied
    q132/q133) — reject duplicates across the whole package."""
    import ast
    import collections
    import pathlib

    pkg = pathlib.Path(__file__).resolve().parents[1]
    files = list((pkg / "gliner_transbronchialbiopsy_ray").rglob("*.py"))
    files += [pkg / "__ray_entry__.py", pkg / "bench.py"]
    for f in files:
        names = collections.Counter()
        for node in ast.parse(f.read_text()).body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                names[node.name] += 1
            elif isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name):
                        names[t.id] += 1
        dups = {n: c for n, c in names.items() if c > 1 and n != "_"}
        assert not dups, f"{f}: duplicate top-level definitions {dups}"
