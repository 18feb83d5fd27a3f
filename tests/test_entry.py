"""Driver-contract smoke: entry() returns a non-empty Dataset with a stable
schema; queries()/oracle_sql() keys line up."""

import ray.data


def test_entry_smoke():
    import __ray_entry__ as e

    ds = e.entry()
    assert isinstance(ds, ray.data.Dataset)
    df = ds.to_pandas()
    assert len(df) >= 1
    assert {"doc_id", "content_hash", "n_tokens", "is_duplicate"} <= set(df.columns)


def test_query_registry_consistent():
    import __ray_entry__ as e

    qs = e.queries()
    sqls = e.oracle_sql()
    assert len(qs) >= 25
    assert set(sqls) <= set(qs)
    assert all(callable(f) for f in qs.values())
