"""Store-layer IO: Lance target, parquet fallback (SURVEY §7.2).

The north-star store is Lance (`ray.data.read_lance` / `write_lance`); this
sandbox has no `pylance`, so both helpers gate on the import and fall back
to parquet with the identical schema.  All tests pass either way.
"""

from __future__ import annotations

import ray.data


def _has_lance() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_table(path: str, **kwargs) -> ray.data.Dataset:
    if _has_lance() and (path.endswith(".lance") or kwargs.pop("format", "") == "lance"):
        return ray.data.read_lance(path, **kwargs)
    return ray.data.read_parquet(path, **kwargs)


def write_triples(ds: ray.data.Dataset, path: str, **kwargs) -> None:
    """Write the triple table to the backing store.  Partitioned parquet by
    default (one file set per block — resumable layout comes from
    state/checkpoint.py, which wraps this per input partition)."""
    if _has_lance() and path.endswith(".lance"):
        ds.write_lance(path, **kwargs)
    else:
        ds.write_parquet(path, **kwargs)


def write_csv(ds: ray.data.Dataset, path: str, **kwargs) -> None:
    """CSV sink (reference K1 export analog; debug-scale only)."""
    ds.write_csv(path, **kwargs)


def write_json(ds: ray.data.Dataset, path: str, **kwargs) -> None:
    """JSON sink (reference K3 export analog)."""
    ds.write_json(path, **kwargs)


def write_excel(ds: ray.data.Dataset, path: str,
                sheet_name: str = "Résultats") -> str:
    """Excel results sink (reference K2, dashboard_v1.py:487-519, minus
    styling) — pure-stdlib workbook writer, see sources/xlsx.py."""
    from .xlsx import results_to_xlsx

    return results_to_xlsx(ds, path, sheet_name=sheet_name)


def write_triples_partitioned(
    ds: ray.data.Dataset, path: str,
    partition_cols: list[str] | None = None, **kwargs,
) -> None:
    """SPO-index analog: hive-partitioned parquet (`pred=.../...parquet`
    by default).  Two scale properties fall out of the layout: (1) a
    per-predicate query prunes at the READ — only that directory's files
    are listed/fetched; (2) output is resumable — a re-run can skip
    predicate directories that already exist (the key-partitioned
    counterpart of state/checkpoint.py's input-shard partitioning).
    Predicates are a bounded vocabulary here (config label set), so the
    directory fan-out is bounded; for an unbounded partition key, bucket
    the key first."""
    ds.write_parquet(path, partition_cols=partition_cols or ["pred"],
                     **kwargs)


def read_triples_predicate(
    path: str, pred: str, partition_col: str = "pred", **kwargs,
) -> ray.data.Dataset:
    """Partition-pruned read of ONE predicate from a
    `write_triples_partitioned` store: lists only `pred=<value>/`, never
    touching other predicates' files.  Ray's hive partitioning re-infers
    the partition value from the path and attaches it as a column."""
    sub = f"{path.rstrip('/')}/{partition_col}={pred}"
    return ray.data.read_parquet(sub, **kwargs)
