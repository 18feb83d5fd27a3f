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
