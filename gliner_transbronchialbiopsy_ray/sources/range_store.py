"""Range-partitioned (clustered) parquet store: sort-free key clustering
with manifest-driven pruned reads.

The warehouse "clustered table" primitive: rows are bucketed into
contiguous key ranges (boundaries from a streamed quantile sample, no
global sort) and written hive-partitioned as `range_id=<r>/...parquet`
with a JSON manifest of the boundaries.  A key-range query then reads
ONLY the overlapping `range_id` directories — at 100 TB the difference
between scanning a day and scanning a decade — and applies the exact
residual filter to the edge ranges (interior ranges pass it trivially).

Scale notes:
- Boundary estimation is one streamed pass of per-batch evenly-ranked
  samples (bounded: `sample_per_batch` rows per batch), folded on the
  driver in canonical (sorted) order — never a global sort, never a
  full-column materialization.
- Row->range assignment is a broadcast of the tiny boundary vector +
  one vectorized np.searchsorted per batch.
- The write is all-or-nothing per `path`: the manifest is written LAST,
  so a crashed write is invisible to readers; per-shard resumability
  composes with state/checkpoint.py by writing one store per shard.
- Correctness does not depend on boundary quality: skewed boundaries
  cost pruning efficiency, never rows (the residual filter is exact).
- Timestamp keys compare as their exact int64 microsecond value end to
  end (a float64 mantissa is ~256 us coarse at the 2024 epoch — floats
  are never used for int/timestamp keys).

Key columns: int64 / float64 / timestamp[us]; the manifest records the
logical type so `read_key_range` accepts timestamps for `lo`/`hi`.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_MANIFEST = "_range_manifest.json"


def _key_kind(ds: ray.data.Dataset, key: str) -> str:
    sch = ds.schema()
    t = dict(zip(sch.names, sch.types))[key]
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_floating(t):
        return "float"
    return "int"


def _key_values(batch: pa.Table, key: str, kind: str) -> np.ndarray:
    col = batch.column(key)
    if kind == "timestamp":
        # normalize the unit first: a timestamp[ns] column (pandas
        # default) must compare in the same us domain the manifest uses
        col = pc.cast(col, pa.timestamp("us"))
        return pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)
    return col.to_numpy(zero_copy_only=False)


def _scalar(value, kind: str):
    if kind == "timestamp":
        return int(pd.Timestamp(value).value // 1000)  # ns -> us
    return float(value) if kind == "float" else int(value)


def compute_range_boundaries(
    ds: ray.data.Dataset, key: str,
    num_ranges: int = 16, sample_per_batch: int = 256,
) -> list:
    """`num_ranges - 1` (or fewer, under ties) interior boundaries from a
    streamed evenly-ranked per-batch sample.  Partials are tiny
    (<= sample_per_batch rows per batch); the driver fold sorts the
    concatenated sample, so block completion order cannot change it."""
    kind = _key_kind(ds, key)
    dtype = "float64" if kind == "float" else "int64"

    def sample(batch: pa.Table) -> pd.DataFrame:
        v = _key_values(batch, key, kind)
        v = np.sort(v[~pd.isna(v)])
        if len(v) == 0:
            return pd.DataFrame({"v": pd.Series(dtype=dtype)})
        idx = np.linspace(0, len(v) - 1, min(sample_per_batch, len(v)))
        return pd.DataFrame({"v": v[idx.astype(np.int64)].astype(dtype)})

    parts = ds.select_columns([key]).map_batches(
        sample, batch_format="pyarrow").to_pandas()
    if not len(parts) or "v" not in parts.columns:
        return []
    v = np.sort(parts["v"].to_numpy())
    ranks = (np.arange(1, num_ranges) * len(v)) // num_ranges
    py = float if kind == "float" else int
    return sorted({py(v[r]) for r in ranks if r < len(v)})


def write_range_partitioned(
    ds: ray.data.Dataset, path: str, key: str,
    num_ranges: int = 16, sample_per_batch: int = 256,
) -> dict:
    """Cluster `ds` by `key` into range partitions under `path`.  Returns
    the manifest (persisted as `_range_manifest.json`, written LAST)."""
    kind = _key_kind(ds, key)
    bounds = compute_range_boundaries(ds, key, num_ranges, sample_per_batch)
    b = np.asarray(bounds, dtype="float64" if kind == "float" else "int64")

    def assign(batch: pa.Table) -> pa.Table:
        rid = np.searchsorted(b, _key_values(batch, key, kind), side="right")
        return batch.append_column("range_id",
                                   pa.array(rid.astype(np.int32)))

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        path, partition_cols=["range_id"])
    manifest = {"key": key, "kind": kind, "boundaries": bounds,
                "num_ranges": len(bounds) + 1}
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f)
    return manifest


def read_key_range(
    path: str, lo, hi, columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Rows with `lo <= key < hi`, reading ONLY the range directories the
    manifest says can overlap.  `columns` prunes at the read (the key is
    fetched alongside for the residual filter, then dropped if not
    requested).  Returns an empty (schema-less) dataset when no range
    directory overlaps."""
    with open(os.path.join(path, _MANIFEST)) as f:
        m = json.load(f)
    key, kind = m["key"], m["kind"]
    lo_v, hi_v = _scalar(lo, kind), _scalar(hi, kind)
    b = np.asarray(m["boundaries"],
                   dtype="float64" if kind == "float" else "int64")
    first = int(np.searchsorted(b, lo_v, side="right"))
    last = int(np.searchsorted(b, hi_v, side="left"))  # hi is exclusive
    dirs = [os.path.join(path, f"range_id={r}")
            for r in range(first, last + 1)
            if os.path.isdir(os.path.join(path, f"range_id={r}"))]
    # expand to files: read_parquet on a LIST of directories is rejected
    # by the pyarrow filesystem layer (works for a single dir only)
    files = [os.path.join(d, f) for d in dirs
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not files:
        return ray.data.from_items([])
    cols = None if columns is None else list(dict.fromkeys([key, *columns]))
    ds = ray.data.read_parquet(files, columns=cols)

    def residual(batch: pa.Table) -> pa.Table:
        v = _key_values(batch, key, kind)
        out = batch.filter(pa.array((v >= lo_v) & (v < hi_v)))
        if "range_id" in out.column_names:  # re-inferred hive column
            out = out.drop_columns(["range_id"])
        if columns is not None:
            out = out.select(columns)
        return out

    return ds.map_batches(residual, batch_format="pyarrow")
