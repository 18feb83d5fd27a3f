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
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet  # noqa: F401 — enables pa.parquet.* in tasks
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


_BLOOM = "_bloom_{col}.json"
_H1_KEY = "0123456789123456"  # pandas siphash keys: build+query must match,
_H2_KEY = "6543216543216543"  # so they are pinned here, not left to defaults


def _bloom_positions(values: pd.Series, m_bits: int, k: int) -> np.ndarray:
    """k bit positions per value via double hashing of two pinned-key
    siphashes (vectorized; h2 forced odd so the stride cycles all of a
    power-of-two m)."""
    h1 = pd.util.hash_pandas_object(values, index=False, hash_key=_H1_KEY)
    h2 = pd.util.hash_pandas_object(values, index=False, hash_key=_H2_KEY)
    h1 = h1.to_numpy().astype(np.uint64)
    h2 = (h2.to_numpy().astype(np.uint64) | np.uint64(1))
    i = np.arange(k, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        pos = (h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)
    return pos  # (n_values, k)


def _bloom_dtype(arrow_type: pa.DataType) -> str:
    """Canonical hash dtype for a stored column.  pandas siphash is
    dtype-sensitive (float64 hashes by bit pattern), so BOTH the build
    and the probe must hash through the same dtype — otherwise an int
    probe (7) on a float64 column (stored 7.0) hashes differently and
    the filter returns a FALSE NEGATIVE, silently skipping files that
    contain matches (ADVICE r4).  The canonical dtype is derived from
    the ARROW type, never pandas inference (an all-null int64 file
    would otherwise infer float64 and poison the build side too)."""
    if pa.types.is_boolean(arrow_type):
        return "bool"
    if pa.types.is_unsigned_integer(arrow_type):
        return "uint64"
    if pa.types.is_integer(arrow_type):
        return "int64"
    if pa.types.is_floating(arrow_type) or pa.types.is_decimal(arrow_type):
        return "float64"
    if pa.types.is_timestamp(arrow_type):
        return "int64"  # exact microsecond ticks, like the range manifest
    return "str"


def _bloom_series(values, dtype: str) -> pd.Series:
    """Coerce build values (ChunkedArray) or a probe scalar to the
    canonical hash dtype.  Nulls are dropped on the build side before
    the cast so int64 columns never round-trip through float64."""
    if isinstance(values, (pa.ChunkedArray, pa.Array)):
        arr = values.drop_null()
        if dtype == "int64" and pa.types.is_timestamp(arr.type):
            arr = arr.cast(pa.int64())
        s = arr.to_pandas()
    else:
        s = pd.Series([values])
    if dtype == "str":
        return s.astype(str)
    return s.astype(dtype)


def _bloom_bits(values: pd.Series, m_bits: int, k: int) -> bytes:
    bits = np.zeros(m_bits, dtype=bool)
    if len(values):
        bits[_bloom_positions(values.dropna(), m_bits, k).ravel()] = True
    return np.packbits(bits).tobytes()


def _bloom_maybe(bitset: bytes, value, m_bits: int, k: int,
                 dtype: str | None = None) -> bool:
    bits = np.unpackbits(np.frombuffer(bitset, dtype=np.uint8))
    probe = (_bloom_series(value, dtype) if dtype is not None
             else pd.Series([value]))
    pos = _bloom_positions(probe, m_bits, k)[0]
    return bool(bits[pos].all())


def _recover_compaction(path: str) -> None:
    """Finish or roll back a compaction that crashed mid-rename
    (ADVICE r4: a crash between `replace(full, old)` and
    `replace(tmp, full)` left the range only under `range_id=N.old`,
    which readers silently skipped — a whole range vanished).  The
    three directory states are unambiguous, so no manifest is needed:

    - `N` and `N.old` both exist  -> renames completed, crash before
      cleanup: drop `N.old`.
    - `N.old` without `N`         -> crash inside the rename window;
      `N.compact` was fully written before the first rename, so roll
      FORWARD (`N.compact` -> `N`) if present, else roll BACK
      (`N.old` -> `N`).
    - `N.compact` with `N` intact -> crash while writing the tmp dir
      (before any rename): drop the partial `N.compact`.

    Runs on every read and on compaction entry (the search_index
    pattern).  Single concurrent compactor per store assumed, as for
    any OPTIMIZE primitive."""
    for d in sorted(os.listdir(path)):
        if not d.startswith("range_id=") or not d.endswith(".old"):
            continue
        old = os.path.join(path, d)
        full = old[:-len(".old")]
        tmp = full + ".compact"
        if os.path.isdir(full):
            shutil.rmtree(old)
        elif os.path.isdir(tmp):
            os.replace(tmp, full)
            shutil.rmtree(old)
        else:
            os.replace(old, full)
    for d in sorted(os.listdir(path)):
        if not d.startswith("range_id=") or not d.endswith(".compact"):
            continue
        tmp = os.path.join(path, d)
        if os.path.isdir(tmp[:-len(".compact")]):
            shutil.rmtree(tmp)


def _store_files(path: str) -> list[str]:
    _recover_compaction(path)
    out = []
    for d in sorted(os.listdir(path)):
        full = os.path.join(path, d)
        if (d.startswith("range_id=") and os.path.isdir(full)
                and not d.endswith((".old", ".compact"))):
            out += [os.path.join(full, f) for f in sorted(os.listdir(full))
                    if f.endswith(".parquet")]
    return out


def build_bloom_index(path: str, column: str,
                      m_bits: int = 8192, k: int = 4,
                      incremental: bool = False) -> dict:
    """Per-FILE Bloom filter index over `column` — the lakehouse
    file-skipping index for point lookups on NON-clustering columns
    (the range manifest only prunes on the sort key).  One Ray task per
    file reads ONLY that column and emits a fixed-size bitset; the
    driver folds n_files tiny rows and writes `_bloom_<column>.json`
    atomically (tmp + rename, after the data — a crashed build leaves
    the store readable without the index).  False positives cost extra
    file reads, never wrong rows (the reader's exact filter stays).

    `incremental=True` makes maintenance O(new data): files already in
    the persisted index keep their bitsets (parameters must match —
    loud error otherwise), only missing files are read; entries for
    files that no longer exist (compacted away) are dropped."""
    files = _store_files(path)
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    dtype = _bloom_dtype(
        pa.parquet.read_schema(files[0]).field(column).type)
    prior: dict[str, str] = {}
    if incremental:
        ipath = os.path.join(path, _BLOOM.format(col=column))
        if os.path.exists(ipath):
            with open(ipath) as f:
                old = json.load(f)
            if (old["m_bits"], old["k"]) != (m_bits, k):
                raise ValueError(
                    f"bloom index at {ipath} was built with "
                    f"m_bits={old['m_bits']}, k={old['k']}; got "
                    f"m_bits={m_bits}, k={k}")
            if old.get("dtype") != dtype:
                # pre-dtype indexes (or a column type change) hashed
                # through pandas-inferred dtypes; their bitsets cannot
                # be mixed with canonical-dtype ones — rebuild fully.
                raise ValueError(
                    f"bloom index at {ipath} has hash dtype "
                    f"{old.get('dtype')!r} but the store column is "
                    f"{dtype!r}; rebuild with incremental=False")
            live = {os.path.relpath(f, path) for f in files}
            prior = {rel: b for rel, b in old["files"].items()
                     if rel in live}
        files = [f for f in files
                 if os.path.relpath(f, path) not in prior]

    def file_bloom(batch: pa.Table) -> pd.DataFrame:
        rows = []
        for f in batch.column("file").to_pylist():
            t = pa.parquet.read_table(f, columns=[column])
            vals = _bloom_series(t.column(column), dtype)
            rows.append({"file": os.path.relpath(f, path),
                         "bits": _bloom_bits(vals, m_bits, k).hex()})
        return pd.DataFrame(rows)

    new_bits: dict[str, str] = {}
    if files:
        blooms = ray.data.from_items(
            [{"file": f} for f in files]
        ).map_batches(file_bloom, batch_format="pyarrow",
                      batch_size=1).to_pandas()
        new_bits = dict(zip(blooms["file"], blooms["bits"]))
    index = {"column": column, "m_bits": m_bits, "k": k, "dtype": dtype,
             "files": {**prior, **new_bits}}
    target = os.path.join(path, _BLOOM.format(col=column))
    tmp = target + ".tmp"
    with open(tmp, "w") as f:
        json.dump(index, f)
    os.replace(tmp, target)
    return index


def read_point_lookup(
    path: str, column: str, value,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Rows with `column == value`, reading ONLY files whose Bloom
    filter can contain the value (plus the manifest's range pruning
    when `column` IS the clustering key).  Exact equality filter on
    the surviving files — bloom false positives add reads, not rows."""
    _recover_compaction(path)
    with open(os.path.join(path, _BLOOM.format(col=column))) as f:
        idx = json.load(f)
    m_bits, k = idx["m_bits"], idx["k"]
    dtype = idx.get("dtype")  # pre-dtype indexes fall back to inference
    files = [os.path.join(path, rel) for rel, bits in idx["files"].items()
             if _bloom_maybe(bytes.fromhex(bits), value, m_bits, k, dtype)]
    with open(os.path.join(path, _MANIFEST)) as f:
        m = json.load(f)
    if column == m["key"]:  # compose with range pruning
        b = np.asarray(m["boundaries"],
                       dtype="float64" if m["kind"] == "float" else "int64")
        v = _scalar(value, m["kind"])
        rid = int(np.searchsorted(b, v, side="right"))
        files = [f for f in files
                 if os.path.basename(os.path.dirname(f)) == f"range_id={rid}"]
    if not files:
        return ray.data.from_items([])
    cols = None if columns is None else list(dict.fromkeys([column, *columns]))
    ds = ray.data.read_parquet(files, columns=cols)

    def exact(batch: pa.Table) -> pa.Table:
        out = batch.filter(pc.equal(batch[column], pa.scalar(value)))
        if "range_id" in out.column_names:
            out = out.drop_columns(["range_id"])
        if columns is not None:
            out = out.select(columns)
        return out

    return ds.map_batches(exact, batch_format="pyarrow")


def compact_store(path: str, target_rows_per_file: int = 1 << 20) -> dict:
    """Small-file compaction (the lakehouse OPTIMIZE primitive): each
    range directory's files are rewritten into ceil(rows / target) files
    — one Ray task per range, so ranges compact in parallel and a range
    is the atomicity unit (its new files land in a tmp dir that replaces
    the old one with two renames).  Boundaries and the manifest are
    unchanged (compaction never moves rows across ranges); any Bloom
    indexes are REBUILT afterwards (file identities changed).  Returns
    {"files_before": n, "files_after": n}."""
    before = _store_files(path)  # also recovers any crashed compaction
    rdirs = sorted(d for d in os.listdir(path)
                   if d.startswith("range_id=")
                   and not d.endswith((".old", ".compact")))

    def compact_range(batch: pa.Table) -> pd.DataFrame:
        out = []
        for d in batch.column("dir").to_pylist():
            full = os.path.join(path, d)
            files = [os.path.join(full, f) for f in sorted(os.listdir(full))
                     if f.endswith(".parquet")]
            t = pa.concat_tables([pa.parquet.read_table(f) for f in files])
            tmp = full + ".compact"
            os.makedirs(tmp, exist_ok=True)
            n_out = max(1, -(-t.num_rows // target_rows_per_file))
            per = -(-t.num_rows // n_out)
            for i in range(n_out):
                pa.parquet.write_table(
                    t.slice(i * per, per),
                    os.path.join(tmp, f"part-{i:05d}.parquet"))
            old = full + ".old"
            os.replace(full, old)
            os.replace(tmp, full)
            shutil.rmtree(old)
            out.append({"dir": d, "files": n_out})
        return pd.DataFrame(out)

    ray.data.from_items([{"dir": d} for d in rdirs]).map_batches(
        compact_range, batch_format="pyarrow", batch_size=1).to_pandas()
    for f in sorted(os.listdir(path)):
        if f.startswith("_bloom_") and f.endswith(".json"):
            with open(os.path.join(path, f)) as fh:
                idx = json.load(fh)
            build_bloom_index(path, idx["column"],
                              m_bits=idx["m_bits"], k=idx["k"])
    return {"files_before": len(before), "files_after": len(_store_files(path))}


def read_key_range(
    path: str, lo, hi, columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Rows with `lo <= key < hi`, reading ONLY the range directories the
    manifest says can overlap.  `columns` prunes at the read (the key is
    fetched alongside for the residual filter, then dropped if not
    requested).  Returns an empty (schema-less) dataset when no range
    directory overlaps."""
    _recover_compaction(path)
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
