"""Store-layer IO: Lance target, parquet fallback (SURVEY §7.2).

The north-star store is Lance (`ray.data.read_lance` / `write_lance`); this
sandbox has no `pylance`, so both helpers gate on the import and fall back
to parquet with the identical schema.  All tests pass either way.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
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
    """Excel results sink (reference K2, dashboard_v1.py:487-519,
    including the styled header + auto-sized columns) — pure-stdlib
    workbook writer, see sources/xlsx.py."""
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


def write_zonemapped(
    ds: ray.data.Dataset,
    out_dir: str,
    sort_col: str,
    n_ranges: int = 16,
) -> pd.DataFrame:
    """ZONE-MAPPED layout: range-partition rows by `sort_col` into
    `n_ranges` key ranges (cut points from a distributed quantile
    sketch — one stats pass, no global sort), write one parquet
    directory per range, and persist a `_zonemap.json` manifest of
    per-range (min, max, rows).  The layout is what makes
    `read_zonemapped` range queries touch only overlapping files —
    the zone-map / data-skipping discipline every warehouse engine
    applies, expressed as plain partitioned parquet + a manifest.
    Resumable-output rule: one directory per range, never one giant
    file.  `sort_col` must be int64-valued."""
    import json

    os.makedirs(out_dir, exist_ok=True)

    # cut points: per-block (min, max, sampled values) partials -> a
    # bounded driver fold (n_ranges-quantiles of the sampled keys)
    def partials(b: pa.Table) -> pd.DataFrame:
        v = b.column(sort_col).to_numpy()
        if len(v) == 0:
            return pd.DataFrame({"q": pd.Series(dtype="int64")})
        qs = np.quantile(v, np.linspace(0, 1, 65), method="nearest")
        return pd.DataFrame({"q": qs.astype("int64")})

    qvals = np.sort(np.array(
        [r["q"] for r in ds.map_batches(
            partials, batch_format="pyarrow").take_all()],
        dtype="int64"))
    if len(qvals) == 0:
        raise ValueError("empty dataset")
    cuts = np.unique(np.quantile(
        qvals, np.linspace(0, 1, n_ranges + 1)[1:-1],
        method="nearest").astype("int64"))

    def tag(b: pa.Table) -> pa.Table:
        v = b.column(sort_col).to_numpy()
        rng = np.searchsorted(cuts, v, side="right").astype("int32")
        return b.append_column("_range", pa.array(rng))

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    tagged.write_parquet(out_dir, partition_cols=["_range"])

    # manifest: true per-range min/max from the written files
    zones = []
    for d in sorted(os.listdir(out_dir)):
        if not d.startswith("_range="):
            continue
        rid = int(d.split("=")[1])
        mins, maxs, rows = [], [], 0
        for f in os.listdir(os.path.join(out_dir, d)):
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(out_dir, d, f),
                                  columns=[sort_col])
                if t.num_rows:
                    mins.append(pc.min(t.column(sort_col)).as_py())
                    maxs.append(pc.max(t.column(sort_col)).as_py())
                    rows += t.num_rows
        if rows:
            zones.append({"range": rid, "min": int(min(mins)),
                          "max": int(max(maxs)), "rows": rows})
    with open(os.path.join(out_dir, "_zonemap.json"), "w") as f:
        json.dump({"sort_col": sort_col, "zones": zones}, f)
    return pd.DataFrame(zones)


def read_zonemapped(
    out_dir: str,
    lo: int | None = None,
    hi: int | None = None,
) -> tuple[ray.data.Dataset, int]:
    """Range query over a `write_zonemapped` layout: the manifest
    prunes non-overlapping ranges BEFORE any file is opened (zone-map
    data skipping), the survivors stream through `read_parquet` with
    the residual row filter.  Returns (dataset, n_ranges_read) so
    callers/tests can assert the skipping actually happened.  Bounds
    are inclusive; None = unbounded."""
    import json

    with open(os.path.join(out_dir, "_zonemap.json")) as f:
        zm = json.load(f)
    col = zm["sort_col"]
    keep = [z["range"] for z in zm["zones"]
            if (lo is None or z["max"] >= lo)
            and (hi is None or z["min"] <= hi)]
    dirs = [os.path.join(out_dir, f"_range={r}") for r in sorted(keep)]
    files = [os.path.join(d, f) for d in dirs
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not files:
        return ray.data.from_arrow(pa.table({})), 0
    ds = ray.data.read_parquet(files)

    def residual(b: pa.Table) -> pa.Table:
        v = b.column(col)
        mask = None
        if lo is not None:
            mask = pc.greater_equal(v, lo)
        if hi is not None:
            m2 = pc.less_equal(v, hi)
            mask = m2 if mask is None else pc.and_(mask, m2)
        return b if mask is None else b.filter(mask)

    return ds.map_batches(residual, batch_format="pyarrow"), len(dirs)


def _part1by1(x: "np.ndarray") -> "np.ndarray":
    """Spread each bit of a < 2^30 int to the even bit positions
    (the standard Morton magic-shift sequence, vectorized uint64)."""
    x = x.astype(np.uint64)
    x = (x | (x << 16)) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << 8)) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << 4)) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << 2)) & np.uint64(0x3333333333333333)
    x = (x | (x << 1)) & np.uint64(0x5555555555555555)
    return x


def morton2(x: "np.ndarray", y: "np.ndarray") -> "np.ndarray":
    """Interleaved 2-D Morton code (int64; inputs must be in
    [0, 2^30) so the code stays sign-safe).  JOINTLY MONOTONE: growing
    either coordinate never shrinks the code — the property Z-order
    box pruning relies on."""
    if (x < 0).any() or (y < 0).any() or \
            (x >= 1 << 30).any() or (y >= 1 << 30).any():
        raise ValueError("morton2 inputs must be in [0, 2^30)")
    return (_part1by1(x) | (_part1by1(y) << np.uint64(1))).astype(
        "int64")


def write_zordered(
    ds: ray.data.Dataset,
    out_dir: str,
    col_x: str,
    col_y: str,
    n_ranges: int = 16,
) -> pd.DataFrame:
    """Z-ORDER clustering for 2-D data skipping: append the Morton
    interleave of (col_x, col_y) and lay the rows out through
    `write_zonemapped` on that code — one linear key carries locality
    in BOTH dimensions, so box queries prune ranges the way
    warehouse Z-/Hilbert-clustering does.  Same manifest + layout
    contract as write_zonemapped."""
    def tag(b: pa.Table) -> pa.Table:
        m = morton2(b.column(col_x).to_numpy(),
                    b.column(col_y).to_numpy())
        return b.append_column("_morton", pa.array(m))

    return write_zonemapped(
        ds.map_batches(tag, batch_format="pyarrow"), out_dir,
        "_morton", n_ranges=n_ranges)


def read_zordered_box(
    out_dir: str,
    col_x: str,
    x_lo: int, x_hi: int,
    col_y: str,
    y_lo: int, y_hi: int,
) -> tuple[ray.data.Dataset, int]:
    """Box query over a `write_zordered` layout: every point inside
    the box has a Morton code within [morton(x_lo, y_lo),
    morton(x_hi, y_hi)] (joint monotonicity), so the zone map prunes
    on that interval — sound, not BIGMIN-tight — and the residual
    filter re-checks the ORIGINAL coordinates.  Returns (dataset,
    n_ranges_read)."""
    lo = int(morton2(np.array([x_lo]), np.array([y_lo]))[0])
    hi = int(morton2(np.array([x_hi]), np.array([y_hi]))[0])
    ds, nread = read_zonemapped(out_dir, lo=lo, hi=hi)
    if nread == 0:
        return ds, 0

    def residual(b: pa.Table) -> pa.Table:
        mx = pc.and_(pc.greater_equal(b.column(col_x), x_lo),
                     pc.less_equal(b.column(col_x), x_hi))
        my = pc.and_(pc.greater_equal(b.column(col_y), y_lo),
                     pc.less_equal(b.column(col_y), y_hi))
        return b.filter(pc.and_(mx, my)).drop_columns(["_morton"])

    return ds.map_batches(residual, batch_format="pyarrow"), nread


def write_arrow_ipc(ds: ray.data.Dataset, out_dir: str,
                    rows_per_file: int = 100_000) -> list[str]:
    """Arrow IPC (Feather v2 / stream-format) SINK: one .arrows file
    per input block-group, written inside map_batches workers (the
    driver never holds data) — the zero-copy interchange format for
    handing a Dataset to non-Ray Arrow consumers.  Returns the file
    paths (content-addressed names, so re-runs overwrite
    deterministically rather than duplicating)."""
    import hashlib
    import os

    import pyarrow.ipc as ipc

    os.makedirs(out_dir, exist_ok=True)

    def dump(batch: pa.Table) -> pa.Table:
        digest = hashlib.md5()
        for col in batch.column_names:
            for chunk in batch.column(col).chunks:
                for buf in chunk.buffers():
                    if buf is not None:
                        digest.update(buf)
        name = os.path.join(out_dir,
                            f"part-{digest.hexdigest()[:16]}.arrows")
        tmp = name + ".tmp"
        with ipc.new_stream(tmp, batch.schema) as w:
            w.write_table(batch)
        os.replace(tmp, name)  # atomic publish: resumable layout
        return pa.table({"path": pa.array([name], type=pa.string()),
                         "n_rows": pa.array([batch.num_rows],
                                            type=pa.int64())})

    manifest = ds.map_batches(dump, batch_format="pyarrow",
                              batch_size=rows_per_file).to_pandas()
    return sorted(manifest["path"].tolist()) if len(manifest) else []


def read_arrow_ipc(paths: str | list[str]) -> ray.data.Dataset:
    """Arrow IPC SOURCE: .arrows stream files -> Dataset, decoded
    inside map_batches over the binary-file read (each file's record
    batches become rows; the driver touches only file listings)."""
    import pyarrow.ipc as ipc

    ds = ray.data.read_binary_files(paths, include_paths=True)

    def load(batch: pa.Table) -> pa.Table:
        tables = []
        for data in batch.column("bytes").to_pylist():
            with ipc.open_stream(data) as r:
                tables.append(r.read_all())
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables, promote_options="default")

    return ds.map_batches(load, batch_format="pyarrow")


def unify_schemas(schemas: list[pa.Schema]) -> pa.Schema:
    """Union of fields across file schemas with widening promotion —
    the schema-evolution merge rule: a column missing from a file reads
    as nulls; int widens to the widest int seen; (int, float) widens to
    float64; identical types pass through; anything else conflicting is
    a loud error (silent coercion hides corruption).  Field order =
    first-seen order (the evolution timeline)."""
    order: list[str] = []
    types: dict[str, pa.DataType] = {}
    for sch in schemas:
        for f in sch:
            if f.name not in types:
                order.append(f.name)
                types[f.name] = f.type
                continue
            a, b = types[f.name], f.type
            if a.equals(b):
                continue
            if pa.types.is_integer(a) and pa.types.is_integer(b):
                au = pa.types.is_unsigned_integer(a)
                bu = pa.types.is_unsigned_integer(b)
                if au == bu:
                    types[f.name] = a if a.bit_width >= b.bit_width else b
                else:
                    # mixed signedness widens to the smallest SIGNED type
                    # that holds both ranges (uint32+int32 -> int64);
                    # uint64+signed has no 128-bit home -> loud error,
                    # never a first-seen-wins narrowing (ADVICE r4)
                    uw = a.bit_width if au else b.bit_width
                    sw = b.bit_width if au else a.bit_width
                    need = max(sw, uw * 2)
                    if need > 64:
                        raise ValueError(
                            f"schema evolution conflict on {f.name!r}: "
                            f"{a} vs {b} (uint64 cannot widen into a "
                            f"signed 64-bit type)")
                    types[f.name] = {16: pa.int16(), 32: pa.int32(),
                                     64: pa.int64()}[need]
            elif ((pa.types.is_integer(a) or pa.types.is_floating(a))
                  and (pa.types.is_integer(b) or pa.types.is_floating(b))):
                types[f.name] = pa.float64()
            else:
                raise ValueError(
                    f"schema evolution conflict on {f.name!r}: "
                    f"{a} vs {b} (no widening rule)")
    return pa.schema([pa.field(n, types[n]) for n in order])


def read_parquet_evolving(
    paths: str | list[str], columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Parquet SOURCE over files with HETEROGENEOUS schemas (the
    long-lived-table reality: columns added/dropped over time).  The
    driver reads only file FOOTERS (O(files), no data) to compute the
    unified schema via `unify_schemas`, then each schema-group of files
    is read with Ray's normal parquet reader and padded/cast to the
    unified schema inside map_batches — missing columns become typed
    nulls, narrower numerics widen.  `columns` prunes the unified
    schema (and the per-file reads) to the requested subset."""
    import glob as _glob

    import pyarrow.parquet as pq

    if isinstance(paths, str):
        if os.path.isdir(paths):
            files = sorted(_glob.glob(os.path.join(paths, "**", "*.parquet"),
                                      recursive=True))
        else:
            files = [paths]
    else:
        files = list(paths)
    if not files:
        return ray.data.from_items([])
    schemas = [pq.read_schema(f) for f in files]
    unified = unify_schemas(schemas)
    if columns is not None:
        unified = pa.schema([unified.field(c) for c in columns])
    # group files by their (relevant) physical schema so each group is
    # one ordinary pruned read
    groups: dict[tuple, list[str]] = {}
    for f, sch in zip(files, schemas):
        names = [n for n in sch.names if n in unified.names]
        key = tuple((n, str(sch.field(n).type)) for n in names)
        groups.setdefault(key, []).append(f)

    def conform(batch: pa.Table) -> pa.Table:
        cols = []
        for fld in unified:
            if fld.name in batch.column_names:
                cols.append(pc.cast(batch.column(fld.name), fld.type))
            else:
                cols.append(pa.nulls(batch.num_rows, type=fld.type))
        return pa.table(dict(zip(unified.names, cols)))

    parts = []
    for key, fs in sorted(groups.items()):
        names = [n for n, _t in key]
        ds = ray.data.read_parquet(fs, columns=names or None)
        parts.append(ds.map_batches(conform, batch_format="pyarrow"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
