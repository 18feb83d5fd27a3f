"""Incremental JOIN maintenance over persisted bucketed state — the
delta-join identity every streaming/IVM engine implements:

    Δ(L ⋈ R) = ΔL ⋈ R_prev  ∪  L_prev ⋈ ΔR  ∪  ΔL ⋈ ΔR
             = ΔL ⋈ (R_prev ∪ ΔR)  ∪  L_prev ⋈ ΔR

A new snapshot (ΔL, ΔR) arrives; the engine must emit exactly the NEW
join rows without re-joining the accumulated sides.  State layout
follows state/snapshot_dedup.py:

  state_dir/left/snap=<id>/bucket=<b>/*.parquet    committed ΔL rows
  state_dir/right/snap=<id>/bucket=<b>/*.parquet   committed ΔR rows
  .../snap=<id>/_SUCCESS                           commit marker
  state_dir/_meta.json                             n_buckets pin

Scale properties:
- **Shuffle cost is O(delta), never O(state)**: both sides persist
  already partitioned by the same crc32(key) bucket the delta rows are
  grouped on, so the delta pass shuffles only the arriving rows and
  each bucket's kernel reads just its own `bucket=<b>` directories.
- The three delta terms reduce to two vectorized pandas merges per
  bucket (ΔL against prior-∪-ΔR, prior-L against ΔR).
- `_SUCCESS`-marker commits: idempotent re-commit, crashed partials
  invisible (the snapshot_dedup discipline); `n_buckets` is pinned in
  `_meta.json` and verified on every call (the snapshot_shacl
  discipline — silently reading wrong buckets is worse than erroring).
- Multi-node contract: `state_dir` is shared storage, like any Ray
  Data read path.
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .snapshot_dedup import _commit_bucketed

_LEFT = "left"
_RIGHT = "right"
_DEFAULT_BUCKETS = 32


def _check_meta(state_dir: str, n_buckets: int) -> None:
    meta_path = os.path.join(state_dir, "_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            pinned = json.load(f).get("n_buckets")
        if pinned != n_buckets:
            raise ValueError(
                f"snapshot_join: state at {state_dir} was committed "
                f"with n_buckets={pinned}, called with {n_buckets}")
    else:
        os.makedirs(state_dir, exist_ok=True)
        with open(meta_path, "w") as f:
            json.dump({"n_buckets": n_buckets}, f)


def _tag_bucket(ds: ray.data.Dataset, key: str,
                n_buckets: int) -> ray.data.Dataset:
    def tag(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["bucket"] = np.fromiter(
            (zlib.crc32(str(k).encode()) % n_buckets for k in df[key]),
            dtype="int32", count=len(df))
        return df

    return ds.map_batches(tag, batch_format="pyarrow")


def incremental_join(
    new_left: ray.data.Dataset,
    new_right: ray.data.Dataset,
    state_dir: str,
    snapshot_id: str,
    key: str,
    n_buckets: int = _DEFAULT_BUCKETS,
) -> ray.data.Dataset:
    """Emit the DELTA join rows contributed by snapshot (ΔL, ΔR)
    against the committed state, then commit the snapshot.  Returns a
    MATERIALIZED dataset of new join rows (key + left payload + right
    payload).  Re-running an already-committed snapshot returns its
    delta again WITHOUT double-committing (idempotent).

    Column contract: `new_left` and `new_right` both carry `key`; the
    remaining columns are each side's payload and must be disjoint."""
    _check_meta(state_dir, n_buckets)
    lcols = [c for c in new_left.schema().names if c != key]
    rcols = [c for c in new_right.schema().names if c != key]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"snapshot_join: overlapping payload columns "
                         f"{sorted(overlap)}")

    dl = _tag_bucket(new_left, key, n_buckets)
    dr = _tag_bucket(new_right, key, n_buckets)
    lkey, rkey = key, key

    # one union exchange: side-tagged SUPERSET frame (both sides carry
    # all payload columns, the foreign ones null, so the union schema
    # is uniform and groups see every column)
    def lift(side: int):
        def f(batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()
            out = pd.DataFrame({"_side": np.int8(side),
                                key: df[key], "bucket": df["bucket"]})
            for c in lcols + rcols:
                out[c] = df[c] if c in df.columns else None
            return out
        return f

    lifted = (dl.map_batches(lift(0), batch_format="pyarrow")
              .union(dr.map_batches(lift(1), batch_format="pyarrow")))

    l_empty = pd.DataFrame({key: pd.Series(dtype="object"),
                            **{c: pd.Series(dtype="object")
                               for c in lcols}})
    r_empty = pd.DataFrame({key: pd.Series(dtype="object"),
                            **{c: pd.Series(dtype="object")
                               for c in rcols}})

    committed = os.path.exists(os.path.join(
        state_dir, _LEFT, f"snap={snapshot_id}", "_SUCCESS"))

    def delta_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["bucket"].iloc[0])
        d_l = g[g["_side"] == 0][[key] + lcols]
        d_r = g[g["_side"] == 1][[key] + rcols]
        snaps_filter = (
            (lambda s: s != f"snap={snapshot_id}") if committed
            else (lambda s: True))
        prev_l = _read_side_bucket(state_dir, _LEFT, b,
                                   [key] + lcols, l_empty, snaps_filter)
        prev_r = _read_side_bucket(state_dir, _RIGHT, b,
                                   [key] + rcols, r_empty, snaps_filter)
        full_r = pd.concat([prev_r, d_r], ignore_index=True)
        t1 = d_l.merge(full_r, on=key) if len(d_l) and len(full_r) \
            else None
        t2 = prev_l.merge(d_r, on=key) if len(prev_l) and len(d_r) \
            else None
        parts = [t for t in (t1, t2) if t is not None and len(t)]
        if not parts:
            return pd.DataFrame({key: pd.Series(dtype="object"),
                                 **{c: pd.Series(dtype="object")
                                    for c in lcols + rcols}})
        return pd.concat(parts, ignore_index=True)[
            [key] + lcols + rcols]

    delta = (lifted.groupby("bucket")
             .map_groups(delta_bucket, batch_format="pandas")
             .materialize())
    # commit AFTER the delta is materialized (the delta pass must see
    # only prior state)
    _commit_bucketed(dl, state_dir, _LEFT, snapshot_id)
    _commit_bucketed(dr, state_dir, _RIGHT, snapshot_id)
    return delta


def _read_side_bucket(state_dir, kind, bucket, columns, empty,
                      snap_filter):
    """_read_bucket, restricted to snapshots passing `snap_filter`
    (used to exclude the snapshot being idempotently re-run)."""
    import pyarrow.parquet as pq

    from .snapshot_dedup import _committed_snapshots
    parts = []
    for snap in _committed_snapshots(state_dir, kind):
        if not snap_filter(snap):
            continue
        sub = os.path.join(state_dir, kind, snap, f"bucket={bucket}")
        if os.path.isdir(sub):
            parts.append(pq.read_table(sub, columns=columns).to_pandas())
    if not parts:
        return empty
    return pd.concat(parts, ignore_index=True)
