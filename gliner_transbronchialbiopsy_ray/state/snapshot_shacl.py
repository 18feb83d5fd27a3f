"""Incremental (snapshot-over-state) SHACL validation.

The maintenance problem: the KG accumulates daily triple snapshots and
must stay validated, but SHACL constraints are PER-SUBJECT over the
subject's complete property set — an arriving triple can flip its
subject's conformance either way, so the subject must be re-checked
against its FULL history, while untouched subjects need no work at all.

State layout (the q111/q112 discipline applied to triples):

  state_dir/triples/snap=<snapshot_id>/bucket=<b>/part.parquet
      that snapshot's (s, p, o) rows, bucketed by crc32(s) % n_buckets
      and SORTED BY s inside each file (row-group statistics then let
      the filtered read skip groups with no touched subject)
  state_dir/triples/snap=<snapshot_id>/_SUCCESS
      commit marker — a directory without it is a crashed partial
      write, invisible to validation and rewritten on the next commit
  state_dir/triples/_meta.json
      the layout's bucket count, written on first commit and verified
      by every later commit/validate call (a mismatching n_buckets
      would silently read the wrong bucket=<b> directories)

Scale properties:

- **Shuffle cost is O(arriving snapshot), never O(state).**  Arriving
  triples take ONE coarse subject-bucket exchange; each bucket group
  reads only its own `bucket=<b>` state files, filtered to the
  subjects the snapshot touched (pyarrow predicate pushdown over the
  sorted row groups).  Accumulated state is never reshuffled.
- **The output is the violation DELTA**: the full re-evaluation of
  exactly the touched subjects.  The caller's ledger update is
  "delete ledger rows for touched subjects, insert these" — subjects
  the snapshot does not touch keep their previous verdicts.
- **class_ref constraints are rejected**: their reference sets span
  the whole store, which breaks the touched-subjects-only cost model;
  validate those on the full store (stages/shacl.py) instead.
- Multi-node contract: `state_dir` is shared storage readable from
  every worker, like any Ray Data read path.
"""

from __future__ import annotations

import os
import shutil
import zlib

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pa_ds
import pyarrow.parquet as pq
import ray
import ray.data

from ..stages.shacl import Shape, _empty_violations, _validate_frame

_KIND = "triples"
_MARKER = "_SUCCESS"
_META = "_meta.json"
_DEFAULT_BUCKETS = 32


def _resolve_n_buckets(state_dir: str, n_buckets: int | None) -> int:
    """The bucket count is part of the state LAYOUT: a caller reading
    with a different count than the one the state was committed with
    would silently look in the wrong bucket=<b> directories.  It is
    therefore persisted next to the snapshots on first commit and
    verified on every later call; passing an explicit mismatching
    value is an error, passing None adopts the persisted value."""
    import json

    path = os.path.join(state_dir, _KIND, _META)
    if os.path.exists(path):
        with open(path) as f:
            persisted = int(json.load(f)["n_buckets"])
        if n_buckets is not None and n_buckets != persisted:
            raise ValueError(
                f"state at {state_dir} was committed with "
                f"n_buckets={persisted}, got n_buckets={n_buckets}")
        return persisted
    return _DEFAULT_BUCKETS if n_buckets is None else n_buckets


def _persist_n_buckets(state_dir: str, n_buckets: int) -> None:
    import json

    root = os.path.join(state_dir, _KIND)
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, _META)
    if not os.path.exists(path):
        with open(path, "w") as f:
            json.dump({"n_buckets": int(n_buckets)}, f)


def _committed(state_dir: str) -> list[str]:
    root = os.path.join(state_dir, _KIND)
    if not os.path.isdir(root):
        return []
    return sorted(
        d for d in os.listdir(root)
        if d.startswith("snap=")
        and os.path.exists(os.path.join(root, d, _MARKER)))


def _bucket_of(s: pd.Series, n_buckets: int) -> pd.Series:
    return s.map(lambda k: zlib.crc32(str(k).encode()) % n_buckets
                 ).astype("int32")


def _read_state_subjects(state_dir: str, bucket: int,
                         subjects: list[str]) -> pd.DataFrame:
    """This bucket's state triples restricted to `subjects` — filtered
    AT THE READ (predicate pushdown over subject-sorted row groups)."""
    parts = []
    for snap in _committed(state_dir):
        sub = os.path.join(state_dir, _KIND, snap, f"bucket={bucket}")
        if not os.path.isdir(sub):
            continue
        t = pa_ds.dataset(sub, format="parquet").to_table(
            filter=pc.field("s").isin(subjects))
        if t.num_rows:
            parts.append(t.to_pandas())
    if not parts:
        return pd.DataFrame({"s": pd.Series(dtype=object),
                             "p": pd.Series(dtype=object),
                             "o": pd.Series(dtype=object)})
    return pd.concat(parts, ignore_index=True)


def incremental_validate(
    snapshot: ray.data.Dataset,
    shapes: list[Shape],
    state_dir: str,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    type_pred: str = "type",
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Validate the subjects TOUCHED by `snapshot` against their full
    (state + snapshot) triple history; returns their complete new
    violation rows (node, shape, constraint, pred, detail) — the
    ledger delta.  One subject-bucket exchange over the snapshot; the
    state contributes only per-bucket filtered reads."""
    for sh in shapes:
        sh.validate_spec()
        if any(c[0] == "class_ref" for c in sh.constraints):
            raise ValueError(
                "class_ref is store-global — validate it with "
                "stages.shacl.validate_shapes over the full store")
    shape_specs = [(sh.name, sh.target_class, list(sh.constraints))
                   for sh in shapes]
    n_buckets = _resolve_n_buckets(state_dir, n_buckets)

    def tag(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "s": batch.column(s_col).cast(pa.string()).to_pandas(),
            "p": batch.column(p_col).cast(pa.string()).to_pandas(),
            "o": batch.column(o_col).cast(pa.string()).to_pandas()})
        df["_bucket"] = _bucket_of(df["s"], n_buckets)
        return df

    def check(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return _empty_violations()
        bucket = int(g["_bucket"].iloc[0])
        new = g.drop(columns=["_bucket"])
        touched = sorted(new["s"].unique())
        prior = _read_state_subjects(state_dir, bucket, touched)
        both = pd.concat([prior, new], ignore_index=True)
        return _validate_frame(both, shape_specs, type_pred, {})

    return (snapshot.map_batches(tag, batch_format="pyarrow")
            .groupby("_bucket").map_groups(check, batch_format="pandas"))


def commit_snapshot(
    snapshot: ray.data.Dataset,
    state_dir: str,
    snapshot_id: str,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    n_buckets: int | None = None,
) -> int:
    """Persist `snapshot` into the bucketed state: per subject bucket
    one s-sorted parquet file, then the `_SUCCESS` marker.  Idempotent
    (an already-committed id is a no-op); a crashed partial directory
    is cleaned and rewritten.  Returns the number of rows committed."""
    n_buckets = _resolve_n_buckets(state_dir, n_buckets)
    root = os.path.join(state_dir, _KIND, f"snap={snapshot_id}")
    if os.path.exists(os.path.join(root, _MARKER)):
        return 0
    if os.path.isdir(root):  # crashed partial commit
        shutil.rmtree(root)
    _persist_n_buckets(state_dir, n_buckets)

    def tag(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "s": batch.column(s_col).cast(pa.string()).to_pandas(),
            "p": batch.column(p_col).cast(pa.string()).to_pandas(),
            "o": batch.column(o_col).cast(pa.string()).to_pandas()})
        df["_bucket"] = _bucket_of(df["s"], n_buckets)
        return df

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({"n": pd.Series(dtype="int64")})
        bucket = int(g["_bucket"].iloc[0])
        rows = (g.drop(columns=["_bucket"])
                .sort_values("s", kind="stable"))
        sub = os.path.join(root, f"bucket={bucket}")
        os.makedirs(sub, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(rows, preserve_index=False),
                       os.path.join(sub, "part.parquet"),
                       row_group_size=65536)
        return pd.DataFrame({"n": pd.Series([len(rows)],
                                            dtype="int64")})

    counts = (snapshot.map_batches(tag, batch_format="pyarrow")
              .groupby("_bucket")
              .map_groups(write_bucket, batch_format="pandas")
              .to_pandas())
    n = int(counts["n"].sum()) if "n" in counts.columns else 0
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, _MARKER), "w") as f:
        f.write("")
    return n
