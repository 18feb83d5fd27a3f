"""Incremental CONNECTED COMPONENTS over persisted state — the
entity-resolution cluster maintenance piece of the KG state family
(exact/LSH dedup: snapshot_dedup.py; SHACL: snapshot_shacl.py).  New
sameAs/duplicate edges arrive in snapshots; component labels are
maintained WITHOUT re-clustering the accumulated graph.

Layout (same `_SUCCESS`-marker commit discipline as the siblings):

  state_dir/_meta.json                     {"n_buckets": B}
  state_dir/labels/snap=<id>/bucket=<b>/   (node, component) int64 —
                                           labels AS OF commit time,
                                           bucketed by crc32(node)
  state_dir/alias/snap=<id>/               (old, new) int64 — label
                                           merges this commit caused

The scale contract: a commit touches (a) the arriving edge batch,
(b) ONLY the label buckets containing the batch's endpoints (hive
predicate pushdown, the snapshot_shacl read pattern), and (c) the
alias table — which grows by at most #merged-components per commit
and is BROADCAST-SIZED by construction (every alias retires a
component forever; total aliases <= total components ever created).
Stored labels are never rewritten: resolution applies the
union-find-compressed alias map at read time, so commits stay
proportional to the batch, not the graph.  `compact()` is the
documented full rewrite that folds aliases back in.

Component ids are the MIN NODE ID of the component (the
dedup.connected_components convention) — old labels are node ids, so
they participate directly in the per-commit merge CC and the
maintained labels equal a from-scratch re-cluster (pinned by test and
by the q246 oracle)."""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

_MARKER = "_SUCCESS"


def _meta_path(state_dir: str) -> str:
    return os.path.join(state_dir, "_meta.json")


def _check_meta(state_dir: str, n_buckets: int) -> None:
    """Persist n_buckets on first commit, verify on every later call
    (the snapshot_shacl bucket-count discipline)."""
    p = _meta_path(state_dir)
    if os.path.exists(p):
        with open(p) as f:
            stored = json.load(f)["n_buckets"]
        if stored != n_buckets:
            raise ValueError(
                f"state at {state_dir} was committed with "
                f"n_buckets={stored}, called with {n_buckets}")
    else:
        os.makedirs(state_dir, exist_ok=True)
        with open(p, "w") as f:
            json.dump({"n_buckets": n_buckets}, f)


def _snaps(state_dir: str, kind: str) -> list[str]:
    root = os.path.join(state_dir, kind)
    if not os.path.isdir(root):
        return []
    out = []
    for d in sorted(os.listdir(root)):
        if d.startswith("snap=") and os.path.exists(
                os.path.join(root, d, _MARKER)):
            out.append(os.path.join(root, d))
    return out


def _alias_map(state_dir: str) -> dict[int, int]:
    """All committed aliases, path-compressed on the driver (bounded:
    one alias per ever-merged component)."""
    parent: dict[int, int] = {}
    for snap in _snaps(state_dir, "alias"):
        for f in sorted(os.listdir(snap)):
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(snap, f))
                for o, n in zip(t.column("old").to_pylist(),
                                t.column("new").to_pylist()):
                    parent[int(o)] = int(n)

    def find(x: int) -> int:
        seen = []
        while x in parent:
            seen.append(x)
            x = parent[x]
        for s in seen:
            parent[s] = x
        return x

    return {o: find(o) for o in list(parent)}


def _read_touched_labels(state_dir: str, buckets: set[int],
                         nodes: set[int]) -> pd.DataFrame:
    """Labels of `nodes`: only the touched bucket directories are
    read, filtered to the touched nodes."""
    frames = []
    for snap in _snaps(state_dir, "labels"):
        for b in sorted(buckets):
            d = os.path.join(snap, f"bucket={b}")
            if not os.path.isdir(d):
                continue
            for f in sorted(os.listdir(d)):
                if f.endswith(".parquet"):
                    t = pq.read_table(os.path.join(d, f),
                                      columns=["node", "component"])
                    m = pc.is_in(t.column("node"),
                                 value_set=pa.array(sorted(nodes),
                                                    type=pa.int64()))
                    frames.append(t.filter(m).to_pandas())
    if not frames:
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "component": pd.Series(dtype="int64")})
    return pd.concat(frames, ignore_index=True).drop_duplicates("node")


def commit_edges(
    state_dir: str,
    edges: ray.data.Dataset,
    snapshot_id: str,
    a: str = "a",
    b: str = "b",
    n_buckets: int = 32,
    max_iterations: int = 12,
) -> bool:
    """Fold one snapshot of undirected edges into the maintained
    component labels.  Idempotent at the `_SUCCESS` marker (a crashed
    partial commit is wiped and redone); returns False if
    `snapshot_id` is already committed.

    Per commit: the edge batch collapses to distinct endpoint pairs;
    the endpoints' CURRENT labels come from the touched buckets only,
    resolved through the alias map; one distributed CC over
    (batch edges ∪ node->label attachments) yields the merged labels
    (old labels are node ids, so the min-id convention is preserved
    globally); labels for genuinely NEW nodes are committed bucketed
    by crc32(node), and every old label whose component grew a
    smaller min becomes one alias row."""
    import numpy as np
    import zlib

    from ..stages.dedup import connected_components

    _check_meta(state_dir, n_buckets)
    snap_labels = os.path.join(state_dir, "labels",
                               f"snap={snapshot_id}")
    if os.path.exists(os.path.join(snap_labels, _MARKER)):
        return False
    for kind in ("labels", "alias"):
        d = os.path.join(state_dir, kind, f"snap={snapshot_id}")
        if os.path.isdir(d):
            shutil.rmtree(d)

    def canon(batch: pa.Table) -> pd.DataFrame:
        df = batch.select([a, b]).to_pandas()
        u = df[a].to_numpy("int64")
        v = df[b].to_numpy("int64")
        keep = u != v
        u, v = u[keep], v[keep]
        return pd.DataFrame({"a": np.minimum(u, v),
                             "b": np.maximum(u, v)}).drop_duplicates()

    e = (edges.map_batches(canon, batch_format="pyarrow")
         .materialize())
    pairs = e.to_pandas().drop_duplicates()

    touched = set(map(int, pd.unique(
        pd.concat([pairs["a"], pairs["b"]], ignore_index=True))))
    tb = {zlib.crc32(str(n).encode()) % n_buckets for n in touched}
    known = _read_touched_labels(state_dir, tb, touched)
    alias = _alias_map(state_dir)
    if len(known):
        known["component"] = known["component"].map(
            lambda c: alias.get(int(c), int(c))).astype("int64")

    # merge graph: batch edges + (node, current label) attachments
    attach = known.rename(columns={"node": "a", "component": "b"})
    merge_pairs = pd.concat(
        [pairs, attach[attach["a"] != attach["b"]]], ignore_index=True)
    cc_in = ray.data.from_arrow(pa.Table.from_pandas(
        merge_pairs.astype({"a": "int64", "b": "int64"}),
        preserve_index=False))
    cc = connected_components(
        cc_in, max_iterations=max_iterations, left_col="a",
        right_col="b", distributed=True).to_pandas()
    new_label = dict(zip(cc["node"].astype("int64"),
                         cc["component"].astype("int64")))

    # aliases: old labels that now resolve elsewhere
    old_labels = set(map(int, known["component"])) if len(known) else set()
    alias_rows = [(ell, int(new_label[ell]))
                  for ell in sorted(old_labels)
                  if int(new_label.get(ell, ell)) != ell]

    # labels to persist: nodes NOT already stored (new this snapshot)
    known_nodes = set(map(int, known["node"])) if len(known) else set()
    new_nodes = sorted(touched - known_nodes)
    lab = pd.DataFrame({
        "node": pd.Series(new_nodes, dtype="int64"),
        "component": pd.Series(
            [int(new_label.get(n, n)) for n in new_nodes],
            dtype="int64")})
    lab["bucket"] = lab["node"].map(
        lambda n: zlib.crc32(str(n).encode()) % n_buckets
    ).astype("int32")

    os.makedirs(snap_labels, exist_ok=True)
    if len(lab):
        ray.data.from_arrow(pa.Table.from_pandas(
            lab, preserve_index=False)).write_parquet(
                snap_labels, partition_cols=["bucket"])
    snap_alias = os.path.join(state_dir, "alias",
                              f"snap={snapshot_id}")
    os.makedirs(snap_alias, exist_ok=True)
    at = pa.table({
        "old": pa.array([r[0] for r in alias_rows], type=pa.int64()),
        "new": pa.array([r[1] for r in alias_rows], type=pa.int64())})
    pq.write_table(at, os.path.join(snap_alias, "alias.parquet"))
    with open(os.path.join(snap_alias, _MARKER), "w") as f:
        json.dump({"snapshot_id": snapshot_id}, f)
    with open(os.path.join(snap_labels, _MARKER), "w") as f:
        json.dump({"snapshot_id": snapshot_id}, f)
    return True


def current_labels(state_dir: str) -> ray.data.Dataset:
    """The maintained (node, component) labels: stored label snapshots
    streamed, the compressed alias map applied as a broadcast dict —
    stored rows are never rewritten until `compact`."""
    snaps = _snaps(state_dir, "labels")
    files = []
    for snap in snaps:
        for root, _, fs in os.walk(snap):
            files += [os.path.join(root, f) for f in fs
                      if f.endswith(".parquet")]
    if not files:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], type=pa.int64()),
            "component": pa.array([], type=pa.int64())}))
    alias = _alias_map(state_dir)
    alias_ref = ray.put(alias)
    ds = ray.data.read_parquet(files, columns=["node", "component"])

    def resolve(batch: pa.Table) -> pa.Table:
        am = ray.get(alias_ref)
        comp = [am.get(int(c), int(c))
                for c in batch.column("component").to_pylist()]
        return pa.table({
            "node": batch.column("node").cast(pa.int64()),
            "component": pa.array(comp, type=pa.int64())})

    return ds.map_batches(resolve, batch_format="pyarrow")


def compact(state_dir: str) -> None:
    """Fold the alias map into the stored labels (full rewrite — the
    periodic maintenance op that resets alias growth).  Single new
    snapshot `snap=compact`, older snapshots removed."""
    with open(_meta_path(state_dir)) as f:
        n_buckets = json.load(f)["n_buckets"]
    import zlib

    resolved = current_labels(state_dir).to_pandas()
    resolved["bucket"] = resolved["node"].map(
        lambda n: zlib.crc32(str(int(n)).encode()) % n_buckets
    ).astype("int32")
    for kind in ("labels", "alias"):
        root = os.path.join(state_dir, kind)
        if os.path.isdir(root):
            shutil.rmtree(root)
    snap = os.path.join(state_dir, "labels", "snap=compact")
    os.makedirs(snap, exist_ok=True)
    if len(resolved):
        ray.data.from_arrow(pa.Table.from_pandas(
            resolved, preserve_index=False)).write_parquet(
                snap, partition_cols=["bucket"])
    with open(os.path.join(snap, _MARKER), "w") as f:
        json.dump({"snapshot_id": "compact"}, f)
    snap_alias = os.path.join(state_dir, "alias", "snap=compact")
    os.makedirs(snap_alias, exist_ok=True)
    pq.write_table(pa.table({
        "old": pa.array([], type=pa.int64()),
        "new": pa.array([], type=pa.int64())}),
        os.path.join(snap_alias, "alias.parquet"))
    with open(os.path.join(snap_alias, _MARKER), "w") as f:
        json.dump({"snapshot_id": "compact"}, f)
