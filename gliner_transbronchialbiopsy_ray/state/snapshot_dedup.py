"""Incremental (snapshot-over-state) exact dedup.

The recurring-crawl problem: a new snapshot arrives daily and must be
deduped against EVERYTHING already accepted, without reprocessing the
accumulated corpus.  The reference's analog is its append-one-row-per-
processed-file incremental habit (reference
src/streamlit/app/app.py:232-241); here it is generalized to a persisted,
bucketed seen-hash state:

  state_dir/seen/snap=<snapshot_id>/bucket=<b>/*.parquet
      (content_hash, keeper_id) of the rows ACCEPTED by that snapshot
  state_dir/seen/snap=<snapshot_id>/_SUCCESS
      commit marker: a snapshot directory without it is a crashed
      partial write and is deleted + rewritten on the next commit.

Scale properties (the reason this is not "union state + exact_dedup"):

- **Shuffle cost is O(new snapshot), never O(state).**  The seen-state is
  persisted ALREADY PARTITIONED by the same coarse content-hash bucket
  (dedup.N_HASH_BUCKETS) the new rows are grouped on, so the verdict pass
  shuffles only the snapshot's narrow (id, hash, bucket) rows; each
  bucket group's UDF reads just its own `bucket=<b>` directories from
  committed snapshots.  Re-shuffling billions of accumulated state hashes
  per daily snapshot is the design this avoids.
- **Text never enters the exchange** — the verdict pass ships 3 narrow
  columns; callers needing surviving full rows join the verdict table
  back on the id (native hash join).
- **Resumable + idempotent commits**: `_SUCCESS` marker per snapshot;
  re-committing an already-committed snapshot is a no-op, a crashed
  partial commit is cleaned and rewritten.  Commits are SERIAL per
  state_dir (each snapshot deduped against all prior commits), which is
  what guarantees a content_hash appears at most once across the state.
- Multi-node assumption (documented contract): `state_dir` is shared
  storage (object store / NFS / S3) readable from every worker, like any
  Ray Data read path.
"""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ..stages.dedup import N_HASH_BUCKETS, _add_hash_bucket

_SEEN = "seen"
_MARKER = "_SUCCESS"


def _committed_snapshots(state_dir: str) -> list[str]:
    seen_root = os.path.join(state_dir, _SEEN)
    if not os.path.isdir(seen_root):
        return []
    return sorted(
        d for d in os.listdir(seen_root)
        if d.startswith("snap=")
        and os.path.exists(os.path.join(seen_root, d, _MARKER))
    )


def _read_state_bucket(state_dir: str, bucket: int) -> pd.DataFrame:
    """(content_hash, keeper_id) accepted by all COMMITTED snapshots for
    one bucket.  Partial (marker-less) snapshot dirs are invisible, so a
    crashed commit can never poison a verdict pass."""
    parts = []
    for snap in _committed_snapshots(state_dir):
        sub = os.path.join(state_dir, _SEEN, snap, f"bucket={bucket}")
        if os.path.isdir(sub):
            parts.append(
                pq.read_table(sub, columns=["content_hash", "keeper_id"])
                .to_pandas()
            )
    if not parts:
        return pd.DataFrame({"content_hash": pd.Series(dtype="object"),
                             "keeper_id": pd.Series(dtype="int64")})
    return pd.concat(parts, ignore_index=True)


def incremental_dedup_verdicts(
    new_docs: ray.data.Dataset,
    state_dir: str,
    key_col: str = "text",
    id_col: str = "doc_id",
    shuffle_blocks: int = 8,
) -> ray.data.Dataset:
    """Verdict table for a new snapshot against the committed state:
    one row per input row with

      status    'dup_of_state'    content already accepted by a prior
                                  committed snapshot
                'unique'          first (min-id) occurrence of new content
                'dup_in_snapshot' later occurrence of new content within
                                  this same snapshot
      keeper_id the id of the row this row's content resolves to (its own
                id when status='unique')

    plus `content_hash`/`bucket` so `commit_snapshot` can persist the
    accepted rows without rehashing.  One bounded shuffle of narrow rows.
    """
    hashed = new_docs.select_columns([id_col, key_col]).map_batches(
        lambda b: _add_hash_bucket(b, key_col), batch_format="pyarrow"
    ).map_batches(
        lambda b: b.drop_columns([key_col]), batch_format="pyarrow"
    ).repartition(shuffle_blocks)

    def verdict_bucket(g: pd.DataFrame) -> pd.DataFrame:
        state = _read_state_bucket(state_dir, int(g["bucket"].iloc[0]))
        state_map = dict(zip(state["content_hash"], state["keeper_id"]))
        g = g.sort_values(id_col, kind="stable").reset_index(drop=True)
        state_keeper = g["content_hash"].map(state_map)
        snap_min = g.groupby("content_hash", sort=False)[id_col].transform("min")
        in_state = state_keeper.notna()
        g["status"] = "dup_in_snapshot"
        g.loc[g[id_col] == snap_min, "status"] = "unique"
        g.loc[in_state, "status"] = "dup_of_state"
        g["keeper_id"] = state_keeper.where(in_state, snap_min).astype("int64")
        return g

    return hashed.groupby("bucket").map_groups(
        verdict_bucket, batch_format="pandas")


def commit_snapshot(
    verdicts: ray.data.Dataset,
    state_dir: str,
    snapshot_id: str,
) -> bool:
    """Persist the snapshot's accepted (status='unique') hashes into the
    bucketed state.  Returns False (no-op) when `snapshot_id` is already
    committed; a marker-less partial directory from a crashed run is
    deleted and rewritten.  The distributed write happens FIRST, the
    marker last — the commit is atomic at the marker."""
    snap_dir = os.path.join(state_dir, _SEEN, f"snap={snapshot_id}")
    if os.path.exists(os.path.join(snap_dir, _MARKER)):
        return False
    if os.path.isdir(snap_dir):  # crashed partial commit
        shutil.rmtree(snap_dir)

    accepted = verdicts.map_batches(
        lambda b: b.filter(pc.equal(b.column("status"), "unique"))
                   .select(["content_hash", "keeper_id", "bucket"]),
        batch_format="pyarrow",
    )
    accepted.write_parquet(snap_dir, partition_cols=["bucket"])
    # a snapshot that accepted nothing (all dups) still commits: makedirs
    # covers the case where the empty write created no directory
    os.makedirs(snap_dir, exist_ok=True)
    with open(os.path.join(snap_dir, _MARKER), "w") as f:
        json.dump({"snapshot_id": snapshot_id}, f)
    return True


def incremental_exact_dedup(
    new_docs: ray.data.Dataset,
    state_dir: str,
    snapshot_id: str,
    key_col: str = "text",
    id_col: str = "doc_id",
    shuffle_blocks: int = 8,
) -> ray.data.Dataset:
    """Verdict pass + commit in one call (the per-snapshot driver step).
    Already-committed snapshot ids skip the commit (idempotent re-run);
    the verdict table is returned either way, with the bookkeeping
    columns dropped: (id, status, keeper_id)."""
    v = incremental_dedup_verdicts(
        new_docs, state_dir, key_col=key_col, id_col=id_col,
        shuffle_blocks=shuffle_blocks)
    # verdicts are narrow (id/hash/bucket/status/keeper) — materialize once
    # so the commit write and the caller's consumption don't each re-run
    # the shuffle; O(snapshot) rows, spillable.
    v = v.materialize()
    commit_snapshot(v, state_dir, snapshot_id)
    return v.drop_columns(["content_hash", "bucket"])
