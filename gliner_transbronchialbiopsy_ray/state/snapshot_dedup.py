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
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ..stages.dedup import N_HASH_BUCKETS, _add_hash_bucket

_SEEN = "seen"
_MARKER = "_SUCCESS"


def _committed_snapshots(state_dir: str, kind: str = _SEEN) -> list[str]:
    root = os.path.join(state_dir, kind)
    if not os.path.isdir(root):
        return []
    return sorted(
        d for d in os.listdir(root)
        if d.startswith("snap=")
        and os.path.exists(os.path.join(root, d, _MARKER))
    )


def _read_bucket(state_dir: str, kind: str, bucket: int,
                 columns: list[str], empty: pd.DataFrame) -> pd.DataFrame:
    """Concatenated `columns` of one bucket across all COMMITTED snapshots
    of a state kind.  Partial (marker-less) snapshot dirs are invisible,
    so a crashed commit can never poison a verdict pass."""
    parts = []
    for snap in _committed_snapshots(state_dir, kind):
        sub = os.path.join(state_dir, kind, snap, f"bucket={bucket}")
        if os.path.isdir(sub):
            parts.append(pq.read_table(sub, columns=columns).to_pandas())
    if not parts:
        return empty
    return pd.concat(parts, ignore_index=True)


def _read_state_bucket(state_dir: str, bucket: int) -> pd.DataFrame:
    return _read_bucket(
        state_dir, _SEEN, bucket, ["content_hash", "keeper_id"],
        pd.DataFrame({"content_hash": pd.Series(dtype="object"),
                      "keeper_id": pd.Series(dtype="int64")}))


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


def _commit_bucketed(
    rows: ray.data.Dataset,
    state_dir: str,
    kind: str,
    snapshot_id: str,
) -> bool:
    """Write `rows` (must carry a `bucket` column) hive-partitioned by
    bucket under `<state_dir>/<kind>/snap=<id>/`, marker last.  Returns
    False (no-op) when `snapshot_id` is already committed; a marker-less
    partial directory from a crashed run is deleted and rewritten.  The
    distributed write happens FIRST, the marker last — the commit is
    atomic at the marker."""
    snap_dir = os.path.join(state_dir, kind, f"snap={snapshot_id}")
    if os.path.exists(os.path.join(snap_dir, _MARKER)):
        return False
    if os.path.isdir(snap_dir):  # crashed partial commit
        shutil.rmtree(snap_dir)
    if rows is not None:
        rows.write_parquet(snap_dir, partition_cols=["bucket"])
    # a snapshot that accepted nothing (all dups) still commits: makedirs
    # covers the case where the empty write created no directory
    os.makedirs(snap_dir, exist_ok=True)
    with open(os.path.join(snap_dir, _MARKER), "w") as f:
        json.dump({"snapshot_id": snapshot_id}, f)
    return True


def commit_snapshot(
    verdicts: ray.data.Dataset,
    state_dir: str,
    snapshot_id: str,
) -> bool:
    """Persist the snapshot's accepted (status='unique') hashes into the
    bucketed exact-dedup state (see `_commit_bucketed` for the marker
    discipline)."""
    accepted = verdicts.map_batches(
        lambda b: b.filter(pc.equal(b.column("status"), "unique"))
                   .select(["content_hash", "keeper_id", "bucket"]),
        batch_format="pyarrow",
    )
    return _commit_bucketed(accepted, state_dir, _SEEN, snapshot_id)


_LSH = "lsh"
_LSH_EMPTY = pd.DataFrame({
    "band": pd.Series(dtype="int32"),
    "band_hash": pd.Series(dtype="uint64"),
    "keeper_id": pd.Series(dtype="int64"),
    "signature": pd.Series(dtype="object"),
})


def _read_lsh_bucket(state_dir: str, bucket: int) -> pd.DataFrame:
    return _read_bucket(
        state_dir, _LSH, bucket,
        ["band", "band_hash", "keeper_id", "signature"], _LSH_EMPTY)


def _check_lsh_meta(state_dir: str, num_perm: int, bands: int) -> None:
    """num_perm/bands are part of the persisted LSH state LAYOUT (they fix
    the signature width, band numbering and bucket partitioning): a later
    call with different values would silently compare mis-shaped
    signatures against the wrong buckets.  Persisted on first commit and
    verified on every later call — the same discipline as
    state/snapshot_shacl._resolve_n_buckets."""
    root = os.path.join(state_dir, _LSH)
    path = os.path.join(root, "_meta.json")
    if os.path.exists(path):
        with open(path) as f:
            meta = json.load(f)
        if (int(meta["num_perm"]), int(meta["bands"])) != (num_perm, bands):
            raise ValueError(
                f"LSH state at {state_dir} was committed with "
                f"num_perm={meta['num_perm']}, bands={meta['bands']}; "
                f"got num_perm={num_perm}, bands={bands}")
        return
    os.makedirs(root, exist_ok=True)
    with open(path, "w") as f:
        json.dump({"num_perm": int(num_perm), "bands": int(bands)}, f)


def _sig_matrix(sig_bytes, num_perm: int):
    import numpy as np
    return np.stack([np.frombuffer(s, dtype=np.uint64, count=num_perm)
                     for s in sig_bytes])


def incremental_lsh_dedup(
    new_docs: ray.data.Dataset,
    state_dir: str,
    snapshot_id: str,
    num_perm: int = 64,
    bands: int = 16,
    threshold_ppm: int = 700_000,
    shuffle_blocks: int = 8,
    star_cap: int = 256,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """Incremental MinHash-LSH NEAR-dup dedup of a snapshot against the
    accumulated accepted corpus — the near-dup sibling of
    `incremental_exact_dedup`, same state discipline:

      state_dir/lsh/snap=<id>/bucket=<b>/*.parquet
          (band, band_hash, keeper_id, signature) of ACCEPTED docs,
          partitioned by the band-hash bucket the verdict pass groups on
          — the state is read pre-bucketed, never reshuffled; shuffle
          cost stays O(snapshot x bands) narrow rows per day.

    Verdict semantics (deterministic):
      - a new doc whose signature agreement vs a state doc sharing an LSH
        band reaches `threshold_ppm` -> status='dup_of_state', keeper =
        the best-agreement (tie: min keeper_id) state doc;
      - else, agreement vs the min-doc_id new doc sharing a band (the
        star anchor, mirroring minhash_candidate_pairs' star_cap rule)
        -> 'dup_in_snapshot';  dup_of_state takes precedence;
      - else 'unique' (accepted; its band rows are committed to state).
    keeper_id is ONE HOP: a dup_in_snapshot row may point at an anchor
    that itself deduped against state — canonicalize offline with
    stages.dedup.connected_components when full-chain resolution matters.
    `star_cap` bounds the per-band comparison fan-out exactly like
    minhash_candidate_pairs: oversized groups compare against the capped
    min-id prefix only (approximate recall, linear cost).

    Returns (doc_id, status, keeper_id, est_ppm); est_ppm is the integer
    signature-agreement estimate of Jaccard for dup rows, 1_000_000 for
    unique rows (self-agreement).  Commit is idempotent per snapshot_id
    (`_SUCCESS` marker, crashed partials cleaned).
    """
    import numpy as np

    from ..stages.dedup import MinHasher
    from ..stages.joins import coalesce_for_join

    _check_lsh_meta(state_dir, num_perm, bands)
    sigs = new_docs.select_columns(["doc_id", "text"]).map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands},
        batch_format="pyarrow",
        concurrency=concurrency,
        # fractional CPUs (like minhash_candidate_pairs): a full-CPU pool of
        # size `concurrency` starves the upstream read tasks on a small
        # cluster — observed deadlock at num_cpus=4 with a 4x1.0 pool
        num_cpus=0.5,
    ).materialize()  # consumed twice: verdict pass + accepted-rows commit

    def band_candidates(g: pd.DataFrame) -> pd.DataFrame:
        """Per LSH-bucket: candidate rows (doc_id, kind, keeper_id,
        est_ppm); kind 2 = vs state, 1 = vs snapshot anchor."""
        state = _read_lsh_bucket(state_dir, int(g["bucket"].iloc[0]))
        state_groups = (
            {k: v for k, v in state.groupby(["band", "band_hash"], sort=False)}
            if len(state) else {}
        )
        out = []
        for (band, bh), grp in g.groupby(["band", "band_hash"], sort=False):
            grp = grp.sort_values("doc_id", kind="stable")
            if star_cap is not None and len(grp) > star_cap:
                grp = grp.iloc[:star_cap]
            M = _sig_matrix(grp["signature"].tolist(), num_perm)
            ids = grp["doc_id"].to_numpy()
            st = state_groups.get((band, bh))
            if st is not None:
                st = st.sort_values("keeper_id", kind="stable")
                if star_cap is not None and len(st) > star_cap:
                    st = st.iloc[:star_cap]
                S = _sig_matrix(st["signature"].tolist(), num_perm)
                est = (M[:, None, :] == S[None, :, :]).sum(axis=2)
                est = (est * 1_000_000) // num_perm          # (m, s) ppm
                best_j = est.argmax(axis=1)                  # first max =
                best = est[np.arange(len(ids)), best_j]      # min keeper tie
                keep = st["keeper_id"].to_numpy()[best_j]
                hit = best >= threshold_ppm
                out.extend(zip(ids[hit], [2] * int(hit.sum()),
                               keep[hit], best[hit]))
            if len(grp) > 1:
                est = ((M[1:] == M[0]).sum(axis=1) * 1_000_000) // num_perm
                hit = est >= threshold_ppm
                out.extend(zip(ids[1:][hit], [1] * int(hit.sum()),
                               np.full(int(hit.sum()), ids[0]), est[hit]))
        df = pd.DataFrame(out, columns=["doc_id", "kind", "keeper_id",
                                        "est_ppm"])
        return df.astype({"doc_id": "int64", "kind": "int64",
                          "keeper_id": "int64", "est_ppm": "int64"})

    cands = (sigs.repartition(shuffle_blocks)
             .groupby("bucket").map_groups(band_candidates,
                                           batch_format="pandas"))

    # sentinel rows guarantee every doc reaches the per-doc reduce even
    # with zero candidates; duplicates across batches are harmless (the
    # reduce keeps one best row per doc, and kind>0 always outranks them)
    def sentinels(batch: pa.Table) -> pd.DataFrame:
        ids = pd.unique(batch.column("doc_id").to_pandas())
        return pd.DataFrame({"doc_id": ids.astype("int64"),
                             "kind": np.int64(0),
                             "keeper_id": ids.astype("int64"),
                             "est_ppm": np.int64(1_000_000)})

    allrows = cands.union(sigs.map_batches(sentinels, batch_format="pyarrow"))
    allrows = allrows.map_batches(
        lambda b: b.append_column(
            "doc_bucket",
            pc.cast(pc.bit_wise_and(b.column("doc_id"), 255), pa.int32())),
        batch_format="pyarrow",
    ).repartition(shuffle_blocks)

    _STATUS = {0: "unique", 1: "dup_in_snapshot", 2: "dup_of_state"}

    def reduce_doc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "kind", "est_ppm", "keeper_id"],
                          ascending=[True, False, False, True],
                          kind="stable")
        g = g.drop_duplicates("doc_id", keep="first")
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "status": g["kind"].map(_STATUS).to_numpy(),
            "keeper_id": g["keeper_id"].to_numpy(),
            "est_ppm": g["est_ppm"].to_numpy(),
        })

    verdicts = (allrows.groupby("doc_bucket")
                .map_groups(reduce_doc, batch_format="pandas")
                .materialize())  # narrow; consumed by commit AND caller

    # commit the accepted docs' band rows (their own id is the keeper)
    uniq = verdicts.map_batches(
        lambda b: b.filter(pc.equal(b.column("status"), "unique"))
                   .select(["doc_id"]),
        batch_format="pyarrow",
    )
    if uniq.count() > 0:
        # join aggregators are ACTORS — size partitions to the cluster or a
        # small session deadlocks waiting for actors it can't place (same
        # rule as queries.q34_native_join)
        try:
            join_parts = max(2, min(shuffle_blocks,
                                    int(ray.cluster_resources().get("CPU", 4)) // 2))
        except Exception:
            join_parts = 2
        accepted = coalesce_for_join(sigs, join_parts).join(
            coalesce_for_join(uniq, join_parts),
            join_type="inner", num_partitions=join_parts,
            on=("doc_id",),
        ).map_batches(
            lambda b: b.select(["band", "band_hash", "doc_id", "bucket"])
                       .rename_columns(["band", "band_hash", "keeper_id",
                                        "bucket"])
                       .append_column("signature", b.column("signature")),
            batch_format="pyarrow",
        )
        _commit_bucketed(accepted, state_dir, _LSH, snapshot_id)
    else:  # nothing accepted: commit the marker only (empty snapshot)
        _commit_bucketed(None, state_dir, _LSH, snapshot_id)
    return verdicts


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
