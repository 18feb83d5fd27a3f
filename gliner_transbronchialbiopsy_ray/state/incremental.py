"""Incremental aggregate (materialized-view) maintenance on top of the
per-partition checkpoint manifests (state/checkpoint.py).

At 100 TB, re-running a corpus-wide aggregate because one shard group was
appended is the difference between minutes and hours: the partition
manifests already carry a content hash per completed partition, so an
aggregate can be maintained as PER-PARTITION PARTIALS cached next to the
checkpoints — `refresh()` recomputes a partial only when its partition's
content hash changed (or the partial is missing), then folds the tiny
partial set into the final result.  The fold sorts partials into a
canonical order first, so the result is bit-identical regardless of which
subset was recomputed (the same order-canonical rule the _preagg driver
merge follows).

This is the engine-level generalization of the reference's incremental
habit — appending one row per processed file to the results DataFrame
(/root/reference/src/streamlit/app/app.py:232-241) — made safe for
distributed reruns: partials are invalidated by CONTENT, not by wall
clock, and a partition rewritten with identical bytes reuses its partial.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

import pandas as pd
import ray.data

from .checkpoint import CheckpointedRun


class IncrementalAggregate:
    """Maintain a grouped aggregate over a CheckpointedRun's output.

    `partial_fn(ds) -> pd.DataFrame` computes one partition's partial rows
    (e.g. per-key counts) from that partition's output Dataset — it runs
    as a normal streaming Dataset consumption, so a partition larger than
    memory still works.  `fold_fn(partials) -> pd.DataFrame` merges the
    concatenated partial rows (e.g. groupby-sum).  Both see ONLY
    partial-sized data at fold time.
    """

    def __init__(
        self,
        output_root: str,
        name: str,
        partial_fn: Callable[[ray.data.Dataset], pd.DataFrame],
        fold_fn: Callable[[pd.DataFrame], pd.DataFrame],
    ):
        self.run = CheckpointedRun(output_root)
        self.name = name
        self.partial_fn = partial_fn
        self.fold_fn = fold_fn
        self.cache_dir = os.path.join(output_root, "aggregates", name)
        os.makedirs(self.cache_dir, exist_ok=True)

    def _paths(self, pid: int) -> tuple[str, str]:
        base = os.path.join(self.cache_dir, f"part-{pid:05d}")
        return base + ".parquet", base + ".json"

    def refresh(self) -> tuple[pd.DataFrame, dict]:
        """Bring every partial up to date and fold.  Returns
        (result, stats) where stats counts reused vs recomputed partials
        — the incremental-maintenance evidence a caller can assert on."""
        import glob

        done = self.run.completed()
        stats = {"reused": 0, "recomputed": 0, "dropped": 0}
        frames = []
        for pid in sorted(done):
            m = done[pid]
            pq_path, meta_path = self._paths(pid)
            meta = None
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    meta = json.load(f)
            if meta and meta.get("content_hash") == m["content_hash"] \
                    and os.path.exists(pq_path):
                frames.append(pd.read_parquet(pq_path))
                stats["reused"] += 1
                continue
            files = sorted(
                glob.glob(os.path.join(m["output_path"], "*.parquet")))
            part = self.partial_fn(ray.data.read_parquet(files))
            # atomic: parquet first, meta (the validity marker) second
            tmp = pq_path + ".tmp"
            part.to_parquet(tmp, index=False)
            os.replace(tmp, pq_path)
            tmp = meta_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"partition": pid,
                           "content_hash": m["content_hash"],
                           "rows": int(len(part))}, f)
            os.replace(tmp, meta_path)
            frames.append(part)
            stats["recomputed"] += 1
        # partials for partitions that no longer exist are dropped from
        # the fold (their cache files are left for inspection)
        live = {os.path.basename(self._paths(pid)[0]) for pid in done}
        for name in os.listdir(self.cache_dir):
            if name.endswith(".parquet") and name not in live:
                stats["dropped"] += 1
        if not frames:
            return pd.DataFrame(), stats
        allp = pd.concat(frames, ignore_index=True)
        # canonical order -> deterministic fold regardless of which
        # partials were recomputed this round
        allp = allp.sort_values(list(allp.columns),
                                kind="stable").reset_index(drop=True)
        return self.fold_fn(allp), stats
