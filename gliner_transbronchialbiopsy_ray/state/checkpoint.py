"""Per-partition checkpoint / lineage / resume (SURVEY §4, north rule:
"every partition writes lineage + throughput metrics to checkpoints so the
job resumes mid-pipeline after failure").

Design for a 100 TB input: the unit of restart is an INPUT SHARD GROUP, not
the whole dataset.  Each partition runs the (streaming) pipeline over its
file group and lands in its own output directory via tmp-dir + atomic
rename; a JSON manifest (lineage: input files + content hash; metrics:
rows in/out, seconds, rows/sec) is written only after the rename, so a
retried/resumed run can trust manifests absolutely.  On resume, pending
partitions = all minus manifested — the anti-join of SURVEY §2.4.

The reference's only "resume" is an in-RAM filename set
(/root/reference/src/streamlit/app/app.py:344-346); its corrections log
(corrections_manager.py:105-113) is the seed of the manifest-sink idea (K3).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from collections.abc import Callable

import ray.data

from .. import __version__


def plan_partitions(input_files: list[str], n_partitions: int) -> list[list[str]]:
    """Deterministic STABLE-HASH file grouping: a file's partition depends
    only on its own name, so appending new input files to a corpus leaves
    existing partitions' file sets unchanged (their manifests stay valid on
    resume) except the partitions the new files hash into."""
    import zlib

    files = sorted(input_files)
    n = max(1, min(n_partitions, len(files)))
    groups: list[list[str]] = [[] for _ in range(n)]
    for f in files:
        groups[zlib.crc32(os.path.basename(f).encode("utf-8")) % n].append(f)
    return groups


class CheckpointedRun:
    """Resumable partitioned execution of a Dataset->Dataset pipeline."""

    def __init__(self, output_root: str):
        self.output_root = output_root
        self.ckpt_dir = os.path.join(output_root, "checkpoints")
        os.makedirs(self.ckpt_dir, exist_ok=True)

    def _manifest_path(self, pid: int) -> str:
        return os.path.join(self.ckpt_dir, f"part-{pid:05d}.json")

    def _out_dir(self, pid: int) -> str:
        return os.path.join(self.output_root, f"part-{pid:05d}")

    def completed(self) -> dict[int, dict]:
        done = {}
        for name in os.listdir(self.ckpt_dir):
            if name.startswith("part-") and name.endswith(".json"):
                with open(os.path.join(self.ckpt_dir, name)) as f:
                    m = json.load(f)
                if os.path.isdir(self._out_dir(m["partition"])):
                    done[m["partition"]] = m
        return done

    def run(
        self,
        partitions: list[list[str]],
        pipeline_fn: Callable[[ray.data.Dataset], ray.data.Dataset],
        read_fn: Callable[[list[str]], ray.data.Dataset] | None = None,
    ) -> dict:
        """Execute all pending partitions; returns summary metrics.

        Each partition is one streaming Dataset execution: read shard group
        -> pipeline -> write_parquet into a tmp dir -> atomic rename ->
        manifest.  A crash mid-partition leaves only a tmp dir (ignored and
        cleaned on resume) — output is never double-emitted.
        """
        read_fn = read_fn or (lambda files: ray.data.read_parquet(files))
        done = self.completed()
        summary = {"completed_prior": 0, "ran": 0, "rows_out": 0}
        for pid, files in enumerate(partitions):
            if not files:  # stable-hash planning can leave a bucket empty
                continue
            # a manifest is only trusted if it covers EXACTLY this
            # partition's current input files — an appended/changed corpus
            # invalidates affected partitions, never silently keeps them
            if pid in done and done[pid].get("input_ref") == files:
                summary["completed_prior"] += 1
                continue
            out_dir = self._out_dir(pid)
            tmp_dir = out_dir + ".tmp"
            if os.path.exists(tmp_dir):
                shutil.rmtree(tmp_dir)  # debris from a killed attempt
            if os.path.exists(out_dir):
                shutil.rmtree(out_dir)  # output without manifest = untrusted
            t0 = time.perf_counter()
            ds = read_fn(files)
            rows_in = ds.count()
            out = pipeline_fn(ds)
            out.write_parquet(tmp_dir)
            os.replace(tmp_dir, out_dir)
            seconds = time.perf_counter() - t0
            rows_out, content_hash = _summarize_dir(out_dir)
            manifest = {
                "partition": pid,
                "input_ref": files,
                "rows_in": rows_in,
                "rows_out": rows_out,
                "seconds": round(seconds, 3),
                "rows_per_sec": round(rows_in / seconds, 2) if seconds else None,
                "output_path": out_dir,
                "content_hash": content_hash,
                "engine_version": __version__,
            }
            tmp_manifest = self._manifest_path(pid) + ".tmp"
            with open(tmp_manifest, "w") as f:
                json.dump(manifest, f, indent=2)
            os.replace(tmp_manifest, self._manifest_path(pid))
            summary["ran"] += 1
            summary["rows_out"] += rows_out
        summary["completed_total"] = len(self.completed())
        return summary


def _summarize_dir(path: str) -> tuple[int, str]:
    """(row count, content hash) of a directory of parquet part files."""
    import pyarrow.parquet as pq

    rows = 0
    h = hashlib.md5()
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        fp = os.path.join(path, name)
        rows += pq.ParquetFile(fp).metadata.num_rows
        with open(fp, "rb") as f:
            h.update(hashlib.md5(f.read()).digest())
    return rows, h.hexdigest()


def read_checkpointed_output(output_root: str) -> ray.data.Dataset:
    """Read back all completed partitions as one Dataset."""
    import glob

    run = CheckpointedRun(output_root)
    files = [
        f
        for pid in sorted(run.completed())
        for f in sorted(glob.glob(os.path.join(run._out_dir(pid), "*.parquet")))
    ]
    return ray.data.read_parquet(files)
