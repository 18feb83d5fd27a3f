#!/usr/bin/env python
"""Hardware throttle probe — measures this machine's per-core slowdown under
parallel load using PURE multiprocessing (no Ray), running the exact NER
kernel the scaling benchmark uses.

Why it exists: the sandbox VM's per-task time inflates once more than ~16
cores are busy (cloud CPU steal / power capping).  That caps the *measured*
N->4N scaling efficiency of ANY job at perTask(N)/perTask(4N), independent
of the engine.  BASELINE.md cites this probe's numbers next to the pipeline
scaling results so the two effects are separable.

Usage: python bench_hw_probe.py  ->  one JSON line {n_procs: per_task_sec}.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def work(_i: int) -> float:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gliner_transbronchialbiopsy_ray.config import LABELS
    from gliner_transbronchialbiopsy_ray.fixtures import generate_corpus
    from gliner_transbronchialbiopsy_ray.stages.assemble import assemble_text
    from gliner_transbronchialbiopsy_ray.stages.ner import LexiconBackend
    from gliner_transbronchialbiopsy_ray.stages.normalize import segment_batch

    t = generate_corpus(156, seed=99)["documents"]
    b = segment_batch(assemble_text(t))
    texts = [c for c in b["conclusion"].to_pylist() if c]
    be = LexiconBackend(work_factor=256)
    t0 = time.time()
    be.predict(texts, LABELS, 0.5)
    return time.time() - t0


def main() -> None:
    out = {}
    for n in (1, 2, 4, 8, 16, 24, 32):
        if n == 1:
            out[n] = round(work(0), 3)
            continue
        with mp.Pool(n) as p:
            ts = p.map(work, range(n))
        out[n] = round(sum(ts) / len(ts), 3)
    print(json.dumps({"per_task_sec_by_nprocs": out}))


if __name__ == "__main__":
    main()
