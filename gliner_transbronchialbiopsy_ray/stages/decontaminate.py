"""Benchmark decontamination: flag corpus documents that share word
n-grams with a (small) benchmark/eval set — the standard train/test
overlap hygiene step for training-data pipelines (n-gram overlap
filtering as described in the GPT-2/GPT-3 dataset reports).

Scale shape: the benchmark side is always tiny relative to the corpus
(GBs vs 100 TB), so its distinct n-gram set is built with per-batch
partials and BROADCAST (`ray.put` once, read per actor in `__init__`),
and the corpus is checked in one streamed `map_batches` pass — no
shuffle touches the 100 TB side.  For benchmark sets too large for an
exact string set, pass `hashed=True` (64-bit gram hashes, 8 bytes each)
or build a Bloom filter with `functions.bloom` and accept false
positives; the exact default keeps results SQL-verifiable.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _grams(text: str, n: int) -> set:
    w = (text or "").split(" ")
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def _hash_gram(g: str) -> int:
    return zlib.crc32(g.encode("utf-8"))


def benchmark_ngram_set(
    bench: ray.data.Dataset,
    n: int = 8,
    text_col: str = "text",
    hashed: bool = False,
) -> set:
    """Distinct n-gram set of the benchmark side: per-batch distinct
    partials -> driver union.  Bounded by benchmark size (the small
    side), never by the corpus."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        out: set = set()
        for t in batch.column(text_col).to_pylist():
            out |= _grams(t, n)
        if hashed:
            out = {_hash_gram(g) for g in out}
        return pd.DataFrame({"g": list(out)})

    parts = bench.map_batches(partial, batch_format="pyarrow").to_pandas()
    if "g" not in parts.columns:  # empty benchmark -> no partial blocks
        return set()
    return set(parts["g"])


class _Decontaminator:
    """Actor stage: broadcast benchmark gram set read once per actor."""

    def __init__(self, gram_set_ref, n: int, text_col: str, hashed: bool):
        self.grams = ray.get(gram_set_ref)
        self.n = n
        self.text_col = text_col
        self.hashed = hashed

    def __call__(self, batch: pa.Table) -> pa.Table:
        hits = np.empty(batch.num_rows, dtype=np.int64)
        for i, t in enumerate(batch.column(self.text_col).to_pylist()):
            g = _grams(t, self.n)
            if self.hashed:
                g = {_hash_gram(x) for x in g}
            hits[i] = len(g & self.grams)
        # append (pass-through) rather than project: composition
        # pipelines keep their carried flags without a re-join
        batch = batch.append_column("hit_grams", pa.array(hits))
        return batch.append_column("contaminated", pa.array(hits > 0))


def decontaminate(
    docs: ray.data.Dataset,
    bench: ray.data.Dataset,
    n: int = 8,
    text_col: str = "text",
    hashed: bool = False,
    concurrency: int | tuple[int, int] = 4,
) -> ray.data.Dataset:
    """Flag each corpus doc with the count of its distinct n-grams that
    appear anywhere in the benchmark set (`hit_grams`) and a
    `contaminated` bool.  No rows are dropped — filtering is the
    caller's policy decision."""
    gram_ref = ray.put(benchmark_ngram_set(bench, n, text_col, hashed))
    return docs.map_batches(
        _Decontaminator,
        fn_constructor_kwargs={
            "gram_set_ref": gram_ref,
            "n": n,
            "text_col": text_col,
            "hashed": hashed,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=0.5,
    )
