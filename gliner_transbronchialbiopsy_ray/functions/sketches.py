"""Mergeable sketches for 100 TB aggregates (guide: "emit one serialized
sketch per batch and merge them — sketches are designed to be mergeable").

- HyperLogLog (p-bit register array; merge = elementwise max): approximate
  distinct counts without a `unique` shuffle.
- (The fixed-bin score histogram lives in stages/stats.py:score_histogram.)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


class HyperLogLog:
    """Standard HLL with md5 hashing (deterministic across processes)."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_many(self, values) -> None:
        for v in values:
            h = int.from_bytes(
                hashlib.md5(str(v).encode("utf-8")).digest()[:8], "big"
            )
            idx = h >> (64 - self.p)
            w = h & ((1 << (64 - self.p)) - 1)  # low 64-p bits
            rho = (64 - self.p) - w.bit_length() + 1
            if rho > self.registers[idx]:
                self.registers[idx] = rho

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        self.registers = np.maximum(self.registers, other.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        e = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # small-range correction
        return float(e)


def approx_distinct(
    ds: ray.data.Dataset, col: str, p: int = 12
) -> float:
    """Approximate COUNT(DISTINCT col) via per-batch HLL sketches merged
    driver-side (each partial is a 4 KiB register array — no shuffle)."""

    def sketch(batch: pa.Table) -> pd.DataFrame:
        h = HyperLogLog(p)
        h.add_many(batch.column(col).to_pylist())
        return pd.DataFrame({"registers": [h.registers.tobytes()]})

    partials = ds.select_columns([col]).map_batches(
        sketch, batch_format="pyarrow"
    ).to_pandas()
    acc = HyperLogLog(p)
    for blob in partials["registers"]:
        other = HyperLogLog(p)
        other.registers = np.frombuffer(blob, dtype=np.uint8).copy()
        acc.merge(other)
    return acc.estimate()
