"""Bloom-filter semi-join pre-filter (SURVEY §2.4 semi/anti-join scale path).

When the key set of a semi-join is too large to broadcast exactly, broadcast
a Bloom filter of it instead: the filter pass keeps every true match (no
false negatives) and drops most non-matches; an exact join over the
(pre-filtered, much smaller) survivors finishes the job when exactness is
required.  Deterministic double-hashing (md5-derived h1 + i*h2), numpy
bit-array, fully vectorizable membership test.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _hash_pair(key: str) -> tuple[int, int]:
    d = hashlib.md5(key.encode("utf-8")).digest()
    return int.from_bytes(d[:8], "big"), int.from_bytes(d[8:], "big") | 1


class BloomFilter:
    """Classic (m, k) Bloom filter with Kirsch-Mitzenmacher double hashing."""

    def __init__(self, capacity: int, fp_rate: float = 0.01):
        m = int(-capacity * np.log(fp_rate) / (np.log(2) ** 2)) + 1
        self.m = max(64, m)
        self.k = max(1, int(round(self.m / capacity * np.log(2))))
        self.bits = np.zeros((self.m + 7) // 8, dtype=np.uint8)

    def add(self, key: str) -> None:
        h1, h2 = _hash_pair(str(key))
        for i in range(self.k):
            pos = (h1 + i * h2) % self.m
            self.bits[pos >> 3] |= 1 << (pos & 7)

    def __contains__(self, key: str) -> bool:
        h1, h2 = _hash_pair(str(key))
        for i in range(self.k):
            pos = (h1 + i * h2) % self.m
            if not (self.bits[pos >> 3] >> (pos & 7)) & 1:
                return False
        return True

    @classmethod
    def build(cls, keys, fp_rate: float = 0.01) -> "BloomFilter":
        keys = list(keys)
        bf = cls(max(1, len(keys)), fp_rate)
        for k in keys:
            bf.add(k)
        return bf


def bloom_semi_join(
    ds: ray.data.Dataset,
    keys_ds: ray.data.Dataset,
    key_col: str,
    right_key_col: str | None = None,
    fp_rate: float = 0.01,
) -> ray.data.Dataset:
    """Keep rows of `ds` whose key is (probably) in `keys_ds`.

    No false negatives; expected false-positive fraction <= fp_rate.  The
    filter is built from the keys side driver-side (stream it if huge) and
    broadcast once via ray.put — no shuffle of the big side."""
    right_key_col = right_key_col or key_col
    keys = [
        r[right_key_col]
        for r in keys_ds.select_columns([right_key_col]).iter_rows()
    ]
    bf_ref = ray.put(BloomFilter.build(keys, fp_rate))

    def keep(batch: pa.Table) -> pd.DataFrame:
        bf = ray.get(bf_ref)
        df = batch.to_pandas()
        return df[df[key_col].map(lambda v: str(v) in bf)]

    return ds.map_batches(keep, batch_format="pyarrow")
