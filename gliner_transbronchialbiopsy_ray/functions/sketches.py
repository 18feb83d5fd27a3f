"""Mergeable sketches for 100 TB aggregates (guide: "emit one serialized
sketch per batch and merge them — sketches are designed to be mergeable").

- HyperLogLog (p-bit register array; merge = elementwise max): approximate
  distinct counts without a `unique` shuffle.
- (The fixed-bin score histogram lives in stages/stats.py:score_histogram.)
"""

from __future__ import annotations

import hashlib
import json

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
    if "registers" not in partials.columns:  # empty input -> no partial blocks
        return 0.0
    acc = HyperLogLog(p)
    for blob in partials["registers"]:
        other = HyperLogLog(p)
        other.registers = np.frombuffer(blob, dtype=np.uint8).copy()
        acc.merge(other)
    return acc.estimate()


class QuantileSketch:
    """Mergeable weighted-sample quantile sketch (bounded size, any value
    domain — the complement to the exact-histogram quantiles of
    q46/q53, which need bounded value cardinality).

    Compression keeps K evenly-spaced order statistics of the sorted
    (value, weight) stream — a deterministic GK-style epsilon-approximate
    summary: rank error is bounded by total_weight / K.  Per-batch
    sketches are a few KB and merge by weighted-union + re-compress, so
    the distributed plan is the HLL shape: map_batches partials -> tiny
    driver fold, no shuffle."""

    def __init__(self, k: int = 512):
        self.k = k
        self.values = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)

    def add_many(self, values) -> "QuantileSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        self.values = np.concatenate([self.values, v])
        self.weights = np.concatenate([self.weights, np.ones(len(v))])
        self._compress()
        return self

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        self.values = np.concatenate([self.values, other.values])
        self.weights = np.concatenate([self.weights, other.weights])
        self._compress()
        return self

    def _compress(self) -> None:
        if len(self.values) <= self.k:
            order = np.argsort(self.values, kind="stable")
            self.values, self.weights = self.values[order], self.weights[order]
            return
        order = np.argsort(self.values, kind="stable")
        v, w = self.values[order], self.weights[order]
        cum = np.cumsum(w)
        total = cum[-1]
        # K evenly spaced target ranks; each keeps the first value whose
        # cumulative weight reaches the target (deterministic)
        targets = (np.arange(1, self.k + 1) / self.k) * total
        idx = np.searchsorted(cum, targets, side="left")
        idx = np.clip(idx, 0, len(v) - 1)
        keep, first = np.unique(idx, return_index=True)
        new_v = v[keep]
        # weight of each kept value = weight mass since the previous kept
        prev = np.concatenate([[0.0], cum[keep][:-1]])
        new_w = cum[keep] - prev
        self.values, self.weights = new_v, new_w

    def quantile(self, q: float) -> float:
        if not len(self.values):
            return float("nan")
        cum = np.cumsum(self.weights)
        target = q * cum[-1]
        i = int(np.searchsorted(cum, target, side="left"))
        return float(self.values[min(i, len(self.values) - 1)])

    def to_bytes(self) -> bytes:
        return np.concatenate([self.values, self.weights]).tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, k: int = 512) -> "QuantileSketch":
        arr = np.frombuffer(blob, dtype=np.float64)
        s = cls(k)
        half = len(arr) // 2
        s.values = arr[:half].copy()
        s.weights = arr[half:].copy()
        return s


def approx_quantiles(
    ds: ray.data.Dataset, col: str, qs: list[float], k: int = 512
) -> list[float]:
    """Approximate quantiles of `col` via per-batch QuantileSketch
    partials merged driver-side — one streamed pass, no shuffle, bounded
    memory regardless of value cardinality (rank error <= n/k)."""

    def sketch(batch: pa.Table) -> pd.DataFrame:
        s = QuantileSketch(k).add_many(
            batch.column(col).to_numpy(zero_copy_only=False)
        )
        return pd.DataFrame({"sketch": [s.to_bytes()]})

    partials = ds.select_columns([col]).map_batches(
        sketch, batch_format="pyarrow", batch_size=None  # one sketch/block
    ).to_pandas()
    # Ray can deliver blocks in completion order, which varies run to run;
    # an iterative merge (compress after each) would make the answer
    # depend on that order.  Fold order-invariantly instead: concatenate
    # every partial, sort by (value, weight) with a deterministic
    # tie-break, compress ONCE.
    acc = QuantileSketch(k)
    if "sketch" not in partials.columns:  # fully-empty input dataset
        return [acc.quantile(q) for q in qs]
    vs, ws = [], []
    for blob in partials["sketch"]:
        part = QuantileSketch.from_bytes(blob, k)
        vs.append(part.values)
        ws.append(part.weights)
    if vs:
        v = np.concatenate(vs)
        w = np.concatenate(ws)
        order = np.lexsort((w, v))
        acc.values, acc.weights = v[order], w[order]
        acc._compress()
    return [acc.quantile(q) for q in qs]


class CountMinSketch:
    """Count-Min frequency sketch (Cormode & Muthukrishnan 2005): a
    (depth x width) counter table; each key increments one counter per
    row (chosen by per-row hashes), estimate = min over rows — always an
    OVERestimate, error <= total_count * e/width with prob 1-e^-depth.

    Mergeable by elementwise ADD (order-invariant, so the distributed
    fold needs no canonical ordering), a few KB per sketch: the HLL
    plan shape — map_batches partials -> tiny driver fold, no shuffle."""

    def __init__(self, width: int = 2048, depth: int = 4):
        self.width = width
        self.depth = depth
        self.table = np.zeros((depth, width), dtype=np.int64)

    def _indices(self, keys) -> np.ndarray:
        """(depth, n) counter indices, fully vectorized: one deterministic
        64-bit base hash per key (pandas hash_array, fixed internal key),
        then a splitmix64 finalizer per row.  The full avalanche matters:
        a LINEAR per-row mix (base*odd + c) modulo a power-of-two width
        makes every row a function of the same low bits — keys colliding
        in one row collide in ALL rows and the min-over-rows bound
        collapses.  No per-key Python loop: O(distinct keys) numpy work."""
        base = pd.util.hash_array(
            np.asarray([str(k) for k in keys], dtype=object))
        rows = np.arange(1, self.depth + 1, dtype=np.uint64)[:, None]
        z = base[None, :] + rows * np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
        return (z % np.uint64(self.width)).astype(np.int64)

    def add_counts(self, keys, counts) -> "CountMinSketch":
        keys = list(keys)
        if not keys:
            return self
        idx = self._indices(keys)
        c = np.asarray(counts, dtype=np.int64)
        for r in range(self.depth):
            np.add.at(self.table[r], idx[r], c)
        return self

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        self.table += other.table
        return self

    def inner_product(self, other: "CountMinSketch") -> int:
        """Join-size estimate (AMS/CM inner product, Cormode &
        Muthukrishnan §4.2): min over rows of the rowwise counter dot
        product estimates sum_k fA(k) * fB(k) = |A JOIN B| on the
        sketched key.  Always an OVERestimate (collision mass only
        adds); error <= (e/width) * |A| * |B| per row with probability
        1 - e^-depth.  Requires identical (width, depth)."""
        if (self.width, self.depth) != (other.width, other.depth):
            raise ValueError("inner_product requires identical sketch "
                             "dimensions")
        # Python-int accumulation (ADVICE r3): under extreme single-key
        # skew a per-cell product of two ~3e9 counters exceeds int64
        # and would overflow silently to a wrong/negative estimate.
        dots = (self.table.astype(object)
                * other.table.astype(object)).sum(axis=1)
        return int(min(dots))

    def estimate(self, key) -> int:
        idx = self._indices([key])
        return int(min(self.table[r, idx[r, 0]] for r in range(self.depth)))

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, width: int = 2048,
                   depth: int = 4) -> "CountMinSketch":
        s = cls(width, depth)
        s.table = np.frombuffer(blob, dtype=np.int64).reshape(
            depth, width).copy()
        return s


def approx_heavy_hitters(
    ds: ray.data.Dataset,
    col: str,
    k: int = 10,
    candidates_per_batch: int = 32,
    width: int = 2048,
    depth: int = 4,
) -> pd.DataFrame:
    """Approximate top-k most frequent values of `col`: per-batch
    (CMS partial + local top-m candidate list) -> driver fold (CMS adds
    are order-invariant; candidates union) -> global top-k by estimated
    count with a lexical tie-break.  One streamed pass, no shuffle,
    memory bounded by depth*width + candidate count regardless of key
    cardinality.  A true heavy hitter is always among the candidates as
    long as it is a local top-m in at least one batch (guaranteed for
    skewed distributions; widen candidates_per_batch for flat ones)."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        vc = (
            pd.Series(batch.column(col).to_pylist())
            .value_counts()
        )
        cms = CountMinSketch(width, depth).add_counts(
            vc.index.astype(str), vc.to_numpy())
        cand = vc.head(candidates_per_batch).index.astype(str).tolist()
        return pd.DataFrame({"cms": [cms.to_bytes()],
                             "cands": [json.dumps(sorted(cand))]})

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    acc = CountMinSketch(width, depth)
    cands: set = set()
    if "cms" not in parts.columns:  # empty input -> no partial blocks
        return pd.DataFrame({"value": pd.Series(dtype=object),
                             "est_count": pd.Series(dtype="int64")})
    for blob, cl in zip(parts["cms"], parts["cands"]):
        acc.merge(CountMinSketch.from_bytes(blob, width, depth))
        cands.update(json.loads(cl))
    out = pd.DataFrame({
        "value": sorted(cands),
    })
    out["est_count"] = out["value"].map(acc.estimate).astype("int64")
    out = out.sort_values(["est_count", "value"],
                          ascending=[False, True], kind="stable")
    return out.head(k).reset_index(drop=True)


def grouped_approx_distinct(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    p: int = 12,
) -> pd.DataFrame:
    """Per-group approximate COUNT(DISTINCT col): one HLL per (batch,
    group) partial -> per-group register-max driver fold (order-invariant,
    like all HLL merges).  Keys must be bounded-cardinality (driver holds
    groups x batches sketches of 2^p bytes); for unbounded keys route the
    partials through a Ray groupby instead."""

    def sketch(batch: pa.Table) -> pd.DataFrame:
        df = batch.select([key, col]).to_pandas()
        rows = []
        for kv, g in df.groupby(key, sort=False, dropna=False):
            h = HyperLogLog(p)
            h.add_many(g[col].tolist())
            rows.append({key: kv, "registers": h.registers.tobytes()})
        return pd.DataFrame(rows)

    parts = ds.map_batches(sketch, batch_format="pyarrow").to_pandas()
    if "registers" not in parts.columns:  # empty input
        return pd.DataFrame({key: pd.Series(dtype=object),
                             "approx_distinct": pd.Series(dtype="float64")})
    out = []
    for kv, g in parts.groupby(key, sort=True, dropna=False):
        acc = HyperLogLog(p)
        for blob in g["registers"]:
            other = HyperLogLog(p)
            other.registers = np.frombuffer(blob, dtype=np.uint8).copy()
            acc.merge(other)
        out.append({key: kv, "approx_distinct": acc.estimate()})
    return pd.DataFrame(out)


def grouped_kmv_distinct(
    ds: ray.data.Dataset,
    key: str,
    value: str,
    k: int = 64,
    keep_hashes: bool = False,
) -> pd.DataFrame:
    """KMV (k-minimum-values / bottom-k) distinct-count sketch per key —
    the order-statistics dual of HyperLogLog, with the property HLL
    lacks: the retained hashes support set INTERSECTION estimates, and
    the estimator is SQL-replayable EXACTLY (no float registers).

    Hash = first 48 bits of md5 of the DECIMAL value string, so DuckDB
    re-derives it: CAST('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 12)
    AS BIGINT).  Estimate = (k-1) * 2^48 // h_k (h_k = k-th smallest
    hash of the distinct values); a key with fewer than k distinct
    values holds ALL its hashes and the estimate is exact.

    Scale shape: each batch ships at most k (hash, value) pairs per key
    (per-batch distinct + bottom-k combiner); the per-key fold merges
    partials, deduplicates by VALUE (cross-batch repeats of one value
    collapse; hash collisions between different values are kept, the
    same multiset SQL's DISTINCT-then-hash sees) and re-takes the k
    smallest.  No raw-row shuffle — the exchange carries only sketch
    partials.  Returns a small driver frame (key, n_sketch, h_k,
    kmv_estimate[, hashes when keep_hashes — the retained bottom-k
    sample, the input to theta-sketch set operations]); keys are
    bounded by contract (group cardinality)."""
    m48 = 1 << 48

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.select([key, value]).to_pandas().drop_duplicates()
        hv = np.array([int(hashlib.md5(str(v).encode()).hexdigest()[:12],
                           16) for v in df[value]], dtype="int64")
        df = pd.DataFrame({key: df[key].to_numpy(),
                           "_hv": hv, "_val": df[value].to_numpy()})
        return (df.sort_values("_hv", kind="stable")
                .groupby(key, sort=False).head(k))

    grouped = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(key))

    def fold_named(g: pd.DataFrame) -> pd.DataFrame:
        kv = g[key].iloc[0]
        g = (g.drop_duplicates(subset=["_val"])
             .sort_values("_hv", kind="stable").head(k))
        n = len(g)
        h_k = int(g["_hv"].iloc[-1]) if n else 0
        est = (k - 1) * m48 // h_k if (n >= k and h_k > 0) else n
        out = {key: [kv], "n_sketch": [np.int64(n)],
               "h_k": [np.int64(h_k)], "kmv_estimate": [np.int64(est)]}
        if keep_hashes:  # the retained bottom-k sample (theta-sketch ops)
            out["hashes"] = [g["_hv"].astype("int64").tolist()]
        return pd.DataFrame(out)

    return (grouped.map_groups(fold_named, batch_format="pandas")
            .to_pandas())
