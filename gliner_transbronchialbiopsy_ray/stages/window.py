"""Window / prefix-scan operators (ordered analytics Ray Data lacks).

Two scale shapes:

1. `keyed_running_agg` — running (cumulative) aggregates PARTITIONED BY a
   key: hash-bucket the key (one all-to-all), sort within the bucket, and
   cumsum/cummax vectorized per key.  The per-key history never crosses
   buckets, so this scales with the widest single key, not the corpus.

2. `global_prefix_scan` — a running aggregate over ONE global order (no
   partition key), e.g. watermark lateness flags over an arrival sequence.
   Classic two-phase distributed scan: sort by the order key, pass 1
   collects per-block summaries (tiny: one row per block), the driver
   prefix-combines them (cheap: O(blocks)), pass 2 broadcasts the per-block
   carry-in and finishes the scan inside each block vectorized.  The only
   driver-side state is the block-summary list.

The reference computes nothing windowed (its corrections fold is
last-writer-wins, SURVEY §2 A3); these are engine additions for
training-data pipelines (arrival-order watermarking, per-user running
state).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def hash_bucketed_map_groups(
    ds: ray.data.Dataset,
    key: str,
    fn,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """The keyed-window scaffold: hash-bucket `key` (ONE all-to-all),
    then apply `fn` to each bucket's rows (every key's full history is
    inside one bucket).  `fn` receives the bucket DataFrame WITH the
    `_bucket` column dropped.  All keyed window ops (running aggregates,
    lag/shift, per-key ranks) share this shape."""

    def tag(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["_bucket"] = df[key].map(
            lambda k: zlib.crc32(str(k).encode()) % n_buckets
        ).astype("int32")
        return df

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns=["_bucket"]))

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(run, batch_format="pandas")
    )


def keyed_running_agg(
    ds: ray.data.Dataset,
    key: str,
    order_by: list[str],
    value: str,
    out_col: str = "running_total",
    agg: str = "sum",
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-key cumulative aggregate in `order_by` order (SQL:
    `agg(value) OVER (PARTITION BY key ORDER BY order_by ROWS UNBOUNDED
    PRECEDING)`).  order_by must make the order total (include a
    tie-breaker column) or float results are engine-dependent.

    agg="count_distinct" is the RUNNING DISTINCT count of `value`
    within the key (SQL has no native count(DISTINCT) OVER — the
    standard emulation marks each (key, value)'s first occurrence in
    order and running-sums the marks; this kernel does exactly that,
    so an oracle can replay it with a row_number() = 1 flag + a
    windowed SUM).  Correct because hash_bucketed_map_groups
    co-locates a key's FULL history in one bucket."""
    assert agg in ("sum", "max", "min", "count", "count_distinct")

    def scan_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_by, kind="stable")
        if agg == "count_distinct":
            first = ~g.duplicated(subset=[key, value], keep="first")
            g[out_col] = (first.astype("int64")
                          .groupby(g[key], sort=False).cumsum())
            return g
        grp = g.groupby(key, sort=False)[value]
        if agg == "sum":
            g[out_col] = grp.cumsum()
        elif agg == "max":
            g[out_col] = grp.cummax()
        elif agg == "min":
            g[out_col] = grp.cummin()
        else:
            g[out_col] = grp.cumcount() + 1
        return g

    return hash_bucketed_map_groups(ds, key, scan_bucket, n_buckets)


def _norm_key(v) -> int | float | str:
    """Hash-stable scalar for dict keying across numpy/pandas types
    (numeric, datetime, or string order keys)."""
    a = np.asarray(v)
    if np.issubdtype(a.dtype, np.datetime64):
        return int(a.astype("datetime64[us]").astype("int64"))
    if np.issubdtype(a.dtype, np.integer):
        return int(a)
    if a.dtype.kind in ("U", "S", "O"):
        return str(v)
    return float(a)


def global_prefix_sum(
    ds: ray.data.Dataset,
    order_by: str,
    value: str,
    out_col: str = "prefix_sum",
    inclusive: bool = True,
) -> ray.data.Dataset:
    """Running SUM of `value` over the global `order_by` order — the same
    two-phase distributed scan as `global_prefix_scan` (per-block totals ->
    driver prefix over O(blocks) rows -> broadcast carry-ins -> vectorized
    cumsum inside blocks).  `order_by` values must be unique (carry-ins
    are keyed by each block's first order value)."""
    s = ds.sort(order_by).materialize()  # two passes over the sorted data

    # batch_size=None = one batch per block, so pass 2 sees the SAME
    # batch boundaries as pass 1 (the carry map is keyed per block)
    def block_summary(batch: pa.Table) -> pd.DataFrame:
        order = batch.column(order_by).to_numpy(zero_copy_only=False)
        vals = batch.column(value).to_numpy(zero_copy_only=False)
        if len(order) == 0:
            return pd.DataFrame({"block_min": [], "block_sum": []})
        return pd.DataFrame(
            {"block_min": [_norm_key(order.min())], "block_sum": [vals.sum()]}
        )

    partials = s.map_batches(
        block_summary, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if "block_min" not in partials.columns:  # empty input -> no partial blocks
        partials = pd.DataFrame({"block_min": [], "block_sum": []})
    partials = partials.sort_values("block_min", kind="stable")

    carry: dict = {}
    running = 0
    for bmin, bsum in zip(partials["block_min"], partials["block_sum"]):
        carry[bmin] = running
        running = running + bsum
    carry_ref = ray.put(carry)

    def finish(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        if not len(df):
            df[out_col] = []
            return df
        cm = ray.get(carry_ref)
        vals = df[value].to_numpy()
        inc = np.cumsum(vals)
        carry_in = cm.get(_norm_key(df[order_by].to_numpy()[0]), 0)
        out = inc if inclusive else inc - vals
        df[out_col] = out + carry_in
        return df

    return s.map_batches(finish, batch_format="pyarrow", batch_size=None)


def global_prefix_scan(
    ds: ray.data.Dataset,
    order_by: str,
    value: str,
    out_col: str = "prefix_max",
    inclusive: bool = False,
) -> ray.data.Dataset:
    """Running MAX of `value` over the global `order_by` order.

    inclusive=False gives the strict prefix (max over rows BEFORE this
    one; first row gets the type's minimum) — what watermark-lateness
    checks need.

    Two-phase: sort -> per-block (min order key, max value) partials ->
    driver prefix over the partial list -> broadcast carry-ins -> finish
    within blocks.  Partitioning assumption: the number of BLOCKS (not
    rows) fits driver memory — always true (blocks are ~128 MB each).
    `order_by` values must be unique (carry-ins are keyed by each block's
    first order value)."""
    s = ds.sort(order_by).materialize()  # two passes over the sorted data

    # batch_size=None = one batch per block, so pass 2 sees the SAME
    # batch boundaries as pass 1 (the carry map is keyed per block)
    def block_summary(batch: pa.Table) -> pd.DataFrame:
        order = batch.column(order_by).to_numpy(zero_copy_only=False)
        vals = batch.column(value).to_numpy(zero_copy_only=False)
        if len(order) == 0:
            return pd.DataFrame({"block_min": [], "block_max_val": []})
        return pd.DataFrame(
            {"block_min": [_norm_key(order.min())], "block_max_val": [vals.max()]}
        )

    partials = s.map_batches(
        block_summary, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if "block_min" not in partials.columns:  # empty input -> no partial blocks
        partials = pd.DataFrame({"block_min": [], "block_max_val": []})
    partials = partials.sort_values("block_min", kind="stable")

    carry: dict = {}
    running = None
    for bmin, bmax in zip(partials["block_min"], partials["block_max_val"]):
        carry[bmin] = running
        running = bmax if running is None else max(running, bmax)
    carry_ref = ray.put(carry)

    def _dtype_min(vals: np.ndarray):
        if np.issubdtype(vals.dtype, np.datetime64):
            # ns-safe sentinel with arithmetic headroom (Timestamp.min
            # overflows as soon as downstream code subtracts from it)
            return np.datetime64("1700-01-01").astype(vals.dtype)
        if np.issubdtype(vals.dtype, np.integer):
            return np.iinfo(vals.dtype).min
        return -np.inf

    def finish(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        if not len(df):
            df[out_col] = []
            return df
        cm = ray.get(carry_ref)
        vals = df[value].to_numpy()
        order = df[order_by].to_numpy()
        inc = np.maximum.accumulate(vals)
        carry_in = cm.get(_norm_key(order[0]))
        if carry_in is not None:
            # partials travel as pandas scalars (e.g. Timestamp); pin to
            # the value dtype so np.maximum stays vectorized, not object
            carry_in = np.asarray(carry_in).astype(vals.dtype)
        if inclusive:
            out = inc if carry_in is None else np.maximum(inc, carry_in)
        else:
            # strict prefix: shift the inclusive scan right by one
            out = np.empty_like(inc)
            out[1:] = inc[:-1]
            out[0] = _dtype_min(vals)
            if carry_in is not None:
                out = np.maximum(out, carry_in)
        df[out_col] = out
        return df

    return s.map_batches(finish, batch_format="pyarrow", batch_size=None)


def grouped_ordered_concat(
    ds,
    key: str,
    order: str,
    val: str,
    sep: str = ";",
):
    """ORDER-sensitive per-group string concatenation at UNBOUNDED group
    count (the distributed form of SQL `string_agg(val, sep ORDER BY
    order)` and of the reference's per-document `';'.join(texts)` wide
    cells, entity_processor.py:74-77 — those were bounded per doc; this
    scales to any number of groups).

    Scale shape: one global sort by (key, order) range-partitions every
    group into ADJACENT blocks.  Each block assembles its groups
    vectorized; only its FIRST and LAST group can straddle a block
    boundary, so those are emitted as fragments and stitched driver-side
    ordered by each fragment's minimum order value.  Driver state is
    O(2 x blocks), never O(groups).

    `order` must be unique within a group (SQL's requirement for a
    deterministic string_agg order); `val` must be a string column.

    Returns a DATASET (key, concat, n): interior groups never leave the
    cluster; only the stitched fragment rows (O(blocks)) round-trip the
    driver and re-enter as one small block union'd onto the stream.
    """
    import ray.data as rd

    s = ds.sort([key, order])

    def assemble(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        if not len(df):
            return pd.DataFrame({key: pd.Series(dtype=object),
                                 "concat": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64"),
                                 "mn": pd.Series(dtype=object),
                                 "frag": pd.Series(dtype=bool)})
        agg = (
            df.groupby(key, sort=False)
            .agg(concat=(val, sep.join), n=(val, "size"), mn=(order, "min"))
            .reset_index()
        )
        agg["n"] = agg["n"].astype("int64")
        # in a sorted block only the edge groups can be split across
        # blocks; everything interior is complete by construction
        frag = np.zeros(len(agg), dtype=bool)
        frag[0] = frag[-1] = True
        agg["frag"] = frag
        return agg

    parts = s.map_batches(
        assemble, batch_format="pyarrow", batch_size=None).materialize()
    interior = (
        parts.filter(expr="frag == False")
        .drop_columns(["mn", "frag"])
    )
    frags = parts.filter(expr="frag == True").to_pandas()  # 2 per block
    if not len(frags):
        return interior
    stitched = (
        frags.sort_values([key, "mn"], kind="stable")
        .groupby(key, sort=False)
        .agg(concat=("concat", sep.join), n=("n", "sum"))
        .reset_index()
    )
    stitched["n"] = stitched["n"].astype("int64")
    # arrow block (not from_pandas) so the union'd stream has ONE block
    # format — downstream ops like rename_columns assume homogeneity
    return interior.union(rd.from_arrow(
        pa.Table.from_pandas(stitched[[key, "concat", "n"]],
                             preserve_index=False)))


def keyed_topk(
    ds: ray.data.Dataset,
    key: str,
    order_by: list[tuple],
    k: int,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-key top-k: for every `key` value the first `k` rows under
    `order_by` ([(col, 'asc'|'desc'), ...]) — SQL's
    row_number() OVER (PARTITION BY key ORDER BY ...) <= k, and (with
    a hash column as the order) the deterministic stratified-sampling
    primitive for training-data pipelines.

    COMBINER-FIRST: every batch folds to its own per-key top-k before
    the single coarse key-bucket exchange (a batch can contribute at
    most k rows per key), so shuffle volume is bounded by
    k * keys-per-batch, not rows; the in-bucket kernel re-sorts and
    takes the final head(k) vectorized.  Make the order TOTAL (include
    a unique tiebreaker) or page membership at the k boundary is
    arbitrary."""
    if k <= 0:
        raise ValueError("k must be >= 1")
    cols = [c for c, _ in order_by]
    asc = []
    for c, d in order_by:
        if d not in ("asc", "desc"):
            raise ValueError(f"direction for {c!r} must be asc|desc")
        asc.append(d == "asc")

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(cols, ascending=asc, kind="stable")
                .groupby(key, sort=False).head(k))

    def tag(batch: pa.Table) -> pd.DataFrame:
        df = local_topk(batch.to_pandas())
        df["_bucket"] = df[key].map(
            lambda v: zlib.crc32(str(v).encode()) % n_buckets
        ).astype("int32")
        return df

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return local_topk(g.drop(columns=["_bucket"]))

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_bucket").map_groups(fold, batch_format="pandas"))


def keyed_ranks(
    ds: ray.data.Dataset,
    key: str,
    order_col: str,
    id_cols: list[str],
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """SQL ranking window functions per partition key — RANK(),
    DENSE_RANK() and PERCENT_RANK() OVER (PARTITION BY key ORDER BY
    order_col), the gap-aware trio keyed_topk / keyed_running_agg
    don't cover.  PERCENT_RANK is emitted in exact integer ppm
    (1e6 * (rank-1) // (n-1), 0 for single-row partitions) so the
    float-free oracle replays it bit for bit.

    Holistic per partition ⇒ ONE crc(key) coarse-bucket exchange,
    then ranks for ALL partitions in a bucket come from one vectorized
    lexsort: rank = first-position-of-equal-run (ties share), dense
    rank = cumulative distinct-value count — no per-partition Python
    loop.  Output: id_cols + (key, order value, rank, dense_rank,
    percent_rank_ppm), one row per input row."""
    import zlib

    cols = list(dict.fromkeys(id_cols + [key, order_col]))

    def tag(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(cols).to_pandas()
        df["_bucket"] = df[key].astype(str).map(
            lambda s: zlib.crc32(s.encode()) % n_buckets).astype("int32")
        return df

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values([key, order_col] + id_cols,
                          kind="stable").reset_index(drop=True)
        k = d[key].astype(str).to_numpy()
        v = d[order_col].to_numpy()
        n = len(d)
        new_key = np.concatenate(([True], k[1:] != k[:-1]))
        new_val = np.concatenate(([True], (v[1:] != v[:-1])
                                  | new_key[1:]))
        idx = np.arange(n, dtype="int64")
        key_start = np.maximum.accumulate(np.where(new_key, idx, 0))
        run_start = np.maximum.accumulate(np.where(new_val, idx, 0))
        rank = run_start - key_start + 1
        # dense rank: distinct-run counter reset per key
        runs = np.cumsum(new_val)
        dense = runs - np.maximum.accumulate(
            np.where(new_key, runs - 1, 0))
        # partition sizes for percent_rank
        sizes = np.diff(np.append(np.flatnonzero(new_key), n))
        size_per_row = np.repeat(sizes, sizes)
        denom = np.maximum(size_per_row - 1, 1)
        pr = np.where(size_per_row > 1,
                      (1_000_000 * (rank - 1)) // denom,
                      np.int64(0))
        out = d[cols].copy()
        out["rank"] = rank.astype("int64")
        out["dense_rank"] = dense.astype("int64")
        out["percent_rank_ppm"] = pr.astype("int64")
        return out

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(rank_bucket, batch_format="pandas"))


def keyed_lag(
    ds: ray.data.Dataset,
    key: str,
    order_col: str,
    value_col: str,
    id_cols: list[str],
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """LAG / LEAD window functions per partition key: previous and next
    `value_col` in `order_col` order (ties broken by id_cols — the
    deterministic ORDER BY the oracle mirrors), plus the lag delta
    (value - prev, null-safe).  The q10 sessionizer hard-codes this
    shape for timestamps; this is the generic operator.  One crc(key)
    coarse-bucket exchange, one vectorized shift per bucket — nulls at
    partition edges, like SQL.  Output: id_cols + (key, order value,
    value, prev_value, next_value, delta), one row per input row;
    prev/next/delta are float64 (NaN at edges) to keep the Arrow
    schema nullable-stable."""
    import zlib

    cols = list(dict.fromkeys(id_cols + [key, order_col, value_col]))

    def tag(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(cols).to_pandas()
        df["_bucket"] = df[key].astype(str).map(
            lambda s: zlib.crc32(s.encode()) % n_buckets).astype("int32")
        return df

    def lag_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values([key, order_col] + id_cols,
                          kind="stable").reset_index(drop=True)
        k = d[key].astype(str).to_numpy()
        v = d[value_col].to_numpy("float64")
        n = len(d)
        same_prev = np.concatenate(([False], k[1:] == k[:-1]))
        same_next = np.concatenate((k[:-1] == k[1:], [False]))
        prev = np.full(n, np.nan)
        nxt = np.full(n, np.nan)
        if n > 1:
            prev[1:] = v[:-1]
            nxt[:-1] = v[1:]
        prev[~same_prev] = np.nan
        nxt[~same_next] = np.nan
        out = d[cols].copy()
        out["prev_value"] = prev
        out["next_value"] = nxt
        out["delta"] = v - prev
        return out

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(lag_bucket, batch_format="pandas"))


def keyed_range_frame_sum(
    ds: ray.data.Dataset,
    key: str,
    order: str,
    value: str,
    range_width: int,
    out: str = "w_sum",
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Time-RANGE windowed aggregate Ray Data lacks natively: for every
    row, the sum of `value` over rows of the SAME key whose `order`
    lies in [row.order - range_width, row.order] — SQL's
    SUM(v) OVER (PARTITION BY key ORDER BY o
                 RANGE BETWEEN w PRECEDING AND CURRENT ROW),
    INCLUDING the current row's order-value peers (RANGE frames are
    peer-inclusive; a searchsorted right bound reproduces that
    exactly).

    `order`/`value` must be integer-like (cast timestamps to epoch
    ns); the window math is prefix-sum + two binary searches per row
    — vectorized per bucket, no per-row Python.  ONE crc(key)
    exchange; scales with the widest single key, not the corpus."""

    def win(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values([key, order], kind="stable")
        o = d[order].to_numpy(np.int64)
        v = d[value].to_numpy(np.int64)
        ks = d[key].astype(str).to_numpy()
        starts = np.concatenate(
            ([0], np.flatnonzero(ks[1:] != ks[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(ks)]))
        res = np.empty(len(d), dtype=np.int64)
        for s, e in zip(starts, ends):
            seg_o = o[s:e]
            pref = np.concatenate(([0], np.cumsum(v[s:e])))
            lo = np.searchsorted(seg_o, seg_o - range_width, "left")
            hi = np.searchsorted(seg_o, seg_o, "right")
            res[s:e] = pref[hi] - pref[lo]
        d[out] = res
        return d

    return hash_bucketed_map_groups(ds, key, win, n_buckets=n_buckets)
