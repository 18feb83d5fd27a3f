"""Temporal KG: timestamped fact assertions become VALIDITY INTERVALS
(SCD2-style, gaps-and-islands run collapse per key), and a point-in-time
`snapshot_at` recovers the store as of any instant — KG time travel.

Timestamps are int64 EPOCH MICROSECONDS end to end (repo discipline:
float64 mantissas are ~256 us coarse at the 2024 epoch; pandas may
deliver ns — callers convert explicitly).

Plan: one coarse bucketed exchange on the subject key
(window.hash_bucketed_map_groups), then a fully vectorized in-bucket
run collapse — sort by (key, ts, tiebreak), run id = cumsum of
key-or-value change, first row per run opens the interval, the next
run's open within the same key closes it (open intervals get
valid_to = NULL).  `snapshot_at` is a single streaming filter pass:
valid_from <= t AND (valid_to IS NULL OR t < valid_to).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

OPEN_END = np.int64(np.iinfo(np.int64).max)


def intervalize_facts(
    facts: ray.data.Dataset,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """(key..., value, valid_from, valid_to) intervals from timestamped
    assertions.  Consecutive equal values collapse into one run; equal
    timestamps order by `tiebreak_col` (REQUIRED to make the order
    total when ts can tie — later tiebreak wins the instant).
    valid_to is NULL for each key's current (open) interval."""
    from .window import hash_bucketed_map_groups

    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def collapse(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key_cols + order, kind="stable")
        # a later assertion AT THE SAME ts supersedes: keep the last
        # row per (key, ts) before run detection
        g = g.drop_duplicates(subset=key_cols + [ts_col], keep="last")
        key_change = (g[key_cols].ne(g[key_cols].shift())
                      .any(axis=1))
        val_change = g[value_col].ne(g[value_col].shift())
        run = (key_change | val_change).cumsum()
        firsts = g.groupby(run, sort=False).head(1).copy()
        firsts = firsts.rename(columns={ts_col: "valid_from"})
        nxt_from = firsts["valid_from"].shift(-1)
        same_key = (firsts[key_cols].eq(firsts[key_cols].shift(-1))
                    .all(axis=1))
        vt = nxt_from.where(same_key, other=np.nan)
        firsts["valid_to"] = vt.astype("float64")
        out = firsts[key_cols + [value_col, "valid_from", "valid_to"]]
        out = out.reset_index(drop=True)
        out["valid_from"] = out["valid_from"].astype("int64")
        # nullable int64: carry open ends as OPEN_END sentinel-free NA
        out["valid_to"] = out["valid_to"].astype("Int64")
        return out

    return hash_bucketed_map_groups(facts, key_cols[0], collapse,
                                    n_buckets=n_buckets)


def snapshot_at(
    intervals: ray.data.Dataset,
    t_us: int,
) -> ray.data.Dataset:
    """The facts valid at instant `t_us` (epoch microseconds): one
    streaming vectorized filter — valid_from <= t < valid_to (open
    intervals match any t >= valid_from)."""
    t = int(t_us)

    def pick(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        vf = df["valid_from"].to_numpy("int64")
        vt = df["valid_to"]
        vt_filled = vt.fillna(OPEN_END).to_numpy("int64")
        keep = (vf <= t) & (t < vt_filled)
        return (df[keep].drop(columns=["valid_from", "valid_to"])
                .reset_index(drop=True))

    return intervals.map_batches(pick, batch_format="pyarrow")


ALLEN_RELATIONS = (
    "before", "meets", "overlaps", "starts", "during", "finishes",
    "equals",
    "after", "met_by", "overlapped_by", "started_by", "contains",
    "finished_by",
)


def allen_interval_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str = "key",
    id_col: str = "id",
    start_col: str = "start",
    end_col: str = "end",
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Allen interval-algebra join: for every same-`key` (left, right)
    interval pair, the ONE of Allen's 13 relations that holds —
    before/meets/overlaps/starts/during/finishes/equals and the six
    inverses (the relations are exhaustive and mutually exclusive for
    proper intervals).  Intervals are CLOSED-OPEN [start, end) int64
    epoch-us with start < end ENFORCED (improper intervals raise).

    Output: (key, l_id, r_id, relation) rows.

    Plan: both sides tag onto ONE coarse key-bucket exchange (the
    range_join_count shape); within a bucket each key's pair grid is
    classified by a fully vectorized numpy broadcast — the contract is
    the per-key interval count stays bounded (an entity's timeline),
    exactly the SCD2 assumption, so the per-key quadratic grid is
    cheap while the CORPUS-level cross join never happens."""
    import zlib

    def tag(side: int):
        def f(b: pa.Table, _s=side) -> pd.DataFrame:
            df = b.to_pandas()
            s = df[start_col].to_numpy("int64")
            e = df[end_col].to_numpy("int64")
            if (s >= e).any():
                raise ValueError(
                    "improper interval: start < end required")
            out = pd.DataFrame({
                "_key": df[key].astype(str),
                "_id": df[id_col].to_numpy("int64"),
                "_s": s, "_e": e})
            out["_side"] = np.int8(_s)
            out["_bucket"] = out["_key"].map(
                lambda k: zlib.crc32(k.encode()) % n_buckets
            ).astype("int32")
            return out
        return f

    both = (left.map_batches(tag(0), batch_format="pyarrow")
            .union(right.map_batches(tag(1), batch_format="pyarrow")))

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"key": pd.Series(dtype=object),
                "l_id": pd.Series(dtype="int64"),
                "r_id": pd.Series(dtype="int64"),
                "relation": pd.Series(dtype=object)}
        if g.empty:
            return pd.DataFrame(cols)
        parts = []
        for k, sub in g.groupby("_key", sort=False):
            l = sub[sub["_side"] == 0]
            r = sub[sub["_side"] == 1]
            if l.empty or r.empty:
                continue
            s1 = l["_s"].to_numpy()[:, None]
            e1 = l["_e"].to_numpy()[:, None]
            s2 = r["_s"].to_numpy()[None, :]
            e2 = r["_e"].to_numpy()[None, :]
            rel = np.full((len(l), len(r)), "", dtype=object)
            rel[e1 < s2] = "before"
            rel[e1 == s2] = "meets"
            rel[(s1 < s2) & (s2 < e1) & (e1 < e2)] = "overlaps"
            rel[(s1 == s2) & (e1 < e2)] = "starts"
            rel[(s1 > s2) & (e1 < e2)] = "during"
            rel[(s1 > s2) & (e1 == e2)] = "finishes"
            rel[(s1 == s2) & (e1 == e2)] = "equals"
            rel[e2 < s1] = "after"
            rel[e2 == s1] = "met_by"
            rel[(s2 < s1) & (s1 < e2) & (e2 < e1)] = "overlapped_by"
            rel[(s1 == s2) & (e1 > e2)] = "started_by"
            rel[(s1 < s2) & (e1 > e2)] = "contains"
            rel[(s1 < s2) & (e1 == e2)] = "finished_by"
            li, ri = np.indices(rel.shape)
            parts.append(pd.DataFrame({
                "key": k,
                "l_id": l["_id"].to_numpy()[li.ravel()],
                "r_id": r["_id"].to_numpy()[ri.ravel()],
                "relation": rel.ravel()}))
        if not parts:
            return pd.DataFrame(cols)
        out = pd.concat(parts, ignore_index=True)
        out["key"] = out["key"].astype(object)
        out["relation"] = out["relation"].astype(object)
        return out

    return both.groupby("_bucket").map_groups(
        classify, batch_format="pandas")


def coalesce_intervals(
    ds: ray.data.Dataset,
    key: str = "key",
    start_col: str = "start",
    end_col: str = "end",
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Interval UNION / coalescing: per key, overlapping or touching
    [start, end) spans merge into maximal islands — (key, start, end,
    n_merged).  The other half of the temporal-KG pair:
    `intervalize_facts` builds validity intervals from point
    assertions; this collapses redundant spans (multi-source ingests,
    re-asserted facts).

    ONE coarse key-bucket exchange; in-bucket the classic
    gaps-and-islands kernel fully vectorized across ALL keys at once:
    sort by (key, start, end), per-key running max of end (cummax +
    shift), island breaks where start > previous running max, one
    groupby(key, island) min/max/size fold."""
    import zlib

    def tag(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        s = df[start_col].to_numpy("int64")
        e = df[end_col].to_numpy("int64")
        if (s >= e).any():
            raise ValueError("improper interval: start < end required")
        out = pd.DataFrame({"_key": df[key].astype(str),
                            "_s": s, "_e": e})
        out["_bucket"] = out["_key"].map(
            lambda k: zlib.crc32(k.encode()) % n_buckets
        ).astype("int32")
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"key": pd.Series(dtype=object),
                "start": pd.Series(dtype="int64"),
                "end": pd.Series(dtype="int64"),
                "n_merged": pd.Series(dtype="int64")}
        if g.empty:
            return pd.DataFrame(cols)
        g = g.sort_values(["_key", "_s", "_e"],
                          kind="stable").reset_index(drop=True)
        run_max = (g.groupby("_key", sort=False)["_e"].cummax()
                   .groupby(g["_key"], sort=False).shift(1))
        brk = run_max.isna() | (g["_s"] > run_max)
        island = brk.cumsum()
        out = (g.assign(_island=island)
               .groupby(["_key", "_island"], sort=False)
               .agg(start=("_s", "min"), end=("_e", "max"),
                    n_merged=("_s", "size"))
               .reset_index()
               .rename(columns={"_key": "key"})
               .drop(columns=["_island"]))
        out["key"] = out["key"].astype(object)
        for c in ("start", "end", "n_merged"):
            out[c] = out[c].astype("int64")
        return out

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_bucket").map_groups(merge, batch_format="pandas"))
