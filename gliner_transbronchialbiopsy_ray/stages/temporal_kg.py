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
