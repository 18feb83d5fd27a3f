"""Mergeable second-moment statistics (variance / covariance /
correlation) — the parallel one-pass algorithm of Chan, Golub & LeVeque
(1983): each batch contributes (n, mean_x, mean_y, M2x, M2y, Cxy) per
group; partials merge pairwise with the numerically STABLE update (no
raw sum-of-squares cancellation), so results match streaming-aggregate
engines to float precision.

Distributed plan: per-batch combiner partials (bounded by groups x
batches) -> canonical-order driver fold — the `_preagg` shape, no
shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _batch_moments(df: pd.DataFrame, keys: list[str], x: str, y: str) -> pd.DataFrame:
    out = []
    for kv, g in df.groupby(keys, sort=False, dropna=False):
        xv = g[x].to_numpy(dtype=np.float64)
        yv = g[y].to_numpy(dtype=np.float64)
        mx, my = xv.mean(), yv.mean()
        row = {
            "n": len(g), "mean_x": mx, "mean_y": my,
            "m2x": ((xv - mx) ** 2).sum(),
            "m2y": ((yv - my) ** 2).sum(),
            "cxy": ((xv - mx) * (yv - my)).sum(),
        }
        if not isinstance(kv, tuple):
            kv = (kv,)
        row.update(dict(zip(keys, kv)))
        out.append(row)
    return pd.DataFrame(out)


def _merge_two(a: dict, b: dict) -> dict:
    n = a["n"] + b["n"]
    dx = b["mean_x"] - a["mean_x"]
    dy = b["mean_y"] - a["mean_y"]
    f = a["n"] * b["n"] / n
    return {
        "n": n,
        "mean_x": a["mean_x"] + dx * b["n"] / n,
        "mean_y": a["mean_y"] + dy * b["n"] / n,
        "m2x": a["m2x"] + b["m2x"] + dx * dx * f,
        "m2y": a["m2y"] + b["m2y"] + dy * dy * f,
        "cxy": a["cxy"] + b["cxy"] + dx * dy * f,
    }


def grouped_moments(
    ds: ray.data.Dataset,
    keys: list[str],
    x: str,
    y: str,
) -> pd.DataFrame:
    """Per-group (n, stddev_samp(x), stddev_samp(y), covar_samp(x,y),
    corr(x,y)) in one streamed pass.  Driver state is groups x batches
    tiny moment rows (bounded-cardinality keys — use a Ray groupby
    variant for unbounded key spaces)."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        return _batch_moments(batch.to_pandas(), keys, x, y)

    parts = ds.select_columns(keys + [x, y]).map_batches(
        partial, batch_format="pyarrow"
    ).to_pandas()
    if "n" not in parts.columns:  # empty input -> no partial blocks
        return pd.DataFrame(columns=keys + [
            "n", "std_x", "std_y", "covar", "corr"])
    # canonical fold order: completion order varies run to run — the key
    # must cover EVERY moment field, or tied (n, x-moment) partials with
    # different y-moments still fold in run-dependent order
    parts = parts.sort_values(
        keys + ["n", "mean_x", "mean_y", "m2x", "m2y", "cxy"],
        kind="stable").reset_index(drop=True)
    rows = []
    for kv, g in parts.groupby(keys, sort=True, dropna=False):
        acc = None
        for rec in g.to_dict("records"):
            state = {f: rec[f] for f in
                     ("n", "mean_x", "mean_y", "m2x", "m2y", "cxy")}
            acc = state if acc is None else _merge_two(acc, state)
        n = acc["n"]
        var_x = acc["m2x"] / (n - 1) if n > 1 else float("nan")
        var_y = acc["m2y"] / (n - 1) if n > 1 else float("nan")
        covar = acc["cxy"] / (n - 1) if n > 1 else float("nan")
        denom = np.sqrt(var_x * var_y)
        corr = covar / denom if denom > 0 else float("nan")
        row = {"n": int(n), "std_x": np.sqrt(var_x), "std_y": np.sqrt(var_y),
               "covar": covar, "corr": corr}
        if not isinstance(kv, tuple):
            kv = (kv,)
        row.update(dict(zip(keys, kv)))
        rows.append(row)
    return pd.DataFrame(rows)[keys + ["n", "std_x", "std_y", "covar", "corr"]]
