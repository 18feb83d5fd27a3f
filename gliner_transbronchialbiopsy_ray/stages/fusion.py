"""Multi-source triple conflict resolution (truth discovery): several
sources assert different objects for the same (subject, predicate) of a
FUNCTIONAL predicate; resolve to one winning triple per (s, p).

Strategies (both deterministic, ties broken by MIN object so the result
is engine-reproducible and SQL-oracle-able):

- "vote":     majority vote over sources — the object asserted by the
              most sources wins; ties -> min object.
- "priority": a source ranking — the object from the highest-priority
              source wins; objects from unknown sources rank last;
              ties within a rank -> min object.

Plan shape (combiner-first): per-batch partial aggregation collapses
each batch to one row per (s, p, o) carrying the vote count and best
source rank — the shuffle then moves PARTIALS, not raw assertions
(sources repeat objects; crawl-style inputs are vote-heavy).  One
coarse subject-hash bucket exchange (32 buckets, repo discipline) and a
vectorized in-bucket fold + winner pick: sum votes / min rank per
(s, p, o), sort, drop_duplicates on (s, p).
"""

from __future__ import annotations

import zlib

import pandas as pd
import pyarrow as pa
import ray.data


def resolve_conflicts(
    triples: ray.data.Dataset,
    strategy: str = "vote",
    priority: list[str] | None = None,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    source_col: str = "source",
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Resolve to one (s, p, o) per (s, p).  `priority` is required for
    strategy="priority" (earlier = stronger); `source_col` may be absent
    for strategy="vote" only when every assertion is one vote."""
    if strategy not in ("vote", "priority"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "priority" and not priority:
        raise ValueError("strategy='priority' needs a priority list")
    ranks = ({src: i for i, src in enumerate(priority)}
             if priority else {})
    unknown_rank = len(ranks)

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "s": batch.column(s_col).to_pandas(),
            "p": batch.column(p_col).to_pandas(),
            "o": batch.column(o_col).to_pandas(),
        })
        if source_col in batch.column_names:
            rk = (batch.column(source_col).to_pandas()
                  .map(ranks).fillna(unknown_rank).astype("int64"))
        else:
            rk = pd.Series(unknown_rank, index=df.index, dtype="int64")
        df["_r"] = rk
        g = (df.groupby(["s", "p", "o"], sort=False)
             .agg(_n=("_r", "size"), _r=("_r", "min")).reset_index())
        g["_bucket"] = g["s"].map(
            lambda k: zlib.crc32(str(k).encode()) % n_buckets
        ).astype("int32")
        return g

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.groupby(["s", "p", "o"], sort=False)
             .agg(_n=("_n", "sum"), _r=("_r", "min")).reset_index())
        if strategy == "vote":
            g = g.sort_values(["s", "p", "_n", "o"],
                              ascending=[True, True, False, True],
                              kind="stable")
        else:
            g = g.sort_values(["s", "p", "_r", "o"],
                              ascending=[True, True, True, True],
                              kind="stable")
        win = g.drop_duplicates(["s", "p"], keep="first")
        return win[["s", "p", "o"]].reset_index(drop=True)

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return resolve(g.drop(columns=["_bucket"]))

    return (triples.map_batches(partial, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(run, batch_format="pandas"))
