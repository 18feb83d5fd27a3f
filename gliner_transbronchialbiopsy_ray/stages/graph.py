"""Graph analytics over edge tables (KG-construction companions to the
dedup connected-components fixpoint): bipartite PageRank via iterative
join + grouped-sum rounds.

Scale shape: ranks live in DATASETS co-partitioned with the edges by
native hash joins — no rank vector is ever broadcast or collected, so
node count is unbounded (the same pattern as
`stages/dedup.py:_cc_distributed`).  Per iteration: one join to attach
the source rank to each edge, one grouped sum to fold contributions into
the destination — both all-to-all on the edge set, which is the
irreducible cost of power iteration.  Degree normalization is
precomputed ONCE and carried on the edge rows (inv_deg), so iterations
ship only (edge, rank) pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum


def _distinct_edges(edges: ray.data.Dataset, left: str, right: str):
    """Distinct (left, right) pairs: per-batch dedupe combiner, then one
    grouped pass (count column dropped)."""

    def local(batch: pa.Table) -> pd.DataFrame:
        return (
            batch.select([left, right]).to_pandas().drop_duplicates()
        )

    return (
        edges.map_batches(local, batch_format="pyarrow")
        .groupby([left, right]).count()
        .drop_columns(["count()"])
    )


def bipartite_pagerank(
    edges: ray.data.Dataset,
    left: str = "user_id",
    right: str = "event_type",
    iters: int = 3,
    damping: float = 0.85,
    num_partitions: int = 8,
    update_left_last: bool = True,
) -> tuple[pd.DataFrame, ray.data.Dataset]:
    """PageRank on the bipartite graph defined by distinct (left, right)
    edge pairs, alternating left->right and right->left updates:

        rank_r = (1-d)/N_r + d * sum_{l->r} rank_l / deg(l)
        rank_l = (1-d)/N_l + d * sum_{l->r} rank_r / deg(r)

    Returns (right-side ranks as a small DataFrame, left-side ranks as a
    Dataset — left nodes are unbounded, so they stay distributed).

    All graph state flows through joins/groupbys over the edge set; the
    only driver-side values are the two node counts."""
    e = _distinct_edges(edges, left, right).materialize()

    deg_l = e.groupby(left).count()
    deg_r = e.groupby(right).count()
    n_l = deg_l.count()
    n_r = deg_r.count()

    def inv(col_out):
        def f(batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()
            df[col_out] = 1.0 / df["count()"]
            return df.drop(columns=["count()"])
        return f

    # edges annotated once with the source-side inverse degree
    e_l = e.join(deg_l.map_batches(inv("inv_deg_l"), batch_format="pyarrow"),
                 join_type="inner", num_partitions=num_partitions,
                 on=(left,), right_on=(left,)).materialize()
    e_r = e.join(deg_r.map_batches(inv("inv_deg_r"), batch_format="pyarrow"),
                 join_type="inner", num_partitions=num_partitions,
                 on=(right,), right_on=(right,)).materialize()

    ranks_l = deg_l.map_batches(
        lambda b: pd.DataFrame({left: b.column(left).to_pandas(),
                                "rank": np.full(b.num_rows, 1.0 / n_l)}),
        batch_format="pyarrow",
    ).materialize()

    base_r = (1.0 - damping) / n_r
    base_l = (1.0 - damping) / n_l
    ranks_r = None
    for it in range(iters):
        # left -> right
        contrib = e_l.join(ranks_l, join_type="inner",
                           num_partitions=num_partitions,
                           on=(left,), right_on=(left,))

        def crow(batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()
            df["c"] = df["rank"] * df["inv_deg_l"]
            return df[[right, "c"]]

        ranks_r = (
            contrib.map_batches(crow, batch_format="pyarrow")
            .groupby(right).aggregate(Sum("c", alias_name="c"))
            .map_batches(
                lambda b: pd.DataFrame({
                    right: b.column(right).to_pandas(),
                    "rank": base_r + damping
                            * b.column("c").to_numpy(zero_copy_only=False)}),
                batch_format="pyarrow",
            ).materialize()
        )

        # right -> left.  The LAST left update feeds nothing unless the
        # caller wants final left ranks (it is not an input to any
        # returned right rank) — skip the full join+shuffle round then.
        if it == iters - 1 and not update_left_last:
            break
        contrib2 = e_r.join(ranks_r, join_type="inner",
                            num_partitions=num_partitions,
                            on=(right,), right_on=(right,))

        def crow2(batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()
            df["c"] = df["rank"] * df["inv_deg_r"]
            return df[[left, "c"]]

        ranks_l = (
            contrib2.map_batches(crow2, batch_format="pyarrow")
            .groupby(left).aggregate(Sum("c", alias_name="c"))
            .map_batches(
                lambda b: pd.DataFrame({
                    left: b.column(left).to_pandas(),
                    "rank": base_l + damping
                            * b.column("c").to_numpy(zero_copy_only=False)}),
                batch_format="pyarrow",
            ).materialize()
        )

    out_r = ranks_r.to_pandas()  # right side is the bounded enum — tiny
    out_r["rank"] = out_r["rank"].round(6)
    out_r = out_r.sort_values(right).reset_index(drop=True)
    return out_r, ranks_l
