"""Similarity search over an embedding column (`list<float>`).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(`ray.put`), each batch does ONE numpy matmul against it, per-batch top-k
partials are merged driver-side (k × n_queries rows — tiny).  This is the
exact-search scale path: it streams the corpus once, no shuffle at all.

Scale variant: `lsh_topk` restricts each query to its sign-pattern LSH
bucket (see dedup.embedding_neardup_pairs) — approximate, one bucket scan
instead of a full pass.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


class BruteForceTopK:
    """map_batches actor: per-batch cosine top-k against broadcast queries."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        q = ray.get(queries_ref)  # dict: query_id -> vector
        self.query_ids = list(q.keys())
        qm = np.array([q[i] for i in self.query_ids], dtype=np.float64)
        qn = np.linalg.norm(qm, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        self.qm = qm / qn
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_col).to_pylist())
        m = np.array(batch.column(self.vec_col).to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ self.qm.T  # (batch, n_queries)
        out_q, out_n, out_s = [], [], []
        k = min(self.k, len(ids))
        for qi, qid in enumerate(self.query_ids):
            col = sims[:, qi]
            top = np.argpartition(-col, k - 1)[:k] if k < len(ids) else np.arange(len(ids))
            for t in top:
                out_q.append(qid)
                out_n.append(ids[t])
                out_s.append(round(float(col[t]), 6))
        return pa.table(
            {
                "query_id": pa.array(out_q),
                "neighbor_id": pa.array(out_n),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )


def brute_force_topk(
    embeddings: ray.data.Dataset,
    queries: dict,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int | tuple[int, int] = 4,
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Exact cosine top-k.  Returns (query_id, neighbor_id, score, rank)
    sorted by (query_id, -score, neighbor_id); deterministic tie-break."""
    ref = ray.put(queries)
    partials = embeddings.select_columns([id_col, vec_col]).map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={
            "queries_ref": ref, "k": k + (1 if exclude_self else 0),
            "id_col": id_col, "vec_col": vec_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=0.5,
    ).to_pandas()  # k * n_queries * n_batches rows — small by construction

    if exclude_self:
        partials = partials[partials["query_id"] != partials["neighbor_id"]]
    partials = partials.sort_values(
        ["query_id", "score", "neighbor_id"],
        ascending=[True, False, True],
        kind="stable",
    )
    out = partials.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out
