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


def _topk_batch(batch: pa.Table, queries_ref, k: int, id_col: str,
                vec_col: str) -> pa.Table:
    """Per-batch cosine top-k against the broadcast query matrix.  Stateless
    task (no actor startup); `ray.get` of the same ref inside a worker is a
    zero-copy plasma hit after the first batch."""
    query_ids, qm = ray.get(queries_ref)
    ids = np.asarray(batch.column(id_col).to_pylist())
    m = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    sims = (m / norms) @ qm.T  # (batch, n_queries) — one matmul per batch
    out_q, out_n, out_s = [], [], []
    k = min(k, len(ids))
    for qi, qid in enumerate(query_ids):
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
    query_ids = list(queries.keys())
    qm = np.array([queries[i] for i in query_ids], dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    ref = ray.put((query_ids, qm / qn))
    kk = k + (1 if exclude_self else 0)
    partials = embeddings.select_columns([id_col, vec_col]).map_batches(
        lambda b: _topk_batch(b, ref, kk, id_col, vec_col),
        batch_format="pyarrow",
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
