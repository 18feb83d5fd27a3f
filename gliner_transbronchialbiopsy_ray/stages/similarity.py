"""Similarity search over an embedding column (`list<float>`).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(`ray.put`), each batch does ONE numpy matmul against it, per-batch top-k
partials are merged driver-side (k × n_queries rows — tiny).  This is the
exact-search scale path: it streams the corpus once, no shuffle at all.

Scale variants: `ivf_topk` (coarse-quantizer probing — cost divided by
n_clusters/n_probe) here, and sign-pattern LSH bucketing in
`dedup.embedding_neardup_pairs` for the pairwise near-dup case.
`kmeans_dataset` is the iterative-algorithm pattern (broadcast state +
per-batch partials per round).
"""

from __future__ import annotations

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
        # select on the ROUNDED score with a neighbor-id tie-break so the
        # k-th boundary is identical to SQL's ORDER BY round(score) DESC, id
        col = np.round(sims[:, qi], 6)
        order = np.lexsort((ids, -col))[:k]
        for t in order:
            out_q.append(qid)
            out_n.append(ids[t])
            out_s.append(float(col[t]))
    return pa.table(
        {
            "query_id": pa.array(out_q),
            "neighbor_id": pa.array(out_n),
            "score": pa.array(out_s, type=pa.float64()),
        }
    )


def _kmeans_lite(sample: np.ndarray, n_clusters: int, iters: int = 8) -> np.ndarray:
    """Deterministic k-means on a driver-side sample (seeded farthest-point
    init, few Lloyd iterations) — the coarse quantizer for IVF."""
    rng = np.random.RandomState(4242)
    centers = sample[rng.choice(len(sample), 1)]
    for _ in range(n_clusters - 1):  # farthest-point init
        d = ((sample[:, None, :] - centers[None, :, :]) ** 2).sum(-1).min(1)
        centers = np.vstack([centers, sample[np.argmax(d)]])
    for _ in range(iters):
        d = ((sample[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(n_clusters):
            pts = sample[assign == c]
            if len(pts):
                centers[c] = pts.mean(0)
    return centers


def ivf_topk(
    embeddings: ray.data.Dataset,
    queries: dict,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    sample_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 4242,
    exclude_self: bool = True,
) -> pd.DataFrame:
    """IVF approximate top-k — the 100 TB scale path for similarity search.

    Train a coarse quantizer on a driver-side SAMPLE (bounded), broadcast the
    centroids, then one streamed pass: each batch computes, for every query,
    similarities only for vectors whose nearest centroid is among the
    query's `n_probe` closest centroids.  Cost per batch ≈ brute-force /
    (n_clusters / n_probe); recall grows with n_probe (n_probe == n_clusters
    degenerates to exact search)."""
    sample_rows = embeddings.select_columns([vec_col]).limit(sample_size).take_all()
    sample = np.array([r[vec_col] for r in sample_rows], dtype=np.float64)
    if sample.size:
        # canonical row order: take_all() returns blocks in an order that
        # can vary run to run, and the farthest-point init is order-
        # sensitive — sort rows lexicographically so the fitted quantizer
        # is a pure function of the sample SET
        sample = sample[np.lexsort(sample.T[::-1])]
    if sample.size == 0:  # empty input: nothing to quantize or probe
        return pd.DataFrame(columns=["query_id", "neighbor_id", "score", "rank"])
    sn = np.linalg.norm(sample, axis=1, keepdims=True)
    sn[sn == 0] = 1.0
    centers = _kmeans_lite(sample / sn, n_clusters)
    cn = np.linalg.norm(centers, axis=1, keepdims=True)
    cn[cn == 0] = 1.0
    centers = centers / cn

    query_ids = list(queries.keys())
    qm = np.array([queries[i] for i in query_ids], dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    qm = qm / qn
    # per-query probe set: n_probe nearest centroids
    q_probes = np.argsort(-(qm @ centers.T), axis=1)[:, :n_probe]
    ref = ray.put((query_ids, qm, centers, q_probes))
    kk = k + (1 if exclude_self else 0)

    def probe_batch(batch: pa.Table) -> pa.Table:
        qids, qmat, cents, probes = ray.get(ref)
        ids = np.asarray(batch.column(id_col).to_pylist())
        m = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mn = m / norms
        assign = (mn @ cents.T).argmax(1)  # nearest centroid per vector
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qids):
            mask = np.isin(assign, probes[qi])
            if not mask.any():
                continue
            sub = mn[mask] @ qmat[qi]
            sub_ids = ids[mask]
            kq = min(kk, len(sub_ids))
            top = np.argpartition(-sub, kq - 1)[:kq] if kq < len(sub_ids) else np.arange(len(sub_ids))
            for t in top:
                out_q.append(qid)
                out_n.append(sub_ids[t])
                out_s.append(round(float(sub[t]), 6))
        return pa.table(
            {
                "query_id": pa.array(out_q),
                "neighbor_id": pa.array(out_n),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    partials = embeddings.select_columns([id_col, vec_col]).map_batches(
        probe_batch, batch_format="pyarrow"
    ).to_pandas()
    if exclude_self:
        partials = partials[partials["query_id"] != partials["neighbor_id"]]
    partials = partials.sort_values(
        ["query_id", "score", "neighbor_id"],
        ascending=[True, False, True], kind="stable",
    )
    out = partials.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out


def kmeans_dataset(
    embeddings: ray.data.Dataset,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 2048,
    keep_vec: bool = False,
):
    """Distributed Lloyd's k-means (iterative algorithm on Ray Data).

    Each iteration: broadcast centroids (`ray.put`) -> one streamed pass
    computing per-batch partial (sum, count) per cluster -> driver merges
    the k×dim partials and updates centroids.  The dataset is never
    materialized; per-iteration driver state is k vectors.

    Returns (assignment Dataset (id, cluster), stats DataFrame
    (cluster, n, inertia rounded)).  Seeded deterministic."""
    sample_rows = embeddings.select_columns([vec_col]).limit(sample_size).take_all()
    sample = np.array([r[vec_col] for r in sample_rows], dtype=np.float64)
    if sample.size:
        # canonical row order: take_all() returns blocks in an order that
        # can vary run to run, and the farthest-point init is order-
        # sensitive — sort rows lexicographically so the fitted quantizer
        # is a pure function of the sample SET
        sample = sample[np.lexsort(sample.T[::-1])]
    if sample.size == 0:  # empty input: no centroids to fit, no rows to assign
        stats = pd.DataFrame({"cluster": pd.Series(dtype="int32"),
                              "n": pd.Series(dtype="int64"),
                              "inertia": pd.Series(dtype="float64")})
        # empty assignment with the NORMAL output schema (id, cluster,
        # sq_dist) so callers selecting those columns don't crash on the
        # empty-shard case; id dtype taken from the input schema
        sch = embeddings.schema()
        types = dict(zip(sch.names, sch.types))
        cols = {
            id_col: pa.array([], type=types[id_col]),
            "cluster": pa.array([], type=pa.int32()),
            "sq_dist": pa.array([], type=pa.float64()),
        }
        if keep_vec:
            cols[vec_col] = pa.array([], type=types[vec_col])
        assigned = ray.data.from_arrow(pa.table(cols))
        return assigned, stats
    centers = _kmeans_lite(sample, k, iters=0)  # farthest-point init only

    for _ in range(iters):
        ref = ray.put(centers)

        def partials(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
            d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            assign = d.argmin(1)
            sums = np.zeros_like(c)
            counts = np.zeros(len(c), dtype=np.int64)
            np.add.at(sums, assign, m)
            np.add.at(counts, assign, 1)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(len(c), dtype=np.int32)),
                    "sum": pa.array(list(sums)),
                    "n": pa.array(counts),
                }
            )

        # batch_size=None -> one batch per BLOCK: partial boundaries are a
        # pure function of the input blocks, not of arrival-order bundling,
        # so the (sorted) float fold is bit-deterministic run to run
        agg = embeddings.map_batches(
            partials, batch_format="pyarrow", batch_size=None
        ).to_pandas()
        # canonical partial order: blocks can arrive in completion order,
        # and float accumulation is order-sensitive — sort so centroid
        # updates are bit-deterministic across runs
        agg["_k"] = agg["sum"].map(lambda v: np.asarray(v).tobytes())
        agg = agg.sort_values(["cluster", "n", "_k"], kind="stable")
        sums = np.zeros_like(centers)
        counts = np.zeros(k, dtype=np.int64)
        for _, row in agg.iterrows():
            sums[row["cluster"]] += np.asarray(row["sum"])
            counts[row["cluster"]] += row["n"]
        nonzero = counts > 0
        centers[nonzero] = sums[nonzero] / counts[nonzero, None]

    ref = ray.put(centers)

    def final_assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        ids = batch.column(id_col)
        m = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        cols = {
            id_col: ids,
            "cluster": pa.array(assign.astype(np.int32)),
            "sq_dist": pa.array(d.min(1)),
        }
        if keep_vec:  # carried through for cluster-local passes (semdedup)
            cols[vec_col] = batch.column(vec_col)
        return pa.table(cols)

    assigned = embeddings.map_batches(
        final_assign, batch_format="pyarrow", batch_size=None)

    # stats via the same per-batch partial-sum pattern as the Lloyd loop:
    # each batch emits k (cluster, n, inertia) rows; the driver merges
    # k x n_batches tiny partials — never the full per-row assignment.
    def stat_partials(batch: pa.Table) -> pa.Table:
        assign = batch.column("cluster").to_numpy()
        sq = batch.column("sq_dist").to_numpy()
        counts = np.zeros(k, dtype=np.int64)
        inertia = np.zeros(k, dtype=np.float64)
        np.add.at(counts, assign, 1)
        np.add.at(inertia, assign, sq)
        return pa.table({"cluster": pa.array(np.arange(k, dtype=np.int32)),
                         "n": pa.array(counts), "inertia": pa.array(inertia)})

    stats = (
        assigned.map_batches(stat_partials, batch_format="pyarrow",
                             batch_size=None)
        .to_pandas()
        .sort_values(["cluster", "n", "inertia"], kind="stable")  # order-stable float fold
        .groupby("cluster", as_index=False)
        .agg(n=("n", "sum"), inertia=("inertia", "sum"))
    )
    stats = stats[stats["n"] > 0].reset_index(drop=True)
    stats["inertia"] = stats["inertia"].round(4)
    return assigned, stats


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
    if "query_id" not in partials.columns:  # empty input -> no partial blocks
        partials = pd.DataFrame(columns=["query_id", "neighbor_id", "score"])
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


def hard_negative_topk(
    embeddings: ray.data.Dataset,
    queries: dict,
    query_labels: dict,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> pd.DataFrame:
    """Hard-negative mining: for each query vector, the exact cosine top-k
    neighbors whose `label_col` DIFFERS from the query's label (the
    contrastive-training staple — nearest points of a different class are
    the hardest negatives).  Same streamed-partials shape as
    `brute_force_topk`: queries + their labels broadcast once (`ray.put`),
    one pass over the corpus with a per-batch (k x n_queries) partial, one
    bounded driver merge.  Self-pairs excluded (a row can share an id with
    a query even when labels differ is impossible — same id implies same
    row — but the guard keeps semantics obvious).  Returns (query_id,
    neighbor_id, neighbor_label, score, rank) with the rounded-score +
    neighbor-id deterministic tie-break used by the whole ANN family."""
    query_ids = list(queries.keys())
    qm = np.array([queries[i] for i in query_ids], dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    qlabels = np.array([query_labels[i] for i in query_ids])
    ref = ray.put((query_ids, qm / qn, qlabels))

    def partial(batch: pa.Table) -> pa.Table:
        qids, qmat, qlab = ray.get(ref)
        ids = np.asarray(batch.column(id_col).to_pylist())
        labels = np.asarray(batch.column(label_col).to_pylist())
        m = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ qmat.T  # (batch, n_queries)
        out_q, out_n, out_l, out_s = [], [], [], []
        for qi, qid in enumerate(qids):
            mask = (labels != qlab[qi]) & (ids != qid)
            if not mask.any():
                continue
            sub_ids = ids[mask]
            sub_lab = labels[mask]
            col = np.round(sims[mask, qi], 6)  # rank on the ROUNDED score
            order = np.lexsort((sub_ids, -col))[: min(k, len(sub_ids))]
            for t in order:
                out_q.append(qid)
                out_n.append(sub_ids[t])
                out_l.append(sub_lab[t])
                out_s.append(float(col[t]))
        return pa.table({
            "query_id": pa.array(out_q),
            "neighbor_id": pa.array(out_n),
            "neighbor_label": pa.array(out_l),
            "score": pa.array(out_s, type=pa.float64()),
        })

    partials = embeddings.select_columns(
        [id_col, vec_col, label_col]
    ).map_batches(partial, batch_format="pyarrow").to_pandas()
    if "query_id" not in partials.columns:  # empty input -> no blocks
        partials = pd.DataFrame(
            columns=["query_id", "neighbor_id", "neighbor_label", "score"])
    partials = partials.sort_values(
        ["query_id", "score", "neighbor_id"],
        ascending=[True, False, True], kind="stable",
    )
    out = partials.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out


def pca_embeddings(
    embeddings: ray.data.Dataset,
    k: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Distributed PCA: ONE streamed pass computes per-batch moment
    partials (n, sum-vector, sum-of-outer-products) — each partial is a
    single (1 + d + d*d)-float row, so driver state is O(batches x d^2)
    regardless of corpus size; the d x d covariance eigendecomposition
    runs driver-side (d is the embedding dim, small by contract), and a
    second streamed pass projects every vector onto the broadcast top-k
    components.

    Determinism: partials are folded in canonical (sorted) order before
    the eigh, and each component's sign is fixed so its
    largest-magnitude coordinate is positive.

    Returns (projection Dataset (id, pc1..pck), summary DataFrame
    (component, explained_var_ratio))."""

    def moments(batch: pa.Table) -> pd.DataFrame:
        vecs = np.array(batch.column(vec_col).to_pylist(),
                        dtype=np.float64)
        if vecs.size == 0:
            return pd.DataFrame({"n": pd.Series(dtype="int64"),
                                 "moments": pd.Series(dtype=object)})
        s = vecs.sum(axis=0)
        ss = vecs.T @ vecs
        return pd.DataFrame({
            "n": [np.int64(len(vecs))],
            "moments": [np.concatenate([s, ss.ravel()]).tolist()],
        })

    parts = embeddings.select_columns([vec_col]).map_batches(
        moments, batch_format="pyarrow").to_pandas()
    parts = parts[parts["n"] > 0]
    if not len(parts):
        proj = pd.DataFrame({id_col: pd.Series(dtype="int64"),
                             **{f"pc{i+1}": pd.Series(dtype="float64")
                                for i in range(k)}})
        summary = pd.DataFrame({"component": pd.Series(dtype="int64"),
                                "explained_var_ratio":
                                    pd.Series(dtype="float64")})
        return ray.data.from_arrow(
            pa.Table.from_pandas(proj, preserve_index=False)), summary

    # canonical fold order: float sums are order-sensitive at ulp level
    parts = parts.assign(_k=parts["moments"].map(lambda m: m[0]))
    parts = parts.sort_values(["n", "_k"], kind="stable")
    n = int(parts["n"].sum())
    acc = np.sum(np.stack(parts["moments"].to_numpy()), axis=0)
    d = int((-1 + np.sqrt(1 + 4 * len(acc))) / 2)
    s, ss = acc[:d], acc[d:].reshape(d, d)
    mean = s / n
    cov = (ss - n * np.outer(mean, mean)) / max(n - 1, 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T          # (k, d)
    evals = np.maximum(evals[order], 0.0)
    # sign convention: largest-|coordinate| positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    total_var = max(float(np.trace(cov)), 1e-300)
    summary = pd.DataFrame({
        "component": np.arange(1, len(order) + 1, dtype=np.int64),
        "explained_var_ratio": np.round(evals / total_var, 6),
    })

    ref = ray.put((mean, comps))

    def project(batch: pa.Table) -> pd.DataFrame:
        m, c = ray.get(ref)
        vecs = np.array(batch.column(vec_col).to_pylist(),
                        dtype=np.float64)
        out = pd.DataFrame({id_col: batch.column(id_col).to_pandas()})
        scores = (vecs - m) @ c.T if vecs.size else np.zeros((0, len(c)))
        for i in range(len(c)):
            out[f"pc{i+1}"] = np.round(scores[:, i], 6)
        return out

    proj = embeddings.select_columns([id_col, vec_col]).map_batches(
        project, batch_format="pyarrow")
    return proj, summary


def semdedup(
    embeddings: ray.data.Dataset,
    k: int = 8,
    threshold_ppm: int = 970_000,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with k-means, then mark
    near-duplicates WITHIN each cluster by pairwise cosine similarity —
    the quadratic pass is confined to one cluster at a time, never the
    corpus (the paper's trick for web scale; k is the knob that bounds
    cluster size).

    Keep rule (deterministic): within a cluster, scan ids ascending and
    greedily keep a vector unless its cosine similarity to an
    already-kept vector reaches ``threshold_ppm`` (integer parts-per-
    million of the rounded cosine — stable across runs because the
    k-means fold is bit-deterministic and the scan order is total).

    Scale design: one shuffle (``groupby(cluster)``) after the streamed
    k-means passes; each ``map_groups`` holds one cluster's vectors —
    the same partitioning assumption the paper makes.  Similarities are
    computed as ONE chunked matmul per cluster, not a Python pair loop.

    Output: (vec_id, cluster, keep, nn_sim_ppm) where nn_sim_ppm is the
    max similarity to an earlier KEPT vector (-1 for the first / an
    all-kept isolate).  Filter keep==True for the deduped corpus.
    """
    assigned, _ = kmeans_dataset(
        embeddings, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
        keep_vec=True,
    )

    def dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="stable").reset_index(drop=True)
        m = np.array(g[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mn = m / norms
        n = len(g)
        keep_idx: list[int] = []
        keep = np.zeros(n, dtype=bool)
        nn_ppm = np.full(n, -1, dtype=np.int64)
        for i in range(n):  # greedy leader scan; sims vs kept = one matvec
            if keep_idx:
                sims = mn[keep_idx] @ mn[i]
                # nearest-int ppm (np.rint), NOT trunc of round(x,6)*1e6 —
                # truncation turns a 0.469962 cosine into 469961 via the
                # x.99999... float representation
                best = int(np.rint(1_000_000 * sims.max()))
                nn_ppm[i] = best
                if best >= threshold_ppm:
                    continue
            keep[i] = True
            keep_idx.append(i)
        return pd.DataFrame({
            id_col: g[id_col].astype("int64"),
            "cluster": g["cluster"].astype("int32"),
            "keep": keep,
            "nn_sim_ppm": nn_ppm,
        })

    return assigned.groupby("cluster").map_groups(
        dedup_cluster, batch_format="pandas")


def pq_train(
    embeddings: ray.data.Dataset,
    m: int = 8,
    n_codes: int = 16,
    sample_size: int = 2048,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Product-quantization codebooks (Jegou et al. 2011): split the
    (normalized) vector into `m` subspaces and fit an independent
    `n_codes`-way k-means per subspace on a bounded driver-side sample
    (the _kmeans_lite discipline: canonical sample order, seeded
    farthest-point init, so the codebooks are a pure function of the
    sample set).  Returns (m, n_codes, dim/m) float64."""
    sample_rows = embeddings.select_columns(
        [vec_col]).limit(sample_size).take_all()
    sample = np.array([r[vec_col] for r in sample_rows],
                      dtype=np.float64)
    if sample.size == 0:
        raise ValueError("pq_train: empty input")
    sample = sample[np.lexsort(sample.T[::-1])]
    n = np.linalg.norm(sample, axis=1, keepdims=True)
    n[n == 0] = 1.0
    sample = sample / n
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.empty((m, n_codes, dsub), dtype=np.float64)
    for j in range(m):
        books[j] = _kmeans_lite(
            np.ascontiguousarray(sample[:, j * dsub:(j + 1) * dsub]),
            n_codes)
    return books


def pq_encode(
    embeddings: ray.data.Dataset,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Streamed PQ encoding: each (normalized) vector -> m uint8 codes
    (nearest codeword per subspace).  Codebooks broadcast once via
    ray.put; 64-float embeddings compress 32x to 8 bytes — the layout a
    10^12-vector index actually stores."""
    ref = ray.put(np.asarray(codebooks, dtype=np.float64))

    def enc(batch: pa.Table) -> pa.Table:
        books = ray.get(ref)
        m, n_codes, dsub = books.shape
        vecs = np.array(batch.column(vec_col).to_pylist(),
                        dtype=np.float64)
        if len(vecs) == 0:
            return pa.table({
                id_col: batch.column(id_col),
                "code": pa.array([], type=pa.list_(pa.uint8()))})
        n = np.linalg.norm(vecs, axis=1, keepdims=True)
        n[n == 0] = 1.0
        vecs = vecs / n
        codes = np.empty((len(vecs), m), dtype=np.uint8)
        for j in range(m):
            sub = vecs[:, j * dsub:(j + 1) * dsub]
            d = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(-1)
            codes[:, j] = d.argmin(1).astype(np.uint8)
        return pa.table({
            id_col: batch.column(id_col),
            "code": pa.array(list(codes), type=pa.list_(pa.uint8()))})

    return embeddings.map_batches(enc, batch_format="pyarrow")


def pq_topk(
    embeddings: ray.data.Dataset,
    queries: dict,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    sample_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> pd.DataFrame:
    """PQ/ADC approximate top-k (asymmetric distance computation): the
    memory-bound scale path COMPLEMENTING IVF's compute-bound one —
    codes are 8 bytes/vector, so the scan reads 32x less than raw
    floats.  Train codebooks on a bounded sample, broadcast (books +
    per-query LUTs); ONE streamed pass encodes each batch and scores
    every query as a (m x n_codes) LUT gather-sum (inner product of
    the normalized query with the RECONSTRUCTED vector); per-batch
    top-k partials fold on the driver (O(blocks x k x queries)).
    Approximate by construction -> golden/recall-gated, no SQL
    oracle."""
    books = pq_train(embeddings, m=m, n_codes=n_codes,
                     sample_size=sample_size, vec_col=vec_col)
    query_ids = list(queries.keys())
    qm = np.array([queries[i] for i in query_ids], dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    qm = qm / qn
    nq, dim = qm.shape
    dsub = dim // m
    # LUT[q, j, c] = q_sub(j) . codeword(j, c)
    lut = np.einsum("qjd,jcd->qjc",
                    qm.reshape(nq, m, dsub), books)
    ref = ray.put((books, lut))
    kk = k + (1 if exclude_self else 0)

    def score_batch(batch: pa.Table) -> pd.DataFrame:
        books_, lut_ = ray.get(ref)
        m_, n_codes_, dsub_ = books_.shape
        ids = np.asarray(batch.column(id_col).to_pylist())
        vecs = np.array(batch.column(vec_col).to_pylist(),
                        dtype=np.float64)
        if len(vecs) == 0:
            return pd.DataFrame({"qi": [], "neighbor_id": [],
                                 "score": []})
        n = np.linalg.norm(vecs, axis=1, keepdims=True)
        n[n == 0] = 1.0
        vecs = vecs / n
        codes = np.empty((len(vecs), m_), dtype=np.int64)
        for j in range(m_):
            sub = vecs[:, j * dsub_:(j + 1) * dsub_]
            d = ((sub[:, None, :] - books_[j][None, :, :]) ** 2).sum(-1)
            codes[:, j] = d.argmin(1)
        # scores[q, i] = sum_j lut[q, j, codes[i, j]]
        scores = lut_[:, np.arange(m_)[None, :], codes].sum(-1)
        out_q, out_n, out_s = [], [], []
        top = min(kk, scores.shape[1])
        for qi in range(scores.shape[0]):
            idx = np.argpartition(-scores[qi], top - 1)[:top]
            out_q.extend([qi] * len(idx))
            out_n.extend(ids[idx].tolist())
            out_s.extend(scores[qi, idx].tolist())
        return pd.DataFrame({
            "qi": pd.Series(out_q, dtype="int64"),
            "neighbor_id": pd.Series(out_n, dtype="int64"),
            "score": pd.Series(out_s, dtype="float64")})

    parts = embeddings.map_batches(
        score_batch, batch_format="pyarrow").to_pandas()
    rows = []
    for qi, qid in enumerate(query_ids):
        g = parts[parts["qi"] == qi]
        if exclude_self:
            g = g[g["neighbor_id"] != qid]
        g = g.sort_values(["score", "neighbor_id"],
                          ascending=[False, True]).head(k)
        for rank, r in enumerate(g.itertuples(), start=1):
            rows.append((qid, int(r.neighbor_id),
                         round(float(r.score), 6), rank))
    return pd.DataFrame(rows, columns=["query_id", "neighbor_id",
                                       "score", "rank"])
