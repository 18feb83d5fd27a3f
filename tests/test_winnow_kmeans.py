"""Winnowing fingerprints + distributed k-means."""

import numpy as np
import pyarrow as pa
import ray.data

from gliner_transbronchialbiopsy_ray.stages.similarity import kmeans_dataset
from gliner_transbronchialbiopsy_ray.stages.text_analysis import winnow_fingerprints


def test_winnow_properties():
    base = "the quick brown fox jumps over the lazy dog repeatedly " * 4
    shifted = "PREFIX " + base  # winnowing is position-robust
    distinct = "completely different material about arrow batches " * 4
    b = pa.table({"doc_id": [1, 2, 3], "text": [base, shifted, distinct]})
    out = winnow_fingerprints(b)
    fps = {d: set(f) for d, f in zip(out.column("doc_id").to_pylist(),
                                     out.column("fingerprints").to_pylist())}
    # identical core content -> high fingerprint overlap despite the shift
    inter = len(fps[1] & fps[2]) / len(fps[1] | fps[2])
    assert inter > 0.7, inter
    # distinct content -> near-zero overlap
    assert len(fps[1] & fps[3]) / len(fps[1] | fps[3]) < 0.05
    # deterministic
    out2 = winnow_fingerprints(b)
    assert out.equals(out2)


def test_kmeans_clusters_separated_data():
    rng = np.random.RandomState(5)
    centers = np.array([[10.0, 0], [-10.0, 0], [0, 10.0]])
    pts = np.vstack([c + rng.randn(50, 2) * 0.5 for c in centers])
    rows = [{"vec_id": i, "embedding": pts[i].tolist()} for i in range(len(pts))]
    ds = ray.data.from_items(rows)
    assigned, stats = kmeans_dataset(ds, k=3, iters=6, sample_size=150)
    df = assigned.to_pandas()
    # each true cluster maps to exactly one learned cluster
    for start in (0, 50, 100):
        labels = df[(df["vec_id"] >= start) & (df["vec_id"] < start + 50)]["cluster"]
        assert labels.nunique() == 1
    assert stats["n"].sum() == 150
    assert (stats["inertia"] >= 0).all()


def test_pca_matches_dense_reference_and_block_layout_invariant(ray_session):
    """Distributed moment-partial PCA must match numpy eigh on the same
    data (variance ratios + |projections|), hold the sign convention,
    and be invariant to block layout (partials fold in canonical
    order)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from gliner_transbronchialbiopsy_ray.stages.similarity import (
        pca_embeddings,
    )

    rng = np.random.RandomState(11)
    X = (rng.randn(300, 1) @ np.array([[4.0, 1.0, 0.5, 0.0]])
         + 0.05 * rng.randn(300, 4)).astype(np.float64)
    tbl = pa.table({"vec_id": np.arange(300),
                    "embedding": list(X.astype(np.float32))})

    proj, summary = pca_embeddings(rd.from_arrow(tbl), k=2)
    p = proj.to_pandas().sort_values("vec_id").reset_index(drop=True)

    Xd = X.astype(np.float32).astype(np.float64)
    evals, evecs = np.linalg.eigh(np.cov(Xd.T))
    order = np.argsort(evals)[::-1]
    ratio_ref = evals[order[0]] / evals.sum()
    assert abs(summary["explained_var_ratio"].iloc[0] - ratio_ref) < 1e-4
    assert (summary["explained_var_ratio"].diff().dropna() <= 0).all()

    # projections match the dense reference up to the fixed sign
    ref1 = (Xd - Xd.mean(0)) @ evecs[:, order[0]]
    got1 = p["pc1"].to_numpy()
    assert np.allclose(np.abs(got1), np.abs(ref1), atol=1e-3)

    # block-layout invariance
    proj2, summary2 = pca_embeddings(
        rd.from_arrow(tbl).repartition(7), k=2)
    p2 = proj2.to_pandas().sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(p, p2)
    pd.testing.assert_frame_equal(summary, summary2)


# --------------------------------------------------------------------------
# SemDeDup


def test_semdedup_marks_within_cluster_near_dups():
    import numpy as np
    import pandas as pd
    import ray.data

    from gliner_transbronchialbiopsy_ray.stages.similarity import semdedup

    rng = np.random.RandomState(7)
    rows = []
    vid = 0
    # two well-separated base directions; per base: one anchor + two
    # near-copies (cos > 0.999) + one distinct-direction member
    for base in (np.array([10.0, 0.0, 0.0, 0.0]),
                 np.array([0.0, 10.0, 0.0, 0.0])):
        anchor = base + rng.normal(0, 0.01, 4)
        for v in (anchor, anchor * 1.5, anchor + rng.normal(0, 0.001, 4)):
            rows.append({"vec_id": vid, "embedding": [float(x) for x in v]})
            vid += 1
        ortho = base + np.roll(base, 2) * 0.8  # same cluster, ~45 deg away
        rows.append({"vec_id": vid, "embedding": [float(x) for x in ortho]})
        vid += 1
    ds = ray.data.from_items(rows)
    out = semdedup(ds, k=2, threshold_ppm=990_000).to_pandas()
    assert len(out) == 8
    out = out.sort_values("vec_id").reset_index(drop=True)
    # anchors (first id per cluster group) kept; scaled + jittered copies
    # dropped; the off-direction member kept
    assert out["keep"].tolist() == [True, False, False, True] * 2
    # dropped rows record their similarity to the kept anchor
    assert (out.loc[~out["keep"], "nn_sim_ppm"] >= 990_000).all()
    assert str(out["nn_sim_ppm"].dtype) == "int64"
    # deterministic across runs
    again = semdedup(ds, k=2, threshold_ppm=990_000).to_pandas()
    pd.testing.assert_frame_equal(
        out, again.sort_values("vec_id").reset_index(drop=True))


def test_semdedup_all_distinct_keeps_everything():
    import ray.data

    from gliner_transbronchialbiopsy_ray.stages.similarity import semdedup

    ds = ray.data.from_items([
        {"vec_id": i, "embedding": [1.0 * (i == j) for j in range(4)]}
        for i in range(4)
    ])
    out = semdedup(ds, k=2, threshold_ppm=900_000).to_pandas()
    assert out["keep"].all()
    assert len(out) == 4
