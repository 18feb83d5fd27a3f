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
