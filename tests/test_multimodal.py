"""Multimodal plumbing: feature extraction, resize, frame sampling —
stubbed kernels, real Ray actor-pool stages over the media inventory."""

import pyarrow as pa
import ray.data

from gliner_transbronchialbiopsy_ray import fixtures
from gliner_transbronchialbiopsy_ray.stages.assemble import media_inventory
from gliner_transbronchialbiopsy_ray.stages.multimodal import (
    FrameSampler,
    MediaFeatureExtractor,
    MediaResizer,
    media_features,
)


def test_media_features_pipeline():
    path = fixtures.write_corpus(120, seed=42, shards=2)
    feats = media_features(ray.data.read_parquet(f"{path}/documents"), dim=8)
    df = feats.to_pandas()
    assert len(df) > 0
    ok = df[df["decode_status"] == "ok"]
    assert (ok["feature"].map(len) == 8).all()
    # deterministic per media_ref
    df2 = media_features(
        ray.data.read_parquet(f"{path}/documents"), dim=8
    ).to_pandas()
    a = df.sort_values("media_ref").reset_index(drop=True)
    b = df2.sort_values("media_ref").reset_index(drop=True)
    assert (a["media_ref"] == b["media_ref"]).all()
    assert all(list(x) == list(y) for x, y in zip(a["feature"], b["feature"]))


def test_resizer_and_frame_sampler():
    inv = pa.table(
        {
            "doc_id": ["d1", "d1", "d2"],
            "kind": ["image", "video", "table"],
            "media_ref": ["media://d1/img", "media://d1/vid", "media://d2/tbl"],
            "offset": pa.array([0, 1, 0], type=pa.int32()),
        }
    )
    resized = MediaResizer(64, 64)(inv)
    rows = resized.to_pylist()
    assert rows[0]["resize_status"] == "ok" and rows[0]["out_w"] == 64
    assert rows[1]["resize_status"] == "unsupported_kind"

    frames = FrameSampler(n_frames=3)(inv)
    f = frames.to_pylist()
    assert len(f) == 3  # only the video row expands
    assert {r["frame_index"] for r in f} == {0, 1, 2}
    assert all(r["media_ref"] == "media://d1/vid" for r in f)


def test_media_inventory_from_spans():
    path = fixtures.write_corpus(50, seed=42, shards=1)
    docs = ray.data.read_parquet(f"{path}/documents")
    inv = docs.map_batches(media_inventory, batch_format="pyarrow").to_pandas()
    assert set(inv.columns) == {"doc_id", "kind", "media_ref", "offset"}
    assert (inv["kind"] != "text").all()
    assert inv["media_ref"].str.startswith("media://").all()
