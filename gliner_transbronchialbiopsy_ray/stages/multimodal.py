"""Multimodal column plumbing: media spans as opaque references with typed
metadata, processed by actor-pool `map_batches` stages.

The image/audio decode libraries are NOT in this environment, so the decode
kernel is stubbed (deterministic fake features, clearly marked); the Ray
side — schema, batch sizing, actor signature, output layout — is real and
tested.  Swap `_decode_stub` for a real decoder (PIL/torchaudio) on a GPU
cluster; the stage contract does not change.

Batch-size note: real media bytes are large — callers should use a SMALL
batch_size (e.g. 16-64) and `num_cpus`/`num_gpus` sized to the decoder, and
keep media as references (never inline bytes in the doc row) so block sizes
stay bounded.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_FEATURES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("kind", pa.string()),
        ("feature", pa.list_(pa.float32())),
        ("decode_status", pa.string()),
    ]
)


def _decode_stub(media_ref: str, kind: str, dim: int) -> np.ndarray:
    """STUB: deterministic fake feature vector derived from the media_ref.

    A real deployment replaces this with image decode + model embed; it
    raises NotImplementedError for kinds a decoder doesn't support."""
    h = hashlib.md5(f"{kind}|{media_ref}".encode("utf-8")).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
    return rng.randn(dim).astype(np.float32)


class MediaFeatureExtractor:
    """Actor stage over the exploded media inventory
    (doc_id, kind, media_ref, offset) -> fixed-dim feature vectors.

    __init__ is where a real decoder/model loads once per actor."""

    def __init__(self, dim: int = 16, supported: tuple[str, ...] = ("image", "table")):
        self.dim = dim
        self.supported = set(supported)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        refs = batch.column("media_ref").to_pylist()
        feats, status = [], []
        for k, r in zip(kinds, refs):
            if k in self.supported:
                feats.append(_decode_stub(r, k, self.dim).tolist())
                status.append("ok")
            else:
                feats.append(None)
                status.append("unsupported_kind")
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.string()),
                "media_ref": pa.array(refs, type=pa.string()),
                "kind": pa.array(kinds, type=pa.string()),
                "feature": pa.array(feats, type=pa.list_(pa.float32())),
                "decode_status": pa.array(status, type=pa.string()),
            }
        )


class MediaResizer:
    """Actor stage: image resize plumbing.  The decode/resize kernel is
    STUBBED (no PIL in this container): emits deterministic fake output
    dimensions + a derived output ref; a real deployment decodes bytes,
    resizes, writes to the media store, and returns the new ref."""

    def __init__(self, target_w: int = 224, target_h: int = 224):
        self.w, self.h = target_w, target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        kinds = batch.column("kind").to_pylist()
        out_refs, ws, hs, status = [], [], [], []
        for r, k in zip(refs, kinds):
            if k != "image":
                out_refs.append(None)
                ws.append(None)
                hs.append(None)
                status.append("unsupported_kind")
                continue
            out_refs.append(f"{r}#resized_{self.w}x{self.h}")
            ws.append(self.w)
            hs.append(self.h)
            status.append("ok")
        return (
            batch.append_column("resized_ref", pa.array(out_refs, type=pa.string()))
            .append_column("out_w", pa.array(ws, type=pa.int32()))
            .append_column("out_h", pa.array(hs, type=pa.int32()))
            .append_column("resize_status", pa.array(status, type=pa.string()))
        )


class FrameSampler:
    """Actor stage: video frame-sampling plumbing (stubbed kernel).  Emits
    one row per sampled frame with a deterministic frame ref; a real
    deployment probes duration and decodes frames at `fps`."""

    def __init__(self, n_frames: int = 4):
        self.n = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        refs = batch.column("media_ref").to_pylist()
        kinds = batch.column("kind").to_pylist()
        o_doc, o_ref, o_frame, o_idx = [], [], [], []
        for d, r, k in zip(doc_ids, refs, kinds):
            if k != "video":
                continue
            for i in range(self.n):
                o_doc.append(d)
                o_ref.append(r)
                o_frame.append(f"{r}#frame_{i}")
                o_idx.append(i)
        return pa.table(
            {
                "doc_id": pa.array(o_doc, type=pa.string()),
                "media_ref": pa.array(o_ref, type=pa.string()),
                "frame_ref": pa.array(o_frame, type=pa.string()),
                "frame_index": pa.array(o_idx, type=pa.int32()),
            }
        )


def media_features(
    docs: ray.data.Dataset,
    dim: int = 16,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """documents (spans shape) -> per-media feature rows."""
    from .assemble import media_inventory

    inv = docs.map_batches(media_inventory, batch_format="pyarrow")
    return inv.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )
