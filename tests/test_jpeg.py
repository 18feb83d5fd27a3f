"""Real baseline JPEG decode/encode (pure NumPy/stdlib — no codec libs).

The encoder is the fixture builder: flat quantization makes round trips
exact up to DCT/color rounding, so the decoder is verified against
analytically-known pixel content.  Reference behavior analog: the
reference app hands JPEGs to PIL inside its Streamlit UI; here the decode
is a first-class Ray stage kernel (stages/multimodal.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from gliner_transbronchialbiopsy_ray.stages.multimodal import (
    decode_jpeg,
    encode_jpeg,
    probe_image_header,
    raw_media_features,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(yy * 10) % 256, (xx * 13) % 256,
                     ((yy + xx) * 5) % 256], axis=2).astype(np.uint8)


def test_roundtrip_444_near_exact():
    img = _gradient(24, 17)  # non-multiple-of-8 dims exercise crop
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_roundtrip_solid_exact():
    img = np.full((16, 16, 3), 77, np.uint8)
    assert (decode_jpeg(encode_jpeg(img)) == img).all()


def test_roundtrip_noise_within_dct_rounding():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (8, 16, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_roundtrip_420_chroma_subsampled():
    # SMOOTH gradient (no modular wrap): 4:2:0 block-averages chroma, so
    # a wrap discontinuity would legitimately smear — that's codec
    # behavior, not a decoder bug.  Odd dims: chroma pad + crop paths.
    yy, xx = np.mgrid[0:33, 0:22]
    img = np.stack([yy * 6, xx * 9, yy * 3 + xx * 3],
                   axis=2).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, subsampling="4:2:0"))
    assert out.shape == img.shape
    # luma survives subsampling nearly exactly; chroma is block-averaged
    luma = lambda a: (0.299 * a[:, :, 0] + 0.587 * a[:, :, 1]
                      + 0.114 * a[:, :, 2])
    assert np.abs(luma(out.astype(float)) - luma(img.astype(float))).max() <= 4
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 16


def test_restart_markers_equal_no_restart():
    img = _gradient(32, 24)
    a = decode_jpeg(encode_jpeg(img, restart_interval=0))
    b = decode_jpeg(encode_jpeg(img, restart_interval=2))
    assert (a == b).all()
    c = decode_jpeg(encode_jpeg(img, subsampling="4:2:0",
                                restart_interval=1))
    d = decode_jpeg(encode_jpeg(img, subsampling="4:2:0"))
    assert (c == d).all()


def test_lossy_quant_table_still_decodes():
    img = _gradient(16, 16)
    q = np.full(64, 16, np.int32)
    q[0] = 8
    out = decode_jpeg(encode_jpeg(img, quant=q))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 24


def test_probe_header_matches_decode():
    img = _gradient(21, 13)
    payload = encode_jpeg(img)
    meta = probe_image_header(payload)
    assert meta["format"] == "jpeg"
    assert (meta["height"], meta["width"]) == decode_jpeg(payload).shape[:2]


def test_progressive_rejected():
    img = _gradient(16, 16)
    payload = bytearray(encode_jpeg(img))
    i = payload.index(bytes([0xFF, 0xC0]))
    payload[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(payload))


def test_truncated_rejected():
    payload = encode_jpeg(_gradient(16, 16))
    with pytest.raises(ValueError):
        decode_jpeg(payload[: len(payload) // 3])
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")


def test_raw_image_stage_routes_jpeg(ray_session):
    img = _gradient(32, 32)
    rows = pa.table({
        "media_ref": ["m1", "m2"],
        "payload": pa.array([encode_jpeg(img), b"\xff\xd8broken"],
                            type=pa.binary()),
        "width": pa.array([None, None], type=pa.int32()),
        "height": pa.array([None, None], type=pa.int32()),
    })
    # collect as Arrow: Ray's pandas conversion tensor-casts the mixed
    # None/list feature column and fails (known quirk, see test_multimodal)
    out = pa.concat_tables(list(
        raw_media_features(ray.data.from_arrow(rows), concurrency=1)
        .iter_batches(batch_size=64, batch_format="pyarrow")
    )).to_pandas().set_index("media_ref")
    assert out.loc["m1", "decode_status"] == "ok"
    feat = np.asarray(out.loc["m1", "feature"])
    assert abs(feat[0] - img[:, :, 0].mean()) < 2.0  # mean_r
    assert abs(feat[6] - (0.299 * img[:, :, 0].mean()
                          + 0.587 * img[:, :, 1].mean()
                          + 0.114 * img[:, :, 2].mean())) < 2.0
    assert out.loc["m2", "decode_status"].startswith("decode_error")
