"""Multimodal plumbing: feature extraction, resize, frame sampling —
stubbed kernels, real Ray actor-pool stages over the media inventory."""

import numpy as np
import pyarrow as pa
import pytest
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


def test_raw_image_stage_real_kernel():
    """decode_raw_rgb/RawImageStage are REAL kernels (no stub): known
    synthetic images must produce exact channel stats and exact block-mean
    resize output; malformed payloads keep their row with an error
    status."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        decode_raw_rgb,
        raw_media_features,
    )

    # 4x4 solid-color image: means exact, stds zero
    solid = np.full((4, 4, 3), (10, 200, 30), dtype=np.uint8)
    # 4x4 with distinct 2x2 blocks -> block-mean resize to 2x2 is exact
    blocks = np.zeros((4, 4, 3), dtype=np.uint8)
    for bi, val in zip([(0, 0), (0, 2), (2, 0), (2, 2)], [0, 60, 120, 240]):
        blocks[bi[0]:bi[0] + 2, bi[1]:bi[1] + 2, :] = val

    media = ray.data.from_arrow(pa.table({
        "media_ref": ["m1", "m2", "m3"],
        "payload": [solid.tobytes(), blocks.tobytes(), b"short"],
        "width": [4, 4, 4],
        "height": [4, 4, 4],
    }))
    # collect as Arrow (Ray's pandas conversion tries to tensor-cast the
    # mixed None/list feature column and fails — a Ray quirk, not ours)
    ds = raw_media_features(media, out_w=2, out_h=2, concurrency=1)
    tbl = pa.concat_tables(list(ds.iter_batches(batch_size=64,
                                                batch_format="pyarrow")))
    out = tbl.to_pandas().set_index("media_ref")

    assert out.loc["m1", "decode_status"] == "ok"
    f = np.asarray(out.loc["m1", "feature"])
    assert f[:3].tolist() == [10.0, 200.0, 30.0]          # exact means
    assert f[3:6].tolist() == [0.0, 0.0, 0.0]             # solid -> std 0
    luma = 0.299 * 10 + 0.587 * 200 + 0.114 * 30
    assert abs(f[6] - luma) < 1e-3

    small = np.frombuffer(out.loc["m2", "resized_payload"],
                          dtype=np.uint8).reshape(2, 2, 3)
    assert small[0, 0, 0] == 0 and small[0, 1, 0] == 60
    assert small[1, 0, 0] == 120 and small[1, 1, 0] == 240

    # malformed payload: row kept, status set
    assert out.loc["m3", "decode_status"].startswith("decode_error")
    assert out.loc["m3", "feature"] is None

    # round-trip of the decoder itself
    assert np.array_equal(decode_raw_rgb(blocks.tobytes(), 4, 4), blocks)


def test_wav_decode_features_analytic(ray_session):
    """RawAudioStage on synthetic sines: RMS = amp/sqrt(2), ZCR = 2f/rate,
    duration/rate/channels exact; malformed payload keeps its row with a
    decode_error status."""
    import io
    import wave

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        wav_audio_features,
    )

    rate, secs, amp, freq = 8000, 0.5, 0.8, 440.0
    t = np.arange(int(rate * secs)) / rate
    x = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(rate)
        w.writeframes(x.tobytes())
    media = rd.from_arrow(pa.table({
        "media_ref": pa.array(["wav://sine", "wav://bad"]),
        "payload": pa.array([buf.getvalue(), b"not-a-wav"],
                            type=pa.binary()),
    }))
    ds = wav_audio_features(media, n_windows=4, concurrency=1)
    out = pa.concat_tables(
        list(ds.iter_batches(batch_size=256, batch_format="pyarrow"))
    ).to_pandas()
    out = out.set_index("media_ref")
    assert out.loc["wav://bad", "decode_status"].startswith("decode_error")
    assert out.loc["wav://bad", "feature"] is None
    f = out.loc["wav://sine", "feature"]
    dur, sr, nch, rms, peak, zcr = f
    assert abs(dur - secs) < 1e-3
    assert sr == rate and nch == 1
    assert abs(rms - amp / np.sqrt(2)) < 0.01
    assert abs(peak - amp) < 0.01
    assert abs(zcr - 2 * freq / rate) < 0.01
    env = out.loc["wav://sine", "rms_envelope"]
    assert len(env) == 4
    # constant-amplitude sine -> flat envelope at the global RMS
    assert all(abs(e - rms) < 0.02 for e in env)


def test_rawv_roundtrip_and_offset_decode():
    """RAWV container: header fields survive; frame decode by offset is
    byte-exact without touching other frames."""
    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        decode_raw_video_frame,
        encode_raw_video,
        raw_video_header,
    )

    rng = np.random.RandomState(7)
    frames = rng.randint(0, 256, size=(5, 4, 6, 3)).astype(np.uint8)
    payload = encode_raw_video(frames, fps=30)
    assert raw_video_header(payload) == (6, 4, 5, 30)
    for i in (0, 2, 4):
        np.testing.assert_array_equal(
            decode_raw_video_frame(payload, i), frames[i])
    with pytest.raises(ValueError):
        decode_raw_video_frame(payload, 5)
    with pytest.raises(ValueError):
        raw_video_header(payload[:-1])  # truncated body
    with pytest.raises(ValueError):
        raw_video_header(b"NOPE" + payload[4:])  # bad magic


def test_raw_video_stage_sampling_and_motion(ray_session):
    """Sampler decodes exactly n evenly-spaced frames; motion is 0 for a
    static clip, positive for a moving one, null on each clip's first
    sampled frame; bad payloads keep one row with decode_status."""
    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        encode_raw_video,
        raw_video_frames,
    )

    rng = np.random.RandomState(11)
    static = np.repeat(
        rng.randint(0, 256, size=(1, 8, 8, 3)), 10, axis=0).astype(np.uint8)
    base = rng.randint(0, 200, size=(8, 8, 3)).astype(np.uint8)
    moving = np.stack(
        [np.roll(base, t, axis=1) for t in range(10)]).astype(np.uint8)
    media = ray.data.from_arrow(pa.table({
        "media_ref": ["v://static", "v://moving", "v://bad"],
        "payload": pa.array(
            [encode_raw_video(static, 25), encode_raw_video(moving, 25),
             b"RAWVgarbage"], type=pa.binary()),
    }))
    ds = raw_video_frames(media, n_frames=4, concurrency=2)
    # concat Arrow batches ourselves: Ray's to_pandas TensorArray cast
    # rejects a list column that mixes nulls (bad row) with fixed-length
    # lists
    df = pa.concat_tables(
        list(ds.iter_batches(batch_size=256, batch_format="pyarrow"))
    ).to_pandas()
    ok = df[df["decode_status"] == "ok"]
    assert sorted(ok[ok["media_ref"] == "v://static"]["frame_index"]) == [0, 3, 6, 9]
    # ts from fps: frame 9 at 25 fps -> 360 ms
    assert ok[(ok["media_ref"] == "v://static")
              & (ok["frame_index"] == 9)]["ts_ms"].iloc[0] == 360
    for ref, expect_zero in (("v://static", True), ("v://moving", False)):
        sub = ok[ok["media_ref"] == ref].sort_values("frame_index")
        assert np.isnan(sub["motion"].iloc[0])  # first sampled frame
        rest = sub["motion"].iloc[1:]
        assert (rest == 0).all() if expect_zero else (rest > 0).all()
    bad = df[df["media_ref"] == "v://bad"]
    assert len(bad) == 1 and bad["decode_status"].iloc[0].startswith("decode_error")


def test_pnm_decode_and_stage_routing(ray_session):
    """decode_pnm is a REAL standard-format kernel: binary P6/P5 with
    comments and arbitrary header whitespace decode exactly; sub-255
    maxval rescales; the stage routes PNM payloads by magic WITHOUT
    width/height metadata, keeps raw-RGB routing when the size matches
    the metadata, and records errors for truncated/16-bit payloads."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        decode_pnm,
        encode_ppm,
        raw_media_features,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8)

    # canonical encode -> decode round trip
    assert np.array_equal(decode_pnm(encode_ppm(img)), img)

    # comments + arbitrary whitespace in the header, per the netpbm spec
    fancy = (b"P6 # magic comment\n#another\n  4\t6 # dims\n 255 "
             + img.tobytes())
    assert np.array_equal(decode_pnm(fancy), img)

    # P5 grayscale expands to 3 identical channels
    gray = rng.integers(0, 256, size=(3, 5, 1), dtype=np.uint8)
    p5 = b"P5\n5 3\n255\n" + gray.tobytes()
    assert np.array_equal(decode_pnm(p5), np.repeat(gray, 3, axis=2))

    # maxval < 255 rescales to full range
    half = np.full((2, 2, 3), 100, dtype=np.uint8)
    scaled = decode_pnm(b"P6\n2 2\n200\n" + half.tobytes())
    assert scaled[0, 0, 0] == (100 * 255) // 200

    # error paths: truncation, 16-bit maxval, bad magic
    for bad in (encode_ppm(img)[:-1], b"P6\n2 2\n65535\n" + b"\0" * 24,
                b"P7\nrest"):
        try:
            decode_pnm(bad)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass

    # stage-level routing: PNM row (no metadata), raw row, garbage row
    raw = np.full((4, 4, 3), 7, dtype=np.uint8)
    media = ray.data.from_arrow(pa.table({
        "media_ref": ["pnm", "raw", "bad"],
        "payload": [encode_ppm(img), raw.tobytes(), b"P6 garbage"],
        "width": [0, 4, 0],
        "height": [0, 4, 0],
    }))
    tbl = pa.concat_tables(list(
        raw_media_features(media, out_w=2, out_h=2, concurrency=1)
        .iter_batches(batch_size=64, batch_format="pyarrow")))
    out = tbl.to_pandas().set_index("media_ref")
    assert out.loc["pnm", "decode_status"] == "ok"
    assert np.allclose(np.asarray(out.loc["pnm", "feature"])[:3],
                       img.reshape(-1, 3).mean(axis=0), atol=1e-3)
    assert out.loc["raw", "decode_status"] == "ok"
    assert np.asarray(out.loc["raw", "feature"])[:3].tolist() == [7, 7, 7]
    assert out.loc["bad", "decode_status"].startswith("decode_error")


def test_probe_image_header_png_jpeg_pnm_and_garbage():
    import struct
    import zlib as _z

    import ray.data as _rd

    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        image_header_stats, probe_image_header,
    )

    # minimal PNG: signature + IHDR (120x80 RGBA)
    ihdr = struct.pack(">II", 120, 80) + bytes([8, 6, 0, 0, 0])
    png = (b"\x89PNG\r\n\x1a\n"
           + struct.pack(">I", 13) + b"IHDR" + ihdr
           + struct.pack(">I", _z.crc32(b"IHDR" + ihdr)))
    m = probe_image_header(png)
    assert m == {"format": "png", "width": 120, "height": 80,
                 "channels": 4}

    # minimal JPEG: SOI + APP0 + DQT + SOF0 (64x48, 3 comps)
    sof = (b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
           + struct.pack(">HH", 48, 64) + b"\x03"
           + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01")
    jpeg = (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
            + b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x00" * 64
            + sof + b"\xff\xda" + struct.pack(">H", 2))
    m2 = probe_image_header(jpeg)
    assert m2 == {"format": "jpeg", "width": 64, "height": 48,
                  "channels": 3}

    # PNM P6 reuses the decode header rule
    m3 = probe_image_header(b"P6\n3 2\n255\n" + b"\x00" * 18)
    assert (m3["format"], m3["width"], m3["height"]) == ("pnm", 3, 2)

    # garbage and truncation keep rows with unknown format
    assert probe_image_header(b"nope")["format"] == "unknown"
    assert probe_image_header(png[:20])["format"] == "unknown"
    assert probe_image_header(b"\xff\xd8\xff\xda\x00\x02")["format"] \
        == "unknown"

    # dataset-level pass
    ds = _rd.from_items([
        {"doc_id": "a", "payload": png},
        {"doc_id": "b", "payload": jpeg},
        {"doc_id": "c", "payload": b"junk"},
    ])
    out = image_header_stats(ds).to_pandas()
    got = {r.doc_id: (r.format, r.width, r.height, r.pixels)
           for r in out.itertuples()}
    assert got == {"a": ("png", 120, 80, 9600),
                   "b": ("jpeg", 64, 48, 3072),
                   "c": ("unknown", -1, -1, -1)}


def test_png_decode_all_filters_and_color_types():
    """decode_png is a REAL pixel decoder (stdlib zlib inflate +
    per-scanline unfilter): encode->decode round-trips exactly; each
    filter type (None/Sub/Up/Average/Paeth) unfilters to the same
    pixels; palette, grayscale, gray+alpha and RGBA color types all
    resolve to (h, w, 3); malformed payloads raise ValueError."""
    import zlib

    import numpy as np

    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        _PNG_MAGIC,
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (len(data).to_bytes(4, "big") + typ + data
                + zlib.crc32(typ + data).to_bytes(4, "big"))

    def build(color_type, channels, pixels, filters, extra=b""):
        h, w = pixels.shape[0], pixels.shape[1]
        ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                + bytes([8, color_type, 0, 0, 0]))
        # apply each requested filter FORWARD per the spec, so decode
        # must invert it to recover `pixels` exactly
        flat = pixels.reshape(h, w * channels).astype(np.int64)
        bpp = channels
        rows = []
        prev = np.zeros(w * channels, dtype=np.int64)
        for y, f in enumerate(filters):
            cur = flat[y]
            if f == 0:
                filt = cur
            elif f == 1:
                left = np.concatenate([np.zeros(bpp, np.int64),
                                       cur[:-bpp]])
                filt = (cur - left) % 256
            elif f == 2:
                filt = (cur - prev) % 256
            elif f == 3:
                left = np.concatenate([np.zeros(bpp, np.int64),
                                       cur[:-bpp]])
                filt = (cur - (left + prev) // 2) % 256
            else:  # paeth
                left = np.concatenate([np.zeros(bpp, np.int64),
                                       cur[:-bpp]])
                upleft = np.concatenate([np.zeros(bpp, np.int64),
                                         prev[:-bpp]])
                pred = np.zeros_like(cur)
                for x in range(len(cur)):
                    a, b, c = int(left[x]), int(prev[x]), int(upleft[x])
                    p = a + b - c
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred[x] = a if (pa_ <= pb and pa_ <= pc_) else (
                        b if pb <= pc_ else c)
                filt = (cur - pred) % 256
            rows.append(bytes([f]) + bytes(filt.astype(np.uint8)))
            prev = cur
        raw = b"".join(rows)
        return (_PNG_MAGIC + chunk(b"IHDR", ihdr) + extra
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b""))

    # every filter type on an RGB image
    rgb = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    payload = build(2, 3, rgb, filters=[0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(payload), rgb)

    # grayscale -> 3 identical channels
    gray = rng.integers(0, 256, size=(4, 3, 1), dtype=np.uint8)
    out = decode_png(build(0, 1, gray, filters=[0, 1, 2, 4]))
    assert np.array_equal(out, np.repeat(gray, 3, axis=2))

    # gray+alpha drops alpha
    ga = rng.integers(0, 256, size=(3, 3, 2), dtype=np.uint8)
    out = decode_png(build(4, 2, ga, filters=[3, 4, 1]))
    assert np.array_equal(out, np.repeat(ga[:, :, :1], 3, axis=2))

    # RGBA drops alpha
    rgba = rng.integers(0, 256, size=(3, 4, 4), dtype=np.uint8)
    out = decode_png(build(6, 4, rgba, filters=[4, 2, 3]))
    assert np.array_equal(out, rgba[:, :, :3])

    # palette resolves through PLTE
    plte = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(4, 4, 1), dtype=np.uint8)
    payload = build(3, 1, idx, filters=[0, 1, 2, 4],
                    extra=chunk(b"PLTE", plte.tobytes()))
    assert np.array_equal(decode_png(payload), plte[idx[:, :, 0]])

    # error paths: truncation, bad magic, interlace, 16-bit, missing
    # PLTE, corrupt IDAT
    good = encode_png(img)
    for bad in (good[:40], b"\x89PNGxxxx" + good[8:],
                build(3, 1, idx, filters=[0, 0, 0, 0])):
        try:
            decode_png(bad)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass
    ihdr16 = (good[:24] + bytes([16]) + good[25:29]
              + zlib.crc32(good[12:25] + bytes([16])
                           + good[26:29]).to_bytes(4, "big"))
    # simpler: flip depth byte and expect a loud failure of some kind
    try:
        decode_png(ihdr16)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_png_stage_routing_checkerboard(ray_session):
    """RawImageStage routes PNG payloads by magic (no width/height
    metadata needed): a checkerboard fixture decodes pixel-exact with
    the analytically-known channel means; truncated PNGs keep their
    row with decode_status."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        encode_png,
        raw_media_features,
    )

    # 8x8 checkerboard: black / solid (200, 100, 50) -> channel means
    # are exactly half the solid color
    board = np.zeros((8, 8, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:8, 0:8]
    board[(yy + xx) % 2 == 1] = (200, 100, 50)
    png = encode_png(board)

    media = ray.data.from_arrow(pa.table({
        "media_ref": ["png", "trunc"],
        "payload": [png, png[: len(png) // 2]],
        "width": [0, 0],
        "height": [0, 0],
    }))
    tbl = pa.concat_tables(list(
        raw_media_features(media, out_w=2, out_h=2, concurrency=1)
        .iter_batches(batch_size=64, batch_format="pyarrow")))
    out = tbl.to_pandas().set_index("media_ref")
    assert out.loc["png", "decode_status"] == "ok"
    assert np.allclose(np.asarray(out.loc["png", "feature"])[:3],
                       [100.0, 50.0, 25.0])
    # exact 4x4-block means of the checkerboard = channel mean too
    resized = np.frombuffer(out.loc["png", "resized_payload"],
                            dtype=np.uint8).reshape(2, 2, 3)
    assert (resized == np.array([100, 50, 25], np.uint8)).all()
    assert out.loc["trunc", "decode_status"].startswith("decode_error")


def test_g711_anchor_values_and_roundtrip():
    """ITU-T G.711 decode anchors (the published table extremes) and the
    code-space roundtrip: every segment midpoint re-encodes to itself."""
    import numpy as np

    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        _g711_table, g711_encode)

    u = _g711_table("ulaw")
    assert u[0x00] == -32124 and u[0x80] == 32124
    assert u[0xFF] == 0 and u[0x7F] == 0
    a = _g711_table("alaw")
    assert a[0x55] == -8 and a[0xD5] == 8
    assert a[0xAA] == 32256 and a[0x2A] == -32256
    for law in ("ulaw", "alaw"):
        codes = np.arange(256, dtype=np.uint8)
        dec = _g711_table(law)[codes]
        enc = g711_encode(dec, law)
        if law == "ulaw":
            # u-law negative zero (0x7F) decodes to 0, which re-encodes
            # as positive zero (0xFF) — the one inherent +-0 collision
            expect = codes.copy()
            expect[0x7F] = 0xFF
        else:
            expect = codes
        assert np.array_equal(enc, expect)


def test_g711_encode_monotone_and_bounded_error():
    import numpy as np

    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        _g711_table, g711_encode)

    x = np.linspace(-32768, 32767, 4001).astype(np.int16)
    for law in ("ulaw", "alaw"):
        y = _g711_table(law)[g711_encode(x, law)].astype(np.int64)
        # companded quantization error bounded by half the top segment
        # step (1024 for A-law/u-law 16-bit mapping)
        assert np.abs(y - x).max() <= 1024
        # decoded values are non-decreasing in the input
        assert (np.diff(y) >= 0).all()


def test_ima_adpcm_roundtrip_mono_and_stereo():
    """Encoder and decoder share the reconstruction recurrence, so a
    sine survives the 4-bit coding with high SNR; block headers carry
    the first sample exactly."""
    import numpy as np

    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        decode_ima_adpcm, decode_wav, encode_wav)

    rate, n = 8000, 4093  # non-multiple of samples-per-block: pad path
    t = np.arange(n) / rate
    left = (0.7 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)

    payload = encode_wav(left, rate, fmt="ima_adpcm", block_align=256)
    x, r = decode_wav(payload)
    assert r == rate and x.shape[1] == 1
    got = (x[:n, 0] * 32768.0).astype(np.int64)
    err = got - left.astype(np.int64)
    snr = 10 * np.log10((left.astype(np.int64) ** 2).mean()
                        / max((err ** 2).mean(), 1e-9))
    assert snr > 25.0
    # header sample of block 0 is exact
    assert got[0] == left[0]

    right = (0.5 * np.cos(2 * np.pi * 220 * t) * 32767).astype(np.int16)
    st = np.stack([left, right], axis=1)
    payload2 = encode_wav(st, rate, fmt="ima_adpcm", block_align=256)
    x2, _ = decode_wav(payload2)
    assert x2.shape[1] == 2
    for c, ref in ((0, left), (1, right)):
        gotc = (x2[:n, c] * 32768.0).astype(np.int64)
        errc = gotc - ref.astype(np.int64)
        snrc = 10 * np.log10((ref.astype(np.int64) ** 2).mean()
                             / max((errc ** 2).mean(), 1e-9))
        assert snrc > 25.0, (c, snrc)

    # malformed: bad step index / bad block align raise (row-keeping is
    # the stage's job)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        decode_ima_adpcm(b"\x00\x00\xff\x00" + b"\x00" * 252, 1, 256)
    with _pytest.raises(ValueError):
        decode_ima_adpcm(b"\x00" * 256, 1, 7)


def test_decode_wav_g711_payloads_and_float32():
    import struct

    import numpy as np

    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        _g711_table, decode_wav, encode_wav)

    rate = 8000
    t = np.arange(800) / rate
    x = (0.6 * np.sin(2 * np.pi * 300 * t) * 32767).astype(np.int16)
    for law in ("ulaw", "alaw"):
        payload = encode_wav(x, rate, fmt=law)
        y, r = decode_wav(payload)
        assert r == rate and y.shape == (800, 1)
        err = y[:, 0] - x.astype(np.float64) / 32768.0
        assert np.abs(err).max() < 0.04  # companding error bound
        # exact vs the table composition
        from gliner_transbronchialbiopsy_ray.stages.multimodal import (
            g711_encode)
        expect = _g711_table(law)[g711_encode(x, law)] / 32768.0
        assert np.allclose(y[:, 0], expect)

    # IEEE float32 (format tag 3)
    f = (0.25 * np.sin(2 * np.pi * 100 * t)).astype("<f4")
    fmt_chunk = struct.pack("<HHIIHH", 3, 1, rate, rate * 4, 4, 32)
    body = (b"fmt " + struct.pack("<I", 16) + fmt_chunk
            + b"data" + struct.pack("<I", len(f.tobytes()))
            + f.tobytes())
    payload = (b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE"
               + body)
    y, r = decode_wav(payload)
    assert np.allclose(y[:, 0], f)

    # error messages stay wave-module-compatible (golden hashes pin them)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not a WAVE file"):
        decode_wav(b"RIFFgarbage-not-a-wave")
    with _pytest.raises(ValueError, match="does not start with RIFF id"):
        decode_wav(b"nope")
    with _pytest.raises(ValueError, match="unsupported WAVE format tag"):
        bad_fmt = struct.pack("<HHIIHH", 0x0055, 1, rate, rate, 1, 8)
        chunk = (b"fmt " + struct.pack("<I", 16) + bad_fmt
                 + b"data" + struct.pack("<I", 0))
        decode_wav(b"RIFF" + struct.pack("<I", 4 + len(chunk))
                   + b"WAVE" + chunk)


def test_decode_wav_pcm_matches_stdlib_writer():
    """Own RIFF parser reproduces the stdlib-wave PCM path exactly (the
    btb_raw_audio golden depends on it)."""
    import io
    import wave

    import numpy as np

    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        decode_wav)

    rate = 8000
    t = np.arange(160) / rate
    x16 = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2); w.setsampwidth(2); w.setframerate(rate)
        w.writeframes(np.stack([x16, x16 // 2], axis=1).tobytes())
    y, r = decode_wav(buf.getvalue())
    assert r == rate and y.shape == (160, 2)
    assert np.allclose(y[:, 0], x16 / 32768.0)
    assert np.allclose(y[:, 1], (x16 // 2) / 32768.0)


def _make_mp4() -> tuple[bytes, list[bytes]]:
    """Minimal ISO-BMFF file with one video track: 6 coded samples of
    known bytes split 2+4 across two chunks (exercising stsc run
    expansion).  Returns (payload, sample_bytes)."""
    import struct

    def box(fourcc: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + fourcc + body

    samples = [bytes([i]) * (3 + i) for i in range(6)]
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isomavc1")
    mdat_body = b"".join(samples)
    mdat = box(b"mdat", mdat_body)
    base = len(ftyp) + 8  # mdat body file offset
    chunk_offs = [base, base + len(samples[0]) + len(samples[1])]

    entry = (struct.pack(">I", 86) + b"avc1" + bytes(6)
             + struct.pack(">H", 1) + bytes(16)
             + struct.pack(">HH", 64, 48) + bytes(50))
    stsd = box(b"stsd", struct.pack(">II", 0, 1) + entry)
    stsz = box(b"stsz", struct.pack(">III", 0, 0, 6)
               + b"".join(struct.pack(">I", len(s)) for s in samples))
    stsc = box(b"stsc", struct.pack(">II", 0, 2)
               + struct.pack(">III", 1, 2, 1)
               + struct.pack(">III", 2, 4, 1))
    stco = box(b"stco", struct.pack(">II", 0, 2)
               + b"".join(struct.pack(">I", o) for o in chunk_offs))
    stbl = box(b"stbl", stsd + stsz + stsc + stco)
    minf = box(b"minf", stbl)
    hdlr = box(b"hdlr", struct.pack(">II", 0, 0) + b"vide" + bytes(13))
    mdhd = box(b"mdhd", struct.pack(">IIIII", 0, 0, 0, 1000, 2500))
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", mdia)
    mvhd = box(b"mvhd", struct.pack(">IIIII", 0, 0, 0, 600, 1500)
               + bytes(80))
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov, samples


def test_mp4_probe_and_sample_table():
    import numpy as np

    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        mp4_sample_table, probe_mp4)

    payload, samples = _make_mp4()
    meta = probe_mp4(payload)
    assert meta["brand"] == "isom"
    assert meta["duration_s"] == 2.5
    t = meta["tracks"][0]
    assert t["handler"] == "vide" and t["codec"] == "avc1"
    assert (t["width"], t["height"]) == (64, 48)
    assert t["sample_count"] == 6 and t["timescale"] == 1000

    offsets, sizes = mp4_sample_table(payload)
    assert sizes.tolist() == [len(s) for s in samples]
    for off, sz, want in zip(offsets, sizes, samples):
        assert payload[off:off + sz] == want

    import pytest as _pytest
    with _pytest.raises(ValueError, match="not an ISO-BMFF"):
        probe_mp4(b"garbage")
    with _pytest.raises(ValueError, match="missing moov"):
        probe_mp4(payload[:24])  # ftyp only (box-aligned truncation)
    with _pytest.raises(ValueError, match="bad box size"):
        probe_mp4(payload[:40])  # truncation mid-box fails loudly
    with _pytest.raises(ValueError):
        mp4_sample_table(payload, track=3)
    assert isinstance(offsets, np.ndarray)


def test_mp4_sample_extractor_stage(ray_session):
    import zlib

    import pyarrow as pa
    import ray.data as rd

    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        mp4_sample_features)

    payload, samples = _make_mp4()
    media = rd.from_arrow(pa.table({
        "media_ref": pa.array(["mp4://ok", "mp4://bad"]),
        "payload": pa.array([payload, b"not-an-mp4-at-all"],
                            type=pa.binary()),
    }))
    out = (mp4_sample_features(media, n_samples=3, concurrency=1)
           .to_pandas().sort_values(["media_ref", "sample_idx"])
           .reset_index(drop=True))
    ok = out[out["media_ref"] == "mp4://ok"]
    # 3 evenly-spaced picks over 6 samples -> indices 0, 2, 5
    assert ok["sample_idx"].tolist() == [0, 2, 5]
    assert ok["codec"].unique().tolist() == ["avc1"]
    for _, r in ok.iterrows():
        assert r["crc32"] == zlib.crc32(samples[r["sample_idx"]])
    bad = out[out["media_ref"] == "mp4://bad"]
    assert len(bad) == 1
    assert bad.iloc[0]["demux_status"].startswith("demux_error")


def _mp3_header(version="1", layer=3, br_idx=9, sr_idx=0, pad=0,
                mode=0, prot=1) -> bytes:
    ver_bits = {"1": 3, "2": 2, "2.5": 0}[version]
    layer_bits = {1: 3, 2: 2, 3: 1}[layer]
    h = ((0x7FF << 21) | (ver_bits << 19) | (layer_bits << 17)
         | (prot << 16) | (br_idx << 12) | (sr_idx << 10) | (pad << 9)
         | (mode << 6))
    return h.to_bytes(4, "big")


def _mp3_frames(specs, version="1", layer=3, sr_idx=0, mode=0,
                fill=0x41) -> tuple[bytes, list[int], list[int]]:
    """specs = [(br_idx, pad), ...] -> (stream, offsets, sizes) built
    independently of the library (own copy of the ISO frame-size
    formula)."""
    l1 = {"1": (0, 32, 64, 96, 128, 160, 192, 224, 256,
                288, 320, 352, 384, 416, 448),
          "2": (0, 32, 48, 56, 64, 80, 96, 112, 128,
                144, 160, 176, 192, 224, 256)}
    l3 = {"1": (0, 32, 40, 48, 56, 64, 80, 96, 112,
                128, 160, 192, 224, 256, 320),
          "2": (0, 8, 16, 24, 32, 40, 48, 56, 64,
                80, 96, 112, 128, 144, 160)}
    l2 = {"1": (0, 32, 48, 56, 64, 80, 96, 112, 128,
                160, 192, 224, 256, 320, 384),
          "2": l3["2"]}
    rates = {"1": (44100, 48000, 32000), "2": (22050, 24000, 16000),
             "2.5": (11025, 12000, 8000)}
    grp = "1" if version == "1" else "2"
    table = {1: l1, 2: l2, 3: l3}[layer][grp]
    rate = rates[version][sr_idx]
    out, offs, sizes = bytearray(), [], []
    for i, (br_idx, pad) in enumerate(specs):
        br = table[br_idx] * 1000
        if layer == 1:
            size = (12 * br // rate + pad) * 4
        else:
            spf = 576 if (layer == 3 and version != "1") else 1152
            size = spf // 8 * br // rate + pad
        offs.append(len(out))
        sizes.append(size)
        hdr = _mp3_header(version, layer, br_idx, sr_idx, pad, mode)
        body = bytes([(fill + i) % 256]) * (size - 4)
        out += hdr + body
    return bytes(out), offs, sizes


def test_mp3_header_and_frame_table():
    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        _mp3_parse_header, mp3_frame_table, probe_mp3)

    # MPEG1 Layer III 128 kbps 44100 stereo: 144*128000//44100 = 417
    h = _mp3_parse_header(_mp3_header(br_idx=9) + b"\x00" * 4, 0)
    assert h["frame_size"] == 417 and h["bitrate_kbps"] == 128
    assert h["sample_rate"] == 44100 and h["samples_per_frame"] == 1152
    # Layer I slot math: MPEG1 L1 br_idx 1 = 32 kbps @ 44100 ->
    # (12*32000//44100 + 1) * 4 = 36 with padding
    h = _mp3_parse_header(
        _mp3_header(layer=1, br_idx=1, pad=1) + b"\x00" * 32, 0)
    assert h["frame_size"] == (12 * 32000 // 44100 + 1) * 4
    # MPEG2 Layer III: 576 samples -> 72*br//sr
    h = _mp3_parse_header(
        _mp3_header(version="2", br_idx=4, sr_idx=1) + b"\x00" * 8, 0)
    assert h["samples_per_frame"] == 576
    assert h["frame_size"] == 72 * 32000 // 24000

    # VBR stream: frame table reproduces construction offsets exactly
    specs = [(9, 0), (11, 1), (5, 0), (14, 1), (9, 0)]
    stream, offs, sizes = _mp3_frames(specs)
    o, s, b = mp3_frame_table(stream)
    assert o.tolist() == offs and s.tolist() == sizes
    assert b.tolist() == [128, 192, 64, 320, 128]
    meta = probe_mp3(stream)
    assert meta["vbr"] and meta["n_frames"] == 5
    assert meta["n_samples"] == 5 * 1152
    assert meta["duration_s"] == round(5 * 1152 / 44100, 3)

    # ID3v2 with syncsafe size + trailing ID3v1 both handled
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 1, 5]) + b"x" * 133
    tagged = id3 + stream + b"TAG" + b"\x00" * 125
    o2, _, _ = mp3_frame_table(tagged)
    assert o2.tolist() == [x + len(id3) for x in offs]
    assert probe_mp3(tagged)["id3v2_bytes"] == len(id3)


def test_mp3_xing_and_error_paths():
    import pytest as _pt

    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        mp3_frame_table, probe_mp3)

    # mono MPEG1 L3: side info 17 bytes; Xing at 4+17
    stream, offs, sizes = _mp3_frames([(9, 0), (9, 0)], mode=3)
    body = bytearray(stream)
    p = 4 + 17
    body[p:p + 4] = b"Xing"
    body[p + 4:p + 8] = (0x3).to_bytes(4, "big")
    body[p + 8:p + 12] = (2).to_bytes(4, "big")
    body[p + 12:p + 16] = len(stream).to_bytes(4, "big")
    meta = probe_mp3(bytes(body))
    assert meta["xing"] == {"tag": "Xing", "flags": 3, "frames": 2,
                            "bytes": len(stream)}
    assert meta["channels"] == 1 and meta["mode"] == "mono"

    with _pt.raises(ValueError, match="sync lost"):
        mp3_frame_table(b"\x00\x01" * 40)
    with _pt.raises(ValueError, match="truncated"):
        mp3_frame_table(stream[:-10])
    with _pt.raises(ValueError, match="free-format"):
        mp3_frame_table(_mp3_header(br_idx=0) + b"\x00" * 100)
    # version flips mid-stream -> loud failure
    s1, _, _ = _mp3_frames([(9, 0)])
    s2, _, _ = _mp3_frames([(4, 0)], version="2", sr_idx=1)
    with _pt.raises(ValueError, match="changed mid-stream"):
        mp3_frame_table(s1 + s2)


def test_mp3_frame_extractor_stage(ray_session):
    import zlib

    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        mp3_frame_features)

    stream, offs, sizes = _mp3_frames(
        [(9, 0), (11, 1), (5, 0), (14, 1), (9, 0), (3, 0)])
    media = ray.data.from_arrow(pa.table({
        "media_ref": pa.array(["mp3://ok", "mp3://bad"]),
        "payload": pa.array([stream, b"not-audio-at-all"],
                            type=pa.binary()),
    }))
    out = (mp3_frame_features(media, n_frames=3, concurrency=1)
           .to_pandas().sort_values(["media_ref", "frame_idx"]))
    ok = out[out["media_ref"] == "mp3://ok"]
    assert ok["frame_idx"].tolist() == [0, 2, 5]  # evenly spaced picks
    for _, r in ok.iterrows():
        blob = stream[r["offset"]:r["offset"] + r["size"]]
        assert zlib.crc32(blob) == r["crc32"]
        assert r["sample_rate"] == 44100
    bad = out[out["media_ref"] == "mp3://bad"]
    assert len(bad) == 1
    assert bad["demux_status"].iloc[0].startswith("demux_error")


def test_png_adam7_interlaced_decode():
    """Adam7: the test builds the 7-pass interlaced stream
    independently (pass grid from the PNG spec, mixed filter types per
    pass) and decode_png must reassemble the original pixels exactly —
    including non-multiple-of-8 dimensions where late passes dominate
    and early passes are tiny."""
    import zlib

    import numpy as np

    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        _PNG_MAGIC, decode_png)

    grid = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (len(data).to_bytes(4, "big") + typ + data
                + zlib.crc32(typ + data).to_bytes(4, "big"))

    def build_interlaced(img: np.ndarray) -> bytes:
        h, w, ch = img.shape
        raw = bytearray()
        for pi, (x0, y0, dx, dy) in enumerate(grid):
            sub = img[y0::dy, x0::dx]
            hp, wp = sub.shape[0], sub.shape[1]
            if hp == 0 or wp == 0:
                continue
            flat = sub.reshape(hp, wp * ch).astype(np.int64)
            prev = np.zeros(wp * ch, dtype=np.int64)
            for y in range(hp):
                cur = flat[y]
                if pi % 2 == 0:  # alternate None / Up filters
                    raw += bytes([0]) + bytes((cur % 256).astype(
                        np.uint8))
                else:
                    raw += bytes([2]) + bytes(
                        ((cur - prev) % 256).astype(np.uint8))
                prev = cur
        ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                + bytes([8, 2, 0, 0, 1]))  # RGB, interlace=1
        return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b""))

    rng = np.random.default_rng(23)
    for shape in ((13, 11), (8, 8), (3, 2), (1, 9)):
        img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(build_interlaced(img)), img), \
            shape

    # truncated interlaced stream fails loudly
    img = rng.integers(0, 256, size=(13, 11, 3), dtype=np.uint8)
    good = build_interlaced(img)
    raw_full = zlib.decompress(good[good.index(b"IDAT") + 4:
                                    good.rindex(b"IEND") - 8])
    bad = (_PNG_MAGIC
           + chunk(b"IHDR", (11).to_bytes(4, "big")
                   + (13).to_bytes(4, "big") + bytes([8, 2, 0, 0, 1]))
           + chunk(b"IDAT", zlib.compress(raw_full[:-5]))
           + chunk(b"IEND", b""))
    import pytest as _pt
    with _pt.raises(ValueError):
        decode_png(bad)


def test_gif_lzw_roundtrip_and_interlace():
    """encode_gif is a real LZW compressor and decode_gif its exact
    inverse: plain + interlaced, palette sizes from 2 colors up to 256
    (the 256-color case grows the code width to 12 bits and forces a
    mid-stream CLEAR reset), odd heights for the 4-pass interlace map."""
    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        decode_gif, encode_gif,
    )

    rng = np.random.RandomState(7)
    img = (rng.randint(0, 4, size=(8, 8, 3)) * 60).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif(img)), img)
    assert np.array_equal(decode_gif(encode_gif(img, interlace=True)),
                          img)
    big = rng.randint(0, 256, size=(100, 123)).astype(np.uint8)
    big3 = np.stack([big, big // 2, 255 - big], axis=2)
    for inter in (False, True):
        assert np.array_equal(
            decode_gif(encode_gif(big3, interlace=inter)), big3)
    for h in (1, 2, 3, 5, 9, 17):
        im = (rng.randint(0, 5, size=(h, 7, 3)) * 40).astype(np.uint8)
        assert np.array_equal(
            decode_gif(encode_gif(im, interlace=True)), im), h


def test_gif_decoder_independent_streams():
    """decode_gif against HAND-BUILT GIF byte streams (not produced by
    encode_gif): per-pixel CLEAR codes, an uncompressed root-only
    stream tracking the decoder's table-growth rule, and a local color
    table overriding the global one — decoder independence from our own
    compressor's coding choices."""
    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        decode_gif,
    )

    def pack_lsb(codes_sizes):
        acc = nbits = 0
        out = bytearray()
        for code, size in codes_sizes:
            acc |= code << nbits
            nbits += size
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)

    def wrap(w, h, pal, lzw, min_code=2, lct=None, interlace=False):
        out = bytearray(b"GIF89a")
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        bits = max(2, (len(pal) - 1).bit_length())
        out += bytes([0x80 | (bits - 1), 0, 0])
        full = np.zeros((1 << bits, 3), dtype=np.uint8)
        full[:len(pal)] = pal
        out += full.tobytes()
        # a skippable comment extension before the image
        out += b"\x21\xfe\x02hi\x00"
        out += b"\x2c" + bytes(4)
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        ip = 0x40 if interlace else 0
        if lct is not None:
            lbits = max(2, (len(lct) - 1).bit_length())
            ip |= 0x80 | (lbits - 1)
            out += bytes([ip, min_code])
            lfull = np.zeros((1 << lbits, 3), dtype=np.uint8)
            lfull[:len(lct)] = lct
            out = out[:-1]  # min_code goes after the LCT
            out += lfull.tobytes() + bytes([min_code])
        else:
            out += bytes([ip, min_code])
        for i in range(0, len(lzw), 255):
            chunk_ = lzw[i:i + 255]
            out += bytes([len(chunk_)]) + chunk_
        out += b"\x00\x3b"
        return bytes(out)

    pal = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250],
                    [9, 9, 9]], dtype=np.uint8)
    # per-pixel CLEAR codes: CLEAR,0,CLEAR,1,CLEAR,2,CLEAR,3,END @3bit
    lzw = pack_lsb([(c, 3) for c in (4, 0, 4, 1, 4, 2, 4, 3, 5)])
    got = decode_gif(wrap(2, 2, pal, lzw))
    assert np.array_equal(got, pal[np.array([[0, 1], [2, 3]])])

    # root-only "uncompressed" stream: the WRITER must mirror the
    # decoder's growth rule (table len hits 2^size -> size += 1)
    rng = np.random.RandomState(3)
    idx = rng.randint(0, 4, size=30)
    codes, size, table_len = [(4, 3)], 3, 6
    for v in idx:
        codes.append((int(v), size))
        table_len += 1  # decoder appends one entry per code after the 1st
        if table_len == (1 << size):
            size += 1
    # first code after CLEAR does not append -> writer over-counted by
    # one, which only matters if a growth landed exactly there; rebuild
    # precisely instead:
    codes, size, table_len, first = [(4, 3)], 3, 6, True
    for v in idx:
        codes.append((int(v), size))
        if first:
            first = False
        else:
            table_len += 1
            if table_len == (1 << size) and size < 12:
                size += 1
    codes.append((5, size))
    got = decode_gif(wrap(6, 5, pal, pack_lsb(codes)))
    assert np.array_equal(got, pal[idx.reshape(5, 6)])

    # local color table overrides the global one
    lct = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9],
                    [10, 11, 12]], dtype=np.uint8)
    lzw = pack_lsb([(c, 3) for c in (4, 0, 4, 1, 4, 2, 4, 3, 5)])
    got = decode_gif(wrap(2, 2, pal, lzw, lct=lct))
    assert np.array_equal(got, lct[np.array([[0, 1], [2, 3]])])

    # malformed payloads raise (stage keeps the row)
    import pytest as _pt
    for bad in (b"GIF89a\x00\x00", wrap(2, 2, pal, lzw)[:18],
                b"NOTGIF" + bytes(20)):
        with _pt.raises(ValueError):
            decode_gif(bad)
    # truncated LZW: claim 4x4 but provide the 2x2 stream
    with _pt.raises(ValueError):
        decode_gif(wrap(4, 4, pal, lzw))


def test_bmp_decode_roundtrip_rle8_and_errors():
    """decode_bmp: 24-bit BI_RGB (bottom-up + top-down + non-trivial
    row padding), palette BI_RLE8 (runs, EOL, EOB), exact roundtrip
    with encode_bmp; malformed payloads raise ValueError."""
    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        decode_bmp, encode_bmp,
    )

    rng = np.random.RandomState(11)
    for td in (False, True):
        for shape in ((7, 5), (8, 8), (3, 13), (1, 1)):
            im = rng.randint(0, 256, size=(*shape, 3)).astype(np.uint8)
            assert np.array_equal(
                decode_bmp(encode_bmp(im, top_down=td)), im), (td, shape)
        im4 = (rng.randint(0, 4, size=(9, 6)) * 70).astype(np.uint8)
        im4 = np.stack([im4, im4 // 2, 255 - im4], axis=2)
        assert np.array_equal(
            decode_bmp(encode_bmp(im4, rle8=True, top_down=td)), im4)

    # hand-built RLE8 stream with absolute mode + delta escape
    pal_bytes = bytes([10, 20, 30, 0, 40, 50, 60, 0])  # BGRX x2
    body = bytes([
        3, 0,             # run: 3 x index0
        0, 3, 1, 0, 1, 0,  # absolute: 3 literals (1,0,1) + pad byte
        0, 0,             # end of line
        0, 2, 2, 0,       # delta: skip 2 right on row 1
        2, 1,             # run: 2 x index1
        0, 1,             # end of bitmap
    ])
    pix_off = 14 + 40 + len(pal_bytes)
    hdr = bytearray(b"BM")
    hdr += (pix_off + len(body)).to_bytes(4, "little") + bytes(4)
    hdr += pix_off.to_bytes(4, "little") + (40).to_bytes(4, "little")
    hdr += (6).to_bytes(4, "little", signed=True)
    hdr += (-2).to_bytes(4, "little", signed=True)  # top-down
    hdr += (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
    hdr += (1).to_bytes(4, "little") + len(body).to_bytes(4, "little")
    hdr += bytes(8) + (2).to_bytes(4, "little") + bytes(4)
    got = decode_bmp(bytes(hdr) + pal_bytes + body)
    pal = np.array([[30, 20, 10], [60, 50, 40]], dtype=np.uint8)
    exp_idx = np.array([[0, 0, 0, 1, 0, 1],
                        [0, 0, 1, 1, 0, 0]])
    exp = pal[exp_idx]
    exp[1, 4:] = 0  # delta-skipped pixels stay background (index 0 -> pal[0])
    exp[1, :2] = pal[0]
    assert np.array_equal(got, pal[np.array([[0, 0, 0, 1, 0, 1],
                                             [0, 0, 1, 1, 0, 0]])])

    import pytest as _pt
    ok = encode_bmp(rng.randint(0, 256, size=(4, 4, 3)).astype(np.uint8))
    for bad in (None, b"BM" + bytes(10), ok[:30], b"XX" + ok[2:]):
        with _pt.raises(ValueError):
            decode_bmp(bad)


def test_probe_image_header_gif_bmp():
    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        encode_bmp, encode_gif, probe_image_header,
    )

    rng = np.random.RandomState(5)
    img = (rng.randint(0, 4, size=(6, 11, 3)) * 50).astype(np.uint8)
    assert probe_image_header(encode_gif(img)) == {
        "format": "gif", "width": 11, "height": 6, "channels": 3}
    assert probe_image_header(encode_bmp(img)) == {
        "format": "bmp", "width": 11, "height": 6, "channels": 3}
    m = probe_image_header(encode_bmp(img, rle8=True, top_down=True))
    assert (m["format"], m["width"], m["height"], m["channels"]) == \
        ("bmp", 11, 6, 1)
    assert probe_image_header(b"GIF89a\x00")["format"] == "unknown"
    assert probe_image_header(b"BM" + bytes(20))["format"] == "unknown"


def test_tiff_roundtrip_all_variants():
    """decode_tiff/encode_tiff: both byte orders, none/PackBits/LZW
    (MSB-first, early code-width change, 4094 reset), horizontal
    predictor, grayscale, palette via hand-built bytes, multi-strip."""
    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        _tiff_lzw_decode, _tiff_lzw_encode, decode_tiff, encode_tiff,
    )

    rng = np.random.RandomState(42)
    # big random stream crosses the 511/1023/2047 width boundaries and
    # the 4094 table reset
    data = rng.randint(0, 256, size=60000).astype(np.uint8).tobytes()
    assert _tiff_lzw_decode(_tiff_lzw_encode(data), len(data)) == data

    for be in (False, True):
        for comp in ("none", "packbits", "lzw"):
            for pred in (False, True):
                img = rng.randint(0, 256, size=(11, 6, 3)).astype(np.uint8)
                enc = encode_tiff(img, compression=comp, predictor=pred,
                                  big_endian=be)
                assert np.array_equal(decode_tiff(enc), img), \
                    (be, comp, pred)
    img = rng.randint(0, 256, size=(33, 20, 3)).astype(np.uint8)
    enc = encode_tiff(img, compression="lzw", predictor=True,
                      rows_per_strip=8)
    assert np.array_equal(decode_tiff(enc), img)

    g = np.repeat(rng.randint(0, 256, size=(5, 4, 1)).astype(np.uint8),
                  3, axis=2)
    assert np.array_equal(decode_tiff(encode_tiff(g, gray=True)), g)

    import pytest as _pt
    ok = encode_tiff(img)
    for bad in (None, b"II*\x00", ok[:40], b"XXXX" + ok[4:]):
        with _pt.raises(ValueError):
            decode_tiff(bad)


def test_tiff_decoder_independent_fixture():
    """decode_tiff against HAND-BUILT TIFF bytes (not from
    encode_tiff): a 2x1 uncompressed RGB II file with the strip before
    the IFD, and a 2x2 palette (photometric 3) file with a 16-bit
    colormap — layouts our encoder never produces."""
    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        decode_tiff,
    )

    def entry(tag, typ, cnt, val):
        sz = {3: 2, 4: 4}[typ]
        v = val.to_bytes(sz, "little") if isinstance(val, int) else val
        return (tag.to_bytes(2, "little") + typ.to_bytes(2, "little")
                + cnt.to_bytes(4, "little") + v + bytes(4 - len(v)))

    # strip data FIRST (offset 8), IFD after it
    strip = bytes([10, 20, 30, 40, 50, 60])  # 2x1 RGB
    ifd_off = 8 + len(strip)
    ents = [
        entry(256, 3, 1, 2), entry(257, 3, 1, 1),
        entry(258, 3, 3, (8).to_bytes(2, "little") * 2),  # inline 2 of 3
        entry(259, 3, 1, 1), entry(262, 3, 1, 2),
        entry(273, 4, 1, 8), entry(277, 3, 1, 3),
        entry(278, 3, 1, 1), entry(279, 4, 1, len(strip)),
    ]
    # 258 needs 3 shorts (6 bytes > 4): relocate after IFD
    bps_off = ifd_off + 2 + 12 * len(ents) + 4
    ents[2] = entry(258, 3, 3, bps_off)
    tiff = (b"II*\x00" + ifd_off.to_bytes(4, "little") + strip
            + len(ents).to_bytes(2, "little") + b"".join(ents)
            + bytes(4) + (8).to_bytes(2, "little") * 3)
    got = decode_tiff(tiff)
    assert np.array_equal(got, np.array([[[10, 20, 30], [40, 50, 60]]]))

    # palette file: indices 0..3, colormap value v maps to v*257//257=v
    idx = bytes([0, 1, 2, 3])
    cmap = []
    for plane in range(3):  # R,G,B planes of 256 shorts
        for i in range(256):
            cmap.append(((plane * 50 + i * 3) % 256) * 257)
    cmap_b = b"".join(v.to_bytes(2, "little") for v in cmap)
    ifd_off = 8 + len(idx)
    ents = [
        entry(256, 3, 1, 2), entry(257, 3, 1, 2),
        entry(258, 3, 1, 8), entry(259, 3, 1, 1),
        entry(262, 3, 1, 3), entry(273, 4, 1, 8),
        entry(277, 3, 1, 1), entry(278, 3, 1, 2),
        entry(279, 4, 1, len(idx)),
        entry(320, 3, 768, 0),  # offset patched below
    ]
    cmap_off = ifd_off + 2 + 12 * len(ents) + 4
    ents[-1] = entry(320, 3, 768, cmap_off)
    tiff2 = (b"II*\x00" + ifd_off.to_bytes(4, "little") + idx
             + len(ents).to_bytes(2, "little") + b"".join(ents)
             + bytes(4) + cmap_b)
    got2 = decode_tiff(tiff2)
    exp = np.zeros((2, 2, 3), dtype=np.uint8)
    for r in range(2):
        for c in range(2):
            i = idx[r * 2 + c]
            exp[r, c] = [(0 + i * 3) % 256, (50 + i * 3) % 256,
                         (100 + i * 3) % 256]
    assert np.array_equal(got2, exp)


def test_probe_image_header_tiff():
    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        encode_tiff, probe_image_header,
    )

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, size=(6, 11, 3)).astype(np.uint8)
    for be in (False, True):
        m = probe_image_header(encode_tiff(img, big_endian=be))
        assert m == {"format": "tiff", "width": 11, "height": 6,
                     "channels": 3}, m
    mg = probe_image_header(encode_tiff(img, gray=True))
    assert (mg["width"], mg["height"], mg["channels"]) == (11, 6, 1)
    assert probe_image_header(b"II*\x00\xff\xff\xff\xff")["format"] \
        == "unknown"


def test_image_perceptual_hash_invariance_and_pairs(ray_session):
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        _decode_image_any, encode_bmp, encode_gif, encode_jpeg,
        encode_png, encode_ppm, encode_tiff, image_ahash, image_dhash,
        image_phash_neardups)

    y, x = np.mgrid[0:72, 0:72]
    img = np.stack([((x // 18) * 60).astype(np.uint8),
                    ((y // 18) * 60).astype(np.uint8),
                    np.full((72, 72), 40, np.uint8)], axis=2)
    d0, a0 = image_dhash(img), image_ahash(img)
    # every real codec round-trip preserves both hashes exactly
    # (JPEG included: gradients survive quantization on smooth content)
    for enc in (encode_png, encode_gif, encode_bmp, encode_tiff,
                encode_ppm, encode_jpeg):
        dec = _decode_image_any(enc(img), None, None)
        assert image_dhash(dec) == d0
        assert image_ahash(dec) == a0
    # uniform brightness shift: dHash exact (gradients unchanged)
    sh = np.clip(img.astype(int) + 3, 0, 255).astype(np.uint8)
    assert image_dhash(sh) == d0
    # an unrelated image is far in hamming space
    rng = np.random.RandomState(0)
    other = rng.randint(0, 255, (72, 72, 3), dtype=np.uint8)
    assert bin(image_dhash(other) ^ d0).count("1") > 10

    # end-to-end: planted cluster pairs found, distinct not, errors kept
    media = rd.from_arrow(pa.table({
        "media_ref": pa.array(["a/png", "a/gif", "a/shift", "b/png",
                               "bad"], type=pa.string()),
        "payload": pa.array([encode_png(img), encode_gif(img),
                             encode_png(sh), encode_png(other),
                             b"junk"], type=pa.binary()),
        "width": pa.array([None] * 5, type=pa.int64()),
        "height": pa.array([None] * 5, type=pa.int64())}))
    sigs, pairs = image_phash_neardups(media, max_hamming=3)
    sdf = sigs.to_pandas().set_index("media_ref")
    assert sdf.loc["bad", "decode_status"].startswith("decode_error")
    got = {tuple(sorted((l, r))) for l, r in
           zip(pairs.to_pandas()["left_id"], pairs.to_pandas()["right_id"])}
    assert got == {("a/gif", "a/png"), ("a/png", "a/shift"),
                   ("a/gif", "a/shift")}


def test_audio_fingerprint_invariance_and_pairs(ray_session):
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        audio_energy_fingerprint, audio_fingerprint_neardups,
        decode_wav, encode_wav)

    rng = np.random.RandomState(5)
    W, n_per = 66, 200
    env = np.repeat(rng.uniform(0.08, 0.85, W), n_per)
    k = np.hanning(81)
    env = np.convolve(env, k / k.sum(), mode="same")
    t = np.arange(W * n_per) / 8000.0
    x = np.clip(env * (0.7 * np.sin(2 * np.pi * 330 * t)
                       + 0.3 * np.sin(2 * np.pi * 187 * t)), -0.99, 0.99)
    xi = (x * 32767).astype(np.int16)[:, None]
    f0 = audio_energy_fingerprint(xi.astype(np.float64) / 32768.0)
    # every real audio coding round-trips to the same fingerprint
    # (the decode_wav fact-chunk trim keeps ADPCM frame-aligned)
    for fmt in ("pcm16", "ulaw", "alaw", "ima_adpcm"):
        y, _ = decode_wav(encode_wav(xi, 8000, fmt=fmt))
        assert y.shape[0] == len(xi)
        assert audio_energy_fingerprint(y) == f0, fmt
    # uniform gain: energy ratios unchanged
    assert audio_energy_fingerprint(
        (xi * 0.25).astype(np.int16).astype(np.float64) / 32768.0) == f0
    # a different recording is far away
    other = rng.randn(len(xi), 1) * 0.3
    assert bin(audio_energy_fingerprint(other) ^ f0).count("1") > 10
    # too-short audio raises (stage keeps the row)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="too short"):
        audio_energy_fingerprint(np.zeros((100, 1)))

    # end-to-end pairs
    media = rd.from_arrow(pa.table({
        "media_ref": pa.array(["a/pcm", "a/ulaw", "b/pcm", "bad"],
                              type=pa.string()),
        "payload": pa.array([
            encode_wav(xi, 8000, fmt="pcm16"),
            encode_wav(xi, 8000, fmt="ulaw"),
            encode_wav((np.clip(other, -0.99, 0.99)
                        * 32767).astype(np.int16), 8000, fmt="pcm16"),
            b"RIFFjunk"], type=pa.binary())}))
    sigs, pairs = audio_fingerprint_neardups(media, max_hamming=3)
    sdf = sigs.to_pandas().set_index("media_ref")
    assert sdf.loc["bad", "decode_status"].startswith("decode_error")
    got = {tuple(sorted((l, r))) for l, r in zip(
        pairs.to_pandas()["left_id"], pairs.to_pandas()["right_id"])}
    assert got == {("a/pcm", "a/ulaw")}


def test_curate_media_clusters_canonicals_and_error_rows(ray_session):
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.pipelines.media import curate_media
    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        encode_gif, encode_png)

    y, x = np.mgrid[0:48, 0:48]
    img = np.stack([((x // 12) * 55).astype(np.uint8),
                    ((y // 12) * 45).astype(np.uint8),
                    np.full((48, 48), 80, np.uint8)], axis=2)
    rng = np.random.RandomState(1)
    other = rng.randint(0, 255, (48, 48, 3), dtype=np.uint8)
    media = rd.from_arrow(pa.table({
        "media_ref": pa.array(["a/png", "a/gif", "b/png", "bad"],
                              type=pa.string()),
        "payload": pa.array([encode_png(img), encode_gif(img),
                             encode_png(other), b"junk"],
                            type=pa.binary())}))
    out = (curate_media(media).to_pandas()
           .set_index("media_ref").sort_index())
    # cluster: a/png joins a/gif ('a/gif' is the lexicographic min ->
    # canonical); b is its own cluster
    assert out.loc["a/png", "cluster_id"] == "a/gif"
    assert out.loc["a/gif", "cluster_id"] == "a/gif"
    assert bool(out.loc["a/gif", "is_canonical"])
    assert not bool(out.loc["a/png", "is_canonical"])
    assert bool(out.loc["b/png", "is_canonical"])
    # features decoded ONLY for canonicals
    assert out.loc["a/gif", "mean_luma"] >= 0
    assert out.loc["a/png", "mean_luma"] == -1
    # error row kept, never canonical
    assert out.loc["bad", "decode_status"].startswith("decode_error")
    assert not bool(out.loc["bad", "is_canonical"])
    assert out.loc["bad", "probe_format"] == "unknown"


def test_curate_media_raw_rgb_features_via_metadata(ray_session):
    """ADVICE r3: a canonical row whose payload is headerless raw RGB
    must get REAL features via the width/height metadata columns (the
    hasher already used them), and a metadata-less raw row keeps its
    row with a feature_status flag instead of failing the pipeline."""
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.pipelines.media import curate_media
    from gliner_transbronchialbiopsy_ray.stages.multimodal import encode_png

    rng = np.random.RandomState(7)
    raw = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
    other = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
    media = rd.from_arrow(pa.table({
        "media_ref": pa.array(["raw/a", "png/b"], type=pa.string()),
        "payload": pa.array([raw.tobytes(), encode_png(other)],
                            type=pa.binary()),
        "width": pa.array([32, None], type=pa.int64()),
        "height": pa.array([32, None], type=pa.int64()),
    }))
    out = (curate_media(media).to_pandas()
           .set_index("media_ref").sort_index())
    # the raw row is its own canonical and its features really decoded
    assert bool(out.loc["raw/a", "is_canonical"])
    assert out.loc["raw/a", "feature_status"] == "ok"
    lum = (299 * raw[:, :, 0].astype(np.int64)
           + 587 * raw[:, :, 1].astype(np.int64)
           + 114 * raw[:, :, 2].astype(np.int64)) // 1000
    assert out.loc["raw/a", "mean_luma"] == int(lum.mean())
    assert out.loc["png/b", "feature_status"] == "ok"
    # non-canonical rows are skipped, not errored
    assert set(out["feature_status"]) <= {"ok", "skipped"}
