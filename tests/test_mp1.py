"""MPEG-1 Layer I payload decode (stages/multimodal.py): requantizer
law, bit-exact encode/decode roundtrip across channel modes, error
paths, and the Mp1SubbandDecoder actor stage."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from gliner_transbronchialbiopsy_ray.stages.multimodal import (
    Mp1SubbandDecoder,
    _mp1_requantize,
    _mp1_scalefactor,
    decode_mp1_frame,
    encode_mp1_frame,
    mp1_subband_features,
)


def _frame(mode=3, ext=0, seed=0, scf_fill=None):
    rng = np.random.default_rng(seed)
    nch = 1 if mode == 3 else 2
    bound = (ext + 1) * 4 if mode == 1 else 32
    alloc = np.zeros((32, nch), dtype=np.int64)
    for i, sb in enumerate([0, 1, 2, 3, 5, 8, 13, 21, 27, 31]):
        a = 1 + (i * 3) % 14
        if sb < bound:
            for ch in range(nch):
                alloc[sb, ch] = 1 + (i * 3 + ch) % 14
        else:
            alloc[sb, :] = a
    if scf_fill is not None:
        scf = np.where(alloc > 0, scf_fill, 0)
    else:
        scf = np.where(alloc > 0, rng.integers(0, 63, (32, nch)), 0)
    codes = np.zeros((12, 32, nch), dtype=np.int64)
    for sb in range(32):
        for ch in range(nch):
            a = alloc[sb, ch]
            if a:
                # 2^nb - 1 LEVELS: the all-ones code is forbidden
                codes[:, sb, ch] = rng.integers(
                    0, 2 ** (a + 1) - 1, 12)
    if mode == 1:
        for sb in range(bound, 32):
            codes[:, sb, 1] = codes[:, sb, 0]
    return codes, alloc, scf


@pytest.mark.parametrize("mode,ext", [(3, 0), (0, 0), (1, 1), (2, 0)])
def test_roundtrip_bit_exact(mode, ext):
    codes, alloc, scf = _frame(mode=mode, ext=ext, seed=mode)
    frame = encode_mp1_frame(codes, alloc, scf, mode=mode,
                             mode_extension=ext)
    d = decode_mp1_frame(frame)
    assert (d["alloc"] == alloc).all()
    assert (d["scf_idx"] == scf).all()
    assert (d["codes"] == codes).all()
    assert d["header"]["channels"] == (1 if mode == 3 else 2)


def test_requantizer_grid_symmetric():
    # nb=2, 3 levels: {-2/3, 0, +2/3}
    got = [_mp1_requantize(c, 2) for c in (0, 1, 2)]
    assert got == pytest.approx([-2 / 3, 0.0, 2 / 3])
    # every legal code of every width stays inside (-1, 1) and the
    # grid is odd-symmetric: requant(c) == -requant(max_code - c)
    for nb in range(2, 16):
        vals = np.array([_mp1_requantize(c, nb)
                         for c in range(2 ** nb - 1)])
        assert (np.abs(vals) < 1.0).all()
        assert np.allclose(vals, -vals[::-1])


def test_scalefactor_law():
    assert _mp1_scalefactor(0) == pytest.approx(2.0)
    assert _mp1_scalefactor(3) == pytest.approx(1.0)
    assert _mp1_scalefactor(6) == pytest.approx(0.5)
    with pytest.raises(ValueError):
        _mp1_scalefactor(63)


def test_joint_stereo_per_channel_scalefactors():
    # shared intensity codes above the bound, but each channel applies
    # its OWN scalefactor: plant scf 3 (x1.0) left, scf 9 (x0.25) right
    nch, ext = 2, 1
    bound = (ext + 1) * 4
    alloc = np.zeros((32, nch), dtype=np.int64)
    alloc[bound + 2, :] = 7          # nb=8
    scf = np.zeros((32, nch), dtype=np.int64)
    scf[bound + 2, 0], scf[bound + 2, 1] = 3, 9
    codes = np.zeros((12, 32, nch), dtype=np.int64)
    codes[:, bound + 2, :] = 200
    frame = encode_mp1_frame(codes, alloc, scf, mode=1,
                             mode_extension=ext)
    d = decode_mp1_frame(frame)
    left = d["samples"][:, bound + 2, 0]
    right = d["samples"][:, bound + 2, 1]
    assert np.allclose(left, 4.0 * right)
    assert np.allclose(left, _mp1_requantize(200, 8))


def test_error_paths():
    codes, alloc, scf = _frame()
    frame = encode_mp1_frame(codes, alloc, scf)
    with pytest.raises(ValueError, match="truncated"):
        decode_mp1_frame(frame[:40])
    # allocation code 15 is forbidden
    bad = bytearray(frame)
    bad[4] = 0xFF                    # first two alloc nibbles -> 15
    with pytest.raises(ValueError, match="allocation code 15"):
        decode_mp1_frame(bytes(bad))
    # all-ones sample codes are rejected at ENCODE time
    codes2 = codes.copy()
    codes2[:, 0, 0] = 2 ** (int(alloc[0, 0]) + 1) - 1
    with pytest.raises(ValueError, match="all-ones"):
        encode_mp1_frame(codes2, alloc, scf)
    # a Layer III header is not a Layer I frame
    h = ((0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)
         | (9 << 12) | (0 << 10) | (3 << 6)).to_bytes(4, "big")
    with pytest.raises(ValueError, match="not a Layer I"):
        decode_mp1_frame(h + bytes(412))


def test_subband_decoder_stage_analytic_rms():
    # one allocated subband, constant code, scf 3 (x1.0): RMS in that
    # band == |requant(code)|, exactly 0 elsewhere
    nch = 1
    alloc = np.zeros((32, nch), dtype=np.int64)
    alloc[5, 0] = 7                  # nb=8
    scf = np.zeros((32, nch), dtype=np.int64)
    scf[5, 0] = 3
    codes = np.zeros((12, 32, nch), dtype=np.int64)
    codes[:, 5, 0] = 200
    good = b"".join(encode_mp1_frame(codes, alloc, scf)
                    for _ in range(3))

    codes_l3, alloc_l3, scf_l3 = _frame(seed=9)
    layer3_hdr = ((0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)
                  | (9 << 12) | (0 << 10) | (3 << 6)).to_bytes(4, "big")
    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        _mp3_parse_header)
    l3_size = _mp3_parse_header(layer3_hdr + bytes(4), 0)["frame_size"]
    layer3 = (layer3_hdr + bytes(l3_size - 4)) * 2

    media = rd.from_arrow(pa.table({
        "media_ref": pa.array(["a", "b", "c"], type=pa.string()),
        "payload": pa.array([good, layer3, b"junk"], type=pa.binary()),
    }))
    out = (mp1_subband_features(media, n_frames=2, concurrency=1)
           .to_pandas().sort_values(["media_ref", "frame_idx"])
           .reset_index(drop=True))
    ok = out[out["decode_status"] == "ok"]
    assert len(ok) == 2 and set(ok["media_ref"]) == {"a"}
    rms = np.array(ok.iloc[0]["subband_rms"])
    assert len(rms) == 32
    expected = abs(_mp1_requantize(200, 8))
    assert rms[5] == pytest.approx(expected, rel=1e-6)
    assert (rms[np.arange(32) != 5] == 0).all()
    assert ok.iloc[0]["codes_crc32"] == ok.iloc[1]["codes_crc32"]
    assert ok.iloc[0]["active_subbands"] == 1
    flagged = out[out["media_ref"] == "b"]
    assert list(flagged["decode_status"]) == ["unsupported_layer:3"]
    bad = out[out["media_ref"] == "c"]
    assert bad.iloc[0]["decode_status"].startswith("demux_error")
