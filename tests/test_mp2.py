"""MPEG-1 Audio Layer II payload decode (ISO 11172-3 §2.4.2.6, Tables
B.2a-d / B.4): encode/decode roundtrips across all four allocation
tables, scfsi sharing modes and channel modes; analytic requantizer
values; grouped-codeword unpacking; error paths.  The encoder is the
in-test independent synthesis dual — decode(encode(x)) is bit-exact on
codes/alloc/scfsi/scf by construction."""

import numpy as np
import pytest

from gliner_transbronchialbiopsy_ray.stages.multimodal import (
    _MP2_CLASS_BITS,
    _mp2_select_table,
    _mp3_parse_header,
    decode_mp2_frame,
    encode_mp2_frame,
)


def _header(mode, ext, sr_idx, br_idx):
    h = ((0x7FF << 21) | (3 << 19) | (2 << 17) | (1 << 16)
         | (br_idx << 12) | (sr_idx << 10) | (mode << 6) | (ext << 4))
    return h.to_bytes(4, "big")


def _fill(mode, ext, sr_idx, br_idx, scfsi_pattern, density=2):
    nch = 1 if mode == 3 else 2
    hdr = _mp3_parse_header(_header(mode, ext, sr_idx, br_idx) + bytes(4), 0)
    tid, rows = _mp2_select_table(hdr)
    sblimit = len(rows)
    bound = min((ext + 1) * 4, sblimit) if mode == 1 else sblimit
    alloc = np.zeros((32, nch), dtype=np.int64)
    scfsi = np.zeros((32, nch), dtype=np.int64)
    scf = np.zeros((3, 32, nch), dtype=np.int64)
    codes = np.zeros((36, 32, nch), dtype=np.int64)
    for sb in range(0, sblimit, density):
        if sb >= bound:
            alloc[sb, :] = 1 + (sb * 3) % len(rows[sb])
        else:
            for ch in range(nch):
                alloc[sb, ch] = 1 + (sb * 3 + ch) % len(rows[sb])
        for ch in range(nch):
            ai = int(alloc[sb, ch])
            if not ai:
                continue
            si = scfsi_pattern[(sb + ch) % len(scfsi_pattern)]
            scfsi[sb, ch] = si
            base = (sb * 5 + ch * 7) % 60
            s3 = {0: (base, base + 1, base + 2),
                  1: (base, base, base + 2),
                  2: (base, base, base),
                  3: (base, base + 1, base + 1)}[si]
            for p in range(3):
                scf[p, sb, ch] = s3[p]
            steps = rows[sb][ai - 1]
            for s in range(36):
                codes[s, sb, ch] = (s * 31 + sb * 7 + ch * 13) % steps
    if mode == 1:
        for sb in range(bound, sblimit):
            codes[:, sb, 1] = codes[:, sb, 0]
    return tid, alloc, scfsi, scf, codes


@pytest.mark.parametrize("mode,ext,sr_idx,br_idx,pattern,exp_tid", [
    (3, 0, 0, 12, [0, 1, 2, 3], "b"),   # mono 256k @44.1
    (0, 0, 1, 14, [2, 3], "a"),         # stereo 384k @48
    (1, 1, 0, 13, [0], "b"),            # joint 320k @44.1, bound 8
    (3, 0, 2, 2, [1], "d"),             # mono 48k @32 (low rate class)
    (3, 0, 0, 2, [0, 2], "c"),          # mono 48k @44.1 (low rate class)
    (0, 0, 2, 6, [1, 3], "d"),          # stereo 96k total @32 -> low, 'd'
    (2, 0, 0, 13, [3, 0], "b"),         # dual 320k @44.1
])
def test_mp2_roundtrip_bit_exact(mode, ext, sr_idx, br_idx, pattern,
                                 exp_tid):
    tid, alloc, scfsi, scf, codes = _fill(mode, ext, sr_idx, br_idx,
                                          pattern,
                                          density=3 if mode == 2 else 2)
    assert tid == exp_tid
    frame = encode_mp2_frame(codes, alloc, scfsi, scf, sr_idx=sr_idx,
                             br_idx=br_idx, mode=mode,
                             mode_extension=ext)
    d = decode_mp2_frame(frame, 0)
    assert d["table_id"] == exp_tid
    assert (d["alloc_idx"] == alloc).all()
    assert (d["codes"] == codes).all()
    nch = alloc.shape[1]
    for sb in range(d["sblimit"]):
        for ch in range(nch):
            if alloc[sb, ch]:
                assert d["scfsi"][sb, ch] == scfsi[sb, ch]
                assert (d["scf_idx"][:, sb, ch] == scf[:, sb, ch]).all()


def test_mp2_requantizer_analytic_values():
    """steps=5 (grouped): s'' = (2v - 4)/5; scf idx 3 -> 2^0 = 1.0,
    idx 0 -> 2.0.  Subband 23 of table 'a' has [3, 5, 65535]: alloc
    index 2 selects the 5-step class."""
    alloc = np.zeros((32, 1), dtype=np.int64)
    scfsi = np.zeros((32, 1), dtype=np.int64)
    scf = np.zeros((3, 32, 1), dtype=np.int64)
    codes = np.zeros((36, 32, 1), dtype=np.int64)
    alloc[23, 0] = 2          # 5 steps in table 'a'
    scf[:, 23, 0] = 3         # 2^(1 - 3/3) = 1.0
    codes[:, 23, 0] = 4       # top level -> +0.8
    frame = encode_mp2_frame(codes, alloc, scfsi, scf, sr_idx=1,
                             br_idx=10, mode=3)  # mono 192k @48 -> a
    d = decode_mp2_frame(frame, 0)
    assert d["table_id"] == "a"
    np.testing.assert_allclose(d["samples"][:, 23, 0], 0.8, rtol=1e-12)
    # middle level of a 3-step class is exactly 0
    alloc[:], codes[:] = 0, 0
    alloc[23, 0] = 1          # 3 steps
    codes[:, 23, 0] = 1
    d2 = decode_mp2_frame(
        encode_mp2_frame(codes, alloc, scfsi, scf, sr_idx=1, br_idx=10,
                         mode=3), 0)
    assert (d2["samples"][:, 23, 0] == 0.0).all()


def test_mp2_grouped_codeword_packing():
    """One 7-bit codeword carries 3 base-5 samples: v0 + 5 v1 + 25 v2."""
    bits, grouped = _MP2_CLASS_BITS[5]
    assert (bits, grouped) == (7, True)
    alloc = np.zeros((32, 1), dtype=np.int64)
    scfsi = np.zeros((32, 1), dtype=np.int64)
    scf = np.zeros((3, 32, 1), dtype=np.int64)
    codes = np.zeros((36, 32, 1), dtype=np.int64)
    alloc[23, 0] = 2
    codes[0:3, 23, 0] = (1, 3, 2)  # cw = 1 + 15 + 50 = 66
    frame = encode_mp2_frame(codes, alloc, scfsi, scf, sr_idx=1,
                             br_idx=10, mode=3)
    d = decode_mp2_frame(frame, 0)
    assert tuple(d["codes"][0:3, 23, 0]) == (1, 3, 2)


def test_mp2_error_paths():
    alloc = np.zeros((32, 1), dtype=np.int64)
    scfsi = np.zeros((32, 1), dtype=np.int64)
    scf = np.zeros((3, 32, 1), dtype=np.int64)
    codes = np.zeros((36, 32, 1), dtype=np.int64)
    alloc[0, 0] = 1
    frame = encode_mp2_frame(codes, alloc, scfsi, scf, sr_idx=1,
                             br_idx=10, mode=3)
    # truncation mid-frame raises
    with pytest.raises(ValueError, match="truncated"):
        decode_mp2_frame(frame[:20], 0)
    # MPEG-2 LSF rejected with the honest message
    h2 = ((0x7FF << 21) | (2 << 19) | (2 << 17) | (1 << 16)
          | (8 << 12) | (0 << 10) | (3 << 6)).to_bytes(4, "big")
    with pytest.raises(ValueError, match="LSF"):
        decode_mp2_frame(h2 + bytes(2000), 0)
    # scalefactor 63 rejected by the encoder
    scf[:, 0, 0] = 63
    with pytest.raises(ValueError, match="scalefactor"):
        encode_mp2_frame(codes, alloc, scfsi, scf, sr_idx=1,
                         br_idx=10, mode=3)
    scf[:, 0, 0] = 0
    # out-of-range code (>= steps) rejected
    codes[0, 0, 0] = 3
    with pytest.raises(ValueError, match="out of range"):
        encode_mp2_frame(codes, alloc, scfsi, scf, sr_idx=1,
                         br_idx=10, mode=3)
    codes[0, 0, 0] = 0
    # scfsi sharing contract enforced
    scfsi[0, 0] = 2
    scf[0, 0, 0] = 5
    with pytest.raises(ValueError, match="scfsi=2"):
        encode_mp2_frame(codes, alloc, scfsi, scf, sr_idx=1,
                         br_idx=10, mode=3)
    # allocation above sblimit rejected (table c: sblimit 8)
    alloc2 = np.zeros((32, 1), dtype=np.int64)
    alloc2[10, 0] = 1
    with pytest.raises(ValueError, match="sblimit"):
        encode_mp2_frame(codes, alloc2, np.zeros((32, 1), dtype=np.int64),
                         np.zeros((3, 32, 1), dtype=np.int64),
                         sr_idx=0, br_idx=2, mode=3)  # 48k @44.1 -> c


def test_mp2_table_shapes():
    """Tables B.2a-d: sblimits 27/30/8/12 and the documented nbal
    layout (4/4/3/2 for 'a')."""
    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        _MP2_TABLES, _mp2_nbal)

    assert {k: len(v) for k, v in _MP2_TABLES.items()} == {
        "a": 27, "b": 30, "c": 8, "d": 12}
    nbals = [_mp2_nbal(r) for r in _MP2_TABLES["a"]]
    assert nbals == [4] * 3 + [4] * 8 + [3] * 12 + [2] * 4
    assert all(_mp2_nbal(r) in (2, 3, 4) for t in _MP2_TABLES.values()
               for r in t)
    # every step count has a class entry
    assert all(s in _MP2_CLASS_BITS for t in _MP2_TABLES.values()
               for r in t for s in r)

@pytest.mark.parametrize("mode,sr_idx,br_idx,exp_tid", [
    # mono totals: <=48 low, 56-80 mid, 96+ high (kjmp2 QUANT_LUT_STEP1)
    (3, 0, 1, "c"),    # mono 32k  @44.1 -> low  -> c
    (3, 2, 2, "d"),    # mono 48k  @32   -> low  -> d
    (3, 0, 3, "a"),    # mono 56k  @44.1 -> mid  -> a
    (3, 0, 4, "a"),    # mono 64k  @44.1 -> mid  -> a (ADVICE r3: was c)
    (3, 0, 5, "a"),    # mono 80k  @44.1 -> mid  -> a
    (3, 0, 6, "b"),    # mono 96k  @44.1 -> high -> b
    (3, 1, 6, "a"),    # mono 96k  @48   -> high -> a (48 kHz exception)
    (3, 2, 6, "b"),    # mono 96k  @32   -> high -> b
    # stereo totals: <=96 low, 112-160 mid, 192+ high
    (0, 0, 6, "c"),    # stereo  96k @44.1 -> low  -> c
    (0, 2, 6, "d"),    # stereo  96k @32   -> low  -> d
    (0, 0, 7, "a"),    # stereo 112k @44.1 -> mid  -> a (ADVICE r3: was c)
    (0, 0, 9, "a"),    # stereo 160k @44.1 -> mid  -> a
    (0, 0, 10, "b"),   # stereo 192k @44.1 -> high -> b (ADVICE r3: was a)
    (0, 0, 11, "b"),   # stereo 224k @44.1 -> high -> b
    (0, 1, 11, "a"),   # stereo 224k @48   -> high -> a
])
def test_mp2_rate_class_boundaries(mode, sr_idx, br_idx, exp_tid):
    """ISO 11172-3 §2.4.2.6 table selection is keyed on kbit/s PER
    CHANNEL (ADVICE r3 high): real-world rates 64k mono and
    112/192/224k stereo must select the right B.2 table."""
    hdr = _mp3_parse_header(_header(mode, 0, sr_idx, br_idx) + bytes(4), 0)
    tid, _rows = _mp2_select_table(hdr)
    assert tid == exp_tid
