"""MPEG-1 Audio Layer III partial payload decode (ISO 11172-3
§2.4.1.7/2.4.2.7/2.4.3.4): side-info round-trips across channel modes,
the bit reservoir (main_data_begin back-pointers), scfsi scalefactor
sharing, long/short blocks, the implemented Huffman subset (big_values
tables 0/1, count1 table B), analytic requantizer values, and LOUD
errors on the documented gaps (tables 2-31, count1 table A, mixed
blocks).  The encoder is the in-test synthesis dual — with |q| <= 1
the requantized lines are exact powers of two, so values pin
analytically, not just by symmetry."""

import numpy as np
import pytest

from gliner_transbronchialbiopsy_ray.stages.multimodal import (
    _MP3_SFB_LONG,
    _MP3_SLEN,
    decode_mp3_frames,
    encode_mp3_stream,
)


def _gran(gg=150, comp=5, bigv=None, count1=None, ts=(1, 1, 1), r0=2,
          r1=2, scf=None, sfs=0, pre=0, bt=0, sbg=(0, 0, 0), c1t=1):
    g = {"global_gain": gg, "scalefac_compress": comp,
         "scalefac_scale": sfs, "preflag": pre,
         "table_select": list(ts), "region0_count": r0,
         "region1_count": r1, "bigv": bigv or [],
         "count1": count1 or [], "count1table_select": c1t,
         "block_type": bt, "subblock_gain": list(sbg)}
    if bt == 2:
        g["scalefactors"] = {
            "short": scf or [[0] * 12 for _ in range(3)]}
    else:
        g["scalefactors"] = {"long": scf or [0] * 21}
    return g


def _frame(granules, scfsi=None, nch=1):
    return {"scfsi": scfsi or [[0, 0, 0, 0]] * nch,
            "granules": granules}


def test_mp3_roundtrip_and_analytic_requant():
    bigv = [(1, 0), (0, 1), (1, 1), (1, -1)]
    count1 = [[1, 0, -1, 0], [0, 0, 0, 0]]
    f0 = _frame([[_gran(bigv=bigv, count1=count1)],
                 [_gran(gg=160, count1=[[1, 1, 1, 1]])]])
    out = decode_mp3_frames(encode_mp3_stream([f0], sr_idx=0,
                                              br_idx=4, mode=3))
    d = out[0]["granules"][0][0]
    assert list(d["qs"][:16]) == [1, 0, 0, 1, 1, 1, 1, -1,
                                  1, 0, -1, 0, 0, 0, 0, 0]
    assert d["nonzero"] == 8
    # gg=150, scalefac 0: xr = 2^((150-210)/4) exactly
    np.testing.assert_allclose(d["xr"][0], 2.0 ** -15, rtol=0)
    assert d["xr"][7] == -(2.0 ** -15)
    d1 = out[0]["granules"][1][0]
    np.testing.assert_allclose(abs(d1["xr"][0]), 2.0 ** -12.5, rtol=0)


def test_mp3_bit_reservoir_main_data_begin():
    """Frame capacity exceeds frame-0 main data, so frame 1's data is
    shipped EARLY and its main_data_begin must point back across the
    frame boundary."""
    small = _frame([[_gran(count1=[[1, 0, 0, 0]])],
                    [_gran(count1=[[0, 1, 0, 0]])]])
    f1 = _frame([[_gran(comp=7, scf=[1] * 21)],
                 [_gran(comp=7, scf=[1] * 21)]])
    out = decode_mp3_frames(encode_mp3_stream([small, f1], sr_idx=0,
                                              br_idx=4, mode=3))
    assert out[0]["side_info"]["main_data_begin"] == 0
    assert out[1]["side_info"]["main_data_begin"] > 0
    assert out[1]["granules"][0][0]["nonzero"] == 0


def test_mp3_scfsi_shares_granule0_scalefactors():
    scf = [3] * 21
    fr = _frame([[_gran(comp=10, scf=scf, count1=[[1, 0, 0, 0]])],
                 [_gran(comp=10, scf=scf, count1=[[1, 0, 0, 0]])]],
                scfsi=[[1, 1, 0, 1]])
    out = decode_mp3_frames(encode_mp3_stream([fr], sr_idx=0,
                                              br_idx=4, mode=3))
    g0 = out[0]["granules"][0][0]["scalefactors"]["long"]
    g1 = out[0]["granules"][1][0]["scalefactors"]["long"]
    assert g0 == scf and g1 == scf
    # sharing changes the bit budget: granule 1's part2_3_length is
    # smaller by the shared groups' bits (groups 0,1,3 of slen (1,3))
    si = out[0]["side_info"]["granules"]
    slen1, slen2 = _MP3_SLEN[10]
    saved = 6 * slen1 + 5 * slen1 + 5 * slen2
    assert (si[0][0]["part2_3_length"] - si[1][0]["part2_3_length"]
            == saved)


def test_mp3_stereo_and_scalefac_scale_preflag():
    scf = list(range(8)) + [0] * 13
    g = _gran(comp=14, scf=scf, sfs=1, pre=1,
              bigv=[(1, 1)], ts=(1, 1, 1), r0=0, r1=0)
    fr = _frame([[g, _gran()], [_gran(), _gran()]],
                scfsi=[[0] * 4, [0] * 4], nch=2)
    out = decode_mp3_frames(encode_mp3_stream([fr], sr_idx=0,
                                              br_idx=8, mode=0))
    d = out[0]["granules"][0][0]
    # band 0: scalefac 0, pretab 0 -> 2^-15; scalefac_scale=1 -> m=1
    np.testing.assert_allclose(d["xr"][0], 2.0 ** -15, rtol=0)
    # line 4 sits in band 1 (scalefac 1): 2^(-15 - 1)
    assert d["qs"][1] == 1
    np.testing.assert_allclose(d["xr"][1], 2.0 ** -15, rtol=0)


def test_mp3_short_blocks_subblock_gain():
    scf = [[1] * 12, [0] * 12, [2] * 12]
    g = _gran(bt=2, comp=10, scf=scf, sbg=(0, 1, 2), ts=(1, 1),
              bigv=[(1, 1), (1, 0)], gg=210)
    fr = _frame([[g], [_gran()]])
    out = decode_mp3_frames(encode_mp3_stream([fr], sr_idx=0,
                                              br_idx=4, mode=3))
    d = out[0]["granules"][0][0]
    # window 0, band 0 (lines 0-3): 2^(0/4) * 2^(-0.5*1)
    np.testing.assert_allclose(d["xr"][0], 2.0 ** -0.5, rtol=0)
    assert out[0]["side_info"]["granules"][0][0]["block_type"] == 2


def test_mp3_documented_gaps_raise():
    g = _gran()
    fr = _frame([[g], [_gran()]])
    stream = bytearray(encode_mp3_stream([fr], sr_idx=0, br_idx=4,
                                         mode=3))
    # corrupt table_select of granule 0 to table 7 (side info bits:
    # after 4 hdr bytes: 9 mdb + 5 priv + 4 scfsi + 12 + 9 + 8 + 4 + 1
    # = 52 bits -> table_select starts at bit 52 of side info
    off = 4 * 8 + 52
    by, bit = divmod(off, 8)
    # write 5-bit value 7 MSB-first at (by, bit)
    cur = int.from_bytes(stream[4:21], "big")
    pos = (17 * 8) - (off - 32) - 5
    cur &= ~(0b11111 << pos)
    cur |= 7 << pos
    stream[4:21] = cur.to_bytes(17, "big")
    with pytest.raises(ValueError, match="table 7 not implemented"):
        decode_mp3_frames(bytes(stream))
    # count1 table A raises when count1 data is present
    ga = _gran(count1=[[1, 0, 0, 0]], c1t=0)
    # encoder writes table-B codes regardless; decoder sees select=0
    streamA = encode_mp3_stream([_frame([[ga], [_gran()]])],
                                sr_idx=0, br_idx=4, mode=3)
    with pytest.raises(ValueError, match="table A"):
        decode_mp3_frames(streamA)
    # encoder refuses nonzero values in a table-0 region
    with pytest.raises(ValueError, match="table 0"):
        encode_mp3_stream([_frame([[_gran(bigv=[(1, 0)], ts=(0, 0, 0))],
                                   [_gran()]])], sr_idx=0, br_idx=4,
                          mode=3)


def test_mp3_sfb_tables_shape():
    for sr, edges in _MP3_SFB_LONG.items():
        assert len(edges) == 23 and edges[0] == 0 and edges[-1] == 576
        assert all(b > a for a, b in zip(edges, edges[1:]))


def test_mp3_tables_2_3_6_roundtrip_and_requant():
    """Big-values tables 2/3 (3x3) and 6 (4x4): encode->decode
    roundtrip of magnitudes up to the table range, and the |q|>1
    requantizer values pin analytically (|q|^(4/3) in float64)."""
    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        _MP3_BV_TABLES,
    )

    assert sorted(_MP3_BV_TABLES) == [0, 1, 2, 3, 6]
    cases = {2: [(2, 0), (0, 2), (2, 1), (1, -2), (-2, 2), (2, 2)],
             3: [(2, 0), (0, 1), (-2, 2), (1, 2), (2, -1), (0, 0)],
             6: [(3, 0), (0, 3), (2, 3), (-3, 1), (3, -3), (2, 2)]}
    for tid, bigv in cases.items():
        fr = _frame([[_gran(gg=210, bigv=bigv, ts=(tid, tid, tid))],
                     [_gran()]])
        out = decode_mp3_frames(encode_mp3_stream([fr], sr_idx=0,
                                                  br_idx=8, mode=3))
        d = out[0]["granules"][0][0]
        flat = [v for xy in bigv for v in xy]
        assert list(d["qs"][:len(flat)]) == flat, f"table {tid}"
        # gg=210, all scalefactors 0 -> xr = sign(q) |q|^(4/3) exactly
        for i, q in enumerate(flat):
            exp = np.sign(q) * np.power(np.float64(abs(q)), 4.0 / 3.0)
            assert d["xr"][i] == exp, (tid, i)
    # magnitude beyond the table's range is a loud encoder error
    with pytest.raises(ValueError, match="exceeds table 2"):
        encode_mp3_stream([_frame([[_gran(bigv=[(3, 0)],
                                          ts=(2, 2, 2))],
                                   [_gran()]])], sr_idx=0, br_idx=8,
                          mode=3)


def test_mp3_mixed_region_tables():
    """Different tables per region: region boundaries select the right
    decode table (region0 ends at the band edge, not mid-pair)."""
    # region0_count=2 at 44.1k -> r0 = edge[3] = 12 lines = 6 pairs
    bigv = [(1, 1)] * 6 + [(3, -2)] * 3  # region0: table 1; region1: 6
    fr = _frame([[_gran(gg=210, bigv=bigv, ts=(1, 6, 0), r0=2, r1=9)],
                 [_gran()]])
    out = decode_mp3_frames(encode_mp3_stream([fr], sr_idx=0,
                                              br_idx=8, mode=3))
    d = out[0]["granules"][0][0]
    assert list(d["qs"][:18]) == [1, 1] * 6 + [3, -2] * 3
    assert d["xr"][12] == np.power(np.float64(3.0), 4.0 / 3.0)
    assert d["xr"][13] == -np.power(np.float64(2.0), 4.0 / 3.0)


def test_mp3_huff_table_structural_validation():
    """The import-time proof rejects any transcription slip: a wrong
    length breaks Kraft completeness, a duplicated code breaks
    uniqueness, a shifted code breaks prefix-freeness."""
    from gliner_transbronchialbiopsy_ray.stages.multimodal import (
        _MP3_HUFF2,
        _validate_huff_xy,
    )

    good = dict(_MP3_HUFF2)
    assert _validate_huff_xy(good, 2, 3)  # the shipped table passes
    bad = dict(good)
    bad[(2, 2)] = (0b0000000, 7)  # lengthened -> Kraft hole
    with pytest.raises(AssertionError, match="Kraft"):
        _validate_huff_xy(bad, 99, 3)
    dup = dict(good)
    dup[(2, 2)] = good[(2, 1)]  # duplicate code
    with pytest.raises(AssertionError, match="duplicate"):
        _validate_huff_xy(dup, 99, 3)
    pfx = dict(good)
    pfx[(2, 2)] = (0b00000, 5)  # prefix of (0,2) "000001"
    with pytest.raises(AssertionError, match="prefix|Kraft"):
        _validate_huff_xy(pfx, 99, 3)
    with pytest.raises(AssertionError, match="domain"):
        _validate_huff_xy(good, 99, 4)
