"""Multimodal column plumbing: media spans as opaque references with typed
metadata, processed by actor-pool `map_batches` stages.

The codec libraries are NOT in this environment; raw RGB888, netpbm
P5/P6, PNG (stdlib-zlib inflate + unfilter), baseline JPEG (pure-NumPy
Huffman + IDCT, `decode_jpeg`/`encode_jpeg`), GIF (real LZW,
`decode_gif`/`encode_gif`), BMP (BI_RGB + BI_RLE8), TIFF
(none/PackBits/TIFF-LZW + predictor), WAV (PCM, IEEE float,
G.711 u-law/A-law, IMA ADPCM — own RIFF parser) and RAWV video are REAL
pure-NumPy/stdlib decoders; MP4/ISO-BMFF and MP3/MPEG-audio DEMUX
(box walk / frame walk, sample+frame tables, O(sampled) byte-range
extraction) are REAL too, and MPEG-1 LAYER I and LAYER II audio
payloads decode for real (formula-exact requantizers to subband
samples; Layer II adds the B.2 allocation tables, grouped 3/5/9-step
classes and scfsi scalefactor sharing — see the Layer I/II sections),
and LAYER III decodes PARTIALLY for real: full side-info parsing, the
bit reservoir, scfsi sharing, long/short windows, count1 table B and
big_values Huffman tables 0/1/2/3/6 with formula-exact requantization
to 576 spectral lines — the remaining big_values tables (the
linbits/escape family) / count1 table A / mixed blocks raise LOUD
errors naming the gap (see the Layer III section for the import-time
structural proof carried tables must pass).  Only the H.264/AAC
sample payload decode kernels remain stubbed (deterministic fakes,
clearly marked).  The Ray side —
schema, batch sizing, actor signature, output layout — is real and tested
throughout.  Swap `_decode_stub` for a real codec (PIL/torchaudio) on a
GPU cluster; the stage contract does not change.

Batch-size note: real media bytes are large — callers should use a SMALL
batch_size (e.g. 16-64) and `num_cpus`/`num_gpus` sized to the decoder, and
keep media as references (never inline bytes in the doc row) so block sizes
stay bounded.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
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


# ---------------------------------------------------------------------------
# REAL kernels for raw (library-free) payloads.  Real deployments store
# decoded/raw tensors next to compressed originals precisely so that
# downstream stages don't need format codecs; these kernels are the genuine
# decode -> feature / resize path for that layout, pure NumPy end to end.


def decode_raw_rgb(payload: bytes, width: int, height: int) -> np.ndarray:
    """Decode a raw interleaved RGB888 buffer into an (h, w, 3) uint8
    array (zero-copy view over the payload bytes).  Raises ValueError on
    size mismatch — the caller records the row's decode_status instead of
    dropping it."""
    expect = width * height * 3
    if len(payload) != expect:
        raise ValueError(
            f"raw rgb payload is {len(payload)} bytes, expected {expect}")
    return np.frombuffer(payload, dtype=np.uint8).reshape(height, width, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6) payload."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def _pnm_header_tokens(payload: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read `n` ASCII integer tokens from a netpbm header starting at
    byte `start`, skipping whitespace and `#` comments (which run to end
    of line, per the spec).  Returns (tokens, offset past the single
    whitespace byte that terminates the last token)."""
    toks: list[int] = []
    i = start
    while len(toks) < n:
        if i >= len(payload):
            raise ValueError("pnm header truncated")
        c = payload[i:i + 1]
        if c == b"#":
            nl = payload.find(b"\n", i)
            if nl < 0:
                raise ValueError("pnm header truncated in comment")
            i = nl + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j:j + 1].isspace():
                j += 1
            tok = payload[i:j]
            if not tok.isdigit():
                raise ValueError(f"bad pnm header token {tok!r}")
            toks.append(int(tok))
            i = j
    # exactly ONE whitespace byte separates the header from raster data
    if i >= len(payload) or not payload[i:i + 1].isspace():
        raise ValueError("pnm header not terminated by whitespace")
    return toks, i + 1


def decode_pnm(payload: bytes) -> np.ndarray:
    """REAL image decode with zero external deps: binary netpbm — P6
    (RGB) and P5 (grayscale, expanded to 3 channels) -> (h, w, 3) uint8.
    Full header handling per the spec: `#` comments, arbitrary
    whitespace between tokens, single whitespace byte before the raster.
    Only maxval <= 255 (8-bit) payloads are supported; 16-bit rasters
    raise with a clear message.  Raises ValueError on truncation — the
    stage keeps the row and records decode_status."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"unsupported pnm magic {magic!r}")
    (w, h, maxval), off = _pnm_header_tokens(payload, 3, 2)
    if maxval == 0 or maxval > 255:
        raise ValueError(f"unsupported pnm maxval {maxval} (8-bit only)")
    ch = 3 if magic == b"P6" else 1
    expect = w * h * ch
    raster = payload[off:off + expect]
    if len(raster) != expect:
        raise ValueError(
            f"pnm raster is {len(raster)} bytes, expected {expect}")
    img = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, ch)
    if maxval != 255:
        img = ((img.astype(np.uint16) * 255) // maxval).astype(np.uint8)
    if ch == 1:
        img = np.repeat(img, 3, axis=2)
    return img


# --- PNG (real pixel decode, stdlib-zlib only) ----------------------------
#
# Public PNG spec (RFC 2083 / W3C PNG): chunks are
# len(u32be) type(4) data crc(u32be); pixel data is the zlib-inflated
# concatenation of all IDAT chunks, one filter-type byte per scanline
# followed by the filtered bytes; filters None/Sub/Up/Average/Paeth
# operate per byte with lag bpp.  Supported here: bit depth 8, color
# types 0 (gray) / 2 (RGB) / 3 (palette) / 4 (gray+alpha) / 6 (RGBA),
# interlace 0.  Everything else raises ValueError with a clear message
# so the stage keeps the row with decode_status set.  Chunk CRCs are
# not verified (inflate itself catches corrupt pixel data via adler32).

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunks(payload: bytes):
    i = 8
    n = len(payload)
    while i + 8 <= n:
        ln = int.from_bytes(payload[i:i + 4], "big")
        typ = payload[i + 4:i + 8]
        data = payload[i + 8:i + 8 + ln]
        if len(data) != ln:
            raise ValueError("png chunk truncated")
        yield typ, data
        i += 12 + ln  # len + type + data + crc
        if typ == b"IEND":
            return
    raise ValueError("png missing IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    return b if pb <= pc_ else c


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering -> (h, stride) uint8.  None/Up are
    whole-row vector ops; Sub is a per-lane modular cumsum; Average and
    Paeth carry an intra-row byte dependency and run as a tight byte
    loop (the adaptive-filter norm for pure-Python decoders)."""
    if len(raw) != h * (1 + stride):
        raise ValueError(
            f"png pixel data is {len(raw)} bytes, expected "
            f"{h * (1 + stride)}")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ftype = int(arr[y, 0])
        row = arr[y, 1:].astype(np.int64)
        if ftype == 0:  # None
            rec = row
        elif ftype == 1:  # Sub: cumsum within each of bpp byte lanes
            pad = (-stride) % bpp
            lanes = np.concatenate([row, np.zeros(pad, np.int64)])
            lanes = lanes.reshape(-1, bpp)
            rec = np.cumsum(lanes, axis=0).reshape(-1)[:stride] % 256
        elif ftype == 2:  # Up
            rec = (row + prev) % 256
        elif ftype == 3:  # Average
            rec = row.copy()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + (left + prev[x]) // 2) % 256
        elif ftype == 4:  # Paeth
            rec = row.copy()
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                c = prev[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + _paeth(int(a), int(prev[x]),
                                          int(c))) % 256
        else:
            raise ValueError(f"png filter type {ftype} invalid")
        out[y] = rec
        prev = rec.astype(np.int64)
    return out


# Adam7 pass grid: (x0, y0, dx, dy) per pass — each pass is its own
# independently-filtered sub-image in the inflated stream (PNG spec §8.2).
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def decode_png(payload: bytes) -> np.ndarray:
    """REAL PNG pixel decode with zero external deps (stdlib zlib
    inflate + per-scanline unfilter) -> (h, w, 3) uint8.  Gray expands
    to 3 channels, palette indices resolve through PLTE, alpha is
    dropped (features/resize operate on color planes).  Adam7
    interlacing decodes as 7 independently-unfiltered sub-images
    scattered onto the pixel grid.  8-bit images only; anything else
    raises ValueError and the calling stage records decode_status
    instead of dropping the row."""
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a png payload")
    w = h = -1
    channels = 0
    color_type = -1
    interlace = 0
    plte: np.ndarray | None = None
    idat: list[bytes] = []
    for typ, data in _png_chunks(payload):
        if typ == b"IHDR":
            if len(data) != 13:
                raise ValueError("png IHDR malformed")
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            depth, color_type, comp, filt, interlace = data[8:13]
            if depth != 8:
                raise ValueError(
                    f"png bit depth {depth} unsupported (8 only)")
            if comp != 0 or filt != 0:
                raise ValueError("png compression/filter method != 0")
            if interlace not in (0, 1):
                raise ValueError(
                    f"png interlace method {interlace} invalid")
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type, 0)
            if channels == 0:
                raise ValueError(f"png color type {color_type} invalid")
        elif typ == b"PLTE":
            if len(data) % 3:
                raise ValueError("png PLTE length not divisible by 3")
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
    if w <= 0 or h <= 0:
        raise ValueError("png missing/invalid IHDR")
    if not idat:
        raise ValueError("png has no IDAT data")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError(f"png IDAT inflate failed: {exc}") from exc
    if interlace == 1:  # Adam7: 7 filtered sub-images, scattered
        px = np.zeros((h, w, channels), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (w - x0 + dx - 1) // dx
            hp = (h - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            sp = wp * channels
            need = hp * (1 + sp)
            sub = _png_unfilter(raw[pos:pos + need], hp, sp, channels)
            px[y0::dy, x0::dx] = sub.reshape(hp, wp, channels)
            pos += need
        if pos != len(raw):
            raise ValueError("png interlaced data length mismatch")
    else:
        stride = w * channels
        px = _png_unfilter(raw, h, stride, channels).reshape(
            h, w, channels)
    if color_type == 3:
        if plte is None:
            raise ValueError("png palette image missing PLTE")
        if int(px.max(initial=0)) >= len(plte):
            raise ValueError("png palette index out of range")
        return plte[px[:, :, 0]]
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    if channels == 2:  # gray+alpha: drop alpha, expand gray
        return np.repeat(px[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(px[:, :, :3])  # RGB / RGBA->RGB


def encode_png(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> minimal valid PNG (color type 2, filter 0
    scanlines, single IDAT) — the writer side of the round-trip and the
    fixture builder for tests."""
    import zlib

    h, w, _ = img.shape

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (len(data).to_bytes(4, "big") + typ + data
                + zlib.crc32(typ + data).to_bytes(4, "big"))

    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0]))
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


# --------------------------------------------------------------- JPEG
# Real baseline JPEG (ITU T.81) decode/encode in pure NumPy + stdlib —
# no codec library.  Decoder: marker parse -> Huffman entropy decode
# (16-bit prefix LUT) -> dequant/dezigzag -> vectorized 2-D IDCT (one
# einsum per component) -> chroma upsample -> YCbCr->RGB.  Encoder:
# the fixture/sink side — flat quant table by default (near-lossless),
# canonical fixed-length Huffman tables built from the emitted symbol
# set (spec-conformant DHT; independent of the Annex K examples),
# 4:4:4 or 4:2:0, optional restart markers.

_DCT_C: np.ndarray | None = None


def _dct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis C: FDCT F = C@f@C.T, IDCT
    f = C.T@F@C (T.81 A.3.3 normalization)."""
    global _DCT_C
    if _DCT_C is None:
        k = np.arange(8, dtype=np.float64)[:, None]
        n = np.arange(8, dtype=np.float64)[None, :]
        c = np.cos((2 * n + 1) * k * np.pi / 16) / 2.0
        c[0] *= 1.0 / np.sqrt(2.0)
        _DCT_C = c
    return _DCT_C


def _zigzag_positions() -> np.ndarray:
    """zz[k] = flat 8x8 position of the k-th zigzag coefficient."""
    pos = []
    for s in range(15):
        rs = (range(min(s, 7), max(0, s - 7) - 1, -1) if s % 2 == 0
              else range(max(0, s - 7), min(s, 7) + 1))
        pos.extend(r * 8 + (s - r) for r in rs)
    return np.array(pos, dtype=np.int64)


_ZZ = _zigzag_positions()


def _build_huff_lut(bits: list[int], vals: list[int]):
    """Canonical JPEG Huffman table -> 16-bit prefix LUT (value, length)."""
    val_lut = np.full(1 << 16, -1, dtype=np.int32)
    len_lut = np.zeros(1 << 16, dtype=np.int32)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(vals):
                raise ValueError("jpeg DHT counts exceed value list")
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            if hi > (1 << 16):
                raise ValueError("jpeg DHT code overflow")
            val_lut[lo:hi] = vals[k]
            len_lut[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return val_lut, len_lut


class _JpegBits:
    """MSB-first bit reader over destuffed entropy bytes."""

    __slots__ = ("d", "i", "buf", "nbits")

    def __init__(self, data: bytes):
        self.d = data
        self.i = 0
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 48 and self.i < len(self.d):
            self.buf = (self.buf << 8) | self.d[self.i]
            self.i += 1
            self.nbits += 8

    def peek16(self) -> int:
        self._fill()
        if self.nbits >= 16:
            return (self.buf >> (self.nbits - 16)) & 0xFFFF
        pad = 16 - self.nbits  # spec pads the tail with 1-bits
        return ((self.buf << pad) | ((1 << pad) - 1)) & 0xFFFF

    def skip(self, length: int) -> None:
        if length > self.nbits:
            raise ValueError("jpeg entropy data truncated")
        self.nbits -= length
        self.buf &= (1 << self.nbits) - 1

    def read(self, length: int) -> int:
        if length == 0:
            return 0
        self._fill()
        if length > self.nbits:
            raise ValueError("jpeg entropy data truncated")
        v = (self.buf >> (self.nbits - length)) & ((1 << length) - 1)
        self.nbits -= length
        self.buf &= (1 << self.nbits) - 1
        return v


def _huff_decode(bits: _JpegBits, lut) -> int:
    val_lut, len_lut = lut
    idx = bits.peek16()
    length = int(len_lut[idx])
    if length == 0:
        raise ValueError("jpeg invalid huffman code")
    bits.skip(length)
    return int(val_lut[idx])


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t low bits to the signed coefficient."""
    if t and v < (1 << (t - 1)):
        return v - (1 << t) + 1
    return v


def _jpeg_entropy_segments(payload: bytes, start: int) -> list[bytes]:
    """Destuff FF00 and split the scan at RSTn markers."""
    segs: list[bytes] = []
    cur = bytearray()
    i, n = start, len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = payload[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
            continue
        if 0xD0 <= m <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
            continue
        break  # real marker (EOI / next segment) ends the scan
    segs.append(bytes(cur))
    return segs


def decode_jpeg(payload: bytes) -> np.ndarray:
    """REAL baseline JPEG pixel decode -> (h, w, 3) uint8.

    Baseline sequential Huffman (SOF0/SOF1) only: progressive,
    arithmetic and 12-bit frames raise ValueError and the calling stage
    records decode_status instead of dropping the row.  Grayscale
    expands to 3 channels; 3-component scans decode as JFIF YCbCr."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a jpeg payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}
    frame = None
    restart_interval = 0
    i = 2
    while i + 2 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError("jpeg marker sync lost")
        m = payload[i + 1]
        if m == 0xD8 or 0xD0 <= m <= 0xD7 or m == 0x01:
            i += 2
            continue
        if m == 0xD9:
            break
        if i + 4 > len(payload):
            raise ValueError("jpeg segment truncated")
        seglen = int.from_bytes(payload[i + 2:i + 4], "big")
        seg = payload[i + 4:i + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("jpeg segment truncated")
        if m == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[j:j + 64], np.uint8)
                    j += 64
                else:
                    tbl = np.frombuffer(seg[j:j + 128], ">u2")
                    j += 128
                if len(tbl) != 64:
                    raise ValueError("jpeg DQT truncated")
                qt[tq] = tbl.astype(np.int32)
        elif m == 0xC4:  # DHT
            j = 0
            while j + 17 <= len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits16 = list(seg[j + 1:j + 17])
                j += 17
                nv = sum(bits16)
                vals = list(seg[j:j + nv])
                j += nv
                if len(vals) != nv:
                    raise ValueError("jpeg DHT truncated")
                huff[(tc, th)] = _build_huff_lut(bits16, vals)
        elif m in (0xC0, 0xC1):  # SOF0/1: baseline sequential Huffman
            if seg[0] != 8:
                raise ValueError("jpeg sample precision != 8 unsupported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for c in range(nc):
                comps.append({
                    "id": seg[6 + 3 * c],
                    "h": seg[7 + 3 * c] >> 4,
                    "v": seg[7 + 3 * c] & 15,
                    "tq": seg[8 + 3 * c],
                })
            frame = (w, h, comps)
        elif 0xC2 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
            raise ValueError(
                f"jpeg SOF{m - 0xC0} (progressive/arithmetic) unsupported")
        elif m == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg SOS before SOF")
            ns = seg[0]
            scomp = [(seg[1 + 2 * c], seg[2 + 2 * c] >> 4,
                      seg[2 + 2 * c] & 15) for c in range(ns)]
            return _jpeg_decode_scan(payload, i + 2 + seglen, frame,
                                     scomp, qt, huff, restart_interval)
        i += 2 + seglen
    raise ValueError("jpeg has no SOS scan")


def _jpeg_decode_scan(payload, start, frame, scomp, qt, huff, ri):
    w, h, comps = frame
    if w <= 0 or h <= 0:
        raise ValueError("jpeg frame has empty dimensions")
    if len(scomp) != len(comps):
        raise ValueError("jpeg multi-scan (progressive) unsupported")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(1 <= c["h"] <= 4 and 1 <= c["v"] <= 4
               and hmax % c["h"] == 0 and vmax % c["v"] == 0
               for c in comps):
        raise ValueError("jpeg sampling factors unsupported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int32)
        if c["tq"] not in qt:
            raise ValueError("jpeg missing quantization table")
    order = []
    for cs, td, ta in scomp:
        match = [c for c in comps if c["id"] == cs]
        if not match:
            raise ValueError("jpeg scan references unknown component")
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("jpeg missing huffman table")
        order.append((match[0], huff[(0, td)], huff[(1, ta)]))
    segs = _jpeg_entropy_segments(payload, start)
    bits = _JpegBits(segs[0])
    seg_idx = 0
    pred = [0] * len(order)
    total = mcux * mcuy
    for mcu in range(total):
        if ri and mcu and mcu % ri == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("jpeg truncated at restart marker")
            bits = _JpegBits(segs[seg_idx])
            pred = [0] * len(order)
        my, mx = divmod(mcu, mcux)
        for ci, (c, dc_lut, ac_lut) in enumerate(order):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    blk = np.zeros(64, np.int32)
                    t = _huff_decode(bits, dc_lut)
                    if t > 15:
                        raise ValueError("jpeg DC category out of range")
                    pred[ci] += _extend(bits.read(t), t)
                    blk[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(bits, ac_lut)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("jpeg AC run overflow")
                        blk[k] = _extend(bits.read(s), s)
                        k += 1
                    row = my * c["v"] + by
                    col = mx * c["h"] + bx
                    c["coef"][row * c["bw"] + col] = blk
    basis = _dct_basis()
    planes = []
    for c in comps:
        deq = c["coef"] * qt[c["tq"]][None, :]
        f = np.zeros((len(deq), 64), np.float64)
        f[:, _ZZ] = deq  # dezigzag
        f = f.reshape(-1, 8, 8)
        px = np.einsum("ui,nuv,vj->nij", basis, f, basis)
        px = np.clip(np.round(px) + 128, 0, 255).astype(np.uint8)
        plane = (px.reshape(c["bh"], c["bw"], 8, 8)
                 .transpose(0, 2, 1, 3).reshape(c["bh"] * 8, c["bw"] * 8))
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.repeat(planes[0][:, :, None], 3, axis=2)
    if len(planes) != 3:
        raise ValueError("jpeg component count unsupported")
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _BitWriter:
    """MSB-first bit writer with JPEG FF00 byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            b = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _fixed_huff(symbols):
    """Canonical fixed-length Huffman table over the emitted symbol set:
    all codes share length L with 2^L - 1 >= n (the all-ones code stays
    unused as T.81 requires).  Returns (bits16, vals, {sym: (code, L)})."""
    syms = sorted(set(symbols)) or [0]
    L = 1
    while (1 << L) - 1 < len(syms):
        L += 1
    bits16 = [0] * 16
    bits16[L - 1] = len(syms)
    codes = {s: (idx, L) for idx, s in enumerate(syms)}
    return bits16, syms, codes


def _mag_cat(v: int) -> tuple[int, int]:
    """coefficient -> (category t, t extra bits) per T.81 F.1.2.1."""
    t = int(abs(v)).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def encode_jpeg(img: np.ndarray, subsampling: str = "4:4:4",
                quant: np.ndarray | None = None,
                restart_interval: int = 0) -> bytes:
    """(h, w, 3) uint8 -> baseline JFIF JPEG bytes (pure NumPy/stdlib).

    Defaults to a flat all-ones quantization table so fixture round
    trips are exact up to DCT/color rounding; pass a real table for
    lossy output.  subsampling: "4:4:4" or "4:2:0"."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects (h, w, 3) uint8")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"subsampling {subsampling!r} unsupported")
    h, w = img.shape[:2]
    q = (np.ones(64, np.int32) if quant is None
         else np.asarray(quant, np.int32).reshape(64))
    rgb = img.astype(np.float64)
    ycc = np.stack([
        0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2],
        (-0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1]
         + 0.5 * rgb[:, :, 2]) + 128.0,
        (0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1]
         - 0.081312 * rgb[:, :, 2]) + 128.0,
    ], axis=0)
    sy = (2, 2) if subsampling == "4:2:0" else (1, 1)
    hmax, vmax = sy
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comp_spec = [(1, hmax, vmax, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    basis = _dct_basis()
    zz_coef = []  # per component: (bh, bw, 64) int32 zigzag blocks
    for idx, (_cid, ch, cv, _tq) in enumerate(comp_spec):
        plane = ycc[idx]
        if (ch, cv) != (hmax, vmax):  # chroma downsample by block mean
            fy, fx = vmax // cv, hmax // ch
            ph = -(-h // fy) * fy
            pw = -(-w // fx) * fx
            pad = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
            plane = pad.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        bh, bw = mcuy * cv, mcux * ch
        pad = np.pad(plane,
                     ((0, bh * 8 - plane.shape[0]),
                      (0, bw * 8 - plane.shape[1])), mode="edge")
        blocks = (pad.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
                  .reshape(-1, 8, 8) - 128.0)
        fq = np.einsum("ui,nij,vj->nuv", basis, blocks, basis)
        fq = np.round(fq.reshape(-1, 64)[:, _ZZ]
                      / q[None, :]).astype(np.int32)
        zz_coef.append(fq.reshape(bh, bw, 64))
    # pass 1: tokenize in MCU-interleaved order
    tokens = []  # (table_key, symbol, extra_val, extra_bits)
    pred = [0, 0, 0]
    n_mcus = mcux * mcuy
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            tokens.append(("RST", (mcu // restart_interval - 1) % 8, 0, 0))
            pred = [0, 0, 0]
        my, mx = divmod(mcu, mcux)
        for idx, (_cid, ch, cv, _tq) in enumerate(comp_spec):
            lum = idx == 0
            dkey, akey = ("dy" if lum else "dc"), ("ay" if lum else "ac")
            for by in range(cv):
                for bx in range(ch):
                    blk = zz_coef[idx][my * cv + by, mx * ch + bx]
                    diff = int(blk[0]) - pred[idx]
                    pred[idx] = int(blk[0])
                    t, extra = _mag_cat(diff)
                    tokens.append((dkey, t, extra, t))
                    nz = np.flatnonzero(blk[1:])
                    k = 1
                    for pos in nz + 1:
                        run = int(pos) - k
                        while run > 15:
                            tokens.append((akey, 0xF0, 0, 0))
                            run -= 16
                        t, extra = _mag_cat(int(blk[pos]))
                        tokens.append((akey, (run << 4) | t, extra, t))
                        k = int(pos) + 1
                    if k < 64:
                        tokens.append((akey, 0x00, 0, 0))  # EOB
    tables = {key: _fixed_huff([s for tk, s, _, _ in tokens if tk == key])
              for key in ("dy", "ay", "dc", "ac")}
    bw_ = _BitWriter()
    body = bytearray()
    for tk, sym, extra, ebits in tokens:
        if tk == "RST":
            bw_.flush()
            body += bw_.out
            bw_.out = bytearray()
            body += bytes([0xFF, 0xD0 + sym])
            continue
        code, length = tables[tk][2][sym]
        bw_.write(code, length)
        bw_.write(extra, ebits)
    bw_.flush()
    body += bw_.out

    def seg(marker: int, data: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(data) + 2).to_bytes(2, "big") + data

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + q.astype(np.uint8).tobytes()
               + bytes([0x01]) + q.astype(np.uint8).tobytes())
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    for cid, ch, cv, tq in comp_spec:
        sof += bytes([cid, (ch << 4) | cv, tq])
    out += seg(0xC0, sof)
    for key, (tc, th) in (("dy", (0, 0)), ("ay", (1, 0)),
                          ("dc", (0, 1)), ("ac", (1, 1))):
        bits16, vals, _ = tables[key]
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits16) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += body
    out += b"\xff\xd9"
    return bytes(out)


# --- GIF (real LZW pixel decode, pure Python/NumPy) ------------------------
#
# GIF87a/89a per the public spec: logical screen descriptor, global/local
# color tables, graphic-control extensions (transparency index read but
# alpha dropped, matching the PNG path), interlaced row ordering, and the
# variable-width LSB-first LZW entropy coding with CLEAR/END codes and the
# 12-bit table cap (deferred-clear streams decode correctly because the
# code width simply stops growing).  decode_gif returns the FIRST frame —
# frame SAMPLING over animations goes through the RAWV/MP4-style demux
# pattern, not this whole-image kernel.  encode_gif is a real LZW
# compressor (exact inverse, roundtrip-tested) used for fixtures and the
# sink story, mirroring encode_png/encode_jpeg.

_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_lzw_decode(data: bytes, min_code_size: int, npix: int) -> np.ndarray:
    """Variable-width LSB-first GIF LZW -> palette indices (uint8)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"gif: bad LZW min code size {min_code_size}")
    clear_code = 1 << min_code_size
    end_code = clear_code + 1
    base = [bytes([i]) for i in range(clear_code)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    out = np.empty(npix, dtype=np.uint8)
    n_out = 0
    acc = nbits = pos = 0
    prev = None
    n = len(data)
    while n_out < npix:
        while nbits < code_size:
            if pos >= n:
                raise ValueError("gif: LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear_code:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end_code:
            break
        if prev is None:
            if code >= clear_code:
                raise ValueError("gif: first LZW code is not a root")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("gif: LZW code out of range")
        k = min(len(entry), npix - n_out)
        out[n_out:n_out + k] = np.frombuffer(entry[:k], dtype=np.uint8)
        n_out += k
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    if n_out < npix:
        raise ValueError("gif: pixel data underrun")
    return out


def _gif_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at pos; returns (data, next)."""
    chunks = []
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("gif: truncated sub-block chain")
        size = payload[pos]
        pos += 1
        if size == 0:
            return b"".join(chunks), pos
        if pos + size > n:
            raise ValueError("gif: truncated sub-block")
        chunks.append(payload[pos:pos + size])
        pos += size


def decode_gif(payload: bytes) -> np.ndarray:
    """REAL GIF pixel decode -> (h, w, 3) uint8, first frame.

    Pure Python/NumPy LZW + palette gather; interlaced images are
    de-interleaved by the 4-pass row map.  Transparency is dropped
    (indices still resolve through the palette), matching decode_png's
    alpha handling.  Malformed payloads raise ValueError so the calling
    stage keeps the row and records decode_status."""
    if payload is None or len(payload) < 13:
        raise ValueError("gif: payload too short")
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    packed = payload[10]
    gct = None
    pos = 13
    if packed & 0x80:
        gct_len = 2 << (packed & 0x07)
        end = pos + 3 * gct_len
        if end > len(payload):
            raise ValueError("gif: truncated global color table")
        gct = np.frombuffer(payload[pos:end], dtype=np.uint8).reshape(-1, 3)
        pos = end
    n = len(payload)
    while pos < n:
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            break
        if block == 0x21:  # extension: label + sub-blocks, all skippable
            if pos >= n:
                raise ValueError("gif: truncated extension")
            pos += 1
            _, pos = _gif_subblocks(payload, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unexpected block 0x{block:02x}")
        if pos + 9 > n:
            raise ValueError("gif: truncated image descriptor")
        w = int.from_bytes(payload[pos + 4:pos + 6], "little")
        h = int.from_bytes(payload[pos + 6:pos + 8], "little")
        ipacked = payload[pos + 8]
        pos += 9
        pal = gct
        if ipacked & 0x80:
            lct_len = 2 << (ipacked & 0x07)
            end = pos + 3 * lct_len
            if end > n:
                raise ValueError("gif: truncated local color table")
            pal = np.frombuffer(payload[pos:end],
                                dtype=np.uint8).reshape(-1, 3)
            pos = end
        if pal is None:
            raise ValueError("gif: no color table")
        if w <= 0 or h <= 0:
            raise ValueError("gif: bad dimensions")
        if pos >= n:
            raise ValueError("gif: missing LZW min code size")
        min_code_size = payload[pos]
        data, pos = _gif_subblocks(payload, pos + 1)
        idx = _gif_lzw_decode(data, min_code_size, w * h).reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            order = np.concatenate(
                [np.arange(start, h, step)
                 for start, step in _GIF_INTERLACE]).astype(np.int64)
            deinter = np.empty_like(idx)
            deinter[order] = idx
            idx = deinter
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("gif: palette index out of range")
        return pal[idx]
    raise ValueError("gif: no image data")


def _gif_lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Real GIF LZW compressor (exact inverse of _gif_lzw_decode).

    Emits CLEAR, dictionary-codes the index stream with the growing
    variable-width rule, resets via CLEAR when the 12-bit table fills,
    and terminates with END."""
    clear_code = 1 << min_code_size
    end_code = clear_code + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear_code)}
    next_code = end_code + 1
    code_size = min_code_size + 1
    emit(clear_code, code_size)
    data = indices.astype(np.uint8).tobytes()
    if data:
        w = data[:1]
        for i in range(1, len(data)):
            c = data[i:i + 1]
            wc = w + c
            if wc in table:
                w = wc
                continue
            emit(table[w], code_size)
            if next_code == 4096:  # table full: reset mid-stream
                emit(clear_code, code_size)
                table = {bytes([j]): j for j in range(clear_code)}
                next_code = end_code + 1
                code_size = min_code_size + 1
            else:
                table[wc] = next_code
                next_code += 1
                if next_code == (1 << code_size) + 1 and code_size < 12:
                    code_size += 1
            w = c
        emit(table[w], code_size)
    emit(end_code, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 -> GIF89a bytes (real LZW compression).

    The palette is built from the image's distinct colors (<= 256
    required — fixture images are drawn from bounded palettes); GIF is a
    palette format, so this writer is exact by construction and
    decode_gif(encode_gif(x)) == x."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_gif expects (h, w, 3) uint8")
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError("encode_gif: more than 256 distinct colors")
    bits = max(2, int(len(pal) - 1).bit_length())
    pal_full = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal_full[:len(pal)] = pal
    idx = inv.astype(np.uint8).reshape(h, w)
    if interlace:
        order = np.concatenate(
            [np.arange(start, h, step) for start, step in _GIF_INTERLACE])
        idx = idx[order]
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (7 << 4) | (bits - 1), 0, 0])
    out += pal_full.tobytes()
    out += b"\x2c" + bytes(4)  # image descriptor at (0, 0)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0x00])
    out += bytes([bits])
    lzw = _gif_lzw_encode(idx.reshape(-1), bits)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


# --- TIFF (real pixel decode: none/PackBits/LZW + horizontal predictor) ----
#
# TIFF 6.0 per the public spec: both byte orders (II/MM), IFD walk,
# 8-bit samples, photometric 0/1 (grayscale, 0 = white-is-zero
# inverted), 2 (RGB) and 3 (palette, 16-bit colormap), chunky planar
# config, multi-strip images, compressions 1 (none), 5 (TIFF-LZW:
# MSB-first codes, 9-bit start, EARLY code-width change at 2^n - 1 —
# the documented divergence from GIF's LZW) and 32773 (PackBits), plus
# predictor 2 (per-channel horizontal differencing).  encode_tiff
# writes all of it for fixtures/roundtrips.


def _tiff_lzw_decode(data: bytes, max_out: int) -> bytes:
    """TIFF-variant LZW -> bytes: MSB-first bit packing, 256=Clear,
    257=EOI, early code-size change (grow at table length 2^n - 1)."""
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    code_size = 9
    out = bytearray()
    acc = nbits = pos = 0
    prev = None
    n = len(data)
    while len(out) < max_out:
        while nbits < code_size:
            if pos >= n:
                raise ValueError("tiff: LZW stream truncated")
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - code_size)) & ((1 << code_size) - 1)
        nbits -= code_size
        acc &= (1 << nbits) - 1
        if code == 256:
            table = list(base)
            code_size = 9
            prev = None
            continue
        if code == 257:
            break
        if prev is None:
            if code >= 256:
                raise ValueError("tiff: first LZW code is not a root")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("tiff: LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << code_size) - 1 and code_size < 12:
            code_size += 1
    return bytes(out[:max_out])


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW compressor (exact inverse of the decoder):
    MSB-first, Clear first, EOI last, early change, reset at 4094."""
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc = (acc << size) | code
        nbits += size
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    code_size = 9
    emit(256, code_size)
    if data:
        w = data[:1]
        for i in range(1, len(data)):
            c = data[i:i + 1]
            wc = w + c
            if wc in table:
                w = wc
                continue
            emit(table[w], code_size)
            table[wc] = next_code
            next_code += 1
            # decoder appends lag one code behind the encoder's
            # registrations, and its early change fires at table
            # length 2^n - 1 — so the WRITER switches at 2^n
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            elif next_code == 4094:  # table nearly full: reset
                emit(256, code_size)
                table = {bytes([j]): j for j in range(256)}
                next_code = 258
                code_size = 9
            w = c
        emit(table[w], code_size)
    emit(257, code_size)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes, max_out: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < max_out:
        h = data[i]
        i += 1
        if h < 128:  # literal run of h+1
            if i + h + 1 > n:
                raise ValueError("tiff: truncated PackBits literal")
            out += data[i:i + h + 1]
            i += h + 1
        elif h > 128:  # repeat next byte 257-h times
            if i >= n:
                raise ValueError("tiff: truncated PackBits repeat")
            out += bytes([data[i]]) * (257 - h)
            i += 1
        # h == 128: noop
    return bytes(out[:max_out])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit_start = i
        i += 1
        while (i < n and i - lit_start < 128
               and not (i + 1 < n and data[i] == data[i + 1])):
            i += 1
        out += bytes([i - lit_start - 1]) + data[lit_start:i]
    return bytes(out)


def decode_tiff(payload: bytes) -> np.ndarray:
    """REAL TIFF pixel decode -> (h, w, 3) uint8 (first IFD).
    Malformed payloads raise ValueError so the calling stage keeps the
    row and records decode_status."""
    if payload is None or len(payload) < 8:
        raise ValueError("tiff: payload too short")
    if payload[:4] == b"II*\x00":
        bo = "little"
    elif payload[:4] == b"MM\x00*":
        bo = "big"
    else:
        raise ValueError("tiff: bad signature")

    def u(off: int, size: int) -> int:
        if off + size > len(payload):
            raise ValueError("tiff: truncated read")
        return int.from_bytes(payload[off:off + size], bo)

    ifd = u(4, 4)
    if ifd + 2 > len(payload):
        raise ValueError("tiff: truncated IFD")
    n_entries = u(ifd, 2)
    _SIZES = {1: 1, 2: 1, 3: 2, 4: 4}
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        e = ifd + 2 + 12 * i
        tag, typ, cnt = u(e, 2), u(e + 2, 2), u(e + 4, 4)
        if typ not in _SIZES:
            continue
        sz = _SIZES[typ]
        total = sz * cnt
        voff = e + 8 if total <= 4 else u(e + 8, 4)
        tags[tag] = [u(voff + j * sz, sz) for j in range(cnt)]
    try:
        w = tags[256][0]
        h = tags[257][0]
        offsets = tags[273]
        counts = tags[279]
    except KeyError as exc:
        raise ValueError(f"tiff: missing required tag {exc}")
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise ValueError("tiff: only 8-bit samples supported")
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    spp = tags.get(277, [len(bits)])[0]
    rows_per_strip = tags.get(278, [h])[0]
    predictor = tags.get(317, [1])[0]
    if tags.get(284, [1])[0] != 1:
        raise ValueError("tiff: planar configuration 2 not supported")
    if w <= 0 or h <= 0 or rows_per_strip <= 0:
        raise ValueError("tiff: bad dimensions")
    row_bytes = w * spp
    chunks = []
    remaining_rows = h
    for off, cnt in zip(offsets, counts):
        rows = min(rows_per_strip, remaining_rows)
        remaining_rows -= rows
        want = rows * row_bytes
        if off + cnt > len(payload):
            raise ValueError("tiff: strip out of range")
        raw = payload[off:off + cnt]
        if comp == 1:
            if len(raw) < want:
                raise ValueError("tiff: short uncompressed strip")
            strip = raw[:want]
        elif comp == 5:
            strip = _tiff_lzw_decode(raw, want)
        elif comp == 32773:
            strip = _packbits_decode(raw, want)
        else:
            raise ValueError(f"tiff: unsupported compression {comp}")
        if len(strip) < want:
            raise ValueError("tiff: strip data underrun")
        a = np.frombuffer(strip, dtype=np.uint8).reshape(rows, w, spp)
        if predictor == 2:
            a = (np.cumsum(a.astype(np.uint64), axis=1)
                 & 0xFF).astype(np.uint8)
        chunks.append(a)
    img = np.concatenate(chunks, axis=0)
    if photo == 3:  # palette: 16-bit colormap, R then G then B planes
        cmap = tags.get(320)
        if not cmap or len(cmap) < 3 * 256:
            raise ValueError("tiff: missing palette colormap")
        pal = (np.asarray(cmap[:3 * 256], dtype=np.uint32)
               .reshape(3, 256).T // 257).astype(np.uint8)
        return pal[img[:, :, 0]]
    if spp == 1:
        g = img[:, :, 0]
        if photo == 0:  # white-is-zero
            g = 255 - g
        return np.repeat(g[:, :, None], 3, axis=2)
    if spp < 3:
        raise ValueError(f"tiff: unsupported samples per pixel {spp}")
    return np.ascontiguousarray(img[:, :, :3])


def encode_tiff(img: np.ndarray, compression: str = "none",
                predictor: bool = False, gray: bool = False,
                rows_per_strip: int | None = None,
                big_endian: bool = False) -> bytes:
    """(h, w, 3) uint8 -> TIFF bytes (II or MM, single IFD, chunky).
    compression: 'none' | 'packbits' | 'lzw'; predictor applies
    horizontal differencing (LZW's usual companion); gray writes one
    luma-less channel (the red plane) as photometric 1."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_tiff expects (h, w, 3) uint8")
    h, w, _ = img.shape
    data = img[:, :, :1] if gray else img
    spp = data.shape[2]
    if rows_per_strip is None:
        rows_per_strip = h
    bo = "big" if big_endian else "little"
    strips = []
    for r0 in range(0, h, rows_per_strip):
        rows = data[r0:r0 + rows_per_strip]
        if predictor:
            d = rows.astype(np.int16)
            d[:, 1:, :] -= rows[:, :-1, :].astype(np.int16)
            rows = (d & 0xFF).astype(np.uint8)
        raw = rows.tobytes()
        if compression == "packbits":
            strips.append(_packbits_encode(raw))
        elif compression == "lzw":
            strips.append(_tiff_lzw_encode(raw))
        else:
            strips.append(raw)
    comp_id = {"none": 1, "packbits": 32773, "lzw": 5}[compression]
    n_strips = len(strips)

    entries: list[tuple[int, int, int, list[int]]] = []
    extra = bytearray()  # out-of-line values, appended after the IFD

    def add(tag: int, typ: int, vals: list[int]) -> None:
        entries.append((tag, typ, len(vals), vals))

    add(256, 3, [w])
    add(257, 3, [h])
    add(258, 3, [8] * spp)
    add(259, 3, [comp_id])
    add(262, 3, [1 if gray else 2])
    add(273, 4, [0] * n_strips)      # patched below
    add(277, 3, [spp])
    add(278, 3, [rows_per_strip])
    add(279, 4, [len(s) for s in strips])
    if predictor:
        add(317, 3, [2])
    entries.sort()
    ifd_off = 8
    ifd_len = 2 + 12 * len(entries) + 4
    data_off = ifd_off + ifd_len
    _SZ = {3: 2, 4: 4}

    # lay out out-of-line arrays first, then strips
    voffs: dict[int, int] = {}
    cur = data_off
    for tag, typ, cnt, vals in entries:
        if _SZ[typ] * cnt > 4:
            voffs[tag] = cur
            cur += _SZ[typ] * cnt
    strip_offs = []
    for s in strips:
        strip_offs.append(cur)
        cur += len(s)

    def pack_vals(typ: int, vals: list[int]) -> bytes:
        return b"".join(v.to_bytes(_SZ[typ], bo) for v in vals)

    out = bytearray()
    out += b"MM\x00*" if big_endian else b"II*\x00"
    out += ifd_off.to_bytes(4, bo)
    out += len(entries).to_bytes(2, bo)
    for tag, typ, cnt, vals in entries:
        if tag == 273:
            vals = strip_offs
        out += tag.to_bytes(2, bo) + typ.to_bytes(2, bo)
        out += cnt.to_bytes(4, bo)
        blob = pack_vals(typ, vals)
        if len(blob) <= 4:
            out += blob + bytes(4 - len(blob))
        else:
            out += voffs[tag].to_bytes(4, bo)
    out += bytes(4)  # next-IFD pointer: none
    for tag, typ, cnt, vals in entries:
        if tag == 273:
            vals = strip_offs
        if _SZ[typ] * cnt > 4:
            out += pack_vals(typ, vals)
    for s in strips:
        out += s
    return bytes(out)


# --- BMP (real pixel decode: BI_RGB 8/24/32-bit + BI_RLE8) -----------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """REAL Windows BMP decode -> (h, w, 3) uint8.

    BITMAPINFOHEADER (and the larger V4/V5 headers, which extend it
    compatibly): 8-bit palette, 24-bit BGR and 32-bit BGRX at BI_RGB
    with 4-byte row padding and bottom-up/top-down orientation, plus the
    BI_RLE8 run-length coding (runs, absolute mode with word padding,
    end-of-line / end-of-bitmap / delta escapes).  Malformed payloads
    raise ValueError; alpha is dropped like the PNG/GIF paths."""
    if payload is None or len(payload) < 54:
        raise ValueError("bmp: payload too short")
    if payload[:2] != b"BM":
        raise ValueError("bmp: bad signature")
    pix_off = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        raise ValueError(f"bmp: unsupported header size {hdr_size}")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError("bmp: bad dimensions")
    if comp not in (0, 1) or bpp not in (8, 24, 32):
        raise ValueError(f"bmp: unsupported bpp={bpp} compression={comp}")
    palette = None
    if bpp == 8:
        n_colors = int.from_bytes(payload[46:50], "little") or 256
        pal_off = 14 + hdr_size
        end = pal_off + 4 * n_colors
        if end > len(payload):
            raise ValueError("bmp: truncated palette")
        palette = np.frombuffer(payload[pal_off:end],
                                dtype=np.uint8).reshape(-1, 4)[:, 2::-1]
    if comp == 1:  # BI_RLE8 (8-bit only per spec)
        if bpp != 8:
            raise ValueError("bmp: RLE8 requires 8-bit")
        idx = np.zeros((h, w), dtype=np.uint8)
        x = y = 0
        i = pix_off
        n = len(payload)
        while i + 1 < n:
            cnt, val = payload[i], payload[i + 1]
            i += 2
            if cnt > 0:  # encoded run
                end_x = min(x + cnt, w)
                idx[y, x:end_x] = val
                x = end_x
            elif val == 0:  # end of line
                x, y = 0, y + 1
                if y >= h:
                    break
            elif val == 1:  # end of bitmap
                break
            elif val == 2:  # delta
                if i + 1 >= n:
                    raise ValueError("bmp: truncated RLE delta")
                x = min(x + payload[i], w)
                y += payload[i + 1]
                i += 2
                if y >= h:
                    break
            else:  # absolute mode, word-aligned
                if i + val > n:
                    raise ValueError("bmp: truncated RLE absolute run")
                end_x = min(x + val, w)
                idx[y, x:end_x] = np.frombuffer(
                    payload[i:i + (end_x - x)], dtype=np.uint8)
                x = end_x
                i += val + (val & 1)
        img = palette[idx]
        return img if top_down else img[::-1]
    nbytes = bpp // 8
    stride = (w * nbytes + 3) & ~3
    end = pix_off + stride * h
    if end > len(payload):
        raise ValueError("bmp: truncated pixel data")
    rows = np.frombuffer(payload[pix_off:end],
                         dtype=np.uint8).reshape(h, stride)
    if bpp == 8:
        img = palette[rows[:, :w]]
    else:
        px = rows[:, :w * nbytes].reshape(h, w, nbytes)
        img = px[:, :, 2::-1]  # BGR(X) -> RGB
    return np.ascontiguousarray(img if top_down else img[::-1])


def encode_bmp(img: np.ndarray, rle8: bool = False,
               top_down: bool = False) -> bytes:
    """(h, w, 3) uint8 -> BMP bytes: 24-bit BI_RGB by default, or
    palette-indexed BI_RLE8 (<= 256 distinct colors) for the compressed
    fixture path.  Exact roundtrip with decode_bmp."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    h, w, _ = img.shape
    rows = img if top_down else img[::-1]
    if rle8:
        pal, inv = np.unique(img.reshape(-1, 3), axis=0, return_inverse=True)
        if len(pal) > 256:
            raise ValueError("encode_bmp: more than 256 distinct colors")
        idx = inv.astype(np.uint8).reshape(h, w)
        idx_rows = idx if top_down else idx[::-1]
        body = bytearray()
        for r in range(h):
            row = idx_rows[r]
            x = 0
            while x < w:
                run = 1
                while (x + run < w and run < 255
                       and row[x + run] == row[x]):
                    run += 1
                body += bytes([run, int(row[x])])
                x += run
            body += b"\x00\x00"  # end of line
        body += b"\x00\x01"  # end of bitmap
        pal_bytes = bytearray()
        for r_, g_, b_ in pal:
            pal_bytes += bytes([b_, g_, r_, 0])
        pix_off = 14 + 40 + len(pal_bytes)
        out = bytearray(b"BM")
        out += (pix_off + len(body)).to_bytes(4, "little") + bytes(4)
        out += pix_off.to_bytes(4, "little")
        out += (40).to_bytes(4, "little")
        out += w.to_bytes(4, "little", signed=True)
        out += (-h if top_down else h).to_bytes(4, "little", signed=True)
        out += (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
        out += (1).to_bytes(4, "little")  # BI_RLE8
        out += len(body).to_bytes(4, "little") + bytes(8)
        out += len(pal).to_bytes(4, "little") + bytes(4)
        out += pal_bytes + body
        return bytes(out)
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    pad = bytes(stride - w * 3)
    for r in range(h):
        body += rows[r, :, ::-1].tobytes() + pad
    pix_off = 14 + 40
    out = bytearray(b"BM")
    out += (pix_off + len(body)).to_bytes(4, "little") + bytes(4)
    out += pix_off.to_bytes(4, "little")
    out += (40).to_bytes(4, "little")
    out += w.to_bytes(4, "little", signed=True)
    out += (-h if top_down else h).to_bytes(4, "little", signed=True)
    out += (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
    out += (0).to_bytes(4, "little")  # BI_RGB
    out += len(body).to_bytes(4, "little") + bytes(8)
    out += bytes(8)
    out += body
    return bytes(out)


def _area_resize(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Area-average downsample when the scale divides evenly (exact block
    mean), nearest-neighbor otherwise — both pure strided NumPy."""
    h, w, _ = img.shape
    if h % out_h == 0 and w % out_w == 0:
        fh, fw = h // out_h, w // out_w
        return (
            img.reshape(out_h, fh, out_w, fw, 3)
            .mean(axis=(1, 3))
            .astype(np.uint8)
        )
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    return img[yi][:, xi]



def _decode_image_any(p: bytes, w: int | None, h: int | None) -> np.ndarray:
    """Format-sniffed decode shared by RawImageStage and the perceptual
    hasher: a payload whose size exactly matches width*height*3 metadata
    is headerless raw RGB888 (raw pixels can legitimately START with
    "P6" or the PNG magic, so the metadata match outranks the magic);
    otherwise PNG/PNM/JPEG/GIF/BMP/TIFF magics route to the real
    decoders."""
    raw_size = (w or 0) * (h or 0) * 3
    if p is not None and len(p) != raw_size:
        if p[:8] == _PNG_MAGIC:
            return decode_png(p)
        if p[:2] in (b"P5", b"P6"):
            return decode_pnm(p)
        if p[:2] == b"\xff\xd8":
            return decode_jpeg(p)
        if p[:6] in (b"GIF87a", b"GIF89a"):
            return decode_gif(p)
        if p[:2] == b"BM":
            return decode_bmp(p)
        if p[:4] in (b"II*\x00", b"MM\x00*"):
            return decode_tiff(p)
    if p is None or w is None or h is None:
        raise ValueError("unknown image format (no magic matched and no "
                         "raw RGB width/height metadata)")
    return decode_raw_rgb(p, w, h)


class RawImageStage:
    """Actor stage over a media-payload dataset (media_ref, payload,
    width, height): REAL decode -> channel statistics features -> real
    `out_w` x `out_h` resize, emitting the resized raw bytes.  No
    external codec; failed rows keep their row with decode_status set.

    Feature layout (float32): [mean_r, mean_g, mean_b, std_r, std_g,
    std_b, mean_luma] (ITU-R 601 luma).

    Payloads are format-sniffed per row: a payload whose size exactly
    matches the row's width*height*3 metadata is headerless raw RGB888
    (raw pixels can legitimately START with the bytes "P6" or the PNG
    magic, so the metadata match outranks the magic); otherwise the PNG
    signature routes to `decode_png` (REAL stdlib-zlib pixel decode),
    a netpbm P5/P6 magic routes to `decode_pnm`, JPEG SOI to
    `decode_jpeg`, GIF87a/89a to `decode_gif` (real LZW) and "BM" to
    `decode_bmp` — all self-describing, so rows carrying container
    files don't need width/height metadata at all."""

    def __init__(self, out_w: int = 8, out_h: int = 8):
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        ws = batch.column("width").to_pylist()
        hs = batch.column("height").to_pylist()
        feats, resized, status = [], [], []
        for r, p, w, h in zip(refs, payloads, ws, hs):
            try:
                img = _decode_image_any(p, w, h).astype(np.float32)
            except (ValueError, TypeError) as exc:
                feats.append(None)
                resized.append(None)
                status.append(f"decode_error: {exc}")
                continue
            mean = img.mean(axis=(0, 1))
            std = img.std(axis=(0, 1))
            luma = 0.299 * mean[0] + 0.587 * mean[1] + 0.114 * mean[2]
            feats.append(np.concatenate([mean, std, [luma]])
                         .astype(np.float32).tolist())
            small = _area_resize(img.astype(np.uint8), self.out_w, self.out_h)
            resized.append(small.tobytes())
            status.append("ok")
        return pa.table(
            {
                "media_ref": pa.array(refs, type=pa.string()),
                "feature": pa.array(feats, type=pa.list_(pa.float32())),
                "resized_payload": pa.array(resized, type=pa.binary()),
                "out_w": pa.array([self.out_w] * len(refs), type=pa.int32()),
                "out_h": pa.array([self.out_h] * len(refs), type=pa.int32()),
                "decode_status": pa.array(status, type=pa.string()),
            }
        )


def raw_media_features(
    media: ray.data.Dataset,
    out_w: int = 8,
    out_h: int = 8,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 16,
) -> ray.data.Dataset:
    """Media-payload dataset -> decoded features + resized raw bytes.

    batch_size defaults SMALL (16) because payload rows carry real image
    bytes — at 224x224x3 that is ~150 KB/row, so a batch stays ~2.4 MB
    and batch x concurrency bounds worker heap."""
    return media.map_batches(
        RawImageStage,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


# --- WAV decode: PCM + IEEE float + G.711 (u-law/A-law) + IMA ADPCM ------
#
# Zero external deps.  PCM/float are numpy reinterpret casts; G.711 is a
# 256-entry LUT gather; IMA ADPCM (DVI4, wFormatTag 0x11 — the classic
# compressed-WAV codec) is a real block decoder with the standard
# step-size/index adaptation.  The ADPCM predictor recurrence is
# inherently sequential WITHIN a block, but blocks are independent — the
# per-row cost is bounded by block count, and rows parallelize across
# the actor pool.  Encoders live alongside for fixture generation and
# the K-sink story (mirrors encode_png/encode_jpeg).

_WAVE_FMT_PCM = 0x0001
_WAVE_FMT_FLOAT = 0x0003
_WAVE_FMT_ALAW = 0x0006
_WAVE_FMT_ULAW = 0x0007
_WAVE_FMT_IMA_ADPCM = 0x0011

_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767],
    dtype=np.int32)

_G711_TABLES: dict[str, np.ndarray] = {}


def _g711_table(law: str) -> np.ndarray:
    """ITU-T G.711 code -> 16-bit linear decode table (256 entries)."""
    t = _G711_TABLES.get(law)
    if t is not None:
        return t
    out = np.zeros(256, dtype=np.int16)
    for code in range(256):
        if law == "ulaw":
            u = ~code & 0xFF
            exponent = (u >> 4) & 0x07
            mantissa = u & 0x0F
            magnitude = (((mantissa << 3) + 0x84) << exponent) - 0x84
            out[code] = -magnitude if (u & 0x80) else magnitude
        else:  # alaw: transmitted sign bit 1 = positive
            a = code ^ 0x55
            exponent = (a >> 4) & 0x07
            mantissa = a & 0x0F
            if exponent == 0:
                magnitude = (mantissa << 4) + 8
            else:
                magnitude = ((mantissa << 4) + 0x108) << (exponent - 1)
            out[code] = magnitude if (a & 0x80) else -magnitude
    _G711_TABLES[law] = out
    return out


def g711_encode(x: np.ndarray, law: str) -> np.ndarray:
    """Vectorized 16-bit linear -> G.711 code (uint8).  Exact inverse of
    the decode table on code space: encode(decode(c)) == c for all 256
    codes (segment midpoints re-encode to themselves)."""
    x = np.clip(np.asarray(x), -32768, 32767).astype(np.int32)
    if law == "ulaw":
        sign = np.where(x < 0, 0x80, 0)
        mag = np.minimum(np.abs(x), 32635) + 0x84
        exponent = np.floor(np.log2(mag)).astype(np.int32) - 7
        mantissa = (mag >> (exponent + 3)) & 0x0F
        return (~(sign | (exponent << 4) | mantissa) & 0xFF).astype(
            np.uint8)
    sign = np.where(x >= 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32767)
    exponent = np.maximum(
        np.floor(np.log2(np.maximum(mag, 1))).astype(np.int32) - 7, 0)
    mantissa = np.where(exponent == 0, mag >> 4,
                        (mag >> (exponent + 3)) & 0x0F)
    return (((sign | (exponent << 4) | mantissa) ^ 0x55) & 0xFF).astype(
        np.uint8)


def _ima_decode_nibbles(nibbles: np.ndarray, pred: int,
                        idx: int) -> np.ndarray:
    """One channel's nibble stream -> int16 samples (sequential
    predictor recurrence — the codec's definition)."""
    out = np.empty(len(nibbles), dtype=np.int16)
    steps, adj = _IMA_STEPS, _IMA_INDEX_ADJ
    for i, n in enumerate(nibbles):
        step = int(steps[idx])
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        pred = pred - diff if (n & 8) else pred + diff
        pred = -32768 if pred < -32768 else (32767 if pred > 32767 else pred)
        idx = idx + int(adj[n & 7])
        idx = 0 if idx < 0 else (88 if idx > 88 else idx)
        out[i] = pred
    return out


def _byte_nibbles(data: np.ndarray) -> np.ndarray:
    """uint8 array -> nibble stream, LOW nibble first (IMA order)."""
    return np.stack([data & 0x0F, data >> 4], axis=1).reshape(-1)


def decode_ima_adpcm(data: bytes, nch: int, block_align: int) -> np.ndarray:
    """IMA/DVI ADPCM 'data' chunk -> int16 (n_frames, nch).  Block
    layout: per-channel 4-byte header (i16 predictor = first output
    sample, u8 step index, u8 reserved), then nibble data — mono
    contiguous, stereo in alternating 4-byte (8-nibble) groups."""
    if nch not in (1, 2):
        raise ValueError(f"unsupported ADPCM channel count: {nch}")
    if block_align < 4 * nch or block_align % 4:
        raise ValueError(f"bad ADPCM block align: {block_align}")
    buf = np.frombuffer(data, dtype=np.uint8)
    chans: list[list[np.ndarray]] = [[] for _ in range(nch)]
    for start in range(0, len(buf) - (len(buf) % block_align), block_align):
        block = buf[start:start + block_align]
        for c in range(nch):
            hdr = block[4 * c:4 * c + 4]
            pred = int(np.int16(hdr[0] | (int(hdr[1]) << 8)))
            idx = int(hdr[2])
            if idx > 88:
                raise ValueError(f"bad ADPCM step index: {idx}")
            body = block[4 * nch:]
            if nch == 2:  # alternating 4-byte groups per channel
                body = body.reshape(-1, 2, 4)[:, c, :].reshape(-1)
            chans[c].append(np.concatenate([
                np.array([pred], dtype=np.int16),
                _ima_decode_nibbles(_byte_nibbles(body), pred, idx)]))
    if not chans[0]:
        return np.empty((0, nch), dtype=np.int16)
    return np.stack([np.concatenate(c) for c in chans], axis=1)


def _ima_encode_nibbles(samples: np.ndarray, pred: int,
                        idx: int) -> tuple[list[int], int, int]:
    nibbles = []
    steps, adj = _IMA_STEPS, _IMA_INDEX_ADJ
    for s in samples:
        step = int(steps[idx])
        diff = int(s) - pred
        n = 0
        if diff < 0:
            n = 8
            diff = -diff
        if diff >= step:
            n |= 4
            diff -= step
        if diff >= step >> 1:
            n |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            n |= 1
        # reconstruct exactly as the decoder will
        d = step >> 3
        if n & 1:
            d += step >> 2
        if n & 2:
            d += step >> 1
        if n & 4:
            d += step
        pred = pred - d if (n & 8) else pred + d
        pred = -32768 if pred < -32768 else (32767 if pred > 32767 else pred)
        idx = idx + int(adj[n & 7])
        idx = 0 if idx < 0 else (88 if idx > 88 else idx)
        nibbles.append(n)
    return nibbles, pred, idx


def encode_wav(x: np.ndarray, rate: int, fmt: str = "pcm16",
               block_align: int = 256) -> bytes:
    """int16 (n, nch) samples -> a complete RIFF/WAVE payload in the
    requested coding: 'pcm16', 'ulaw', 'alaw' or 'ima_adpcm'.  The
    compressed codings carry a fact chunk with the true frame count per
    the WAVE spec.  Fixture generator AND the audio K-sink analog."""
    import struct

    x = np.asarray(x, dtype=np.int16)
    if x.ndim == 1:
        x = x[:, None]
    n, nch = x.shape
    if fmt == "pcm16":
        tag, ba, bits, ext = _WAVE_FMT_PCM, 2 * nch, 16, b""
        body = x.astype("<i2").tobytes()
    elif fmt in ("ulaw", "alaw"):
        tag = _WAVE_FMT_ULAW if fmt == "ulaw" else _WAVE_FMT_ALAW
        ba, bits, ext = nch, 8, struct.pack("<H", 0)
        body = g711_encode(x.reshape(-1), fmt).tobytes()
    elif fmt == "ima_adpcm":
        tag, ba, bits = _WAVE_FMT_IMA_ADPCM, block_align, 4
        spb = (block_align - 4 * nch) * 2 // nch + 1
        ext = struct.pack("<HH", 2, spb)
        out = bytearray()
        preds = [0] * nch
        idxs = [0] * nch
        for start in range(0, n, spb):
            frame = x[start:start + spb]
            if len(frame) < spb:  # zero-pad the tail block
                frame = np.vstack([frame, np.zeros(
                    (spb - len(frame), nch), dtype=np.int16)])
            grouped: list[list[int]] = []
            for c in range(nch):
                preds[c] = int(frame[0, c])
                out += struct.pack("<hBB", preds[c], idxs[c], 0)
                nibs, preds[c], idxs[c] = _ima_encode_nibbles(
                    frame[1:, c], preds[c], idxs[c])
                grouped.append(nibs)
            if nch == 1:
                stream = grouped[0]
            else:  # alternate 8-nibble groups per channel
                stream = []
                for g in range(0, len(grouped[0]), 8):
                    stream += grouped[0][g:g + 8] + grouped[1][g:g + 8]
            for lo, hi in zip(stream[0::2], stream[1::2]):
                out.append(lo | (hi << 4))
        body = bytes(out)
    else:
        raise ValueError(f"unknown wav coding: {fmt}")
    import struct as _s
    if tag == _WAVE_FMT_IMA_ADPCM:
        byte_rate = rate * block_align // spb  # informational average
    else:
        byte_rate = rate * ba
    fmt_chunk = _s.pack("<HHIIHH", tag, nch, rate, byte_rate, ba,
                        bits) + ext
    chunks = b"fmt " + _s.pack("<I", len(fmt_chunk)) + fmt_chunk
    if len(fmt_chunk) % 2:
        chunks += b"\x00"
    if tag != _WAVE_FMT_PCM:
        chunks += b"fact" + _s.pack("<II", 4, n)
    chunks += b"data" + _s.pack("<I", len(body)) + body
    if len(body) % 2:
        chunks += b"\x00"
    return b"RIFF" + _s.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL audio decode with zero external deps — own RIFF parser, so
    compressed codings decode too: PCM (8/16/32-bit int), IEEE float32,
    G.711 u-law/A-law, and IMA ADPCM (wFormatTag 0x11).  Returns
    (samples, rate) where samples is float32 (n_frames, n_channels)
    scaled to [-1, 1].  Raises ValueError on malformed payloads — the
    stage keeps the row and records decode_status (never drops)."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError("file does not start with RIFF id")
    if payload[8:12] != b"WAVE":
        raise ValueError("not a WAVE file")
    fmt_body = data = None
    fact_frames = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        if cid == b"fmt ":
            fmt_body = payload[pos + 8:pos + 8 + size]
        elif cid == b"data":
            data = payload[pos + 8:pos + 8 + size]
        elif cid == b"fact" and size >= 4:
            fact_frames = int.from_bytes(
                payload[pos + 8:pos + 12], "little")
        pos += 8 + size + (size & 1)
    if fmt_body is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if len(fmt_body) < 16:
        raise ValueError("truncated fmt chunk")
    tag, nch, rate, _brate, balign, bits = struct.unpack(
        "<HHIIHH", fmt_body[:16])
    if nch < 1:
        raise ValueError("bad channel count")
    if tag == _WAVE_FMT_PCM:
        if bits == 8:  # 8-bit PCM is unsigned
            x = np.frombuffer(data, dtype=np.uint8).astype(np.float32)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(
                data[:len(data) - len(data) % 2], dtype="<i2"
            ).astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(
                data[:len(data) - len(data) % 4], dtype="<i4"
            ).astype(np.float32) / 2147483648.0
        else:
            raise ValueError(f"unsupported PCM sample width: {bits // 8}")
    elif tag == _WAVE_FMT_FLOAT:
        if bits != 32:
            raise ValueError(f"unsupported float sample width: {bits}")
        x = np.frombuffer(
            data[:len(data) - len(data) % 4], dtype="<f4"
        ).astype(np.float32)
    elif tag in (_WAVE_FMT_ULAW, _WAVE_FMT_ALAW):
        law = "ulaw" if tag == _WAVE_FMT_ULAW else "alaw"
        codes = np.frombuffer(data, dtype=np.uint8)
        x = _g711_table(law)[codes].astype(np.float32) / 32768.0
    elif tag == _WAVE_FMT_IMA_ADPCM:
        x = decode_ima_adpcm(data, nch, balign).astype(
            np.float32) / 32768.0
        # fact chunk carries the true frame count (WAVE spec for
        # compressed codings): trim the final block's pad tail so
        # decode(encode(x)) is frame-count exact
        if fact_frames is not None and 0 < fact_frames <= len(x):
            x = x[:fact_frames]
        return x, rate  # decode_ima_adpcm already returns (n, nch)
    else:
        raise ValueError(f"unsupported WAVE format tag: 0x{tag:04x}")
    x = x[:len(x) - len(x) % nch].reshape(-1, nch)
    if fact_frames is not None and 0 < fact_frames <= len(x):
        x = x[:fact_frames]
    return x, rate


class RawAudioStage:
    """Actor stage over an audio-payload dataset (media_ref, payload):
    REAL WAV decode -> scalar features + a fixed-length windowed RMS
    envelope (the audio analog of FrameSampler: n_windows equal slices,
    vectorized block RMS).  Failed rows keep their row with
    decode_status set.

    Feature layout (float32): [duration_s, sample_rate, n_channels,
    rms, peak, zero_crossing_rate]; envelope is list<float32> of
    `n_windows` per-slice RMS values."""

    def __init__(self, n_windows: int = 8):
        self.n_windows = n_windows

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        feats, envs, status = [], [], []
        for p in payloads:
            try:
                x, rate = decode_wav(p)
            except (ValueError, EOFError) as exc:
                feats.append(None)
                envs.append(None)
                status.append(f"decode_error: {exc}")
                continue
            mono = x.mean(axis=1)
            n = len(mono)
            if n == 0:
                feats.append(None)
                envs.append(None)
                status.append("decode_error: empty stream")
                continue
            rms = float(np.sqrt(np.mean(mono ** 2)))
            peak = float(np.abs(mono).max())
            zcr = float(np.count_nonzero(
                np.signbit(mono[1:]) != np.signbit(mono[:-1])) / n)
            feats.append(np.array(
                [n / rate, rate, x.shape[1], rms, peak, zcr],
                dtype=np.float32).tolist())
            # equal-slice RMS envelope: truncate to a multiple of
            # n_windows, then one vectorized reshape-mean
            k = self.n_windows
            m = (n // k) * k
            if m == 0:
                env = np.zeros(k, dtype=np.float32)
                env[0] = rms
            else:
                env = np.sqrt(
                    (mono[:m].reshape(k, m // k) ** 2).mean(axis=1))
            envs.append(env.astype(np.float32).tolist())
            status.append("ok")
        return pa.table(
            {
                "media_ref": pa.array(refs, type=pa.string()),
                "feature": pa.array(feats, type=pa.list_(pa.float32())),
                "rms_envelope": pa.array(envs, type=pa.list_(pa.float32())),
                "decode_status": pa.array(status, type=pa.string()),
            }
        )


def wav_audio_features(
    media: ray.data.Dataset,
    n_windows: int = 8,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 16,
) -> ray.data.Dataset:
    """Audio-payload dataset -> decoded WAV features + RMS envelope.

    Same sizing contract as raw_media_features: small batches because
    payload rows carry real audio bytes (1 s of 16-bit 16 kHz mono is
    ~32 KB/row), actor pool so any heavier decoder loads once per
    actor."""
    return media.map_batches(
        RawAudioStage,
        fn_constructor_kwargs={"n_windows": n_windows},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


# --------------------------------------------------------------------------
# Raw video container ("RAWV"): the video analog of decode_raw_rgb /
# decode_wav — a real, seekable kernel with no external codec.  Layout:
#   header  <4s magic "RAWV"> <u16 width> <u16 height> <u32 n_frames>
#           <u16 fps>                                  (little-endian, 14 B)
#   body    n_frames raw RGB888 frames, each width*height*3 bytes
# The point of the format is the SCALE property real frame sampling
# relies on: any frame is addressable by byte offset, so a sampler
# touches O(sampled) bytes, never O(video).

_RAWV_MAGIC = b"RAWV"
_RAWV_HEADER = struct.Struct("<4sHHIH")


def encode_raw_video(frames: np.ndarray, fps: int = 25) -> bytes:
    """(n, h, w, 3) uint8 -> RAWV payload."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, c = frames.shape
    if c != 3:
        raise ValueError(f"expected RGB frames, got {c} channels")
    return _RAWV_HEADER.pack(_RAWV_MAGIC, w, h, n, fps) + frames.tobytes()


def raw_video_header(payload: bytes) -> tuple[int, int, int, int]:
    """-> (width, height, n_frames, fps); validates magic and length."""
    if len(payload) < _RAWV_HEADER.size:
        raise ValueError("payload shorter than RAWV header")
    magic, w, h, n, fps = _RAWV_HEADER.unpack_from(payload, 0)
    if magic != _RAWV_MAGIC:
        raise ValueError("bad RAWV magic")
    if len(payload) < _RAWV_HEADER.size + n * w * h * 3:
        raise ValueError("RAWV payload truncated")
    return w, h, n, fps


def decode_raw_video_frame(payload: bytes, idx: int) -> np.ndarray:
    """Random-access single-frame decode: a byte-offset slice +
    frombuffer — O(frame), independent of video length."""
    w, h, n, _fps = raw_video_header(payload)
    if not 0 <= idx < n:
        raise ValueError(f"frame {idx} out of range [0,{n})")
    fsz = w * h * 3
    off = _RAWV_HEADER.size + idx * fsz
    return np.frombuffer(payload, dtype=np.uint8,
                         count=fsz, offset=off).reshape(h, w, 3)


class RawVideoStage:
    """Actor stage over (media_ref, payload): REAL frame sampling —
    read the header, pick `n_frames` evenly-spaced frame indices, decode
    ONLY those frames by offset, emit one row per sampled frame with
    channel-mean+luma features and a motion score (mean |diff| against
    the previously sampled frame; null for the first).  Failed payloads
    keep ONE row with decode_status set (no silent drops)."""

    def __init__(self, n_frames: int = 4):
        self.n = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        o_ref, o_idx, o_ts, o_feat, o_motion, o_status = [], [], [], [], [], []
        for r, p in zip(refs, payloads):
            try:
                w, h, n, fps = raw_video_header(p)
            except (ValueError, TypeError) as exc:
                o_ref.append(r)
                o_idx.append(None)
                o_ts.append(None)
                o_feat.append(None)
                o_motion.append(None)
                o_status.append(f"decode_error: {exc}")
                continue
            take = np.unique(np.linspace(
                0, n - 1, num=min(self.n, n), dtype=np.int64))
            prev = None
            for i in take:
                img = decode_raw_video_frame(p, int(i)).astype(np.float32)
                mean = img.mean(axis=(0, 1))
                luma = 0.299 * mean[0] + 0.587 * mean[1] + 0.114 * mean[2]
                o_ref.append(r)
                o_idx.append(int(i))
                o_ts.append(int(i) * 1000 // max(fps, 1))
                o_feat.append(np.concatenate([mean, [luma]])
                              .astype(np.float32).tolist())
                o_motion.append(
                    None if prev is None
                    else float(np.abs(img - prev).mean()))
                o_status.append("ok")
                prev = img
        return pa.table(
            {
                "media_ref": pa.array(o_ref, type=pa.string()),
                "frame_index": pa.array(o_idx, type=pa.int32()),
                "ts_ms": pa.array(o_ts, type=pa.int64()),
                "feature": pa.array(o_feat, type=pa.list_(pa.float32())),
                "motion": pa.array(o_motion, type=pa.float32()),
                "decode_status": pa.array(o_status, type=pa.string()),
            }
        )


def raw_video_frames(
    media: ray.data.Dataset,
    n_frames: int = 4,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 4,
) -> ray.data.Dataset:
    """Video-payload dataset -> per-sampled-frame feature rows.

    batch_size defaults SMALLEST of the media stages (4): a video row is
    n_frames x w x h x 3 bytes (a 100-frame 224p clip is ~15 MB), so
    batch x concurrency must stay within a worker heap; a real
    deployment passes refs and range-reads from the store instead of
    shipping payloads through the object store."""
    return media.map_batches(
        RawVideoStage,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


# ---------------------------------------------------------------------------
# container-header metadata extraction (no decode)

def probe_image_header(payload: bytes) -> dict:
    """Extract (format, width, height, channels) from an image
    container HEADER without decoding pixel data — the metadata pass a
    100 TB media ingest runs before deciding what to decode at all.
    Pure-stdlib parsers for the self-describing containers:

    - PNG: IHDR chunk (width/height big-endian u32 at fixed offsets,
      color type -> channel count) — public PNG spec.
    - JPEG/JFIF: scan marker segments for the first SOF0-SOF15 frame
      header (precision u8, height u16, width u16, components u8) —
      public JPEG spec; entropy data is never touched.
    - PNM (P5/P6): existing decode_pnm header rule, reused.
    - GIF: logical-screen-descriptor dims (little-endian u16 at 6/8).
    - BMP: BITMAPINFOHEADER dims (signed; negative height = top-down).

    Unknown/truncated payloads return format="unknown" with -1 dims
    (rows are kept; the error surfaces in the column, never a drop)."""
    bad = {"format": "unknown", "width": -1, "height": -1,
           "channels": -1}
    if payload is None or len(payload) < 8:
        return bad
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if len(payload) < 33 or payload[12:16] != b"IHDR":
            return bad
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        color_type = payload[25]
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type, -1)
        return {"format": "png", "width": w, "height": h,
                "channels": channels}
    if payload[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        n = len(payload)
        while i + 4 <= n:
            if payload[i] != 0xFF:
                return bad
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            if i + 4 > n:
                return bad
            seglen = int.from_bytes(payload[i + 2:i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8,
                                                         0xCC):
                if i + 9 > n:
                    return bad
                h = int.from_bytes(payload[i + 5:i + 7], "big")
                w = int.from_bytes(payload[i + 7:i + 9], "big")
                comps = payload[i + 9]
                return {"format": "jpeg", "width": w, "height": h,
                        "channels": comps}
            if marker == 0xDA:  # start of scan: no SOF seen before it
                return bad
            i += 2 + seglen
        return bad
    if payload[:2] in (b"P5", b"P6"):
        try:
            vals, _ = _pnm_header_tokens(payload, 3, 2)
            return {"format": "pnm", "width": vals[0],
                    "height": vals[1],
                    "channels": 3 if payload[:2] == b"P6" else 1}
        except Exception:
            return bad
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        if len(payload) < 13:
            return bad
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        return {"format": "gif", "width": w, "height": h, "channels": 3}
    if payload[:2] == b"BM" and len(payload) >= 30:
        hdr_size = int.from_bytes(payload[14:18], "little")
        if hdr_size < 40 or len(payload) < 54:
            return bad
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = abs(int.from_bytes(payload[22:26], "little", signed=True))
        bpp = int.from_bytes(payload[28:30], "little")
        return {"format": "bmp", "width": w, "height": h,
                "channels": 1 if bpp == 8 else 3}
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        bo = "little" if payload[:2] == b"II" else "big"
        try:
            ifd = int.from_bytes(payload[4:8], bo)
            n = int.from_bytes(payload[ifd:ifd + 2], bo)
            vals = {}
            for i in range(n):
                e = ifd + 2 + 12 * i
                tag = int.from_bytes(payload[e:e + 2], bo)
                typ = int.from_bytes(payload[e + 2:e + 4], bo)
                sz = {1: 1, 3: 2, 4: 4}.get(typ)
                if tag in (256, 257, 277) and sz:
                    vals[tag] = int.from_bytes(
                        payload[e + 8:e + 8 + sz], bo)
            if 256 in vals and 257 in vals:
                return {"format": "tiff", "width": vals[256],
                        "height": vals[257],
                        "channels": vals.get(277, 1)}
        except Exception:
            return bad
        return bad
    return bad


def image_header_stats(
    docs,
    payload_col: str = "payload",
    id_col: str = "doc_id",
):
    """Per-row header metadata as a streaming vectorized-per-batch
    pass: (id, format, width, height, channels, pixels).  No pixel
    decode, no shuffle — the pre-filter stage ahead of any decode
    actor pool."""

    def probe(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        metas = [probe_image_header(v) for v in df[payload_col]]
        out = pd.DataFrame({
            id_col: df[id_col],
            "format": [m["format"] for m in metas],
            "width": np.array([m["width"] for m in metas], "int64"),
            "height": np.array([m["height"] for m in metas], "int64"),
            "channels": np.array([m["channels"] for m in metas],
                                 "int64"),
        })
        out["pixels"] = np.where(
            (out["width"] > 0) & (out["height"] > 0),
            out["width"] * out["height"], np.int64(-1))
        return out

    return docs.map_batches(probe, batch_format="pyarrow")


# --------------------------------------------------------------------------
# MP4/ISO-BMFF DEMUX (real box walk + sample tables; codec payloads stay
# encoded).  What IS real with zero codec libs: the container parse —
# ftyp brand, movie/track metadata (mvhd/tkhd/mdhd/hdlr/stsd), and the
# full sample-location machinery (stsz sizes, stsc sample->chunk runs,
# stco/co64 chunk offsets) that maps any sample index to its exact byte
# range in mdat.  That is the property frame SAMPLING needs at scale:
# extracting k frames from an hour-long file touches O(k) byte ranges,
# never O(file).  Decoding the extracted H.264/AAC payload is the one
# remaining stub (documented at module top); the demux emits the raw
# sample bytes + metadata so a real decoder slots in per-sample.

_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl",
                   b"edts", b"udta", b"mvex", b"dinf"}


def _mp4_boxes(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for the sibling boxes in
    buf[start:end].  Handles 32-bit sizes, size==1 (64-bit largesize)
    and size==0 (to end-of-enclosure); malformed sizes raise."""
    import struct as _s

    pos = start
    while pos + 8 <= end:
        size = _s.unpack_from(">I", buf, pos)[0]
        typ = buf[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            size = _s.unpack_from(">Q", buf, pos + 8)[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"bad box size {size} at {pos}")
        yield typ, body, pos + size
        pos += size


def _mp4_find(buf: bytes, start: int, end: int, path: list[bytes]):
    """All (body_start, body_end) spans reachable by the box path."""
    spans = [(start, end)]
    for name in path:
        nxt = []
        for s, e in spans:
            for typ, bs, be in _mp4_boxes(buf, s, e):
                if typ == name:
                    nxt.append((bs, be))
        spans = nxt
    return spans


def mp4_sample_table(payload: bytes, track: int = 0):
    """Sample byte ranges of one track: (offsets, sizes) int64 arrays.

    stsc runs (first_chunk, samples_per_chunk) expand against stco/co64
    chunk offsets; within a chunk samples are contiguous with stsz
    sizes — the ISO 14496-12 location algorithm, vectorized."""
    import struct as _s

    traks = _mp4_find(payload, 0, len(payload), [b"moov", b"trak"])
    if track >= len(traks):
        raise ValueError(f"no track {track} (found {len(traks)})")
    ts, te = traks[track]
    stbl = _mp4_find(payload, ts, te, [b"mdia", b"minf", b"stbl"])
    if not stbl:
        raise ValueError("track has no sample table")
    ss, se = stbl[0]
    tables: dict[bytes, tuple[int, int]] = {}
    for typ, bs, be in _mp4_boxes(payload, ss, se):
        tables[typ] = (bs, be)

    def _u32s(span, skip, count):
        bs, _ = span
        return np.frombuffer(payload, dtype=">u4",
                             count=count, offset=bs + skip)

    if b"stsz" not in tables:
        raise ValueError("missing stsz")
    bs, _ = tables[b"stsz"]
    fixed, n_samples = _s.unpack_from(">II", payload, bs + 4)
    sizes = (np.full(n_samples, fixed, dtype=np.int64) if fixed
             else _u32s(tables[b"stsz"], 12, n_samples).astype(np.int64))

    co = tables.get(b"stco")
    if co is not None:
        n_chunks = _s.unpack_from(">I", payload, co[0] + 4)[0]
        chunk_off = _u32s(co, 8, n_chunks).astype(np.int64)
    else:
        co = tables.get(b"co64")
        if co is None:
            raise ValueError("missing stco/co64")
        n_chunks = _s.unpack_from(">I", payload, co[0] + 4)[0]
        chunk_off = np.frombuffer(payload, dtype=">u8", count=n_chunks,
                                  offset=co[0] + 8).astype(np.int64)

    if b"stsc" not in tables:
        raise ValueError("missing stsc")
    bs, _ = tables[b"stsc"]
    n_runs = _s.unpack_from(">I", payload, bs + 4)[0]
    runs = _u32s(tables[b"stsc"], 8, 3 * n_runs).reshape(
        n_runs, 3).astype(np.int64)  # (first_chunk 1-based, spc, desc)

    # expand runs -> samples-per-chunk for every chunk
    spc = np.empty(n_chunks, dtype=np.int64)
    for i in range(n_runs):
        lo = runs[i, 0] - 1
        hi = runs[i + 1, 0] - 1 if i + 1 < n_runs else n_chunks
        spc[lo:hi] = runs[i, 1]
    counts = np.minimum(np.cumsum(spc), n_samples)
    starts = np.concatenate([[0], counts[:-1]])
    offsets = np.empty(n_samples, dtype=np.int64)
    pos = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    for c in range(n_chunks):
        s0, s1 = int(starts[c]), int(counts[c])
        if s1 <= s0:
            continue
        rel = pos[s0:s1] - pos[s0]
        offsets[s0:s1] = chunk_off[c] + rel
    return offsets, sizes


def probe_mp4(payload: bytes) -> dict:
    """Container metadata without touching sample data: brand,
    movie-level duration, and per-track (handler, codec fourcc,
    width/height, sample count, timescale).  Raises ValueError on
    malformed boxes (stage keeps the row)."""
    import struct as _s

    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF/MP4 payload")
    brand = payload[8:12].decode("latin-1")
    out: dict = {"brand": brand, "tracks": []}
    moov = _mp4_find(payload, 0, len(payload), [b"moov"])
    if not moov:
        raise ValueError("missing moov box")
    ms, me = moov[0]
    for typ, bs, be in _mp4_boxes(payload, ms, me):
        if typ == b"mvhd":
            ver = payload[bs]
            if ver == 1:
                tscale, dur = _s.unpack_from(">IQ", payload, bs + 20)
            else:
                tscale, dur = _s.unpack_from(">II", payload, bs + 12)
            out["duration_s"] = round(dur / tscale, 3) if tscale else None
    for ts, te in _mp4_find(payload, ms, me, [b"trak"]):
        tr: dict = {}
        for mds, mde in _mp4_find(payload, ts, te, [b"mdia"]):
            for typ, bs, be in _mp4_boxes(payload, mds, mde):
                if typ == b"mdhd":
                    ver = payload[bs]
                    off = 20 if ver == 1 else 12
                    tr["timescale"] = _s.unpack_from(
                        ">I", payload, bs + off)[0]
                elif typ == b"hdlr":
                    tr["handler"] = payload[bs + 8:bs + 12].decode(
                        "latin-1")
            for sts, ste in _mp4_find(payload, mds, mde,
                                      [b"minf", b"stbl"]):
                for typ, bs, be in _mp4_boxes(payload, sts, ste):
                    if typ == b"stsd":
                        # first sample entry: size(4) fourcc(4)
                        tr["codec"] = payload[bs + 12:bs + 16].decode(
                            "latin-1")
                        if tr.get("handler") == "vide" and be - bs >= 44:
                            w, h = _s.unpack_from(
                                ">HH", payload, bs + 40)
                            tr["width"], tr["height"] = w, h
                    elif typ == b"stsz":
                        tr["sample_count"] = _s.unpack_from(
                            ">I", payload, bs + 8)[0]
        out["tracks"].append(tr)
    return out


class Mp4SampleExtractor:
    """Actor stage over (media_ref, payload) MP4 rows: demux the first
    video (or only) track and extract `n_samples` evenly-spaced coded
    samples — raw codec payload bytes located via the sample tables,
    NOT decoded (the documented codec stub).  Emits per-sample
    (sample_idx, offset, size, crc32) plus track metadata; failed rows
    keep their row with demux_status set."""

    def __init__(self, n_samples: int = 4):
        self.n_samples = n_samples

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib as _z

        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        o_ref, o_idx, o_off, o_size, o_crc = [], [], [], [], []
        o_codec, o_status = [], []
        for ref, p in zip(refs, payloads):
            try:
                meta = probe_mp4(p)
                vid = next((i for i, t in enumerate(meta["tracks"])
                            if t.get("handler") == "vide"), 0)
                offsets, sizes = mp4_sample_table(p, vid)
                n = len(offsets)
                if n == 0:
                    raise ValueError("track has no samples")
                picks = np.unique(np.linspace(
                    0, n - 1, min(self.n_samples, n)).astype(np.int64))
                codec = meta["tracks"][vid].get("codec", "")
                for k in picks:
                    off, sz = int(offsets[k]), int(sizes[k])
                    blob = p[off:off + sz]
                    if len(blob) != sz:
                        raise ValueError(
                            f"sample {k} out of file bounds")
                    o_ref.append(ref)
                    o_idx.append(int(k))
                    o_off.append(off)
                    o_size.append(sz)
                    o_crc.append(_z.crc32(blob))
                    o_codec.append(codec)
                    o_status.append("ok")
            except (ValueError, IndexError, EOFError) as exc:
                o_ref.append(ref)
                o_idx.append(-1)
                o_off.append(-1)
                o_size.append(-1)
                o_crc.append(0)
                o_codec.append("")
                o_status.append(f"demux_error: {exc}")
        return pa.table({
            "media_ref": pa.array(o_ref, type=pa.string()),
            "sample_idx": pa.array(o_idx, type=pa.int64()),
            "offset": pa.array(o_off, type=pa.int64()),
            "size": pa.array(o_size, type=pa.int64()),
            "crc32": pa.array(o_crc, type=pa.int64()),
            "codec": pa.array(o_codec, type=pa.string()),
            "demux_status": pa.array(o_status, type=pa.string()),
        })


def mp4_sample_features(
    media: ray.data.Dataset,
    n_samples: int = 4,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 8,
) -> ray.data.Dataset:
    """MP4 payload dataset -> demuxed sample inventory (metadata +
    located coded bytes' crc32).  Small batches: MP4 payloads are the
    largest media rows."""
    return media.map_batches(
        Mp4SampleExtractor,
        fn_constructor_kwargs={"n_samples": n_samples},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


# --------------------------------------------------------------------------
# MP3 / MPEG-audio DEMUX (real frame walk; codec payloads stay encoded).
# The MP4 treatment applied to MPEG audio: what IS real with zero codec
# libs is the container layer — ID3v2/ID3v1 tag skipping, the 4-byte
# frame-header parse (version / layer / bitrate / sample-rate / channel
# mode, ISO 11172-3 & 13818-3 tables), the Xing/Info VBR tag, and the
# full frame table mapping any frame index to its exact byte range (the
# frame-size formula: Layer I (12*br/sr + pad)*4 slots, Layers II/III
# spf/8*br/sr + pad).  That gives O(sampled) frame extraction from an
# hour-long stream.  Decoding the extracted Layer I/II/III audio payload
# is the one remaining stub (documented at module top); the demux emits
# raw frame bytes + metadata so a real decoder slots in per-frame.

# kbps tables indexed by bitrate_index 1..14 (0 = "free format"
# unsupported here, 15 = invalid).  Keyed (version_group, layer):
# version_group "1" = MPEG1, "2" = MPEG2/2.5 (which share tables,
# layers II and III also share one table).
_MP3_BITRATES = {
    ("1", 1): (32, 64, 96, 128, 160, 192, 224, 256,
               288, 320, 352, 384, 416, 448),
    ("1", 2): (32, 48, 56, 64, 80, 96, 112, 128,
               160, 192, 224, 256, 320, 384),
    ("1", 3): (32, 40, 48, 56, 64, 80, 96, 112,
               128, 160, 192, 224, 256, 320),
    ("2", 1): (32, 48, 56, 64, 80, 96, 112, 128,
               144, 160, 176, 192, 224, 256),
    ("2", 2): (8, 16, 24, 32, 40, 48, 56, 64,
               80, 96, 112, 128, 144, 160),
}
_MP3_RATES = {"1": (44100, 48000, 32000), "2": (22050, 24000, 16000),
              "2.5": (11025, 12000, 8000)}


def _mp3_parse_header(buf: bytes, pos: int) -> dict:
    """Parse the 4-byte MPEG audio frame header at buf[pos:].  Returns
    the decoded fields incl. the exact frame_size in bytes; raises
    ValueError on anything that is not a valid, sized frame header
    (free-format bitrate 0 included — no frame size without it)."""
    if pos + 4 > len(buf):
        raise ValueError("mp3 header truncated")
    h = int.from_bytes(buf[pos:pos + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:
        raise ValueError("mp3 frame sync lost")
    ver_bits = (h >> 19) & 0x3
    version = {0: "2.5", 2: "2", 3: "1"}.get(ver_bits)
    if version is None:
        raise ValueError("mp3 reserved version")
    layer = {1: 3, 2: 2, 3: 1}.get((h >> 17) & 0x3)
    if layer is None:
        raise ValueError("mp3 reserved layer")
    br_idx = (h >> 12) & 0xF
    if br_idx == 0:
        raise ValueError("mp3 free-format bitrate unsupported")
    if br_idx == 15:
        raise ValueError("mp3 invalid bitrate index")
    sr_idx = (h >> 10) & 0x3
    if sr_idx == 3:
        raise ValueError("mp3 invalid sample-rate index")
    if (h & 0x3) == 2:
        raise ValueError("mp3 reserved emphasis")
    group = "1" if version == "1" else "2"
    bitrate = _MP3_BITRATES[(group, min(layer, 2) if group == "2" and
                             layer >= 2 else layer)][br_idx - 1]
    rate = _MP3_RATES[version][sr_idx]
    padding = (h >> 9) & 0x1
    mode_bits = (h >> 6) & 0x3
    mode = ("stereo", "joint_stereo", "dual_channel", "mono")[mode_bits]
    if layer == 1:
        spf = 384
        size = (12 * bitrate * 1000 // rate + padding) * 4
    else:
        spf = 576 if (layer == 3 and version != "1") else 1152
        size = spf // 8 * bitrate * 1000 // rate + padding
    return {
        "version": version, "layer": layer, "bitrate_kbps": bitrate,
        "sample_rate": rate, "padding": padding, "mode": mode,
        "mode_extension": (h >> 4) & 0x3,
        "channels": 1 if mode == "mono" else 2,
        "crc_protected": not (h >> 16) & 0x1,
        "samples_per_frame": spf, "frame_size": size,
    }


def _mp3_skip_id3v2(payload: bytes) -> int:
    """Byte offset of the first audio frame candidate: past a leading
    ID3v2 tag (10-byte header, 4-byte syncsafe size, optional footer)
    if present, else 0."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    flags = payload[5]
    size = 0
    for b in payload[6:10]:
        if b & 0x80:
            raise ValueError("mp3 ID3v2 size not syncsafe")
        size = (size << 7) | b
    return 10 + size + (10 if flags & 0x10 else 0)


def mp3_frame_table(payload: bytes):
    """Frame byte ranges of an MPEG audio stream: (offsets, sizes,
    bitrates_kbps) int64 arrays — the seek index that makes k-frame
    sampling O(k) bytes touched.  Strict walk: version/layer/sample
    rate must stay constant (bitrate may vary — VBR), and the stream
    must end exactly at a frame boundary, optionally followed by a
    128-byte ID3v1 'TAG' block.  Anything else raises ValueError."""
    pos = _mp3_skip_id3v2(payload)
    end = len(payload)
    offs: list[int] = []
    sizes: list[int] = []
    brs: list[int] = []
    first: dict | None = None
    while pos < end:
        if payload[pos:pos + 3] == b"TAG" and end - pos == 128:
            break  # trailing ID3v1 tag
        hdr = _mp3_parse_header(payload, pos)
        if first is None:
            first = hdr
        elif (hdr["version"], hdr["layer"], hdr["sample_rate"]) != (
                first["version"], first["layer"], first["sample_rate"]):
            raise ValueError("mp3 header parameters changed mid-stream")
        if pos + hdr["frame_size"] > end:
            raise ValueError("mp3 final frame truncated")
        offs.append(pos)
        sizes.append(hdr["frame_size"])
        brs.append(hdr["bitrate_kbps"])
        pos += hdr["frame_size"]
    if first is None:
        raise ValueError("mp3 stream has no frames")
    return (np.asarray(offs, dtype=np.int64),
            np.asarray(sizes, dtype=np.int64),
            np.asarray(brs, dtype=np.int64))


def probe_mp3(payload: bytes) -> dict:
    """Stream metadata without touching frame payloads beyond the walk:
    first-frame parameters, frame/sample counts, duration, mean
    bitrate, VBR flag, and the Xing/Info VBR tag (frame/byte counts)
    if the first frame carries one."""
    start = _mp3_skip_id3v2(payload)
    first = _mp3_parse_header(payload, start)
    offs, sizes, brs = mp3_frame_table(payload)
    n = len(offs)
    n_samples = n * first["samples_per_frame"]
    # Xing/Info tag sits after the Layer III side info of frame 0.
    xing = None
    if first["layer"] == 3:
        side = (17 if first["mode"] == "mono" else 32) \
            if first["version"] == "1" else \
            (9 if first["mode"] == "mono" else 17)
        p = start + 4 + (2 if first["crc_protected"] else 0) + side
        tag = payload[p:p + 4]
        if tag in (b"Xing", b"Info"):
            flags = int.from_bytes(payload[p + 4:p + 8], "big")
            xing = {"tag": tag.decode("ascii"), "flags": flags}
            q = p + 8
            if flags & 0x1:
                xing["frames"] = int.from_bytes(payload[q:q + 4], "big")
                q += 4
            if flags & 0x2:
                xing["bytes"] = int.from_bytes(payload[q:q + 4], "big")
    return {
        "version": first["version"], "layer": first["layer"],
        "sample_rate": first["sample_rate"],
        "channels": first["channels"], "mode": first["mode"],
        "n_frames": n, "n_samples": n_samples,
        "duration_s": round(n_samples / first["sample_rate"], 3),
        "bitrate_kbps_mean": round(float(np.mean(brs)), 3),
        "vbr": bool(len(np.unique(brs)) > 1),
        "id3v2_bytes": start, "xing": xing,
    }


class Mp3FrameExtractor:
    """Actor stage over (media_ref, payload) MPEG-audio rows: walk the
    frame table and extract `n_frames` evenly-spaced coded frames —
    raw frame bytes located by byte range, NOT decoded (the documented
    codec stub).  Emits per-frame (frame_idx, offset, size,
    bitrate_kbps, crc32) plus stream metadata; failed rows keep their
    row with demux_status set (mirrors Mp4SampleExtractor)."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib as _z

        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        o_ref, o_idx, o_off, o_size = [], [], [], []
        o_br, o_crc, o_rate, o_status = [], [], [], []
        for ref, p in zip(refs, payloads):
            try:
                meta = probe_mp3(p)
                offsets, sizes, brs = mp3_frame_table(p)
                picks = np.unique(np.linspace(
                    0, len(offsets) - 1,
                    min(self.n_frames, len(offsets))).astype(np.int64))
                for k in picks:
                    off, sz = int(offsets[k]), int(sizes[k])
                    o_ref.append(ref)
                    o_idx.append(int(k))
                    o_off.append(off)
                    o_size.append(sz)
                    o_br.append(int(brs[k]))
                    o_crc.append(_z.crc32(p[off:off + sz]))
                    o_rate.append(meta["sample_rate"])
                    o_status.append("ok")
            except (ValueError, IndexError, EOFError) as exc:
                o_ref.append(ref)
                o_idx.append(-1)
                o_off.append(-1)
                o_size.append(-1)
                o_br.append(-1)
                o_crc.append(0)
                o_rate.append(-1)
                o_status.append(f"demux_error: {exc}")
        return pa.table({
            "media_ref": pa.array(o_ref, type=pa.string()),
            "frame_idx": pa.array(o_idx, type=pa.int64()),
            "offset": pa.array(o_off, type=pa.int64()),
            "size": pa.array(o_size, type=pa.int64()),
            "bitrate_kbps": pa.array(o_br, type=pa.int64()),
            "crc32": pa.array(o_crc, type=pa.int64()),
            "sample_rate": pa.array(o_rate, type=pa.int64()),
            "demux_status": pa.array(o_status, type=pa.string()),
        })


def mp3_frame_features(
    media: ray.data.Dataset,
    n_frames: int = 4,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 16,
) -> ray.data.Dataset:
    """MP3 payload dataset -> demuxed frame inventory (metadata +
    located coded bytes' crc32).  Small batches — audio payloads are
    large media rows."""
    return media.map_batches(
        Mp3FrameExtractor,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


# --- MPEG-1/2 Layer I frame decode (ISO 11172-3 / 13818-3 §2.4.2.5) -------
# Layer I is the one MPEG-audio layer whose payload decode is PURELY
# formula-derived — 4-bit linear allocation codes, a 2^(1-i/3)
# scalefactor law and the (s/2^(nb-1) - 1 + 2^(1-nb)) * 2^nb/(2^nb-1)
# requantizer; no tabulated allocation classes (Layer II) or Huffman
# tables (Layer III).  Decode stops at EXACT subband samples: the
# 32-band polyphase synthesis window D is tabulated data in the
# standard (Annex 3-B.3), so PCM reconstruction stays out of scope and
# the subband-domain samples (the time-frequency representation the
# psychoacoustic layer actually codes) are the decoder's output —
# exactly what a feature-extraction pipeline consumes.  Layer II and
# (partially) Layer III have their own decoders below.


class _BitReader:
    """MSB-first bit reader over bytes (frame-local — a Layer I frame
    is <= ~8 KiB, so per-frame Python int shifting is fine)."""

    def __init__(self, buf: bytes, bit_pos: int = 0):
        self.buf = buf
        self.pos = bit_pos

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.buf) * 8:
            raise ValueError("layer1 frame truncated mid-field")
        out = 0
        pos = self.pos
        while n:
            byte = self.buf[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(n, avail)
            out = (out << take) | (
                (byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return out


def _mp1_requantize(code: int, nb: int) -> float:
    """Layer I requantizer (§2.4.3.2.1): MSB-inverted two's-complement
    fraction s''' = code/2^(nb-1) - 1, then
    s'' = (s''' + 2^(1-nb)) * 2^nb/(2^nb - 1).  Encoders use
    2^nb - 1 LEVELS (the all-ones code is excluded to avoid sync
    emulation), which makes the grid symmetric in (-1, 1); the decoder
    stays permissive on all-ones input like real decoders."""
    frac = code / float(1 << (nb - 1)) - 1.0
    return (frac + 2.0 ** (1 - nb)) * ((1 << nb) / float((1 << nb) - 1))


def _mp1_scalefactor(idx: int) -> float:
    """Table 3-B.1 scalefactor law: 2^(1 - idx/3), idx 0..62."""
    if not 0 <= idx <= 62:
        raise ValueError("layer1 scalefactor index 63 is forbidden")
    return 2.0 ** (1.0 - idx / 3.0)


def decode_mp1_frame(payload: bytes, offset: int = 0) -> dict:
    """Decode ONE Layer I frame at `offset` to exact subband samples.

    Returns {header, alloc (32, nch), scf_idx (32, nch), codes
    (12, 32, nch) raw quantized ints, samples (12, 32, nch) float64
    requantized * scalefactor}.  Joint (intensity) stereo shares the
    allocation AND the sample codes above the bound =
    (mode_extension + 1) * 4 subbands; each channel still applies its
    own scalefactor (§2.4.2.5).  Raises ValueError on allocation code
    15, scalefactor 63, or a frame too short for its own fields."""
    hdr = _mp3_parse_header(payload, offset)
    if hdr["layer"] != 1:
        raise ValueError(f"not a Layer I frame (layer {hdr['layer']})")
    nch = hdr["channels"]
    bound = 32
    if hdr["mode"] == "joint_stereo":
        bound = (hdr["mode_extension"] + 1) * 4
    frame = payload[offset:offset + hdr["frame_size"]]
    if len(frame) < hdr["frame_size"]:
        raise ValueError("layer1 frame truncated")
    br = _BitReader(frame, (6 if hdr["crc_protected"] else 4) * 8)

    alloc = np.zeros((32, nch), dtype=np.int64)
    for sb in range(32):
        if sb < bound:
            for ch in range(nch):
                a = br.read(4)
                if a == 15:
                    raise ValueError("layer1 allocation code 15")
                alloc[sb, ch] = a
        else:
            a = br.read(4)
            if a == 15:
                raise ValueError("layer1 allocation code 15")
            alloc[sb, :] = a

    scf_idx = np.zeros((32, nch), dtype=np.int64)
    scf = np.ones((32, nch), dtype=np.float64)
    for sb in range(32):
        for ch in range(nch):
            if alloc[sb, ch]:
                idx = br.read(6)
                scf_idx[sb, ch] = idx
                scf[sb, ch] = _mp1_scalefactor(idx)

    codes = np.zeros((12, 32, nch), dtype=np.int64)
    samples = np.zeros((12, 32, nch), dtype=np.float64)
    for s in range(12):
        for sb in range(32):
            if sb < bound:
                for ch in range(nch):
                    a = int(alloc[sb, ch])
                    if a:
                        nb = a + 1
                        c = br.read(nb)
                        codes[s, sb, ch] = c
                        samples[s, sb, ch] = (
                            scf[sb, ch] * _mp1_requantize(c, nb))
            else:
                a = int(alloc[sb, 0])
                if a:
                    nb = a + 1
                    c = br.read(nb)  # shared intensity code
                    for ch in range(nch):
                        codes[s, sb, ch] = c
                        samples[s, sb, ch] = (
                            scf[sb, ch] * _mp1_requantize(c, nb))
    return {"header": hdr, "alloc": alloc, "scf_idx": scf_idx,
            "codes": codes, "samples": samples}


def encode_mp1_frame(
    codes: np.ndarray,
    alloc: np.ndarray,
    scf_idx: np.ndarray,
    sr_idx: int = 2,
    br_idx: int = 14,
    mode: int = 3,
    mode_extension: int = 0,
    version: str = "1",
) -> bytes:
    """Build a VALID Layer I frame from raw quantized sample codes —
    the synthesis side of decode_mp1_frame (test oracle + synthetic
    corpora; decode(encode(x)) is bit-exact on codes/alloc/scf by
    construction).  Unused trailing slot bytes are zero-filled, as
    real encoders do.  `mode`: 0 stereo, 1 joint, 2 dual, 3 mono."""
    nch = 1 if mode == 3 else 2
    bound = (mode_extension + 1) * 4 if mode == 1 else 32
    ver_bits = {"1": 3, "2": 2, "2.5": 0}[version]
    h = ((0x7FF << 21) | (ver_bits << 19) | (3 << 17) | (1 << 16)
         | (br_idx << 12) | (sr_idx << 10) | (mode << 6)
         | (mode_extension << 4))
    hdr4 = h.to_bytes(4, "big")
    size = _mp3_parse_header(hdr4 + bytes(4), 0)["frame_size"]

    for sb in range(32):
        for ch in range(nch):
            a = int(alloc[sb, ch])
            if a and (codes[:, sb, ch] >= (1 << (a + 1)) - 1).any():
                raise ValueError(
                    "layer1 all-ones code is forbidden (2^nb - 1 "
                    f"levels): subband {sb}")

    bits: list[tuple[int, int]] = []
    for sb in range(32):
        if sb < bound:
            for ch in range(nch):
                bits.append((int(alloc[sb, ch]), 4))
        else:
            bits.append((int(alloc[sb, 0]), 4))
    for sb in range(32):
        for ch in range(nch):
            if alloc[sb, ch]:
                bits.append((int(scf_idx[sb, ch]), 6))
    for s in range(12):
        for sb in range(32):
            if sb < bound:
                for ch in range(nch):
                    a = int(alloc[sb, ch])
                    if a:
                        bits.append((int(codes[s, sb, ch]), a + 1))
            else:
                a = int(alloc[sb, 0])
                if a:
                    bits.append((int(codes[s, sb, 0]), a + 1))

    acc, nacc = 0, 0
    body = bytearray()
    for val, n in bits:
        acc = (acc << n) | (val & ((1 << n) - 1))
        nacc += n
        while nacc >= 8:
            nacc -= 8
            body.append((acc >> nacc) & 0xFF)
    if nacc:
        body.append((acc << (8 - nacc)) & 0xFF)
    frame = bytearray(hdr4) + body
    if len(frame) > size:
        raise ValueError("layer1 payload exceeds frame size "
                         f"({len(frame)} > {size}) — raise br_idx")
    frame += bytes(size - len(frame))
    return bytes(frame)


class Mp1SubbandDecoder:
    """Actor stage over (media_ref, payload) MPEG-audio rows: REAL
    Layer I payload decode — evenly-spaced frames are located via the
    strict frame table (O(sampled) bytes touched) and decoded to exact
    subband samples; emits per-frame spectral features (per-subband
    RMS over the 12 granules, averaged across channels, float32[32])
    plus a crc32 over the raw quantized codes that pins bit-exact
    decode.  Layer II/III rows route to Mp2SubbandDecoder /
    Mp3SpectralDecoder and keep their row here with
    decode_status='unsupported_layer:N'; demux errors keep rows too
    (readers never drop)."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib as _z

        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        o_ref, o_idx, o_nch, o_nsb = [], [], [], []
        o_crc, o_rms, o_status = [], [], []

        def emit(ref, idx, nch, nsb, crc, rms, status):
            o_ref.append(ref)
            o_idx.append(idx)
            o_nch.append(nch)
            o_nsb.append(nsb)
            o_crc.append(crc)
            # [] not None on error rows: a null list trips Ray's
            # tensor-extension cast in to_pandas; ragged is fine
            o_rms.append([] if rms is None else rms)
            o_status.append(status)

        for ref, p in zip(refs, payloads):
            try:
                meta = probe_mp3(p)
                offsets, _sizes, _brs = mp3_frame_table(p)
            except (ValueError, IndexError, EOFError) as exc:
                emit(ref, -1, -1, -1, 0, None, f"demux_error: {exc}")
                continue
            if meta["layer"] != 1:
                emit(ref, -1, -1, -1, 0, None,
                     f"unsupported_layer:{meta['layer']}")
                continue
            picks = np.unique(np.linspace(
                0, len(offsets) - 1,
                min(self.n_frames, len(offsets))).astype(np.int64))
            for k in picks:
                try:
                    d = decode_mp1_frame(p, int(offsets[k]))
                except ValueError as exc:
                    emit(ref, int(k), -1, -1, 0, None,
                         f"decode_error: {exc}")
                    continue
                rms = np.sqrt(
                    (d["samples"] ** 2).mean(axis=(0, 2))).astype(
                        np.float32)
                emit(ref, int(k), d["samples"].shape[2],
                     int((d["alloc"][:, 0] > 0).sum()),
                     _z.crc32(d["codes"].tobytes()),
                     rms.tolist(), "ok")
        return pa.table({
            "media_ref": pa.array(o_ref, type=pa.string()),
            "frame_idx": pa.array(o_idx, type=pa.int64()),
            "channels": pa.array(o_nch, type=pa.int64()),
            "active_subbands": pa.array(o_nsb, type=pa.int64()),
            "codes_crc32": pa.array(o_crc, type=pa.int64()),
            "subband_rms": pa.array(
                o_rms, type=pa.list_(pa.float32())),
            "decode_status": pa.array(o_status, type=pa.string()),
        })


def mp1_subband_features(
    media: ray.data.Dataset,
    n_frames: int = 4,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 16,
) -> ray.data.Dataset:
    """MPEG-audio payload dataset -> Layer I subband-domain features
    (REAL payload decode; Layer II/III rows pass through flagged)."""
    return media.map_batches(
        Mp1SubbandDecoder,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


# --- MPEG-1 Audio Layer II payload decode (ISO 11172-3 §2.4.2.6/B.2/B.4) ---
# Classes of quantization, Table B.4: steps -> (codeword bits, grouped).
# Grouped classes pack 3 consecutive samples into one base-`steps`
# codeword; ungrouped classes send 3 codes of ceil(log2(steps+1)) bits
# whose all-ones pattern is excluded (steps = 2^nb - 1 levels).
_MP2_CLASS_BITS = {
    3: (5, True), 5: (7, True), 9: (10, True),
    7: (3, False), 15: (4, False), 31: (5, False), 63: (6, False),
    127: (7, False), 255: (8, False), 511: (9, False), 1023: (10, False),
    2047: (11, False), 4095: (12, False), 8191: (13, False),
    16383: (14, False), 32767: (15, False), 65535: (16, False),
}

# Bit-allocation tables B.2a-d: per subband, the ordered list of step
# counts for allocation index 1..2^nbal-1 (index 0 = no allocation);
# nbal = log2(len(list) + 1).
_B2A_SB0_2 = [3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
              16383, 32767, 65535]
_B2A_SB3_10 = [3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
               8191, 65535]
_B2A_SB11_22 = [3, 5, 7, 9, 15, 31, 65535]
_B2A_TOP = [3, 5, 65535]
_B2CD_SB0_1 = [3, 5, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
               8191, 16383, 32767]
_B2CD_REST = [3, 5, 9, 15, 31, 63, 127]

_MP2_TABLES = {
    "a": [_B2A_SB0_2] * 3 + [_B2A_SB3_10] * 8 + [_B2A_SB11_22] * 12
         + [_B2A_TOP] * 4,                                   # sblimit 27
    "b": [_B2A_SB0_2] * 3 + [_B2A_SB3_10] * 8 + [_B2A_SB11_22] * 12
         + [_B2A_TOP] * 7,                                   # sblimit 30
    "c": [_B2CD_SB0_1] * 2 + [_B2CD_REST] * 6,               # sblimit 8
    "d": [_B2CD_SB0_1] * 2 + [_B2CD_REST] * 10,              # sblimit 12
}


def _mp2_select_table(hdr: dict) -> tuple[str, list[list[int]]]:
    """Table selection per ISO 11172-3 §2.4.2.6 (the same mapping
    kjmp2/pl_mpeg tabulate): low rates use the 8/12-subband tables,
    mid rates B.2a, high rates B.2b except at 48 kHz."""
    if hdr["version"] != "1":
        raise ValueError(
            "MPEG-2 LSF Layer II uses its own allocation table "
            "(13818-3 Table B.1) — not supported")
    kbps, sr, nch = hdr["bitrate_kbps"], hdr["sample_rate"], hdr["channels"]
    # Rate classes are keyed on kbit/s PER CHANNEL (kjmp2 QUANT_LUT_STEP1):
    # per-channel 32-48 -> low, 56-80 -> mid, 96+ -> high; i.e. mono totals
    # <=48 / 56-80 / 96+, stereo totals <=96 / 112-160 / 192+.
    if nch == 1:
        rate_class = 0 if kbps <= 48 else (1 if kbps <= 80 else 2)
    else:
        rate_class = 0 if kbps <= 96 else (1 if kbps <= 160 else 2)
    sr_class = {44100: 0, 48000: 1, 32000: 2}[sr]
    tid = (("c", "c", "d"), ("a", "a", "a"),
           ("b", "a", "b"))[rate_class][sr_class]
    return tid, _MP2_TABLES[tid]


def _mp2_nbal(row: list[int]) -> int:
    return (len(row) + 1).bit_length() - 1


def decode_mp2_frame(payload: bytes, offset: int = 0) -> dict:
    """Decode ONE MPEG-1 Layer II frame at `offset` to exact subband
    samples (1152 PCM samples = 36 per subband; 12 granules x 3).

    Requantization: for an n-step class, s'' = (2v - (n-1)) / n —
    algebraically identical to the spec's s'' = C(s''' + D) law with
    C = 2^nb/n and D = (2^nb - n + 1)/2^nb (Table B.4's constants),
    so no float table is transcribed.  Grouped classes (3/5/9 steps)
    unpack one base-n codeword into 3 samples.  scfsi 0..3 expand to
    the 3 scalefactor parts (12 samples each).  Joint stereo shares
    allocation AND codes above bound = (mode_extension + 1) * 4,
    capped at sblimit; scalefactors stay per-channel (§2.4.2.6).
    Raises on MPEG-2 LSF, scalefactor 63, out-of-range codes, and
    frames too short for their own fields.

    Returns {header, table_id, sblimit, alloc_idx (32, nch),
    scfsi (32, nch), scf_idx (3, 32, nch), codes (36, 32, nch),
    samples (36, 32, nch)}."""
    hdr = _mp3_parse_header(payload, offset)
    if hdr["layer"] != 2:
        raise ValueError(f"not a Layer II frame (layer {hdr['layer']})")
    tid, rows = _mp2_select_table(hdr)
    sblimit = len(rows)
    nch = hdr["channels"]
    bound = sblimit
    if hdr["mode"] == "joint_stereo":
        bound = min((hdr["mode_extension"] + 1) * 4, sblimit)
    frame = payload[offset:offset + hdr["frame_size"]]
    if len(frame) < hdr["frame_size"]:
        raise ValueError("layer2 frame truncated")
    br = _BitReader(frame, (6 if hdr["crc_protected"] else 4) * 8)

    alloc_idx = np.zeros((32, nch), dtype=np.int64)
    for sb in range(sblimit):
        nbal = _mp2_nbal(rows[sb])
        if sb < bound:
            for ch in range(nch):
                alloc_idx[sb, ch] = br.read(nbal)
        else:
            alloc_idx[sb, :] = br.read(nbal)

    scfsi = np.zeros((32, nch), dtype=np.int64)
    for sb in range(sblimit):
        for ch in range(nch):
            if alloc_idx[sb, ch]:
                scfsi[sb, ch] = br.read(2)

    scf_idx = np.zeros((3, 32, nch), dtype=np.int64)
    scf = np.ones((3, 32, nch), dtype=np.float64)
    for sb in range(sblimit):
        for ch in range(nch):
            if not alloc_idx[sb, ch]:
                continue
            si = scfsi[sb, ch]
            if si == 0:
                i0, i1, i2 = br.read(6), br.read(6), br.read(6)
            elif si == 1:
                i0 = br.read(6)
                i1 = i0
                i2 = br.read(6)
            elif si == 2:
                i0 = br.read(6)
                i1 = i2 = i0
            else:
                i0, i1 = br.read(6), br.read(6)
                i2 = i1
            for p, idx in enumerate((i0, i1, i2)):
                scf_idx[p, sb, ch] = idx
                scf[p, sb, ch] = _mp1_scalefactor(idx)

    codes = np.zeros((36, 32, nch), dtype=np.int64)
    samples = np.zeros((36, 32, nch), dtype=np.float64)
    for gr in range(12):
        for sb in range(sblimit):
            chans = range(nch) if sb < bound else (0,)
            for ch in chans:
                ai = int(alloc_idx[sb, ch])
                if not ai:
                    continue
                steps = rows[sb][ai - 1]
                bits, grouped = _MP2_CLASS_BITS[steps]
                if grouped:
                    c = br.read(bits)
                    if c >= steps ** 3:
                        raise ValueError(
                            f"layer2 grouped code {c} out of range "
                            f"(steps {steps})")
                    vs = (c % steps, (c // steps) % steps,
                          c // (steps * steps))
                else:
                    vs = []
                    for _ in range(3):
                        v = br.read(bits)
                        if v >= steps:
                            raise ValueError(
                                "layer2 all-ones code is forbidden "
                                f"(steps {steps})")
                        vs.append(v)
                part = gr // 4
                tgt = range(nch) if sb >= bound else (ch,)
                for k, v in enumerate(vs):
                    s_idx = gr * 3 + k
                    q = (2 * v - (steps - 1)) / steps
                    for cch in tgt:
                        codes[s_idx, sb, cch] = v
                        samples[s_idx, sb, cch] = scf[part, sb, cch] * q
    return {"header": hdr, "table_id": tid, "sblimit": sblimit,
            "alloc_idx": alloc_idx, "scfsi": scfsi, "scf_idx": scf_idx,
            "codes": codes, "samples": samples}


def encode_mp2_frame(
    codes: np.ndarray,
    alloc_idx: np.ndarray,
    scfsi: np.ndarray,
    scf_idx: np.ndarray,
    sr_idx: int = 0,
    br_idx: int = 12,
    mode: int = 3,
    mode_extension: int = 0,
) -> bytes:
    """Build a VALID MPEG-1 Layer II frame from raw quantized codes —
    the synthesis dual of decode_mp2_frame (test oracle + synthetic
    corpora; decode(encode(x)) is bit-exact on codes/alloc/scfsi/scf
    by construction).  Validates allocation indices against the
    selected B.2 table, code ranges against the class, scalefactor
    indices <= 62, and that scf_idx parts obey the scfsi sharing
    pattern (scfsi=1 -> parts 0,1 equal; 2 -> all equal; 3 -> 1,2
    equal) so the roundtrip can be exact."""
    nch = 1 if mode == 3 else 2
    ver_bits = 3
    h = ((0x7FF << 21) | (ver_bits << 19) | (2 << 17) | (1 << 16)
         | (br_idx << 12) | (sr_idx << 10) | (mode << 6)
         | (mode_extension << 4))
    hdr4 = h.to_bytes(4, "big")
    hdr = _mp3_parse_header(hdr4 + bytes(4), 0)
    tid, rows = _mp2_select_table(hdr)
    sblimit = len(rows)
    bound = sblimit
    if mode == 1:
        bound = min((mode_extension + 1) * 4, sblimit)

    if alloc_idx[sblimit:].any():
        raise ValueError(f"allocation above sblimit {sblimit} "
                         f"(table {tid})")
    bits_out: list[tuple[int, int]] = []
    for sb in range(sblimit):
        nbal = _mp2_nbal(rows[sb])
        for ch in range(nch):
            if not 0 <= alloc_idx[sb, ch] <= len(rows[sb]):
                raise ValueError(
                    f"allocation index {alloc_idx[sb, ch]} out of "
                    f"range for subband {sb} (table {tid})")
        if sb >= bound and nch == 2 and \
                alloc_idx[sb, 0] != alloc_idx[sb, 1]:
            raise ValueError("joint-stereo allocation must match "
                             f"above bound {bound} (subband {sb})")
        if sb < bound:
            for ch in range(nch):
                bits_out.append((int(alloc_idx[sb, ch]), nbal))
        else:
            bits_out.append((int(alloc_idx[sb, 0]), nbal))
    for sb in range(sblimit):
        for ch in range(nch):
            if alloc_idx[sb, ch]:
                bits_out.append((int(scfsi[sb, ch]), 2))
    for sb in range(sblimit):
        for ch in range(nch):
            if not alloc_idx[sb, ch]:
                continue
            i0, i1, i2 = (int(scf_idx[p, sb, ch]) for p in range(3))
            for idx in (i0, i1, i2):
                if not 0 <= idx <= 62:
                    raise ValueError("layer2 scalefactor index "
                                     f"{idx} out of range")
            si = int(scfsi[sb, ch])
            if si == 0:
                send = (i0, i1, i2)
            elif si == 1:
                if i0 != i1:
                    raise ValueError("scfsi=1 requires parts 0,1 equal")
                send = (i0, i2)
            elif si == 2:
                if not (i0 == i1 == i2):
                    raise ValueError("scfsi=2 requires all parts equal")
                send = (i0,)
            else:
                if i1 != i2:
                    raise ValueError("scfsi=3 requires parts 1,2 equal")
                send = (i0, i1)
            bits_out.extend((s, 6) for s in send)
    for gr in range(12):
        for sb in range(sblimit):
            chans = range(nch) if sb < bound else (0,)
            for ch in chans:
                ai = int(alloc_idx[sb, ch])
                if not ai:
                    continue
                steps = rows[sb][ai - 1]
                nbits, grouped = _MP2_CLASS_BITS[steps]
                vs = [int(codes[gr * 3 + k, sb, ch]) for k in range(3)]
                for v in vs:
                    if not 0 <= v < steps:
                        raise ValueError(
                            f"layer2 code {v} out of range "
                            f"(steps {steps}, subband {sb})")
                if grouped:
                    bits_out.append(
                        (vs[0] + steps * vs[1] + steps * steps * vs[2],
                         nbits))
                else:
                    bits_out.extend((v, nbits) for v in vs)

    acc, nacc = 0, 0
    body = bytearray()
    for val, n in bits_out:
        acc = (acc << n) | (val & ((1 << n) - 1))
        nacc += n
        while nacc >= 8:
            nacc -= 8
            body.append((acc >> nacc) & 0xFF)
    if nacc:
        body.append((acc << (8 - nacc)) & 0xFF)
    frame = bytearray(hdr4) + body
    size = hdr["frame_size"]
    if len(frame) > size:
        raise ValueError(f"layer2 payload exceeds frame size "
                         f"({len(frame)} > {size}) — raise br_idx")
    frame += bytes(size - len(frame))
    return bytes(frame)


class Mp2SubbandDecoder:
    """Actor stage over (media_ref, payload) MPEG-audio rows: REAL
    Layer II payload decode — evenly-spaced frames located via the
    strict frame table (O(sampled) bytes touched), decoded to exact
    subband samples; emits per-frame features (per-subband RMS over
    the 36 samples, averaged across channels, float32[32]) plus a
    crc32 over the raw quantized codes pinning bit-exact decode.
    Layer I/III rows keep their row flagged (Layer I and III have
    their own decoders: Mp1SubbandDecoder / Mp3SpectralDecoder);
    demux errors keep rows too (readers never drop)."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib as _z

        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        o_ref, o_idx, o_nch, o_nsb = [], [], [], []
        o_tid, o_crc, o_rms, o_status = [], [], [], []

        def emit(ref, idx, nch, nsb, tid, crc, rms, status):
            o_ref.append(ref)
            o_idx.append(idx)
            o_nch.append(nch)
            o_nsb.append(nsb)
            o_tid.append(tid)
            o_crc.append(crc)
            o_rms.append([] if rms is None else rms)
            o_status.append(status)

        for ref, p in zip(refs, payloads):
            try:
                meta = probe_mp3(p)
                offsets, _sizes, _brs = mp3_frame_table(p)
            except (ValueError, IndexError, EOFError) as exc:
                emit(ref, -1, -1, -1, "", 0, None, f"demux_error: {exc}")
                continue
            if meta["layer"] != 2:
                emit(ref, -1, -1, -1, "", 0, None,
                     f"unsupported_layer:{meta['layer']}")
                continue
            picks = np.unique(np.linspace(
                0, len(offsets) - 1,
                min(self.n_frames, len(offsets))).astype(np.int64))
            for k in picks:
                try:
                    d = decode_mp2_frame(p, int(offsets[k]))
                except ValueError as exc:
                    emit(ref, int(k), -1, -1, "", 0, None,
                         f"decode_error: {exc}")
                    continue
                rms = np.sqrt(
                    (d["samples"] ** 2).mean(axis=(0, 2))).astype(
                        np.float32)
                emit(ref, int(k), d["samples"].shape[2],
                     int((d["alloc_idx"][:, 0] > 0).sum()),
                     d["table_id"],
                     _z.crc32(d["codes"].tobytes()),
                     rms.tolist(), "ok")
        return pa.table({
            "media_ref": pa.array(o_ref, type=pa.string()),
            "frame_idx": pa.array(o_idx, type=pa.int64()),
            "channels": pa.array(o_nch, type=pa.int64()),
            "active_subbands": pa.array(o_nsb, type=pa.int64()),
            "alloc_table": pa.array(o_tid, type=pa.string()),
            "codes_crc32": pa.array(o_crc, type=pa.int64()),
            "subband_rms": pa.array(
                o_rms, type=pa.list_(pa.float32())),
            "decode_status": pa.array(o_status, type=pa.string()),
        })


def mp2_subband_features(
    media: ray.data.Dataset,
    n_frames: int = 4,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 16,
) -> ray.data.Dataset:
    """MPEG-audio payload dataset -> Layer II subband-domain features
    (REAL payload decode; Layer I/III rows pass through flagged)."""
    return media.map_batches(
        Mp2SubbandDecoder,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


# --- MPEG-1 Audio Layer III payload decode (honest partial) ---------------
# REAL side-info parsing (the full MPEG-1 granule field layout), bit
# reservoir (main_data_begin back-pointers across frames), scfsi
# scalefactor sharing, long/short/mixed window side fields, count1
# quadruple Huffman (table B) and big_values Huffman tables 0, 1, 2,
# 3 and 6 (every linbits-free table whose data passes the import-time
# structural proof in _validate_huff_xy: prefix-free + Kraft-complete),
# and the formula-exact requantizer to 576 spectral lines per granule.
# The remaining big-values tables (5, 7-31 — the linbits/escape
# family), count1 table A and mixed-block scalefactors raise a LOUD
# ValueError naming the gap (spec tables carried without a validating
# cross-check are a silent-corruption risk — the MP2 rate-class
# lesson; the carried tables are small enough to verify against ISO
# 11172-3 Table B.7 by hand AND are machine-checked at import).  Reference behavior:
# reference repo has no audio path; public spec is ISO 11172-3 §2.4.1.7
# (side info), §2.4.2.7 (main data), §2.4.3.4 (requantization).

# scalefac_compress -> (slen1, slen2) bit widths (ISO 11172-3 §2.4.2.7)
_MP3_SLEN = [(0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2),
             (1, 3), (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3),
             (4, 2), (4, 3)]

# preemphasis table, long scalefactor bands 0..21 (§2.4.3.4)
_MP3_PRETAB = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
               1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0]

# long-block scalefactor band edges (frequency-line index), Table B.8
_MP3_SFB_LONG = {
    44100: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110,
            134, 162, 196, 238, 288, 342, 418, 576],
    48000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106,
            128, 156, 190, 230, 276, 330, 384, 576],
    32000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126,
            156, 194, 240, 296, 364, 448, 550, 576],
}
# short-block band edges (per window; 12 bands + end), Table B.8
_MP3_SFB_SHORT = {
    44100: [0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192],
    48000: [0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192],
    32000: [0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192],
}

# big_values Huffman: implemented tables only.  ISO 11172-3 Table B.7
# data, (x,y) -> (code, length); table 0 emits no bits and decodes
# all-zero.  Tables 1 (2x2), 2/3 (3x3) and 6 (4x4) — all linbits-free —
# are carried because each passes the import-time STRUCTURAL proof
# below: the code set must be prefix-free AND Kraft-complete
# (sum 2^-len == 1), which any single transcription slip in a length
# or code value breaks.  Tables whose data cannot be validated that
# way in-sandbox (no external decoder to cross-check) stay loud
# errors rather than silent-corruption risks — the MP2 rate-class
# lesson (ROUND_NOTES r3/r4).
_MP3_HUFF1 = {(0, 0): (0b1, 1), (1, 0): (0b01, 2),
              (0, 1): (0b001, 3), (1, 1): (0b000, 3)}
_MP3_HUFF2 = {
    (0, 0): (0b1, 1), (0, 1): (0b010, 3), (0, 2): (0b000001, 6),
    (1, 0): (0b011, 3), (1, 1): (0b001, 3), (1, 2): (0b00001, 5),
    (2, 0): (0b00011, 5), (2, 1): (0b00010, 5), (2, 2): (0b000000, 6),
}
_MP3_HUFF3 = {
    (0, 0): (0b11, 2), (0, 1): (0b10, 2), (0, 2): (0b000001, 6),
    (1, 0): (0b001, 3), (1, 1): (0b01, 2), (1, 2): (0b00001, 5),
    (2, 0): (0b00011, 5), (2, 1): (0b00010, 5), (2, 2): (0b000000, 6),
}
_MP3_HUFF6 = {
    (0, 0): (0b111, 3), (0, 1): (0b011, 3), (0, 2): (0b00101, 5),
    (0, 3): (0b0000001, 7),
    (1, 0): (0b110, 3), (1, 1): (0b10, 2), (1, 2): (0b0011, 4),
    (1, 3): (0b00010, 5),
    (2, 0): (0b0101, 4), (2, 1): (0b0100, 4), (2, 2): (0b00100, 5),
    (2, 3): (0b000001, 6),
    (3, 0): (0b000011, 6), (3, 1): (0b00011, 5), (3, 2): (0b000010, 6),
    (3, 3): (0b0000000, 7),
}


def _validate_huff_xy(table: dict, tid: int, dim: int) -> dict:
    """Structural proof of a big_values code table: full (x,y) domain,
    prefix-free, and Kraft-COMPLETE (every B.7 table is a complete
    prefix code, so sum 2^-len must equal 1 exactly).  Any transcription
    slip in one length or code value breaks one of the three.  Raises
    at import; returns the decode map {(len, code): (x, y)}."""
    if set(table) != {(x, y) for x in range(dim) for y in range(dim)}:
        raise AssertionError(f"mp3 table {tid}: domain != {dim}x{dim}")
    codes = sorted((ln, code) for code, ln in table.values())
    if len(set(codes)) != len(codes):
        raise AssertionError(f"mp3 table {tid}: duplicate code")
    if sum(1 << (19 - ln) for ln, _ in codes) != (1 << 19):
        raise AssertionError(f"mp3 table {tid}: not Kraft-complete")
    bits = [format(code, f"0{ln}b") for ln, code in codes]
    for i, a in enumerate(bits):
        for b in bits[i + 1:]:
            if b.startswith(a) or a.startswith(b):
                raise AssertionError(
                    f"mp3 table {tid}: {a} prefixes {b}")
    return {(ln, code): xy for xy, (code, ln) in table.items()}


_MP3_HUFF_ENC = {1: _MP3_HUFF1, 2: _MP3_HUFF2, 3: _MP3_HUFF3,
                 6: _MP3_HUFF6}
_MP3_BV_DIMS = {1: 2, 2: 3, 3: 3, 6: 4}
_MP3_BV_TABLES = {0: None, **{
    tid: _validate_huff_xy(t, tid, _MP3_BV_DIMS[tid])
    for tid, t in _MP3_HUFF_ENC.items()}}


def _mp3_side_info(frame: bytes, hdr: dict) -> dict:
    """Parse the MPEG-1 Layer III side information block (§2.4.1.7).

    Returns {main_data_begin, scfsi (nch, 4), granules: [gr][ch] dicts
    with part2_3_length, big_values, global_gain, scalefac_compress,
    window_switching, block_type, mixed_block, table_select,
    subblock_gain, region0_count, region1_count, preflag,
    scalefac_scale, count1table_select, size_bytes}."""
    if hdr["version"] != "1":
        raise ValueError("MPEG-2 LSF Layer III side info (9 bytes, 1 "
                         "granule) not supported")
    nch = hdr["channels"]
    start = (6 if hdr["crc_protected"] else 4)
    size = 17 if nch == 1 else 32
    if len(frame) < start + size:
        raise ValueError("layer3 frame truncated in side info")
    br = _BitReader(frame, start * 8)
    info: dict = {"main_data_begin": br.read(9), "size_bytes": size}
    br.read(5 if nch == 1 else 3)  # private_bits
    info["scfsi"] = [[br.read(1) for _ in range(4)] for _ in range(nch)]
    grs = []
    for _gr in range(2):
        chs = []
        for _ch in range(nch):
            g = {
                "part2_3_length": br.read(12),
                "big_values": br.read(9),
                "global_gain": br.read(8),
                "scalefac_compress": br.read(4),
            }
            g["window_switching"] = br.read(1)
            if g["window_switching"]:
                g["block_type"] = br.read(2)
                g["mixed_block"] = br.read(1)
                g["table_select"] = [br.read(5) for _ in range(2)]
                g["subblock_gain"] = [br.read(3) for _ in range(3)]
                if g["block_type"] == 0:
                    raise ValueError(
                        "layer3 window_switching with block_type 0 is "
                        "forbidden (§2.4.1.7)")
                # switched blocks carry no region fields: the split
                # is the fixed 36-line boundary (§2.4.2.7); stored
                # values are informational
                g["region0_count"] = -1
                g["region1_count"] = -1
            else:
                g["block_type"] = 0
                g["mixed_block"] = 0
                g["table_select"] = [br.read(5) for _ in range(3)]
                g["region0_count"] = br.read(4)
                g["region1_count"] = br.read(3)
                g["subblock_gain"] = [0, 0, 0]
            if g["big_values"] > 288:
                raise ValueError("layer3 big_values > 288")
            g["preflag"] = br.read(1)
            g["scalefac_scale"] = br.read(1)
            g["count1table_select"] = br.read(1)
            chs.append(g)
        grs.append(chs)
    info["granules"] = grs
    return info


def _mp3_read_scalefactors(br: "_BitReader", g: dict, scfsi: list,
                           gr: int, prev: dict | None) -> tuple[dict, int]:
    """Part-2 scalefactor decode.  Long blocks: bands 0-10 slen1 bits,
    11-20 slen2, scfsi groups [0-5][6-10][11-15][16-20] reuse granule
    0's values in granule 1.  Short blocks: 3 windows x (bands 0-5
    slen1, 6-11 slen2), no scfsi.  Mixed blocks raise (documented
    gap).  Returns ({'long': [21], 'short': [3][12]}, bits_read)."""
    slen1, slen2 = _MP3_SLEN[g["scalefac_compress"]]
    bits = 0
    if g["block_type"] == 2 and g["mixed_block"]:
        raise ValueError("layer3 mixed-block scalefactors not "
                         "implemented (documented partial-decode gap)")
    if g["block_type"] == 2:
        short = []
        for sfb in range(12):
            n = slen1 if sfb < 6 else slen2
            short.append([br.read(n) for _ in range(3)])
            bits += 3 * n
        return {"long": [0] * 21,
                "short": [[short[s][w] for s in range(12)]
                          for w in range(3)]}, bits
    groups = [(0, 6, slen1), (6, 11, slen1), (11, 16, slen2),
              (16, 21, slen2)]
    vals = [0] * 21
    for gi, (lo, hi, n) in enumerate(groups):
        if gr == 1 and scfsi[gi]:
            if prev is None:
                raise ValueError("layer3 scfsi set but granule 0 "
                                 "scalefactors unavailable")
            vals[lo:hi] = prev["long"][lo:hi]
        else:
            for sfb in range(lo, hi):
                vals[sfb] = br.read(n)
                bits += n
    return {"long": vals, "short": None}, bits


def _mp3_read_spectrum(br: "_BitReader", g: dict, hdr: dict,
                       part2_bits: int) -> tuple[np.ndarray, int]:
    """Part-3 Huffman decode to 576 quantized integer lines.

    big_values pairs decode through the implemented (x,y) tables —
    unimplemented table ids raise naming the table; count1 quadruples
    use table B (4-bit inverted-bits codes); table A raises.  Region
    boundaries only select WHICH table applies, so they are resolved
    against the long-block band edges per §2.4.2.7."""
    qs = np.zeros(576, dtype=np.int64)
    limit = g["part2_3_length"] - part2_bits
    if limit < 0:
        raise ValueError("layer3 part2 overran part2_3_length")
    t0 = br.pos
    edges = _MP3_SFB_LONG[hdr["sample_rate"]]
    if g["window_switching"]:
        # switched blocks: fixed 36-line region boundary, two tables
        bounds = [min(36, g["big_values"] * 2), g["big_values"] * 2]
    else:
        r0 = edges[min(g["region0_count"] + 1, len(edges) - 1)]
        r1 = edges[min(g["region0_count"] + 1 + g["region1_count"] + 1,
                       len(edges) - 1)]
        bounds = [min(r0, g["big_values"] * 2),
                  min(r1, g["big_values"] * 2), g["big_values"] * 2]
    pos = 0
    for region, end in enumerate(bounds):
        tid = g["table_select"][region]
        if tid not in _MP3_BV_TABLES:
            raise ValueError(
                f"layer3 big_values huffman table {tid} not implemented "
                f"(tables {sorted(_MP3_BV_TABLES)} only - documented "
                "partial-decode gap)")
        table = _MP3_BV_TABLES[tid]
        while pos < end:
            if table is None:
                x = y = 0
            else:
                code, ln = 0, 0
                while (ln, code) not in table:
                    code = (code << 1) | br.read(1)
                    ln += 1
                    if ln > 19:
                        raise ValueError("layer3 invalid huffman code")
                x, y = table[(ln, code)]
            if x and br.read(1):
                x = -x
            if y and br.read(1):
                y = -y
            qs[pos], qs[pos + 1] = x, y
            pos += 2
    # count1 region: quadruples until the granule's bit budget is spent
    if g["count1table_select"] == 0:
        if br.pos - t0 < limit and pos < 576:
            raise ValueError("layer3 count1 table A not implemented "
                             "(documented partial-decode gap)")
    while br.pos - t0 < limit and pos + 4 <= 576:
        p = 15 - br.read(4)  # table B: 4-bit inverted-bits codes
        quad = [(p >> 3) & 1, (p >> 2) & 1, (p >> 1) & 1, p & 1]
        for k in range(4):
            v = quad[k]
            if v and br.read(1):
                v = -v
            qs[pos + k] = v
        pos += 4
    if br.pos - t0 > limit:
        raise ValueError("layer3 huffman data overran part2_3_length")
    br.pos = t0 + limit  # skip stuffing to the next granule
    return qs, pos


def _mp3_requantize(qs: np.ndarray, g: dict, scf: dict,
                    hdr: dict) -> np.ndarray:
    """Formula-exact requantizer (§2.4.3.4): xr = sign(q) |q|^(4/3)
    * 2^((global_gain-210)/4) * 2^(-m (scalefac + preflag*pretab)),
    m = (scalefac_scale+1)/2; short windows subtract 8*subblock_gain
    inside the power-of-two exponent.  With the implemented Huffman
    tables |q| <= 3; q in {0, +-1} yields exact powers of two, and
    |q| in {2, 3} multiplies in np.power's deterministic float64
    rounding of 2^(4/3) / 3^(4/3) (a fixed constant per platform;
    tests compare through the same kernel)."""
    sr = hdr["sample_rate"]
    mag = np.abs(qs).astype(np.float64) ** (4.0 / 3.0)
    xr = np.sign(qs) * mag
    m = 0.5 * (g["scalefac_scale"] + 1)
    if g["block_type"] == 2:
        edges = _MP3_SFB_SHORT[sr]
        widths = np.diff(edges)
        exp = np.zeros(576)
        pos = 0
        for sfb in range(12):
            for w in range(3):
                width = widths[sfb]
                if pos + width > 576:
                    break
                exp[pos:pos + width] = (
                    (g["global_gain"] - 210 - 8 * g["subblock_gain"][w])
                    / 4.0 - m * scf["short"][w][sfb])
                pos += width
        # lines past the banded region (if any) keep granule gain
        exp[pos:] = (g["global_gain"] - 210) / 4.0
    else:
        edges = _MP3_SFB_LONG[sr]
        exp = np.full(576, (g["global_gain"] - 210) / 4.0)
        for sfb in range(21):
            lo, hi = edges[sfb], edges[sfb + 1]
            exp[lo:hi] -= m * (scf["long"][sfb]
                               + g["preflag"] * _MP3_PRETAB[sfb])
    return xr * np.power(2.0, exp)


def decode_mp3_frames(payload: bytes, max_frames: int | None = None
                      ) -> list[dict]:
    """Decode the Layer III frames of an MPEG-1 audio stream through
    the bit reservoir: frames are walked in order (main_data_begin
    back-pointers need every predecessor's main data), each granule's
    side info + scalefactors + quantized spectrum + requantized lines
    are returned.  Frames whose payload needs an unimplemented Huffman
    table raise ValueError naming the gap (callers like
    Mp3SpectralDecoder keep rows flagged).

    Returns [{frame_idx, side_info, granules: [gr][ch] {scalefactors,
    qs (576 int64), xr (576 float64), nonzero}}]."""
    offsets, _sizes, _brs = mp3_frame_table(payload)
    if max_frames is not None:
        offsets = offsets[:max_frames]
    main_buf = bytearray()
    shipped = 0  # absolute bytes accumulated into main_buf
    out = []
    for fi, off in enumerate(offsets):
        hdr = _mp3_parse_header(payload, int(off))
        if hdr["layer"] != 3:
            raise ValueError(f"not a Layer III frame (layer {hdr['layer']})")
        frame = payload[int(off):int(off) + hdr["frame_size"]]
        if len(frame) < hdr["frame_size"]:
            raise ValueError("layer3 frame truncated")
        info = _mp3_side_info(frame, hdr)
        start = (6 if hdr["crc_protected"] else 4) + info["size_bytes"]
        region = frame[start:]
        begin_abs = shipped - info["main_data_begin"]
        if begin_abs < 0:
            raise ValueError("layer3 main_data_begin underflows the "
                             "bit reservoir")
        main_buf += region
        shipped += len(region)
        # trim the reservoir, keeping absolute addressing
        base = shipped - len(main_buf)
        br = _BitReader(bytes(main_buf), (begin_abs - base) * 8)
        nch = hdr["channels"]
        grs = []
        prev_scf = [None] * nch
        for gr in range(2):
            chs = []
            for ch in range(nch):
                g = info["granules"][gr][ch]
                p0 = br.pos
                scf, p2bits = _mp3_read_scalefactors(
                    br, g, info["scfsi"][ch], gr, prev_scf[ch])
                qs, nlines = _mp3_read_spectrum(br, g, hdr, p2bits)
                if br.pos - p0 != g["part2_3_length"]:
                    raise ValueError("layer3 granule length mismatch")
                if gr == 0 and g["block_type"] != 2:
                    prev_scf[ch] = scf
                xr = _mp3_requantize(qs, g, scf, hdr)
                chs.append({"scalefactors": scf, "qs": qs, "xr": xr,
                            "nonzero": int(np.count_nonzero(qs)),
                            "nlines": nlines})
            grs.append(chs)
        if len(main_buf) > 511 + len(region):
            del main_buf[:len(main_buf) - 511 - len(region)]
        out.append({"frame_idx": fi, "side_info": info,
                    "granules": grs, "header": hdr})
    return out


def _mp3_granule_bits(g: dict, gr: int, scfsi: list,
                      prev_long: list | None) -> list[tuple[int, int]]:
    """Pack one granule's main data as (value, nbits) fields:
    scalefactors (honoring scfsi on granule 1), big_values pairs
    through the selected table, count1 quadruples through table B."""
    slen1, slen2 = _MP3_SLEN[g["scalefac_compress"]]
    bits: list[tuple[int, int]] = []
    scf = g["scalefactors"]
    if g["block_type"] == 2:
        for sfb in range(12):
            n = slen1 if sfb < 6 else slen2
            for w in range(3):
                v = scf["short"][w][sfb]
                if not 0 <= v < (1 << n) if n else v != 0:
                    raise ValueError("layer3 scalefactor exceeds slen")
                if n:
                    bits.append((v, n))
    else:
        groups = [(0, 6, slen1), (6, 11, slen1), (11, 16, slen2),
                  (16, 21, slen2)]
        for gi, (lo, hi, n) in enumerate(groups):
            if gr == 1 and scfsi[gi]:
                if prev_long is None or \
                        scf["long"][lo:hi] != prev_long[lo:hi]:
                    raise ValueError("scfsi=1 requires granule 0/1 "
                                     "scalefactors equal")
                continue
            for sfb in range(lo, hi):
                v = scf["long"][sfb]
                if v >= (1 << n) if n else v != 0:
                    raise ValueError("layer3 scalefactor exceeds slen")
                if n:
                    bits.append((v, n))
    # big_values region layout mirrors the decoder exactly
    bv = g["bigv"]
    tids = g["table_select"]
    nlines = 2 * len(bv)
    if g["window_switching"]:
        bounds = [min(36, nlines), nlines]
    else:
        edges = _MP3_SFB_LONG[g["_sr"]]
        r0 = edges[min(g["region0_count"] + 1, len(edges) - 1)]
        r1 = edges[min(g["region0_count"] + 1 + g["region1_count"] + 1,
                       len(edges) - 1)]
        bounds = [min(r0, nlines), min(r1, nlines), nlines]
    pos = 0
    for region, end in enumerate(bounds):
        tid = tids[region]
        while pos < end:
            x, y = bv[pos // 2]
            if tid == 0:
                if x or y:
                    raise ValueError("table 0 region carries nonzero")
            elif tid in _MP3_HUFF_ENC:
                enc = _MP3_HUFF_ENC[tid]
                if (abs(x), abs(y)) not in enc:
                    raise ValueError(
                        f"encoder: |({x}, {y})| exceeds table {tid} "
                        f"range {_MP3_BV_DIMS[tid]}x{_MP3_BV_DIMS[tid]}")
                code, ln = enc[(abs(x), abs(y))]
                bits.append((code, ln))
                if x:
                    bits.append((1 if x < 0 else 0, 1))
                if y:
                    bits.append((1 if y < 0 else 0, 1))
            else:
                raise ValueError(f"encoder: table {tid} unsupported")
            pos += 2
    for quad in g["count1"]:
        p = sum((1 if v else 0) << (3 - k) for k, v in enumerate(quad))
        bits.append((15 - p, 4))
        for v in quad:
            if v:
                bits.append((1 if v < 0 else 0, 1))
    return bits


def encode_mp3_stream(
    frames: list,
    sr_idx: int = 0,
    br_idx: int = 11,
    mode: int = 3,
) -> bytes:
    """Test dual of decode_mp3_frames: packs granule specs into a real
    MPEG-1 Layer III stream — side info, scalefactors, Huffman codes
    (tables 0/1/B), and the BIT RESERVOIR: each frame's main data is
    written into the stream of frame payload regions in order, and
    main_data_begin back-pointers are computed so decoders must read
    across frame boundaries whenever a frame's capacity exceeds its
    own main data.

    Each frame spec is {scfsi: [nch][4], granules: [2][nch] of
    {global_gain, scalefac_compress, scalefac_scale, preflag,
    block_type (0|2), subblock_gain, table_select, region0_count,
    region1_count, scalefactors, bigv: [(x, y)], count1: [[v,w,x,y]]}}.
    """
    nch = 1 if mode == 3 else 2
    sr = [44100, 48000, 32000][sr_idx]
    hdr4 = ((0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)
            | (br_idx << 12) | (sr_idx << 10) | (mode << 6))
    hdr = _mp3_parse_header(hdr4.to_bytes(4, "big") + bytes(4), 0)
    side_bytes = 17 if nch == 1 else 32
    cap = hdr["frame_size"] - 4 - side_bytes

    # 1) per-frame main data bitstrings (byte-padded per frame)
    frame_main: list[bytes] = []
    all_side: list[list] = []
    for spec in frames:
        acc, n = 0, 0
        out = bytearray()
        sides = []
        prev_long = [None] * nch
        for gr in range(2):
            for ch in range(nch):
                g = dict(spec["granules"][gr][ch])
                g["_sr"] = sr
                g.setdefault("window_switching",
                             1 if g.get("block_type", 0) == 2 else 0)
                g.setdefault("block_type", 0)
                g.setdefault("subblock_gain", [0, 0, 0])
                g.setdefault("preflag", 0)
                g.setdefault("scalefac_scale", 0)
                g.setdefault("count1", [])
                g.setdefault("bigv", [])
                fields = _mp3_granule_bits(
                    g, gr, spec["scfsi"][ch], prev_long[ch])
                nbits = sum(b for _, b in fields)
                g["part2_3_length"] = nbits
                g["big_values"] = len(g["bigv"])
                sides.append(g)
                if gr == 0 and g["block_type"] != 2:
                    prev_long[ch] = list(g["scalefactors"]["long"])
                for v, b in fields:
                    acc = (acc << b) | (v & ((1 << b) - 1))
                    n += b
                    while n >= 8:
                        out.append((acc >> (n - 8)) & 0xFF)
                        n -= 8
                        acc &= (1 << n) - 1
        if n:
            out.append((acc << (8 - n)) & 0xFF)
        frame_main.append(bytes(out))
        all_side.append(sides)

    # 2) bound the reservoir: pad each frame's main data with ancillary
    # zero bytes (decoders read only part2_3_length bits per granule)
    # so the accumulated surplus — the NEXT frame's main_data_begin —
    # stays within the 9-bit field, as real encoders do
    mdb = 0
    for fi, raw in enumerate(frame_main):
        pad = max(0, mdb + cap - len(raw) - 400)
        if pad:
            raw = raw + bytes(pad)
            frame_main[fi] = raw
        mdb = mdb + cap - len(raw)

    # 3) distribute through the reservoir
    B = b"".join(frame_main)
    stream = bytearray()
    shipped = 0   # bytes of B shipped in earlier frames' regions
    offset = 0    # bytes of B belonging to earlier frames' main data
    for fi, spec in enumerate(frames):
        mdb = shipped - offset
        if not 0 <= mdb <= 511:
            raise ValueError(
                f"frame {fi}: main_data_begin {mdb} out of range — "
                "re-balance frame payload sizes vs bitrate")
        if offset + len(frame_main[fi]) > shipped + cap:
            raise ValueError(
                f"frame {fi}: main data spills past its own frame "
                "(raise br_idx)")
        bits: list[tuple[int, int]] = [(mdb, 9),
                                       (0, 5 if nch == 1 else 3)]
        for ch in range(nch):
            for b in spec["scfsi"][ch]:
                bits.append((b, 1))
        for g in all_side[fi]:
            bits += [(g["part2_3_length"], 12), (g["big_values"], 9),
                     (g["global_gain"], 8), (g["scalefac_compress"], 4),
                     (g["window_switching"], 1)]
            if g["window_switching"]:
                bits += [(g["block_type"], 2), (0, 1)]
                bits += [(t, 5) for t in g["table_select"][:2]]
                bits += [(sg, 3) for sg in g["subblock_gain"]]
            else:
                bits += [(t, 5) for t in g["table_select"][:3]]
                bits += [(g["region0_count"], 4),
                         (g["region1_count"], 3)]
            bits += [(g["preflag"], 1), (g["scalefac_scale"], 1),
                     (g.get("count1table_select", 1), 1)]
        acc, n = 0, 0
        side = bytearray()
        for v, b in bits:
            acc = (acc << b) | (v & ((1 << b) - 1))
            n += b
            while n >= 8:
                side.append((acc >> (n - 8)) & 0xFF)
                n -= 8
                acc &= (1 << n) - 1
        if n:
            side.append((acc << (8 - n)) & 0xFF)
        if len(side) != side_bytes:
            raise ValueError(f"side info {len(side)} != {side_bytes}")
        region = B[shipped:shipped + cap]
        region = region + bytes(cap - len(region))
        stream += hdr4.to_bytes(4, "big") + bytes(side) + region
        shipped += cap
        offset += len(frame_main[fi])
    return bytes(stream)


class Mp3SpectralDecoder:
    """Actor stage over (media_ref, payload) MPEG-audio rows: REAL
    Layer III payload decode through the bit reservoir — side info,
    scfsi scalefactor sharing, Huffman subset (big_values tables 0/1,
    count1 table B), formula-exact requantization to 576 spectral
    lines per granule.  Emits per-granule features: nonzero line
    count, crc32 over the quantized integer spectrum (pins bit-exact
    decode), max |xr| in ppm, global gain.  Layer I/II rows and frames
    needing an unimplemented Huffman table keep their rows flagged
    (readers never drop)."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib as _z

        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        rows: list[tuple] = []

        def emit(ref, fi, gr, ch, bt, gg, nz, crc, amp, status):
            rows.append((ref, fi, gr, ch, bt, gg, nz, crc, amp, status))

        for ref, p in zip(refs, payloads):
            try:
                meta = probe_mp3(p)
            except (ValueError, IndexError, EOFError) as exc:
                emit(ref, -1, -1, -1, -1, -1, -1, 0, -1,
                     f"demux_error: {exc}")
                continue
            if meta["layer"] != 3:
                emit(ref, -1, -1, -1, -1, -1, -1, 0, -1,
                     f"unsupported_layer:{meta['layer']}")
                continue
            try:
                frames = decode_mp3_frames(p, max_frames=self.n_frames)
            except ValueError as exc:
                emit(ref, -1, -1, -1, -1, -1, -1, 0, -1,
                     f"decode_error: {exc}")
                continue
            for fr in frames:
                for gr, chs in enumerate(fr["granules"]):
                    for ch, d in enumerate(chs):
                        g = fr["side_info"]["granules"][gr][ch]
                        amp = float(np.abs(d["xr"]).max())
                        emit(ref, fr["frame_idx"], gr, ch,
                             g["block_type"], g["global_gain"],
                             d["nonzero"],
                             _z.crc32(d["qs"].tobytes()),
                             int(round(amp * 1e6)), "ok")
        cols = list(zip(*rows)) if rows else [[]] * 10
        return pa.table({
            "media_ref": pa.array(cols[0], type=pa.string()),
            "frame_idx": pa.array(cols[1], type=pa.int64()),
            "granule": pa.array(cols[2], type=pa.int64()),
            "channel": pa.array(cols[3], type=pa.int64()),
            "block_type": pa.array(cols[4], type=pa.int64()),
            "global_gain": pa.array(cols[5], type=pa.int64()),
            "nonzero_lines": pa.array(cols[6], type=pa.int64()),
            "qs_crc32": pa.array(cols[7], type=pa.int64()),
            "max_xr_ppm": pa.array(cols[8], type=pa.int64()),
            "decode_status": pa.array(cols[9], type=pa.string()),
        })


def mp3_spectral_features(
    media: ray.data.Dataset,
    n_frames: int = 4,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 16,
) -> ray.data.Dataset:
    """MPEG-audio payload dataset -> Layer III spectral-domain features
    (REAL partial payload decode; Layer I/II rows pass through
    flagged)."""
    return media.map_batches(
        Mp3SpectralDecoder,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


# --- perceptual image hashing (near-duplicate image dedup) ----------------


def _int_luma(img: np.ndarray) -> np.ndarray:
    """ITU-R 601 luma in EXACT integer fixed point:
    (299 R + 587 G + 114 B) // 1000 — deterministic across platforms,
    no float rounding in the hash path."""
    im = img.astype(np.int64)
    return (299 * im[:, :, 0] + 587 * im[:, :, 1]
            + 114 * im[:, :, 2]) // 1000


def _gray_block_resize(g: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Grayscale downsample: exact integer block mean when the scale
    divides evenly (sum // count), nearest-neighbor otherwise — the
    grayscale twin of _area_resize."""
    h, w = g.shape
    if h % out_h == 0 and w % out_w == 0:
        fh, fw = h // out_h, w // out_w
        return (g.reshape(out_h, fh, out_w, fw).sum(axis=(1, 3))
                // (fh * fw))
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    return g[yi][:, xi]


def image_dhash(img: np.ndarray) -> int:
    """64-bit difference hash (dHash): 9x8 integer luma grid, one bit
    per horizontal gradient (left < right).  Robust to uniform
    brightness/contrast shifts and re-encodes; bit i = row-major
    gradient i."""
    g = _gray_block_resize(_int_luma(img), 9, 8)
    bits = (g[:, :-1] < g[:, 1:]).ravel()
    return int(np.packbits(bits.astype(np.uint8)).view(">u8")[0])


def image_ahash(img: np.ndarray) -> int:
    """64-bit average hash (aHash): 8x8 integer luma grid, one bit per
    cell >= the integer grid mean (sum // 64)."""
    g = _gray_block_resize(_int_luma(img), 8, 8)
    mean = int(g.sum()) // 64
    bits = (g >= mean).ravel()
    return int(np.packbits(bits.astype(np.uint8)).view(">u8")[0])


class ImagePerceptualHasher:
    """Actor stage over (media_ref, payload, width, height) image rows:
    REAL decode via the shared format sniffer, then 64-bit dHash +
    aHash perceptual fingerprints — the signatures that make image
    near-dup dedup a 64-bit hamming problem, so the text dedup
    machinery (stages/dedup.py:hamming_neardup_pairs, banded
    pigeonhole) applies unchanged.  Failed rows keep their row with
    hashes 0 and decode_status set (readers never drop)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        ws = batch.column("width").to_pylist()
        hs = batch.column("height").to_pylist()
        dh, ah, ows, ohs, status = [], [], [], [], []
        for p, w, h in zip(payloads, ws, hs):
            try:
                img = _decode_image_any(p, w, h)
            except (ValueError, TypeError) as exc:
                dh.append(0)
                ah.append(0)
                ows.append(-1)
                ohs.append(-1)
                status.append(f"decode_error: {exc}")
                continue
            dh.append(image_dhash(img))
            ah.append(image_ahash(img))
            ohs.append(img.shape[0])
            ows.append(img.shape[1])
            status.append("ok")
        return pa.table({
            "media_ref": pa.array(refs, type=pa.string()),
            "dhash": pa.array(np.array(dh, dtype=np.uint64)),
            "ahash": pa.array(np.array(ah, dtype=np.uint64)),
            "img_w": pa.array(ows, type=pa.int64()),
            "img_h": pa.array(ohs, type=pa.int64()),
            "decode_status": pa.array(status, type=pa.string()),
        })


def image_phash_neardups(
    media: ray.data.Dataset,
    max_hamming: int = 3,
    bands: int = 4,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 16,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Image near-duplicate detection end to end: decode (actor pool)
    -> dHash signatures -> banded-pigeonhole hamming pairs (the text
    SimHash transport, signature-agnostic).  Returns (signatures,
    pairs); pairs carry (left_id, right_id, hamming) over media_ref."""
    from .dedup import hamming_neardup_pairs

    sigs = media.map_batches(
        ImagePerceptualHasher,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    ).materialize()
    ok = sigs.map_batches(
        lambda b: b.filter(pc.equal(b.column("decode_status"), "ok")),
        batch_format="pyarrow")
    pairs = hamming_neardup_pairs(
        ok, max_hamming=max_hamming, bands=bands,
        id_col="media_ref", sig_col="dhash")
    return sigs, pairs


# --- audio fingerprinting (near-duplicate audio dedup) --------------------


def audio_energy_fingerprint(x: np.ndarray) -> int:
    """64-bit audio fingerprint from windowed energy GRADIENTS (the
    same gradient-sign construction as image_dhash, over time instead
    of space): mix to mono, split into 65 equal windows, bit i =
    energy(window i) < energy(window i+1).  Energy ratios are
    invariant under uniform gain, and window energies survive lossy
    companding (G.711) and ADPCM requantization — so re-encodes of
    one recording collapse to hamming-0/near-0 while different
    recordings land far apart.  `x`: float array (n_frames,
    n_channels) in [-1, 1] (decode_wav's contract)."""
    mono = x.mean(axis=1) if x.ndim == 2 else x
    n = len(mono)
    if n < 130:
        raise ValueError("audio too short to fingerprint (< 130 frames)")
    W = 65
    cut = (n // W) * W
    e = (mono[:cut].astype(np.float64) ** 2).reshape(W, -1).sum(axis=1)
    bits = (e[:-1] < e[1:])
    return int(np.packbits(bits.astype(np.uint8)).view(">u8")[0])


class AudioFingerprinter:
    """Actor stage over (media_ref, payload) WAV rows: REAL decode
    (PCM / float / G.711 / IMA-ADPCM via decode_wav) -> 64-bit energy
    fingerprint; failed rows keep their row with fingerprint 0 and
    decode_status set."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        fp, rate, nfr, status = [], [], [], []
        for p in payloads:
            try:
                x, r = decode_wav(p)
                f = audio_energy_fingerprint(x)
            except (ValueError, TypeError) as exc:
                fp.append(0)
                rate.append(-1)
                nfr.append(-1)
                status.append(f"decode_error: {exc}")
                continue
            fp.append(f)
            rate.append(r)
            nfr.append(x.shape[0])
            status.append("ok")
        return pa.table({
            "media_ref": pa.array(refs, type=pa.string()),
            "fingerprint": pa.array(np.array(fp, dtype=np.uint64)),
            "sample_rate": pa.array(rate, type=pa.int64()),
            "n_frames": pa.array(nfr, type=pa.int64()),
            "decode_status": pa.array(status, type=pa.string()),
        })


def audio_fingerprint_neardups(
    media: ray.data.Dataset,
    max_hamming: int = 3,
    bands: int = 4,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 16,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Audio near-duplicate detection end to end: decode (actor pool)
    -> energy fingerprints -> banded-pigeonhole hamming pairs (the
    shared 64-bit transport).  Returns (signatures, pairs)."""
    from .dedup import hamming_neardup_pairs

    sigs = media.map_batches(
        AudioFingerprinter,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    ).materialize()
    ok = sigs.map_batches(
        lambda b: b.filter(pc.equal(b.column("decode_status"), "ok")),
        batch_format="pyarrow")
    pairs = hamming_neardup_pairs(
        ok, max_hamming=max_hamming, bands=bands,
        id_col="media_ref", sig_col="fingerprint")
    return sigs, pairs
