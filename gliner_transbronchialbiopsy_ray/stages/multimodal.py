"""Multimodal column plumbing: media spans as opaque references with typed
metadata, processed by actor-pool `map_batches` stages.

The lossy-codec libraries are NOT in this environment, so the JPEG/MP3/MP4
decode kernel is stubbed (deterministic fake features, clearly marked);
raw RGB888, netpbm P5/P6, PNG (stdlib-zlib inflate + unfilter), WAV PCM
and RAWV video are REAL pure-NumPy/stdlib decoders.  The Ray side —
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


def decode_png(payload: bytes) -> np.ndarray:
    """REAL PNG pixel decode with zero external deps (stdlib zlib
    inflate + per-scanline unfilter) -> (h, w, 3) uint8.  Gray expands
    to 3 channels, palette indices resolve through PLTE, alpha is
    dropped (features/resize operate on color planes).  8-bit,
    non-interlaced images only; anything else raises ValueError and the
    calling stage records decode_status instead of dropping the row."""
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a png payload")
    w = h = -1
    channels = 0
    color_type = -1
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
            if interlace != 0:
                raise ValueError("png interlaced (Adam7) unsupported")
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
    stride = w * channels
    px = _png_unfilter(raw, h, stride, channels).reshape(h, w, channels)
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
    signature routes to `decode_png` (REAL stdlib-zlib pixel decode)
    and a netpbm P5/P6 magic routes to `decode_pnm` — both
    self-describing, so rows carrying container files don't need
    width/height metadata at all."""

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
                raw_size = (w or 0) * (h or 0) * 3
                if p is not None and len(p) != raw_size and (
                        p[:8] == _PNG_MAGIC):
                    img = decode_png(p).astype(np.float32)
                elif p is not None and len(p) != raw_size and p[:2] in (
                        b"P5", b"P6"):
                    img = decode_pnm(p).astype(np.float32)
                else:
                    img = decode_raw_rgb(p, w, h).astype(np.float32)
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


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL audio decode with zero external deps: standard RIFF/WAVE PCM
    (8/16/32-bit int) via the stdlib `wave` module -> (samples, rate)
    where samples is float32 (n_frames, n_channels) scaled to [-1, 1].
    Raises wave.Error/ValueError on malformed payloads — the stage keeps
    the row and records decode_status (never drops)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        width = w.getsampwidth()
        rate = w.getframerate()
        nch = w.getnchannels()
        raw = w.readframes(w.getnframes())
    if width == 1:  # 8-bit PCM is unsigned
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
        x = (x - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width: {width}")
    return x.reshape(-1, nch), rate


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
        import wave

        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        feats, envs, status = [], [], []
        for p in payloads:
            try:
                x, rate = decode_wav(p)
            except (wave.Error, ValueError, EOFError) as exc:
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
