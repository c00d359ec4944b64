"""Pure-stdlib media codecs backing the multimodal operators.

No PIL/opencv/ffmpeg exists in this environment, but PNG and WAV need
nothing beyond the standard library: PNG is zlib-compressed scanlines
with 5 difference filters (RFC 2083); WAV PCM is a RIFF header over raw
samples (stdlib ``wave``). These decoders are REAL — they bit-exactly
recover pixels/samples from genuine files — and small enough to audit.

Scope (honestly bounded):
- PNG: 8-bit depth, color types 0/2/3/4/6 (gray, RGB, palette, gray+A,
  RGBA), non-interlaced — i.e. the overwhelmingly common encoder output.
  Interlaced/16-bit raise ValueError.
- WAV: 8/16/32-bit integer PCM via the stdlib reader.
- JPEG/video: genuinely need a native codec; the operators keep their
  declared NotImplementedError for those.

Perf note: unfiltering Sub/Average/Paeth is sequential along a scanline,
so rows decode in a Python loop over bytes. Fine for the fixture-scale
payloads these tests use; a production pipeline swaps a native codec into
the same mapInPandas operator shape (the plumbing, not the codec, is what
this engine owns).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG into a (height, width, channels) uint8 array.
    Palette images are expanded to RGB."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat, plte = 8, None, b"", None
    while pos < len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, interlace={interlace})")
    if color not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color}")
    ch = _CHANNELS[color]
    raw = zlib.decompress(idat)
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline payload length mismatch")
    out = np.empty((height, stride), np.uint8)
    prev = np.zeros(stride, np.intp)
    for y in range(height):
        fbyte = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)], np.uint8
        ).astype(np.intp)
        row = _unfilter(fbyte, row, prev, ch)
        out[y] = row.astype(np.uint8)
        prev = row
    arr = out.reshape(height, width, ch)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        arr = plte[arr[:, :, 0]]
    return arr


def _unfilter(ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    if ftype == 0:
        return row
    if ftype == 2:
        return (row + prev) % 256
    n = len(row)
    out = row.copy()
    if ftype == 1:  # Sub
        for i in range(bpp, n):
            out[i] = (out[i] + out[i - bpp]) % 256
    elif ftype == 3:  # Average
        for i in range(n):
            a = out[i - bpp] if i >= bpp else 0
            out[i] = (out[i] + (a + prev[i]) // 2) % 256
    elif ftype == 4:  # Paeth
        for i in range(n):
            a = out[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (out[i] + pred) % 256
    else:
        raise ValueError(f"unknown PNG filter {ftype}")
    return out


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal PNG encoder (filter 0, one IDAT). Accepts (H, W) gray,
    (H, W, 1|2|3|4) uint8."""
    a = np.asarray(arr, np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W, C) array — pure index math."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return arr[ys][:, xs]


def luma(arr: np.ndarray) -> float:
    """Mean Rec.601 luma in [0, 1]; gray/gray+A use the gray channel."""
    a = arr.astype(np.float64)
    if a.ndim == 2 or a.shape[2] <= 2:
        y = a if a.ndim == 2 else a[:, :, 0]
    else:
        y = 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
    return float(y.mean()) / 255.0


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode integer-PCM WAV bytes -> ((n_samples, n_channels) int array,
    sample_rate) via the stdlib reader."""
    import io
    import wave

    with wave.open(io.BytesIO(data)) as f:
        n, ch, sw, rate = f.getnframes(), f.getnchannels(), f.getsampwidth(), f.getframerate()
        raw = f.readframes(n)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
    if dtype is None:
        raise ValueError(f"unsupported WAV sample width {sw}")
    samples = np.frombuffer(raw, dtype).reshape(-1, ch)
    if sw == 1:  # 8-bit WAV is unsigned; center it
        samples = samples.astype(np.int16) - 128
    return samples, rate
