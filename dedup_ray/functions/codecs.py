"""Self-implemented image codecs (no PIL/cv2 in the environment).

Three formats cover the invariant matrix from BASELINE.md ("decoded-pixel
allclose / PSNR >= 40 dB for lossy, exact for lossless"):

    raw  -- uncompressed RGB8, trivial header            (lossless)
    png  -- real PNG (filter 0, zlib), self-implemented  (lossless)
    qnt  -- 6-bit/channel quantized + zlib               (lossy, PSNR ~ 46 dB)

All functions are pure numpy/stdlib and deterministic. Pixels are HxWx3 uint8.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_raw(pixels: np.ndarray) -> bytes:
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    return struct.pack(">II", w, h) + pixels.tobytes()


def decode_raw(data: bytes) -> np.ndarray:
    w, h = struct.unpack(">II", data[:8])
    return np.frombuffer(data[8:], dtype=np.uint8).reshape(h, w, 3).copy()


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal but spec-conformant 8-bit RGB PNG (color type 2, filter 0)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # prepend the per-scanline filter byte (0 = None)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()
    idat = zlib.compress(raw, level=6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, stride: int) -> np.ndarray:
    """Undo PNG scanline filters for bpp=3. Vectorized per filter type where
    possible; filters 1/3/4 need a per-scanline pass (rare in our own output,
    which always uses filter 0, but decode stays general)."""
    rows = raw.reshape(h, stride + 1)
    ftypes = rows[:, 0]
    out = rows[:, 1:].astype(np.int32).copy()
    if np.all(ftypes == 0):
        return out.astype(np.uint8)
    bpp = 3
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f, line = int(ftypes[y]), out[y]
        if f == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif f == 2:  # Up
            line[:] = (line + prev) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                cc = prev[x - bpp] if x >= bpp else 0
                p = a + b - cc
                pa, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc_) else (b if pb <= pc_ else cc)
                line[x] = (line[x] + pred) & 0xFF
        prev = line
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos, w = 8, 0
    h = 0
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bitdepth, ctype = struct.unpack(">IIBB", payload[:10])
            assert bitdepth == 8 and ctype == 2, "only 8-bit RGB supported"
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    return _unfilter(raw, h, w * 3).reshape(h, w, 3)


def encode_qnt(pixels: np.ndarray) -> bytes:
    """Lossy: keep the top 6 bits per channel, zlib-compress.

    Decode re-centers into the dropped-bits range, so |err| <= 2 per channel
    -> MSE <= 2 -> PSNR >= 10*log10(255^2/2) ~ 45 dB, satisfying the >= 40 dB
    invariant (BASELINE.md per-row invariants)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    q = (pixels >> 2).tobytes()
    return struct.pack(">II", w, h) + zlib.compress(q, level=6)


def decode_qnt(data: bytes) -> np.ndarray:
    w, h = struct.unpack(">II", data[:8])
    q = np.frombuffer(zlib.decompress(data[8:]), dtype=np.uint8).reshape(h, w, 3)
    return ((q << 2) | 2).astype(np.uint8)  # +2 centers the 4-wide bin


_DECODERS = {"raw": decode_raw, "png": decode_png, "qnt": decode_qnt}
_ENCODERS = {"raw": encode_raw, "png": encode_png, "qnt": encode_qnt}
LOSSLESS_FMTS = frozenset({"raw", "png"})


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    return _ENCODERS[fmt](pixels)


def decode(data: bytes, fmt: str) -> np.ndarray:
    return _DECODERS[fmt](data)


def header_dims(data: bytes, fmt: str) -> tuple[int, int] | None:
    """(w, h) from the container header WITHOUT decoding, or None when the
    header is unreadable. Used by cascade decode to keep validity-filter
    semantics aligned for rows whose pixel decode is skipped: header-level
    corruption is caught either way; only deep payload corruption needs the
    full decode."""
    try:
        if fmt == "raw":
            w, h = struct.unpack(">II", data[:8])
            if len(data) != 8 + w * h * 3:
                return None
            return w, h
        if fmt == "qnt":
            return struct.unpack(">II", data[:8])
        if fmt == "png":
            if data[:8] != _PNG_SIG:
                return None
            (length,) = struct.unpack(">I", data[8:12])
            if data[12:16] != b"IHDR":
                return None
            w, h, bitdepth, ctype = struct.unpack(">IIBB", data[16:26])
            if bitdepth != 8 or ctype != 2:
                return None
            return w, h
    except Exception:
        return None
    return None


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
