"""Codec invariants (BASELINE.md per-row invariants: lossless exact,
lossy PSNR >= 40 dB)."""

import numpy as np
import pytest

from dedup_ray.functions import codecs


@pytest.fixture
def pixels():
    rng = np.random.default_rng(123)
    return rng.integers(0, 256, (37, 21, 3), dtype=np.uint8)


@pytest.mark.parametrize("fmt", ["raw", "png"])
def test_lossless_roundtrip(pixels, fmt):
    back = codecs.decode(codecs.encode(pixels, fmt), fmt)
    assert np.array_equal(pixels, back)
    assert codecs.psnr(pixels, back) == float("inf")


def test_qnt_psnr_invariant(pixels):
    back = codecs.decode(codecs.encode(pixels, "qnt"), "qnt")
    assert back.shape == pixels.shape
    assert codecs.psnr(pixels, back) >= 40.0


def test_qnt_deterministic(pixels):
    assert codecs.encode(pixels, "qnt") == codecs.encode(pixels, "qnt")


def test_png_is_real_png(pixels):
    data = codecs.encode(pixels, "png")
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in data[:32] and b"IEND" in data[-16:]


def test_png_decodes_filtered_scanlines():
    """Decoder handles Up-filtered data (not produced by our encoder)."""
    import struct
    import zlib

    h, w = 4, 3
    rows = np.arange(h * w * 3, dtype=np.uint8).reshape(h, w * 3)
    # filter type 2 (Up): raw[y] = cur - prev
    filtered = bytearray()
    prev = np.zeros(w * 3, dtype=np.int32)
    for y in range(h):
        filtered.append(2)
        filtered += ((rows[y].astype(np.int32) - prev) & 0xFF).astype(np.uint8).tobytes()
        prev = rows[y].astype(np.int32)
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        sig
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + codecs._chunk(b"IEND", b"")
    )
    out = codecs.decode_png(data)
    assert np.array_equal(out.reshape(h, w * 3), rows)


def test_psnr_sensitivity(pixels):
    noisy = pixels.copy()
    noisy[0, 0, 0] ^= 0xFF
    assert 0 < codecs.psnr(pixels, noisy) < float("inf")
