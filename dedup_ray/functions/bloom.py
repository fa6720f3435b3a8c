"""Vectorized Bloom filter over int64 keys — the shuffle-pruning prefilter.

At 100 TB the expensive part of a semi/anti join is shipping the BIG side's
rows into the co-partitioning shuffle. When the key set is too large to
broadcast exactly but its Bloom bitmap is not (1e9 keys at ~10 bits/key is
~1.2 GB — one ray.put, read zero-copy by every probe task), probing the
bitmap map-side drops the guaranteed-miss rows BEFORE the shuffle; the
false-positive survivors (a tunable ~1% of misses) are eliminated by the
exact shuffle_join that follows, so the composed operator stays EXACT —
the filter moves bytes, never correctness (the classic distributed
semi-join reduction; e.g. Bratbergsengen's Bloom-join, VLDB 1984).

Double hashing (Kirsch-Mitzenmacher): index_i = h1 + i*h2 (mod m) gives k
independent-enough probes from two splitmix64 draws, fully vectorized.
"""

from __future__ import annotations

import math

import numpy as np

from dedup_ray.functions.hashing import splitmix64

_SALT = np.uint64(0xA076_1D64_78BD_642F)  # second-draw domain separator


def bloom_params(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) sized for ``n_keys`` at target false-positive rate
    ``fpp``: m = -n ln p / (ln 2)^2, k = (m/n) ln 2, both floored to sane
    minimums so degenerate inputs stay valid."""
    n = max(1, int(n_keys))
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2.0) ** 2)))
    m = max(64, (m + 63) & ~63)  # whole uint64 words
    k = max(1, int(round(m / n * math.log(2.0))))
    return m, min(k, 16)


def _indices(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(len(keys), k) probe bit-indices via double hashing."""
    h1 = splitmix64(keys)
    h2 = splitmix64(keys.astype(np.int64, copy=False).view(np.uint64) ^ _SALT)
    h2 |= np.uint64(1)  # odd -> full-period stride for any m
    i = np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)


def bloom_build(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Set bits for ``keys`` -> uint64 bitmap of m_bits/64 words. Partial
    bitmaps from different batches merge with bitwise OR (associative and
    commutative), so distributed builds tree-reduce."""
    bitmap = np.zeros(m_bits // 64, dtype=np.uint64)
    if len(keys) == 0:
        return bitmap
    idx = _indices(np.asarray(keys), m_bits, k).ravel()
    words, bits = idx >> np.uint64(6), idx & np.uint64(63)
    np.bitwise_or.at(bitmap, words.astype(np.int64),
                     np.uint64(1) << bits)
    return bitmap


def bloom_probe(keys: np.ndarray, bitmap: np.ndarray, k: int) -> np.ndarray:
    """Membership mask: True = possibly present, False = DEFINITELY absent."""
    n = len(keys)
    if n == 0:
        return np.zeros(0, dtype=bool)
    m_bits = len(bitmap) * 64
    idx = _indices(np.asarray(keys), m_bits, k)
    words, bits = idx >> np.uint64(6), idx & np.uint64(63)
    hit = (bitmap[words.astype(np.int64)] >> bits) & np.uint64(1)
    return hit.all(axis=1)
