"""Deterministic hashing & sketching kernels.

Generalizes the reference's two-tier BLAKE3 cascade
(/root/reference/src/hasher.rs:18-47 — partial-prefix hash then full hash)
into the digest/sketch family the three-stage detector needs:

    content_hash  exact byte digest (blake2b-256)           ~ full_hash_file
    pixel_hash    digest of DECODED pixels (re-encode dup)  (new tier)
    phash         64-bit perceptual average-hash            (cheap key ~ partial hash)
    minhash       K-permutation MinHash over char shingles  (near-dup captions)
    simhash64     64-bit SimHash over token hashes          (near-dup text)
    band keys     LSH banding for both MinHash and phash bitplanes

Everything is pure numpy/stdlib, seeded, and stable across processes (no
reliance on PYTHONHASHSEED).
"""

from __future__ import annotations

import hashlib

import numpy as np

U64 = np.uint64
_MERSENNE61 = np.uint64((1 << 61) - 1)


# ---------------------------------------------------------------- digests


def content_hash(data: bytes) -> bytes:
    """32-byte exact digest of the encoded payload (blake2b stands in for the
    reference's BLAKE3, /root/reference/src/hasher.rs:30-47)."""
    return hashlib.blake2b(data, digest_size=32).digest()


def pixel_hash(pixels: np.ndarray) -> bytes:
    """32-byte digest of decoded pixels (+shape), catching exact re-encodes
    across formats — the tier the file-level reference cannot have."""
    h = hashlib.blake2b(digest_size=32)
    h.update(np.asarray(pixels.shape, dtype=np.int64).tobytes())
    h.update(np.ascontiguousarray(pixels).tobytes())
    return h.digest()


# ---------------------------------------------------------------- phash


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash: average-hash over an 8x8 block-mean grayscale.

    DCT-free variant: grayscale -> 8x8 block means (area interpolation via
    cumsum so any w,h works) -> bit i = cell_i > mean. Deterministic, pure
    numpy. Returns a SIGNED int64-compatible int (two's complement) so it
    stores losslessly in the `phash: int64` input_hint column.
    """
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    # integral image for O(1) box sums at arbitrary fractional grid lines
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    ii[1:, 1:] = gray.cumsum(0).cumsum(1)
    ys = np.linspace(0, h, 9).round().astype(np.int64)
    xs = np.linspace(0, w, 9).round().astype(np.int64)
    y0 = np.minimum(ys[:8], h - 1)
    y1 = np.minimum(np.maximum(ys[1:], y0 + 1), h)
    x0 = np.minimum(xs[:8], w - 1)
    x1 = np.minimum(np.maximum(xs[1:], x0 + 1), w)
    area = np.outer(y1 - y0, x1 - x0).astype(np.float64)
    cells = (
        ii[np.ix_(y1, x1)] - ii[np.ix_(y0, x1)] - ii[np.ix_(y1, x0)] + ii[np.ix_(y0, x0)]
    ) / area
    bits = (cells > cells.mean()).ravel()
    val = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return int(np.uint64(val).astype(np.int64))


def _dihedral_orbit(pixels: np.ndarray):
    """The 8 dihedral transforms of an (h, w, c) image — rotations by
    0/90/180/270 degrees and their mirror images. numpy views (no copies);
    consumers that need contiguity copy themselves."""
    yield pixels
    yield np.rot90(pixels)
    yield np.rot90(pixels, 2)
    yield np.rot90(pixels, 3)
    f = pixels[:, ::-1]
    yield f
    yield np.rot90(f)
    yield np.rot90(f, 2)
    yield np.rot90(f, 3)


def dihedral_pixel_hash(pixels: np.ndarray) -> bytes:
    """Orbit-canonical exact digest: min over the 8 dihedral transforms of
    ``pixel_hash``. EXACTLY invariant under any rotation/flip of the pixel
    array — the orbit {T(p)} is a group orbit, so every member yields the
    same 8-digest set and therefore the same minimum. The exact-dedup key
    for rotated/flipped copies (the tier plain pixel_hash cannot have)."""
    return min(pixel_hash(t) for t in _dihedral_orbit(pixels))


def phash_dihedral64(pixels: np.ndarray) -> int:
    """Orbit-canonical perceptual hash: min over the 8 dihedral transforms
    of ``phash64``. Exactly invariant for exact rotations/flips (same group-
    orbit argument as ``dihedral_pixel_hash``); for a perturbed-then-rotated
    copy it moves about as many bits as plain phash64 does for the same
    perturbation, so it serves as the cheap key of a rotation-robust near-
    dup cascade."""
    return min(phash64(t) for t in _dihedral_orbit(pixels))


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of XOR over int64/uint64 arrays."""
    x = (np.ascontiguousarray(np.asarray(a).astype(np.int64)).view(np.uint64)
         ^ np.ascontiguousarray(np.asarray(b).astype(np.int64)).view(np.uint64))
    v = x.view(np.uint8).reshape(*x.shape, 8)
    return _POPCOUNT_LUT[v].sum(axis=-1).astype(np.int64)


_POPCOUNT_LUT = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _band_widths(n_bands: int) -> np.ndarray:
    """Bit widths of an (as-equal-as-possible) n_bands partition of 64 bits.
    The pigeonhole argument below needs only that bands PARTITION the bits,
    so n_bands need not divide 64 (e.g. 9 bands = 7,7,7,7,7,7,7,7,8)."""
    w = np.full(n_bands, 64 // n_bands, dtype=np.int64)
    w[: 64 % n_bands] += 1
    return w


def phash_bands(phash: np.ndarray, n_bands: int) -> np.ndarray:
    """Split 64-bit phashes into ``n_bands`` bit-slices (as equal as 64
    allows — see ``_band_widths``).

    Pigeonhole guarantee: two hashes within Hamming distance < n_bands share
    at least one identical band -> banding is a recall-complete candidate
    generator for Hamming <= n_bands-1.

    Returns shape (len(phash), n_bands) uint64 of band values.
    """
    widths = _band_widths(n_bands)
    offsets = np.concatenate([[0], np.cumsum(widths)[:-1]])
    u = np.ascontiguousarray(np.asarray(phash).astype(np.int64)).view(np.uint64)
    out = np.empty((u.shape[0], n_bands), dtype=np.uint64)
    for b in range(n_bands):
        mask = np.uint64((1 << int(widths[b])) - 1)
        out[:, b] = (u >> np.uint64(int(offsets[b]))) & mask
    return out


def phash_combo_keys(
    phash: np.ndarray, n_bands: int, combo_size: int
) -> np.ndarray:
    """Hamming-LSH keys from size-``combo_size`` band combinations: for each
    of the C(n_bands, combo_size) combinations, key = the concatenated band
    values tagged with the combo index.

    Pigeonhole: Hamming <= n_bands - combo_size leaves >= combo_size bands
    untouched, so some size-s combination matches exactly -> recall-complete
    for Hamming <= n_bands - combo_size. The default (8, 2) gives 16-bit
    keys over 28 combos, complete to Hamming 6 (the verify threshold).

    The SELECTIVITY knob for band-pair keyspace saturation (SCALE.md): at R
    reps with random phashes, junk-pair volume ~ n_combos * R^2 / 2^(key
    bits + 1). (9, 3) widens keys to ~21 bits over 84 combos — ~13x less
    junk for 3x the explode rows; (10, 4) ~25.6-bit keys over 210 combos —
    ~100x less junk for 7.5x explode. The trade is the pigeonhole bound:
    completeness drops to n_bands - combo_size, so the config validates
    phash_hamming_max <= n_bands - combo_size.

    Returns shape (len(phash), C(n_bands, combo_size)) uint64; the combo
    index is mixed into the bits above the key so distinct combos never
    share a key space (keys wider than 64 bits would wrap — the config
    bounds combo widths well below that).
    """
    from itertools import combinations

    b = phash_bands(phash, n_bands)
    widths = _band_widths(n_bands)
    n = b.shape[0]
    combos = list(combinations(range(n_bands), combo_size))
    out = np.empty((n, len(combos)), dtype=np.uint64)
    for c, members in enumerate(combos):
        total = int(widths[list(members)].sum())
        # concatenated member bands, combo tag in the bits above them
        key = np.zeros(n, dtype=np.uint64)
        for i in members:
            key = (key << np.uint64(int(widths[i]))) | b[:, i]
        out[:, c] = (np.uint64(c) << np.uint64(total)) | key
    return out


def phash_band_pair_keys(phash: np.ndarray, n_bands: int) -> np.ndarray:
    """Back-compat wrapper: ``phash_combo_keys`` at combo_size=2."""
    return phash_combo_keys(phash, n_bands, 2)


def phash_combo_key_single(
    phash: np.ndarray, n_bands: int, combo_size: int, combo_index: int
) -> np.ndarray:
    """Column ``combo_index`` of ``phash_combo_keys`` without materializing
    the (n, C(n_bands, combo_size)) matrix — the broadcast cascade kernel
    (stages/lsh._cascade_broadcast_pairs) computes one combo per Ray task.
    Bit-identical to the corresponding full-matrix column (same
    enumeration order, same tag placement)."""
    from itertools import combinations

    b = phash_bands(phash, n_bands)
    widths = _band_widths(n_bands)
    members = list(combinations(range(n_bands), combo_size))[combo_index]
    total = int(widths[list(members)].sum())
    key = np.zeros(len(phash), dtype=np.uint64)
    for i in members:
        key = (key << np.uint64(int(widths[i]))) | b[:, i]
    return (np.uint64(combo_index) << np.uint64(total)) | key


# ---------------------------------------------------------------- shingles


def _codepoints(text: str) -> np.ndarray:
    """Unicode codepoints as uint32, vectorized (no Python char loop).

    All text hashing works on CODEPOINTS, not UTF-8 bytes, so k-gram
    positions/lengths match character semantics and the DuckDB oracles'
    ``ord(substr(t, i, 1))`` reproduces the exact same values for any
    unicode text, not just ASCII."""
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)


def char_shingle_hashes(text: str, k: int) -> np.ndarray:
    """uint64 polynomial rolling hashes of all k-char shingles (codepoints).

    Fully vectorized: sliding windows x precomputed base powers, mod 2^64 via
    natural uint64 wraparound. Deterministic across processes. Returns the
    UNIQUE shingle hash set (set semantics for Jaccard).
    """
    raw = _codepoints(text)
    if raw.size < k:
        return np.empty(0, dtype=np.uint64)
    powers = _shingle_powers(k)
    win = np.lib.stride_tricks.sliding_window_view(raw, k).astype(np.uint64)
    return np.unique((win * powers).sum(axis=1, dtype=np.uint64))


_POWER_CACHE: dict[int, np.ndarray] = {}
_SHINGLE_BASE = np.uint64(1099511628211)  # FNV prime; odd -> bijective mod 2^64


def _shingle_powers(k: int) -> np.ndarray:
    p = _POWER_CACHE.get(k)
    if p is None:
        p = np.empty(k, dtype=np.uint64)
        p[k - 1] = np.uint64(1)
        with np.errstate(over="ignore"):  # uint64 wraparound is the hash's modulus
            for i in range(k - 2, -1, -1):
                p[i] = p[i + 1] * _SHINGLE_BASE
        _POWER_CACHE[k] = p
    return p


# ---------------------------------------------------------------- MinHash


class MinHasher:
    """K-permutation MinHash with seeded 61-bit universal hashing.

    State (the a/b permutation tables) is built once and reused per batch —
    in the pipeline this object lives inside a map_batches actor's __init__
    (SURVEY.md §7.1 M3).
    """

    EMPTY = np.uint64(0xFFFFFFFFFFFFFFFF)

    def __init__(self, num_perm: int, seed: int) -> None:
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.a = rng.integers(1, _MERSENNE61, num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, _MERSENNE61, num_perm, dtype=np.uint64)

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        """(num_perm,) uint64 signature; all-ones sentinel for empty sets."""
        if shingle_hashes.size == 0:
            return np.full(self.num_perm, self.EMPTY, dtype=np.uint64)
        h = shingle_hashes & _MERSENNE61  # fold into the 61-bit field
        v = self.a[:, None] * h[None, :] + self.b[:, None]  # wraps mod 2^64
        v = (v & _MERSENNE61) + (v >> np.uint64(61))  # fast partial mod 2^61-1
        return v.min(axis=1)

    @staticmethod
    def est_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
        """Estimated Jaccard from equal-length signatures; supports (N,K)
        stacked comparisons. Empty-sentinel signatures estimate 0 vs anything
        non-empty by construction of the sentinel (matches only itself)."""
        a, b = np.asarray(sig_a), np.asarray(sig_b)
        return (a == b).mean(axis=-1)


def band_keys(sigs: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """Collapse (N, bands*rows) signatures into (N, bands) uint64 band keys
    via a seeded polynomial combine (one shuffle key per band)."""
    n = sigs.shape[0]
    out = np.empty((n, bands), dtype=np.uint64)
    base = np.uint64(0x9E3779B97F4A7C15)
    for b in range(bands):
        block = sigs[:, b * rows : (b + 1) * rows]
        acc = np.full(n, np.uint64(b + 1), dtype=np.uint64)
        for r in range(rows):
            acc = (acc ^ block[:, r]) * base
        out[:, b] = acc
    return out


# ---------------------------------------------------------------- winnowing


def winnow_fingerprints(text: str, gram_len: int, window: int) -> np.ndarray:
    """Winnowed fingerprints (Schleimer et al., SIGMOD'03 scheme) over
    ``gram_len``-char rolling hashes: select the min hash in every window of
    ``window`` consecutive grams (rightmost-min tie-break via position).

    Guarantee: two texts sharing a substring of length >= gram_len+window-1
    share at least one selected fingerprint — this is tier 3's candidate
    generator AND (with an exact LCS verify) part of its relation definition,
    shared with the oracle. Returns unique uint64 fingerprints.
    """
    raw = _codepoints(text)
    n = raw.size - gram_len + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    powers = _shingle_powers(gram_len)
    win = np.lib.stride_tricks.sliding_window_view(raw, gram_len).astype(np.uint64)
    hashes = (win * powers).sum(axis=1, dtype=np.uint64)
    if n <= window:
        return np.unique(hashes.min(keepdims=True))
    hw = np.lib.stride_tricks.sliding_window_view(hashes, window)
    return np.unique(hw.min(axis=1))


# ---------------------------------------------------------------- SimHash


def simhash64(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """Classic 64-bit SimHash: signed bit-plane accumulation of token hashes."""
    if token_hashes.size == 0:
        return 0
    bits = (
        (token_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
        & np.uint64(1)
    ).astype(np.int64)
    signed = bits * 2 - 1
    if weights is not None:
        signed = signed * weights[:, None].astype(np.int64)
    acc = signed.sum(axis=0)
    val = np.uint64(0)
    for i in range(63, -1, -1):
        val = (val << np.uint64(1)) | np.uint64(1 if acc[i] > 0 else 0)
    return int(val.astype(np.int64))


_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def token_hashes(text: str) -> np.ndarray:
    """uint64 FNV-1a hashes of whitespace tokens.

    Stable across processes AND SQL-expressible: the DuckDB oracle for
    ``simhash_near_pairs`` recomputes the exact same hash with a
    ``list_reduce`` over token CODEPOINTS (``ord(substr(t,i,1))``) — FNV-1a
    folded per character, which matches this implementation for any unicode
    text. Vectorized across tokens (sequential only over character
    position, bounded by the longest token)."""
    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    raws = [_codepoints(t) for t in toks]
    lens = np.array([r.size for r in raws])
    mat = np.zeros((len(toks), int(lens.max())), dtype=np.uint64)
    for i, r in enumerate(raws):
        mat[i, : r.size] = r
    h = np.full(len(toks), _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):  # uint64 wraparound IS the modulus
        for j in range(mat.shape[1]):
            active = j < lens
            h[active] = (h[active] ^ mat[active, j]) * _FNV_PRIME
    return h


def splitmix64(ids: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over int64/uint64 ids -> uint64 hashes.

    The shared deterministic-id-hash kernel: hash-split assignment,
    per-group deterministic sampling, and the HyperLogLog sketch all draw
    uniform 64-bit values from it. SQL-expressible bit-exactly (the DuckDB
    oracles reproduce it with HUGEINT mod-2^64 arithmetic, multiplies split
    into 32-bit halves to stay under INT128), so splits/samples are
    value-checkable end to end."""
    h = np.asarray(ids).astype(np.int64, copy=False).view(np.uint64).copy()
    with np.errstate(over="ignore"):  # uint64 wraparound IS the modulus
        h += np.uint64(0x9E3779B97F4A7C15)
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return h
