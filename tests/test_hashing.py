"""Kernel-level properties of the hash/sketch family (SURVEY.md §5.1 analog
of the reference's cascade-correctness pair tests, src/hasher.rs:138-160)."""

import numpy as np

from dedup_ray.functions.hashing import (
    MinHasher,
    band_keys,
    char_shingle_hashes,
    content_hash,
    hamming64,
    phash64,
    phash_bands,
    pixel_hash,
    simhash64,
    token_hashes,
    winnow_fingerprints,
)


def _img(seed, h=32, w=32):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (8, 8, 3), dtype=np.int32)
    return np.clip(np.kron(base, np.ones((4, 4, 1), dtype=np.int32)), 0, 255).astype(
        np.uint8
    )


def test_content_hash_distinct():
    assert content_hash(b"abc") != content_hash(b"abd")
    assert len(content_hash(b"")) == 32


def test_pixel_hash_shape_sensitive():
    a = np.zeros((4, 6, 3), dtype=np.uint8)
    b = np.zeros((6, 4, 3), dtype=np.uint8)
    assert pixel_hash(a) != pixel_hash(b)


def test_phash_deterministic_and_local():
    img = _img(1)
    assert phash64(img) == phash64(img)
    # small perturbation -> small hamming distance
    near = img.copy()
    near[:4, :4] = np.clip(near[:4, :4].astype(int) + 25, 0, 255).astype(np.uint8)
    d_near = hamming64(np.array([phash64(img)]), np.array([phash64(near)]))[0]
    d_far = hamming64(np.array([phash64(img)]), np.array([phash64(_img(2))]))[0]
    assert d_near <= 8
    assert d_far > 10


def test_phash_arbitrary_dims():
    for h, w in [(8, 8), (9, 13), (31, 17), (64, 48)]:
        rng = np.random.default_rng(h * 100 + w)
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        v = phash64(img)
        assert -(2**63) <= v < 2**63


def test_hamming64_basic():
    a = np.array([0, -1, 7], dtype=np.int64)
    b = np.array([0, 0, 0], dtype=np.int64)
    assert hamming64(a, b).tolist() == [0, 64, 3]


def test_phash_bands_pigeonhole():
    """Hamming <= n_bands-1 guarantees a shared band."""
    rng = np.random.default_rng(3)
    base = np.int64(rng.integers(-(2**62), 2**62))
    flipped = base
    for bit in rng.choice(64, size=7, replace=False):
        flipped = np.int64(flipped ^ np.int64(1 << int(bit)))
    pb = phash_bands(np.array([base, flipped]), 8)
    assert (pb[0] == pb[1]).any()


def test_shingles_set_semantics():
    h = char_shingle_hashes("abcabcabc", 3)
    assert h.size == 3  # {abc, bca, cab}
    assert char_shingle_hashes("ab", 3).size == 0
    assert char_shingle_hashes("", 3).size == 0


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(7)
    mh = MinHasher(256, 42)
    a = rng.integers(0, 2**63, 400, dtype=np.uint64)
    b = np.concatenate([a[:200], rng.integers(0, 2**63, 200, dtype=np.uint64)])
    true_j = len(set(a.tolist()) & set(b.tolist())) / len(set(a.tolist()) | set(b.tolist()))
    est = MinHasher.est_jaccard(mh.signature(a), mh.signature(b))
    assert abs(est - true_j) < 0.12


def test_minhash_empty_sentinel():
    mh = MinHasher(64, 42)
    empty = mh.signature(np.empty(0, dtype=np.uint64))
    nonempty = mh.signature(np.array([1, 2, 3], dtype=np.uint64))
    assert MinHasher.est_jaccard(empty, nonempty) == 0.0
    assert MinHasher.est_jaccard(empty, empty) == 1.0  # excluded upstream via has_sig


def test_band_keys_shape_and_match():
    mh = MinHasher(64, 42)
    s1 = mh.signature(char_shingle_hashes("the quick brown fox jumps over the dog", 5))
    s2 = mh.signature(char_shingle_hashes("the quick brown fox jumps over the cat", 5))
    bk = band_keys(np.stack([s1, s2]), 32, 2)
    assert bk.shape == (2, 32)
    assert (bk[0] == bk[1]).any()  # similar strings share a band


def test_winnow_guarantee():
    """Shared substring of length >= L + w - 1 -> shared fingerprint."""
    L, w = 30, 8
    shared = "x" * 0 + "the shared fragment persists across documents!"  # 46 chars
    assert len(shared) >= L + w - 1
    a = "AAAA completely different prefix " + shared + " tail one"
    b = shared + " and some other totally unrelated continuation here"
    fa = set(winnow_fingerprints(a, L, w).tolist())
    fb = set(winnow_fingerprints(b, L, w).tolist())
    assert fa & fb


def test_winnow_short_text():
    assert winnow_fingerprints("short", 30, 8).size == 0


def test_simhash_locality():
    a = simhash64(token_hashes("the quick brown fox jumps over the lazy dog"))
    b = simhash64(token_hashes("the quick brown fox jumps over the lazy cat"))
    c = simhash64(token_hashes("completely unrelated words appear here instead"))
    d_ab = hamming64(np.array([a]), np.array([b]))[0]
    d_ac = hamming64(np.array([a]), np.array([c]))[0]
    assert d_ab < d_ac
    assert simhash64(token_hashes("")) == 0


def test_token_fnv_matches_duckdb_on_unicode():
    """The SQL oracles hash per-character CODEPOINTS (ord(substr(t,i,1)));
    the Python kernels must produce the same values for non-ASCII text,
    not just ASCII (round-2 review finding)."""
    import duckdb

    fnv = (
        "list_reduce(list_prepend(CAST(14695981039346656037 AS UBIGINT), "
        "list_transform(range(1, length(t)+1), i -> CAST(ord(substr(t,i,1)) AS UBIGINT))), "
        "(a,b) -> CAST((CAST(xor(a,b) AS HUGEINT) * 1099511628211) % "
        f"{1 << 64} AS UBIGINT))"
    )
    for tok in ["hello", "café", "naïve", "日本語", "🦆duck"]:
        got = duckdb.sql(
            f"SELECT {fnv} AS h FROM (SELECT ? AS t)", params=[tok]
        ).fetchone()[0]
        want = int(token_hashes(tok)[0])
        assert got == want, tok


def test_char_shingles_codepoint_positions():
    """k counts CHARACTERS (codepoints): a 4-char non-ASCII string has
    exactly one 4-shingle even though it is >4 UTF-8 bytes."""
    assert char_shingle_hashes("café", 4).size == 1
    assert char_shingle_hashes("caf", 4).size == 0
