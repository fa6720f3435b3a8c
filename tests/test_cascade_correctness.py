"""Cascade-correctness pair tests — the analog of the reference's
same-prefix/different-tail tests (src/hasher.rs:138-160: partial hash may
match while full hash splits; the cascade must pass the candidate and the
verify stage must split it)."""

import numpy as np
import pyarrow as pa

from dedup_ray.config import DedupConfig
from dedup_ray.functions.hashing import (
    MinHasher,
    band_keys,
    char_shingle_hashes,
    hamming64,
    phash_band_pair_keys,
)
from dedup_ray.stages.verify import PairVerifier

CFG = DedupConfig()


def _sig(text: str) -> np.ndarray:
    mh = MinHasher(CFG.num_perm, CFG.seed)
    return mh.signature(char_shingle_hashes(text, CFG.shingle_k))


def _fp_col(caption: str) -> pa.Array:
    """One-row winnow_fp list column, gated exactly like the signatures
    stage (empty below the tier-3 caption-length threshold)."""
    from dedup_ray.functions.hashing import winnow_fingerprints

    fp = (
        winnow_fingerprints(caption, CFG.substring_min_len, CFG.winnow_window)
        if caption and len(caption) >= CFG.substring_caption_min
        else np.empty(0, dtype=np.uint64)
    )
    return pa.LargeListArray.from_arrays(
        pa.array([0, fp.size], type=pa.int64()),
        pa.array(fp.view(np.int64), type=pa.int64()),
    )


def _find_band_collision_below_threshold():
    """Deterministically scan seeded caption pairs for one that shares a
    MinHash band (candidate!) but has est-Jaccard < threshold (must be
    rejected by verify) — the 'partial matches, full splits' shape."""
    rng = np.random.default_rng(7)
    words = ["alpha", "bravo", "china", "delta", "echo", "fox", "golf", "hotel",
             "india", "jazz", "kilo", "lima", "mike", "nov", "oscar", "papa"]
    for _ in range(4000):
        base = [words[i] for i in rng.integers(0, len(words), 12)]
        other = list(base)
        for j in rng.integers(0, 12, 7):
            other[j] = words[rng.integers(0, len(words))]
        a, b = " ".join(base), " ".join(other)
        sa, sb = _sig(a), _sig(b)
        est = float(MinHasher.est_jaccard(sa, sb))
        bands = band_keys(np.stack([sa, sb]), CFG.bands, CFG.rows_per_band)
        if est < CFG.jaccard_threshold - 0.05 and (bands[0] == bands[1]).any():
            return a, b, est
    raise AssertionError("no collision pair found in deterministic scan")


def test_band_candidate_rejected_by_verify():
    a, b, est = _find_band_collision_below_threshold()
    sig_a, sig_b = _sig(a), _sig(b)
    k = CFG.num_perm
    batch = pa.table(
        {
            "src_id": pa.array(["x"]),
            "dst_id": pa.array(["y"]),
            "src_phash": pa.array([0], type=pa.int64()),
            "dst_phash": pa.array([-1], type=pa.int64()),  # hamming 64
            "src_minhash_sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sig_a.view(np.int64), type=pa.int64()), k
            ),
            "dst_minhash_sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sig_b.view(np.int64), type=pa.int64()), k
            ),
            "src_has_sig": pa.array([True]),
            "dst_has_sig": pa.array([True]),
            "src_caption": pa.array([a]),
            "dst_caption": pa.array([b]),
            "src_winnow_fp": _fp_col(a),
            "dst_winnow_fp": _fp_col(b),
        }
    )
    out = PairVerifier(CFG)(batch)
    assert out.num_rows == 0  # candidate surfaced, verify splits — D1 holds


def test_phash_pair_bands_split_on_far_hashes():
    """Two phashes with large Hamming distance share no band-pair key (so the
    exact tier's candidate key discriminates), while near hashes do."""
    rng = np.random.default_rng(3)
    base = np.int64(rng.integers(-(2**62), 2**62))
    far = np.int64(~np.uint64(base.view(np.uint64)).astype(np.int64))
    near = base ^ np.int64(1 << 5)
    kb = phash_band_pair_keys(np.array([base, far, near]), CFG.phash_bands)
    assert not (kb[0] == kb[1]).any()
    assert (kb[0] == kb[2]).any()
    assert hamming64(np.array([base]), np.array([near]))[0] == 1


def test_corrupt_header_dropped_in_both_cascade_modes():
    """Validity-filter alignment (round-2 fix): a row whose container header
    is corrupt (or contradicts declared dims) must be dropped and counted
    whether or not cascade decode skips its pixel decode."""
    from dedup_ray.functions import codecs
    from dedup_ray.stages.keys import compute_exact_keys

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    good = codecs.encode(px, "raw")
    corrupt = b"\x00\x01" + good[2:]  # header now declares absurd dims

    def batch(n_rows_bytes):
        ids, bs = zip(*n_rows_bytes)
        return pa.table(
            {
                "image_id": pa.array(list(ids)),
                "bytes": pa.array(list(bs), type=pa.binary()),
                "w": pa.array([16] * len(ids), type=pa.int32()),
                "h": pa.array([16] * len(ids), type=pa.int32()),
                "fmt": pa.array(["raw"] * len(ids)),
                "caption": pa.array(["c"] * len(ids)),
                "phash": pa.array(list(range(len(ids))), type=pa.int64()),
            }
        )

    b = batch([("ok", good), ("bad", corrupt)])
    # cascade OFF: full decode path
    full = compute_exact_keys(b, None)
    # cascade ON with no dup phashes: every row skips decode
    skipped = compute_exact_keys(b, np.empty(0, dtype=np.int64))
    assert full["image_id"].to_pylist() == ["ok"]
    assert skipped["image_id"].to_pylist() == ["ok"]
