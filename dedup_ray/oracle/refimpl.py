"""Single-process reference implementation — the recall oracle.

Plays the role the cross-tool harness plays for the reference
(/root/reference/benchmark/runner.py:181-210: every tool checked against the
planted ground truth AND against independent tools): a brute-force,
LSH-free implementation of the SAME duplicate relation at the SAME config.

Relation (pair i,j is a duplicate) — identical kernels to the pipeline's
verify stage, but candidates are ALL pairs, so the only possible pipeline
deficit is candidate-generation recall (the quantity under test):

    pixel_hash equal                              (tier 1)
    Hamming(phash) <= cfg.phash_hamming_max       (tier 2b)
    est-Jaccard(minhash) >= cfg.jaccard_threshold (tier 2a, both non-empty)
    shared winnow fingerprint AND LCS >= L        (tier 3, long captions)

Clusters = union-find over those pairs; cluster_id = min member.
O(n^2) vectorized numpy — fine up to ~10^4 rows (the oracle scale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dedup_ray.config import DedupConfig
from dedup_ray.functions.hashing import (
    MinHasher,
    char_shingle_hashes,
    winnow_fingerprints,
)
from dedup_ray.functions.suffix import lcs_len
from dedup_ray.functions.unionfind import UnionFind
from dedup_ray.stages.keys import compute_exact_keys


def oracle_clusters(images: pa.Table, cfg: DedupConfig | None = None) -> dict[str, str]:
    """image_id -> cluster_id (min member) for every row in a dup cluster."""
    cfg = cfg or DedupConfig()
    keys = compute_exact_keys(images)
    ids = keys["image_id"].to_pylist()
    n = len(ids)
    uf = UnionFind()

    # tier 1: pixel-exact
    by_pixel: dict[str, str] = {}
    for i, ph in enumerate(keys["pixel_hash"].to_pylist()):
        if ph in by_pixel:
            uf.union(by_pixel[ph], ids[i])
        else:
            by_pixel[ph] = ids[i]

    # signatures
    mh = MinHasher(cfg.num_perm, cfg.seed)
    captions = keys["caption"].to_pylist()
    sigs = np.empty((n, cfg.num_perm), dtype=np.uint64)
    has = np.zeros(n, dtype=bool)
    for i, cap in enumerate(captions):
        sh = char_shingle_hashes(cap or "", cfg.shingle_k)
        sigs[i] = mh.signature(sh)
        has[i] = sh.size > 0

    phash = keys["phash"].to_numpy(zero_copy_only=False).astype(np.int64)
    u = phash.view(np.uint64)
    lut = np.array([bin(x).count("1") for x in range(256)], dtype=np.uint8)

    # tier 2: all-pairs hamming + est-jaccard, row-chunked
    chunk = max(1, 2_000_000 // max(n, 1))
    for a0 in range(0, n, chunk):
        a1 = min(a0 + chunk, n)
        x = u[a0:a1, None] ^ u[None, :]
        ham = lut[x.view(np.uint8).reshape(a1 - a0, n, 8)].sum(axis=2)
        eq = (sigs[a0:a1, None, :] == sigs[None, :, :]).mean(axis=2)
        both = has[a0:a1, None] & has[None, :]
        hit = (ham <= cfg.phash_hamming_max) | (both & (eq >= cfg.jaccard_threshold))
        ai, bi = np.nonzero(hit)
        for r, c in zip(ai, bi):
            gi = a0 + int(r)
            if gi < c:  # upper triangle only
                uf.union(ids[gi], ids[int(c)])

    # tier 3: winnow inverted index -> LCS verify
    index: dict[int, list[int]] = {}
    for i, cap in enumerate(captions):
        if cap and len(cap) >= cfg.substring_caption_min:
            for fp in winnow_fingerprints(cap, cfg.substring_min_len, cfg.winnow_window):
                index.setdefault(int(fp), []).append(i)
    cand: set[tuple[int, int]] = set()
    for members in index.values():
        if len(members) > 1:
            for ii in range(len(members) - 1):
                for jj in range(ii + 1, len(members)):
                    cand.add((members[ii], members[jj]))
    for i, j in cand:
        if uf.find(ids[i]) == uf.find(ids[j]):
            continue
        if lcs_len(captions[i], captions[j]) >= cfg.substring_min_len:
            uf.union(ids[i], ids[j])

    return uf.components()
