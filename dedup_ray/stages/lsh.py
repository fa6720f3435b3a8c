"""Stage D — LSH bucketing: explode to bucket keys, shuffle, emit candidates.

~ the reference's cheap-key grouping stage (group_by_partial_hash,
/root/reference/src/hasher.rs:77-79) generalized to three approximate
candidate generators over the collapsed rep table:

    minhash bands   (band_id = 0..b-1,      key = band hash of sig rows)
    phash bands     (band_id = 1000+0..7,   key = 8-bit slice of the phash)
                    — "SimHash over phash bitplanes": pigeonhole-complete for
                    Hamming <= phash_bands-1
    winnow anchors  (band_id = 2000,        key = winnowed L-gram fingerprint)

All three funnel into ONE `(band_id, band_key)` groupby — a single shuffle
for all tiers, shuffling only (int32, int64, image_id) rows.

Skew: bucket sizes are bounded because identical (pixels, caption) rows were
collapsed upstream; any surviving bucket larger than ``bucket_pair_cap``
degrades to star+chain edges (O(n) instead of O(n^2)) and is counted in the
metrics — connectivity is preserved, only which concrete pairs get verified
changes (documented recall trade: the exact tier already removed the known
hot cases, so oversized buckets are adversarial, not organic).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from dedup_ray.config import DedupConfig
from dedup_ray.functions.hashing import band_keys, phash_bands, winnow_fingerprints
from dedup_ray.stages.signatures import sigs_from_arrow
from dedup_ray.state.metrics import inc_counter

PAIR_SCHEMA = pa.schema([("src_id", pa.string()), ("dst_id", pa.string())])


def explode_buckets(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    """signatures rows -> (band_id:int32, band_key:int64, image_id) rows."""
    ids = batch["image_id"].to_pylist()
    n = len(ids)
    out_band: list[np.ndarray] = []
    out_key: list[np.ndarray] = []
    out_idx: list[np.ndarray] = []

    # --- minhash bands (skip sentinel/no-shingle rows: empty-caption hot key)
    has = batch["has_sig"].to_numpy(zero_copy_only=False)
    if has.any():
        sigs = sigs_from_arrow(batch["minhash_sig"])[has]
        bk = band_keys(sigs, cfg.bands, cfg.rows_per_band)  # (m, bands)
        m = bk.shape[0]
        idx = np.flatnonzero(has)
        out_band.append(np.repeat(np.arange(cfg.bands, dtype=np.int32)[None, :], m, 0).ravel())
        out_key.append(bk.astype(np.int64, copy=False).view(np.int64).ravel())
        out_idx.append(np.repeat(idx, cfg.bands))

    # --- phash bitplane bands
    ph = batch["phash"].to_numpy(zero_copy_only=False)
    pb = phash_bands(ph, cfg.phash_bands)  # (n, pb)
    out_band.append(
        (1000 + np.repeat(np.arange(cfg.phash_bands, dtype=np.int32)[None, :], n, 0)).ravel()
    )
    # include the band value AND the band index in the key via the band_id col
    out_key.append(pb.view(np.int64).ravel())
    out_idx.append(np.repeat(np.arange(n), cfg.phash_bands))

    # --- winnowed substring anchors (long captions only)
    caps = batch["caption"].to_pylist()
    for i, cap in enumerate(caps):
        if cap and len(cap) >= cfg.substring_caption_min:
            fp = winnow_fingerprints(cap, cfg.substring_min_len, cfg.winnow_window)
            if fp.size:
                out_band.append(np.full(fp.size, 2000, dtype=np.int32))
                out_key.append(fp.view(np.int64))
                out_idx.append(np.full(fp.size, i, dtype=np.int64))

    band = np.concatenate(out_band)
    key = np.concatenate(out_key)
    idx = np.concatenate(out_idx)
    id_arr = pa.array(ids, type=pa.string()).take(pa.array(idx))
    return pa.table(
        {
            "band_id": pa.array(band, type=pa.int32()),
            "band_key": pa.array(key, type=pa.int64()),
            "image_id": id_arr,
        }
    )


def bucket_pairs(group: pa.Table, cap: int) -> pa.Table:
    """One LSH bucket -> candidate pairs (src < dst), capped for skew."""
    n = group.num_rows
    if n < 2:
        return PAIR_SCHEMA.empty_table()
    ids = sorted(group["image_id"].to_pylist())
    if n <= cap:
        src, dst = [], []
        for i in range(n - 1):
            for j in range(i + 1, n):
                src.append(ids[i])
                dst.append(ids[j])
    else:
        # star from min member + chain: connectivity-preserving O(n) fallback
        inc_counter("lsh_buckets_capped", 1)
        inc_counter("lsh_capped_rows", n)
        src = [ids[0]] * (n - 1) + ids[1:-1]
        dst = ids[1:] + ids[2:]
    return pa.table(
        {
            "src_id": pa.array(src, type=pa.string()),
            "dst_id": pa.array(dst, type=pa.string()),
        }
    )


def lsh_candidates(signatures: rd.Dataset, cfg: DedupConfig) -> rd.Dataset:
    """signatures -> deduplicated candidate pairs (one shuffle + one dedup)."""
    buckets = signatures.map_batches(
        lambda b: explode_buckets(b, cfg), batch_format="pyarrow"
    )
    pairs = buckets.groupby(["band_id", "band_key"]).map_groups(
        lambda g: bucket_pairs(g, cfg.bucket_pair_cap), batch_format="pyarrow"
    )
    # a pair can surface from many buckets -> dedup before the expensive verify
    return pairs.groupby(["src_id", "dst_id"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )
