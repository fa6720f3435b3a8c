"""Stage C — signature computation (the stateful actor-pool stage).

One callable class = one Ray actor pool (SURVEY.md §7.1 M3): the MinHash
permutation tables, shingle powers and winnowing config are built ONCE per
actor in ``__init__`` and reused for every batch — the Ray analog of the
reference's per-worker hasher state. Emits, per representative row:

    minhash_sig : fixed_size_list<uint64>[K]  (all-ones sentinel if no shingles)
    has_sig     : bool   (False for captions shorter than k — the degenerate
                  empty-caption hot key is EXCLUDED from MinHash LSH here,
                  generalizing the reference's empty-file skip,
                  /root/reference/src/scanner.rs:96-99)
    winnow_fp   : large_list<int64>  winnowed fingerprints (empty below the
                  tier-3 caption-length gate). Computed ONCE here and reused
                  by BOTH the LSH anchor explode and the tier-3 verify gate —
                  recomputing per batch in verify was the top CPU sink at
                  1M+ candidate pairs
    n_fp        : int32  count of winnowed fingerprints (tier-3 fan-out metric)

Band explosion happens in the LSH stage; this stage's output is the
checkpointable ``signatures`` table (FIXTURES.md §2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from dedup_ray.config import DedupConfig
from dedup_ray.functions.hashing import MinHasher, char_shingle_hashes, winnow_fingerprints


class SignerActor:
    """map_batches callable: captions -> MinHash signatures + winnow counts."""

    def __init__(self, cfg: DedupConfig) -> None:
        self.cfg = cfg
        self.minhasher = MinHasher(cfg.num_perm, cfg.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        captions = batch["caption"].to_pylist()
        n = len(captions)
        sigs = np.empty((n, cfg.num_perm), dtype=np.uint64)
        has = np.zeros(n, dtype=bool)
        nfp = np.zeros(n, dtype=np.int32)
        fp_parts: list[np.ndarray] = []
        fp_offsets = np.zeros(n + 1, dtype=np.int64)
        for i, cap in enumerate(captions):
            sh = char_shingle_hashes(cap or "", cfg.shingle_k)
            sigs[i] = self.minhasher.signature(sh)
            has[i] = sh.size > 0
            if cap and len(cap) >= cfg.substring_caption_min:
                fp = winnow_fingerprints(
                    cap, cfg.substring_min_len, cfg.winnow_window
                )
                nfp[i] = fp.size
                fp_parts.append(fp.view(np.int64))
            fp_offsets[i + 1] = fp_offsets[i] + nfp[i]
        flat_fp = (
            np.concatenate(fp_parts) if fp_parts else np.empty(0, dtype=np.int64)
        )
        fp_col = pa.LargeListArray.from_arrays(
            pa.array(fp_offsets, type=pa.int64()),
            pa.array(flat_fp, type=pa.int64()),
        )
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1).view(np.int64), type=pa.int64()), cfg.num_perm
        )
        return pa.table(
            {
                "image_id": batch["image_id"],
                "phash": batch["phash"],
                "caption": batch["caption"],
                "minhash_sig": sig_col,
                "has_sig": pa.array(has),
                "winnow_fp": fp_col,
                "n_fp": pa.array(nfp, type=pa.int32()),
            }
        )


_SIGNER_CACHE: dict[str, SignerActor] = {}


def sign_batch(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    """Stateless-task form of SignerActor: the permutation state is cached
    once per WORKER PROCESS (module global) instead of once per actor.
    Elastic tasks beat an actor pool here — pool ramp-up latency dominated
    the stage at bench scale while the state is microseconds to build;
    reserve actor pools for stages with genuinely heavy state (models)."""
    signer = _SIGNER_CACHE.get(cfg.config_hash())
    if signer is None:
        signer = SignerActor(cfg)
        _SIGNER_CACHE[cfg.config_hash()] = signer
    return signer(batch)


def signatures_stage(
    reps: rd.Dataset, cfg: DedupConfig, concurrency: int | tuple[int, int] = 4
) -> rd.Dataset:
    # concurrency is accepted for API stability; stateless tasks are elastic
    # and scheduled by the streaming executor without a pool.
    return reps.map_batches(
        lambda b: sign_batch(b, cfg),
        batch_format="pyarrow",
        batch_size=1024,
    )


def sigs_from_arrow(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """fixed_size_list<int64>[K] column -> (N, K) uint64 matrix, zero-copy."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    k = col.type.list_size
    flat = col.flatten().to_numpy(zero_copy_only=False).view(np.uint64)
    return flat.reshape(-1, k)
