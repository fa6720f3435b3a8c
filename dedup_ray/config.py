"""Pipeline configuration.

The config hash participates in checkpoint manifests (a changed config
invalidates prior stage outputs — generalizing the reference's crash-safe
apply step, /root/reference/src/actions.rs:118-136, one level up).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class DedupConfig:
    """All knobs of the three-stage detector + clustering.

    Defaults are the "matched config" used by both the Ray pipeline and the
    single-process oracle (recall >= 0.99 is measured at identical settings,
    mirroring how the reference's benchmark harness compares tools on one
    generated corpus — /root/reference/benchmark/runner.py:181-210).
    """

    seed: int = 42

    # --- caption shingling / MinHash (stage 2a) ---
    shingle_k: int = 5            # character shingle width
    num_perm: int = 128           # MinHash permutations K
    bands: int = 32               # LSH bands b (num_perm must equal bands*rows)
    rows_per_band: int = 4        # LSH rows per band r
    # b=32,r=4: P(candidate | J) = 1-(1-J^4)^32 = 0.99 at J=0.60, ~1.0 above
    # 0.65, while junk at J=0.3 collides only 23% of the time (r=2 was 95% —
    # candidate explosion on moderately-similar corpora). Threshold sits at
    # the knee; the >=0.99 pair-recall bar is measured vs the oracle at this
    # same (K, b, r, t), so band geometry is the only recall lever.
    jaccard_threshold: float = 0.60   # verify: estimated Jaccard >= t -> edge

    # --- phash / SimHash banding (stage 2b) ---
    phash_bands: int = 8          # split the 64-bit phash into 8 x 8-bit bands
    phash_hamming_max: int = 6    # verify: Hamming(phash) <= t -> edge

    # --- suffix/substring tier (stage 3) ---
    substring_min_len: int = 30   # shared substring >= L chars -> edge
    substring_caption_min: int = 60  # only captions this long enter stage 3
    winnow_window: int = 8        # winnowing window w over L-gram hashes; the
    # candidate generator (shared winnowed fingerprint) is part of the tier-3
    # relation DEFINITION, shared verbatim with the oracle -> tier-3 recall is
    # exact by construction; detection guaranteed for shares >= L+w-1 chars

    # --- skew handling ---
    bucket_pair_cap: int = 64     # LSH bucket size above which pair emission
                                  # degrades to star+chain edges (logged)
    salt_hot_buckets: bool = False  # EXACT alternative to capping: split
    # over-cap buckets into salted sub-buckets + cross-salt rendezvous groups
    # (north-rule salting). Preserves the full pair set at the cost of a
    # bucket-count pre-pass and ~4x pair duplication inside hot buckets;
    # capping remains the fallback if a salted sub-group still exceeds cap.
    salt_slack: int = 4           # salt factor k = ceil(slack * n / cap):
                                  # keeps rendezvous groups ~cap/2 w.h.p.

    # --- physical execution ---
    distributed_prepass: bool = False  # LSH pre-pass physical plan: False =
    # driver-merged per-block partials (bitmap OR-fold + distinct-key count
    # merge — fastest on one node); True = the at-scale shape: log-depth
    # tree-reduce of the pairable bitmaps + groupby-sum count exchange (the
    # driver receives one 8 MiB bitmap + the aggregated key table). Output
    # is bit-identical either way (merge is associative; pytest-checked).
    batch_size: int = 4096        # rows per map_batches batch for sig stages
    driver_unionfind_max_edges: int = 2_000_000  # below -> driver union-find
    ckpt_chunk_files: int = 8     # per-partition lineage: input part files
    # per independently-committed decode-stage chunk (north-rule "resumable
    # from checkpoint with per-partition lineage"). Bounds lost work on a
    # crash to one chunk of the expensive decode stage instead of the whole
    # stage; each chunk commit is atomic (tmp+rename + manifest entry).

    # --- cascade decode (the reference's load-bearing property: work scales
    # with the dup ratio, not the corpus — src/hasher.rs cascade) ---
    cascade_decode: bool = True   # decode pixels ONLY for rows whose phash
    # occurs >=2 times. Lossless: pixel-equal rows always share a phash, so
    # phash-unique rows cannot be pixel-duplicates of anything; their
    # pixel_hash is replaced by a row-unique sentinel.

    min_size: int = 0             # byte-length row filter (reference --min-size)
    max_size: int = 2**63 - 1     # (reference --max-size)
    include: tuple = ()           # fnmatch globs on image_id (reference include
    exclude: tuple = ()           # /exclude globs, src/scanner.rs:13-41)

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.num_perm:
            raise ValueError("num_perm must equal bands * rows_per_band")
        if 64 % self.phash_bands != 0:
            raise ValueError("phash_bands must divide 64")

    def config_hash(self) -> str:
        """Deterministic 16-hex-char digest of every knob (plus the stage
        SCHEMA version, so checkpoints written by an older code version with
        different stage columns invalidate like a config change would)."""
        blob = json.dumps(
            {**asdict(self), "__schema__": _STAGE_SCHEMA_VERSION}, sort_keys=True
        ).encode()
        return hashlib.blake2b(blob, digest_size=8).hexdigest()


# bump when a checkpointed stage's output schema changes (v2: signatures
# carry the winnowed fingerprints as a list column instead of just n_fp)
_STAGE_SCHEMA_VERSION = 2
