"""Phash saturation cascade (round-5): over-cap COARSE phash buckets must
re-band under the finer cascade keys and recover the UNCAPPED exact
Hamming pair set — strictly better than the star/chain degradation the
cascade replaces, with the hot rows never riding the level-1 pair shuffle.

Corpus shape: every row shares coarse bands 0-1 (the (0,1) combo bucket
saturates at cap 20), true near-pairs are (i, i+N/2) — deliberately NOT
adjacent in id order, so the star/chain fallback cannot find them by
accident — and everything else is random in the low 48 bits (Hamming >> 6
w.h.p., so the in-generation screen drops it)."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from dedup_ray.config import DedupConfig
from dedup_ray.functions.hashing import hamming64
from dedup_ray.stages.lsh import lsh_candidates
from dedup_ray.state.metrics import reset_counters, snapshot_counters

N = 60  # one saturated coarse bucket of 60 rows, cap 20


def _phashes() -> np.ndarray:
    rng = np.random.default_rng(11)
    ph = rng.integers(0, 2**63, N, dtype=np.int64).view(np.uint64)
    ph = (ph & np.uint64(0x0000FFFFFFFFFFFF)) | np.uint64(
        0xABCD_0000_0000_0000
    )  # bands 0-1 (top 16 bits) equal everywhere -> combo (0,1) saturates
    half = N // 2
    for i in range(half):
        # true pair (i, i+half): partner = i with EXACTLY one bit flipped in
        # each of coarse bands 2..7 (Hamming 6 == the verify threshold), so
        # the ONLY coarse combo the pair shares is the saturated (0,1) — the
        # star/chain fallback cannot find it through a side bucket
        mask = np.uint64(0)
        for band in range(6):  # bit groups [0-7], [8-15], ..., [40-47]
            mask |= np.uint64(1) << np.uint64(8 * band + int(rng.integers(8)))
        ph[i + half] = ph[i] ^ mask
    return ph.view(np.int64)


def _signatures(num_perm: int, ph: np.ndarray) -> rd.Dataset:
    ids = [f"img_{i:04d}" for i in range(N)]
    sig_col = pa.FixedSizeListArray.from_arrays(
        pa.array(np.zeros(N * num_perm, dtype=np.int64)), num_perm
    )
    t = pa.table(
        {
            "image_id": pa.array(ids, type=pa.string()),
            "minhash_sig": sig_col,
            "has_sig": pa.array([False] * N),  # phash tier only
            "phash": pa.array(ph, type=pa.int64()),
            "caption": pa.array([""] * N, type=pa.string()),
            "winnow_fp": pa.LargeListArray.from_arrays(
                pa.array(np.zeros(N + 1, dtype=np.int64)),
                pa.array([], type=pa.int64()),
            ),
        }
    )
    return rd.from_arrow(t).repartition(4)


def _pairs(cfg: DedupConfig, ph: np.ndarray) -> set:
    cand = lsh_candidates(_signatures(cfg.num_perm, ph), cfg)
    out = set()
    for tbl in ray.get(cand.to_arrow_refs()):
        if tbl.num_rows and "src_id" in tbl.column_names:
            out.update(zip(tbl["src_id"].to_pylist(), tbl["dst_id"].to_pylist()))
    return out


def _brute_hamming_pairs(ph: np.ndarray, hmax: int) -> set:
    ids = [f"img_{i:04d}" for i in range(N)]
    out = set()
    for i in range(N):
        d = hamming64(np.repeat(ph[i], N - i - 1), ph[i + 1 :])
        for j in np.flatnonzero(d <= hmax):
            out.add((ids[i], ids[i + 1 + int(j)]))
    return out


def test_cascade_recovers_exact_hamming_pair_set():
    ph = _phashes()
    cfg = DedupConfig(bucket_pair_cap=20)  # cascade is the default
    brute = _brute_hamming_pairs(ph, cfg.phash_hamming_max)
    assert len(brute) >= N // 2  # the planted pairs are in there

    reset_counters()
    cascade = _pairs(cfg, ph)
    counters = snapshot_counters()
    assert counters.get("lsh_cascade_buckets", 0) >= 1
    assert counters.get("lsh_cascade_rows", 0) > cfg.bucket_pair_cap
    assert counters.get("lsh_cascade_ids", 0) == N
    assert cascade == brute

    # sanity: the uncapped exact path agrees
    uncapped = _pairs(
        DedupConfig(bucket_pair_cap=10**9, phash_cascade=False), ph
    )
    assert uncapped == brute

    # and the star/chain degradation the cascade replaces genuinely loses
    # pairs on this corpus (partners are not id-adjacent)
    capped = _pairs(DedupConfig(bucket_pair_cap=20, phash_cascade=False), ph)
    assert capped < brute


def test_cascade_broadcast_and_explode_paths_agree():
    """The two fine-level physical plans (broadcast per-combo kernel vs
    explode + bitmap + shuffle) must produce the SAME pair set — and both
    must equal the brute-force Hamming set on the planted saturated
    corpus (round-5: the broadcast kernel is the default below
    phash_cascade_broadcast_max)."""
    ph = _phashes()
    brute = _brute_hamming_pairs(ph, DedupConfig().phash_hamming_max)
    reset_counters()
    broadcast = _pairs(DedupConfig(bucket_pair_cap=20), ph)
    assert snapshot_counters().get("lsh_cascade_broadcast", 0) == 1
    reset_counters()
    explode = _pairs(
        DedupConfig(bucket_pair_cap=20, phash_cascade_broadcast_max=0), ph
    )
    assert snapshot_counters().get("lsh_cascade_broadcast", 0) == 0
    assert broadcast == explode == brute


def test_cascade_broadcast_exactly_once_with_capped_fine_bucket():
    """A mega-group of IDENTICAL phashes saturates even the fine keys (the
    over-cap fine bucket case): both physical plans must still produce the
    same pair set, and the broadcast plan's exactly-once triu filter must
    not suppress the star/chain fallback pairs of the capped bucket."""
    rng = np.random.default_rng(23)
    ph = _phashes().view(np.uint64).copy()
    ph[:30] = np.uint64(0xABCD_7777_1234_5678)  # 30 identical -> fine-capped
    ph = ph.view(np.int64)
    cfg_b = DedupConfig(bucket_pair_cap=20)
    cfg_e = DedupConfig(bucket_pair_cap=20, phash_cascade_broadcast_max=0)
    reset_counters()
    broadcast = _pairs(cfg_b, ph)
    c = snapshot_counters()
    assert c.get("lsh_cascade_broadcast", 0) == 1
    assert c.get("lsh_cascade_fine_capped", 0) >= 1
    explode = _pairs(cfg_e, ph)
    assert broadcast == explode
    # the mega-group's star/chain connectivity survives: every one of the
    # 30 identical-phash rows appears in at least one pair
    mega = {f"img_{i:04d}" for i in range(30)}
    touched = {a for a, _ in broadcast} | {b for _, b in broadcast}
    assert mega <= touched


def test_cascade_allfine_mode_exact_pair_set():
    """The saturation endgame: when hot rows dominate the coarse phash
    tier, the coarse banding is skipped entirely and EVERY rep routes
    through the fine broadcast kernel — the pair set must still be the
    exact Hamming set (round-5 all_fine mode; forced here with a tiny
    allfine fraction + explicit n_reps so the gates open on 60 rows)."""
    from dedup_ray.stages.lsh import lsh_candidates as _lc

    ph = _phashes()
    cfg = DedupConfig(bucket_pair_cap=20, phash_cascade_allfine_frac=0.01)
    reset_counters()
    cand = _lc(_signatures(cfg.num_perm, ph), cfg, n_reps=1_000_000)
    out = set()
    for tbl in ray.get(cand.to_arrow_refs()):
        if tbl.num_rows and "src_id" in tbl.column_names:
            out.update(zip(tbl["src_id"].to_pylist(), tbl["dst_id"].to_pylist()))
    c = snapshot_counters()
    assert c.get("lsh_cascade_allfine", 0) == 1
    assert c.get("lsh_cascade_broadcast", 0) == 1
    assert c.get("lsh_cascade_ids", 0) == N  # every rep routed fine
    assert out == _brute_hamming_pairs(ph, cfg.phash_hamming_max)


def test_cascade_noop_below_cap():
    ph = _phashes()
    reset_counters()
    pairs = _pairs(DedupConfig(bucket_pair_cap=10**9), ph)  # nothing hot
    assert snapshot_counters().get("lsh_cascade_buckets", 0) == 0
    assert pairs == _brute_hamming_pairs(ph, DedupConfig().phash_hamming_max)


def test_cascade_config_validation():
    with pytest.raises(ValueError, match="pigeonhole"):
        DedupConfig(phash_cascade_bands=8, phash_cascade_combo=4)  # 8-4 < 6
    with pytest.raises(ValueError, match="phash_cascade_combo"):
        DedupConfig(phash_cascade_bands=10, phash_cascade_combo=0)
    with pytest.raises(ValueError, match="auto cascade ladder"):
        DedupConfig(phash_hamming_max=7, phash_bands=9)  # auto rungs cap at 6
    # auto mode (both 0) is the default and legal
    DedupConfig()
    # salting takes precedence over the cascade (exact mode) — both set is
    # legal, the salt path simply wins (exercised in test_salting)
    DedupConfig(salt_hot_buckets=True, phash_cascade=True)


def test_cascade_int_coded_ids():
    """The flagship runs the wide stages over int64 id codes — the cascade
    split/membership kernels must behave identically on that path."""
    ph = _phashes()
    cfg = DedupConfig(bucket_pair_cap=20)
    sigs = _signatures(cfg.num_perm, ph)

    def encode(b: pa.Table) -> pa.Table:
        # img_0000 -> 0, ... (already sorted ids, so codes preserve order)
        codes = np.array(
            [int(s[4:]) for s in b["image_id"].to_pylist()], dtype=np.int64
        )
        return b.set_column(
            b.schema.get_field_index("image_id"), "image_id", pa.array(codes)
        )

    cand = lsh_candidates(
        sigs.map_batches(encode, batch_format="pyarrow"), cfg
    )
    out = set()
    for tbl in ray.get(cand.to_arrow_refs()):
        if tbl.num_rows and "src_id" in tbl.column_names:
            out.update(
                (f"img_{a:04d}", f"img_{b:04d}")
                for a, b in zip(
                    tbl["src_id"].to_pylist(), tbl["dst_id"].to_pylist()
                )
            )
    assert out == _brute_hamming_pairs(ph, cfg.phash_hamming_max)


def test_bitmap_sizing_and_ladder():
    from dedup_ray.stages.lsh import _bitmap_log2_for, _pick_cascade_keys

    assert _bitmap_log2_for(None) == 26
    assert _bitmap_log2_for(1000) == 26
    assert _bitmap_log2_for(118_000_000) == 28  # the 2M-rep explode volume
    assert _bitmap_log2_for(10**12) == 28  # capped: partial size is bounded
    cfg = DedupConfig()
    assert _pick_cascade_keys(cfg, 1_640_000) == (9, 3)
    assert _pick_cascade_keys(cfg, 10_000_000) == (10, 4)
    assert _pick_cascade_keys(cfg, 10**9) == (12, 6)
    explicit = DedupConfig(phash_cascade_bands=10, phash_cascade_combo=4)
    assert _pick_cascade_keys(explicit, 10) == (10, 4)
