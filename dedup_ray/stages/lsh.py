"""Stage D — LSH bucketing: explode to bucket keys, shuffle, emit candidates.

~ the reference's cheap-key grouping stage (group_by_partial_hash,
/root/reference/src/hasher.rs:77-79) generalized to three approximate
candidate generators over the collapsed rep table:

    minhash bands   (band_id = 0..b-1,      key = band hash of sig rows)
    phash bands     (band_id = 1000+0..7,   key = 8-bit slice of the phash)
                    — "SimHash over phash bitplanes": pigeonhole-complete for
                    Hamming <= phash_bands-1
    winnow anchors  (band_id = 2000,        key = winnowed L-gram fingerprint)

All three funnel into ONE `(band_id, band_key)` key space. Physical plan
(every step vectorized — no per-group Python on the big tables):

    explode -> shuffle-free count pass (per-block partial counts, driver
    merge) -> [driver: keys with n>=2, hot keys above bucket_pair_cap] ->
    broadcast sorted-membership filter -> coarse-bucket shuffle + pair-gen
    over the SURVIVING rows only (n>=2 buckets are a tiny fraction) ->
    within-batch structural pair dedup.

At cluster scale the broadcast key filter becomes a semi-join of the bucket
table against the count table on (band_id, band_key) — same plan shape, one
more shuffle; the driver never materializes per-row data either way.

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
import pyarrow.compute as pc

import ray
import ray.data as rd

from dedup_ray.config import DedupConfig
from dedup_ray.functions.hashing import band_keys, phash_band_pair_keys
from dedup_ray.stages.signatures import sigs_from_arrow
from dedup_ray.state.metrics import inc_counter

PAIR_SCHEMA = pa.schema([("src_id", pa.string()), ("dst_id", pa.string())])


def explode_buckets(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    """signatures rows -> (band_id:int32, band_key:int64, image_id, gen:int8,
    phash:int64) rows. ``gen`` tags the generator (0 minhash / 1 phash /
    2 anchor); phash rides along so phash-bucket pairs can be Hamming-filtered
    INSIDE pair generation — a 16-bit band-pair key alone is not selective
    enough at 10^5+ reps (junk grew ~n^2/65536)."""
    ids = batch["image_id"].to_pylist()
    n = len(ids)
    out_band: list[np.ndarray] = []
    out_key: list[np.ndarray] = []
    out_idx: list[np.ndarray] = []
    out_gen: list[np.ndarray] = []

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
        out_gen.append(np.zeros(m * cfg.bands, dtype=np.int8))

    # --- phash bitplane band-pair keys (recall-complete for hamming <=
    #     phash_bands-2 = the verify threshold; see phash_band_pair_keys)
    ph = batch["phash"].to_numpy(zero_copy_only=False)
    pb = phash_band_pair_keys(ph, cfg.phash_bands)  # (n, C(pb,2))
    n_combo = pb.shape[1]
    out_band.append(
        (1000 + np.repeat(np.arange(n_combo, dtype=np.int32)[None, :], n, 0)).ravel()
    )
    out_key.append(pb.view(np.int64).ravel())
    out_idx.append(np.repeat(np.arange(n), n_combo))
    out_gen.append(np.ones(n * n_combo, dtype=np.int8))

    # --- winnowed substring anchors (long captions only): the fingerprints
    # were computed ONCE in the signatures stage; explode is a zero-Python
    # flatten of the list column (empty below the caption-length gate)
    fp_col = batch["winnow_fp"]
    if isinstance(fp_col, pa.ChunkedArray):
        fp_col = fp_col.combine_chunks()
    flat_fp = fp_col.flatten().to_numpy(zero_copy_only=False)
    if flat_fp.size:
        fp_lens = fp_col.value_lengths().to_numpy(zero_copy_only=False)
        out_band.append(np.full(flat_fp.size, 2000, dtype=np.int32))
        out_key.append(flat_fp)
        out_idx.append(np.repeat(np.arange(n), fp_lens))
        out_gen.append(np.full(flat_fp.size, 2, dtype=np.int8))

    band = np.concatenate(out_band)
    key = np.concatenate(out_key)
    idx = np.concatenate(out_idx)
    gen = np.concatenate(out_gen)
    id_arr = pa.array(ids, type=pa.string()).take(pa.array(idx))
    return pa.table(
        {
            "band_id": pa.array(band, type=pa.int32()),
            "band_key": pa.array(key, type=pa.int64()),
            "image_id": id_arr,
            "gen": pa.array(gen, type=pa.int8()),
            "phash": pa.array(ph[idx], type=pa.int64()),
        }
    )


def _combo(band_id: np.ndarray, band_key: np.ndarray) -> np.ndarray:
    """(band_id, band_key) -> single uint64 bucket key.

    (band_key << 12) ^ band_id: injective in band_id (< 4096) and the low 52
    bits of band_key; distinct buckets collide only when band_keys agree mod
    2^52 (p ~ 2^-52 per pair), and a collision merely MERGES buckets — extra
    candidates for the verifier, never a lost one."""
    return (
        np.ascontiguousarray(band_key.astype(np.int64)).view(np.uint64)
        << np.uint64(12)
    ) ^ band_id.astype(np.uint64)


def bucket_pairs(group: pa.Table, cap: int) -> pa.Table:
    """One LSH bucket -> candidate pairs (src < dst), capped for skew.
    Vectorized (numpy triu) — no per-pair Python."""
    n = group.num_rows
    if n < 2:
        return PAIR_SCHEMA.empty_table()
    ids = np.sort(np.asarray(group["image_id"].to_pylist(), dtype=object))
    if n <= cap:
        iu, ju = np.triu_indices(n, 1)
        src, dst = ids[iu], ids[ju]
    else:
        # star from min member + chain: connectivity-preserving O(n) fallback
        inc_counter("lsh_buckets_capped", 1)
        inc_counter("lsh_capped_rows", n)
        src = np.concatenate([np.repeat(ids[0], n - 1), ids[1:-1]])
        dst = np.concatenate([ids[1:], ids[2:]])
    return pa.table(
        {
            "src_id": pa.array(list(src), type=pa.string()),
            "dst_id": pa.array(list(dst), type=pa.string()),
        }
    )


def _pairs_from_runs(cap: int, phash_hamming_max: int):
    """Vectorized pair generation over all bucket-runs of a coarse group
    (stages/grouped.py): rows sorted by (combo key, image_id); per run of
    size n emit triu pairs (n<=cap) or star+chain (n>cap, counted).
    phash-generated runs (gen==1) are Hamming-filtered in place — the bucket
    co-membership only guarantees one matching band-pair, and re-checking the
    full 64-bit distance here costs one vectorized popcount instead of
    shipping ~n^2/65536 junk pairs into the attach+verify stages."""

    def fn(g: pa.Table) -> pa.Table:
        keys = g["combo"].to_numpy(zero_copy_only=False)
        ids = np.asarray(g["image_id"].to_pylist(), dtype=object)
        gens = g["gen"].to_numpy(zero_copy_only=False)
        phs = g["phash"].to_numpy(zero_copy_only=False)
        from dedup_ray.functions.hashing import hamming64
        from dedup_ray.stages.grouped import run_starts

        starts = run_starts(keys)
        bounds = np.append(starts, len(keys))
        sizes = np.diff(bounds)
        src_parts, dst_parts = [], []
        capped = 0
        capped_rows = 0
        # triu pairs for every in-cap run at once, batched BY RUN SIZE: one
        # triu_indices + one fancy-index per distinct size (<= cap distinct
        # values) instead of one Python iteration per run — the per-run loop
        # was ~70 CPU-s at 1.2M candidate pairs
        in_cap = (sizes >= 2) & (sizes <= cap)
        if in_cap.any():
            offs_all = bounds[:-1][in_cap]
            sz_all = sizes[in_cap]
            for s in np.unique(sz_all):
                offs = offs_all[sz_all == s]
                iu, ju = np.triu_indices(int(s), 1)
                gi = (offs[:, None] + iu[None, :]).ravel()
                gj = (offs[:, None] + ju[None, :]).ravel()
                # runs are gen-uniform (combo encodes band_id encodes gen);
                # phash buckets get the exact Hamming re-check in place
                is_ph = gens[gi] == 1
                if is_ph.any():
                    keep = np.ones(gi.size, dtype=bool)
                    keep[is_ph] = (
                        hamming64(phs[gi[is_ph]], phs[gj[is_ph]])
                        <= phash_hamming_max
                    )
                    gi, gj = gi[keep], gj[keep]
                src_parts.append(ids[gi])
                dst_parts.append(ids[gj])
        for r in np.flatnonzero(sizes > cap):
            s, e = int(bounds[r]), int(bounds[r + 1])
            n = e - s
            run = ids[s:e]
            capped += 1
            capped_rows += n
            src_parts.append(np.concatenate([np.repeat(run[0], n - 1), run[1:-1]]))
            dst_parts.append(np.concatenate([run[1:], run[2:]]))
        if capped:
            inc_counter("lsh_buckets_capped", capped)
            inc_counter("lsh_capped_rows", capped_rows)
        if not src_parts:
            return PAIR_SCHEMA.empty_table()
        src = np.concatenate(src_parts)
        dst = np.concatenate(dst_parts)
        return pa.table(
            {
                "src_id": pa.array(list(src), type=pa.string()),
                "dst_id": pa.array(list(dst), type=pa.string()),
            }
        )

    return fn


_BITMAP_LOG2 = 26  # 64 Mbit = 8 MiB per bitmap; sized so the driver merge
# stays trivial at bench scale. Saturation degrades GRACEFULLY: a fuller
# bitmap only admits more singleton rows into the shuffle (see
# _pairable_bitmap), it never loses a candidate pair.


def _pairable_bitmap(buckets: rd.Dataset) -> np.ndarray | None:
    """Approximate global "combo seen >= 2 times" filter as a bit array.

    Per block (one elastic task each): hash every combo into a 2^26-bit
    space and emit (seen-once, seen-twice) bitmaps; the driver merges with
    three ORs per block — global_twice |= block_twice | (global_once &
    block_once). ~16 MiB per block crosses the object store instead of the
    per-block distinct-combo tables (~100 MiB+ and an O(n log n) driver
    merge at 100k rows — profiled 3.1 s, vs ~0.9 s for this).

    One-sided error: hash collisions can mark a globally-unique combo
    "pairable" (its rows ride the shuffle and produce no pairs — run length
    1 is skipped by pair-gen), but a combo with >= 2 rows is ALWAYS marked.
    Recall-exact, like every cheap tier in the cascade. At cluster scale the
    driver OR-merge becomes a log-depth tree reduce of the same bitmaps.
    Returns None when no combo is pairable (or the dataset is empty)."""
    words = 1 << (_BITMAP_LOG2 - 6)
    mix = np.uint64(0x9E3779B97F4A7C15)
    shift = np.uint64(64 - _BITMAP_LOG2)

    def block_bitmaps(b: pa.Table) -> pa.Table:
        combo = b["combo"].to_numpy(zero_copy_only=False)
        idx = (combo.view(np.uint64) * mix) >> shift
        u, c = np.unique(idx, return_counts=True)
        once = np.zeros(words, dtype=np.uint64)
        twice = np.zeros(words, dtype=np.uint64)
        bits = np.uint64(1) << (u & np.uint64(63))
        np.bitwise_or.at(once, (u >> np.uint64(6)).astype(np.int64), bits)
        d = c >= 2
        np.bitwise_or.at(
            twice, (u[d] >> np.uint64(6)).astype(np.int64), bits[d]
        )
        return pa.table(
            {"once": pa.array([once.tobytes()], type=pa.binary()),
             "twice": pa.array([twice.tobytes()], type=pa.binary())}
        )

    once_g = np.zeros(words, dtype=np.uint64)
    twice_g = np.zeros(words, dtype=np.uint64)
    seen_any = False
    for t in ray.get(
        buckets.map_batches(
            block_bitmaps, batch_format="pyarrow", batch_size=None
        ).to_arrow_refs()
    ):
        if t.num_rows == 0 or "once" not in t.column_names:
            continue
        for i in range(t.num_rows):
            ob = np.frombuffer(t["once"][i].as_py(), dtype=np.uint64)
            tb = np.frombuffer(t["twice"][i].as_py(), dtype=np.uint64)
            twice_g |= tb | (once_g & ob)
            once_g |= ob
            seen_any = True
    if not seen_any or not twice_g.any():
        return None
    return twice_g


def _count_combos(buckets: rd.Dataset) -> tuple[np.ndarray, np.ndarray] | None:
    """Shuffle-free global bucket-size counts: per-block partial (combo, n)
    counts merged on the driver — the cascade-pre-pass pattern. The merged
    table is counts over DISTINCT bucket keys (bounded by reps x bands, far
    smaller than the row set); at cluster scale this driver merge becomes a
    semi-join of the bucket table against a distributed count table
    (same plan shape, one more shuffle — the driver never sees row data)."""

    def partial_counts(b: pa.Table) -> pa.Table:
        u, c = np.unique(b["combo"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"combo": pa.array(u), "n": pa.array(c)})

    parts = [
        t for t in ray.get(
            buckets.map_batches(partial_counts, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows and "combo" in t.column_names
    ]
    if not parts:
        return None
    from dedup_ray.stages.grouped import merge_partial_counts

    merged = pa.concat_tables(parts)
    return merge_partial_counts(
        merged["combo"].to_numpy(zero_copy_only=False),
        merged["n"].to_numpy(zero_copy_only=False),
    )


def _apply_salt(
    buckets: rd.Dataset, cfg: DedupConfig, u: np.ndarray, tot: np.ndarray
) -> rd.Dataset:
    """EXACT hot-bucket salting (north-rule named feature; SURVEY §4 skew row).

    Each hot-bucket row (count > bucket_pair_cap; salt s = crc32(id) % k,
    k = ceil(slack*n/cap)) is re-emitted into every rendezvous group
    p(min(s,t), max(s,t)) for t in 0..k-1 — pairs WITHIN salt s arise in the
    diagonal group (s,s), pairs ACROSS salts s<t in group (s,t), so triu over
    each rendezvous group regenerates the complete pair set, just partitioned
    into groups of ~2n/k <= cap rows (duplicates are absorbed by idempotent
    verify + union-find). Cold rows pass through untouched. Bucket counts
    come precomputed from ``_count_combos`` (one count pass shared with the
    singleton prefilter).
    """
    import zlib

    hot_mask = tot > cfg.bucket_pair_cap
    if not hot_mask.any():
        return buckets
    hot = u[hot_mask]  # sorted
    hot_k = np.ceil(cfg.salt_slack * tot[hot_mask] / cfg.bucket_pair_cap).astype(np.int64)
    inc_counter("lsh_buckets_salted", int(hot.size))
    hot_ref = ray.put((hot, hot_k))
    mix = np.uint64(0x9E3779B97F4A7C15)

    def add_salt(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        hot_c, hot_kk = ray.get(hot_ref)
        combo = b["combo"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(hot_c, combo)
        pos[pos >= hot_c.size] = hot_c.size - 1
        is_hot = hot_c[pos] == combo
        cold = b.filter(pa.array(~is_hot))
        hi = np.flatnonzero(is_hot)
        if hi.size == 0:
            return cold
        ks = hot_kk[pos[hi]]
        ids = b["image_id"].take(pa.array(hi)).to_pylist()
        salts = np.fromiter(
            (zlib.crc32(x.encode()) for x in ids), dtype=np.int64, count=len(ids)
        ) % ks
        # expand: row i -> k_i rendezvous groups (its salt vs every t)
        rep = np.repeat(np.arange(hi.size), ks)
        t_idx = np.concatenate([np.arange(k) for k in ks]) if hi.size else np.empty(0, np.int64)
        s_rep = salts[rep]
        lo = np.minimum(s_rep, t_idx)
        hh = np.maximum(s_rep, t_idx)
        p = hh * (hh + 1) // 2 + lo  # triangular index of the salt pair
        combo2 = (
            combo[hi][rep].view(np.uint64)
            ^ ((p.astype(np.uint64) + np.uint64(1)) * mix)
        ).view(np.int64)
        hot_tbl = b.take(pa.array(hi[rep]))
        hot_tbl = hot_tbl.set_column(
            hot_tbl.schema.get_field_index("combo"), "combo", pa.array(combo2)
        )
        return pa.concat_tables([cold, hot_tbl]) if cold.num_rows else hot_tbl

    return buckets.map_batches(add_salt, batch_format="pyarrow")


def lsh_candidates(signatures: rd.Dataset, cfg: DedupConfig) -> rd.Dataset:
    """signatures -> deduplicated candidate pairs. ONE coarse hash-partition
    shuffle (bucket -> pairs) over ONLY the pair-participating rows: a
    shuffle-free count pass finds bucket sizes, singleton buckets (the vast
    majority — most band keys are unique) are dropped BEFORE the shuffle via
    a broadcast sorted-membership filter, and the same counts drive hot-
    bucket salting when enabled. Profiled at 100k rows / 16 CPUs: the sort
    shuffle input drops ~7x (3.5M exploded rows -> the n>=2 survivors)."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    def explode_with_combo(b: pa.Table) -> pa.Table:
        t = explode_buckets(b, cfg)
        combo = _combo(
            t["band_id"].to_numpy(zero_copy_only=False),
            t["band_key"].to_numpy(zero_copy_only=False),
        ).view(np.int64)
        return pa.table(
            {
                "combo": pa.array(combo),
                "image_id": t["image_id"],
                "gen": t["gen"],
                "phash": t["phash"],
            }
        )

    buckets = signatures.map_batches(
        explode_with_combo, batch_format="pyarrow"
    ).materialize()  # consumed by the bitmap pass + the filtered shuffle
    bitmap = _pairable_bitmap(buckets)
    if bitmap is None:
        return rd.from_arrow(PAIR_SCHEMA.empty_table())
    bm_ref = ray.put(bitmap)
    mix = np.uint64(0x9E3779B97F4A7C15)
    shift = np.uint64(64 - _BITMAP_LOG2)

    def keep_pairable(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        bm = ray.get(bm_ref)
        combo = b["combo"].to_numpy(zero_copy_only=False)
        idx = (combo.view(np.uint64) * mix) >> shift
        hit = (
            bm[(idx >> np.uint64(6)).astype(np.int64)]
            >> (idx & np.uint64(63))
        ) & np.uint64(1)
        return b.filter(pa.array(hit.astype(bool)))

    buckets = buckets.map_batches(keep_pairable, batch_format="pyarrow")
    if cfg.salt_hot_buckets:
        # exact counts for hot-bucket detection, taken over the SURVIVORS
        # (bitmap false positives have count 1 and can never look hot)
        counts = _count_combos(buckets.materialize())
        if counts is not None:
            buckets = _apply_salt(buckets, cfg, *counts)
    pairs = grouped_runs(
        buckets,
        "combo",
        _pairs_from_runs(cfg.bucket_pair_cap, cfg.phash_hamming_max),
        sort_cols=["combo", "image_id"],
    )

    # NO pair-dedup shuffle: a pair surfacing from k buckets is verified up
    # to k times (verification is idempotent and vectorized; the verify stage
    # np.unique's within each batch) and union-find absorbs duplicate edges.
    # Trades bounded redundant verify work for one fewer all-to-all — the
    # fixed shuffle cost dominated the whole stage at bench scale.
    def dedup_within_batch(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        # structural (src,dst) dedup — a delimiter-join key would make
        # ("a|b","c") and ("a","b|c") collide for ids containing the delimiter
        src = np.asarray(b["src_id"].to_pylist(), dtype=object)
        dst = np.asarray(b["dst_id"].to_pylist(), dtype=object)
        order = np.lexsort((dst, src))  # stable: first occurrence wins
        ss, dd = src[order], dst[order]
        keep = np.ones(len(order), dtype=bool)
        keep[1:] = ~((ss[1:] == ss[:-1]) & (dd[1:] == dd[:-1]))
        return b.take(pa.array(np.sort(order[keep])))

    return pairs.map_batches(dedup_within_batch, batch_format="pyarrow")
