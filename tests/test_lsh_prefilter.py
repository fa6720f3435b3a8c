"""The singleton-bucket bitmap prefilter must be recall-exact: every combo
occurring >= 2 times globally (including split ACROSS blocks) survives, so
the candidate pair set is identical to an unfiltered brute run. False
positives (hash collisions admitting singleton rows) are allowed — they
produce no pairs — but false negatives never are."""

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from dedup_ray.config import DedupConfig
from dedup_ray.stages.grouped import grouped_runs
from dedup_ray.stages.lsh import (
    _pairable_bitmap,
    _pairs_from_runs,
    lsh_candidates,
)


def _bucket_rows(n_combos: int, seed: int) -> pa.Table:
    """Synthetic exploded bucket rows: ~half the combos singletons, the rest
    sizes 2..5, shuffled so multi-row combos straddle block boundaries."""
    rng = np.random.default_rng(seed)
    combos, ids = [], []
    row = 0
    for c in range(n_combos):
        size = 1 if c % 2 == 0 else int(rng.integers(2, 6))
        for _ in range(size):
            combos.append(c * 7919 + 13)
            ids.append(f"img_{row:06d}")
            row += 1
    order = rng.permutation(len(combos))
    return pa.table(
        {
            "combo": pa.array(np.asarray(combos, dtype=np.int64)[order]),
            "image_id": pa.array(np.asarray(ids, dtype=object)[order], type=pa.string()),
            "gen": pa.array(np.zeros(len(combos), dtype=np.int8)[order]),
            "phash": pa.array(np.zeros(len(combos), dtype=np.int64)[order]),
        }
    )


def _pair_set(ds: rd.Dataset, cfg: DedupConfig) -> set:
    pairs = grouped_runs(
        ds, "combo", _pairs_from_runs(cfg.bucket_pair_cap, cfg.phash_hamming_max),
        sort_cols=["combo", "image_id"],
    )
    out = set()
    for tbl in ray.get(pairs.to_arrow_refs()):
        if tbl.num_rows and "src_id" in tbl.column_names:
            out.update(zip(tbl["src_id"].to_pylist(), tbl["dst_id"].to_pylist()))
    return out


def test_bitmap_prefilter_is_recall_exact():
    cfg = DedupConfig()
    t = _bucket_rows(400, seed=11)
    ds = rd.from_arrow(t).repartition(8)  # multi-row combos straddle blocks

    bitmap = _pairable_bitmap(ds.materialize())
    assert bitmap is not None
    # every true-pairable combo is marked (one-sided error only)
    combos = t["combo"].to_numpy(zero_copy_only=False)
    u, c = np.unique(combos, return_counts=True)
    mix = np.uint64(0x9E3779B97F4A7C15)
    from dedup_ray.stages.lsh import _BITMAP_LOG2

    idx = (u.view(np.uint64) * mix) >> np.uint64(64 - _BITMAP_LOG2)
    hit = (bitmap[(idx >> np.uint64(6)).astype(np.int64)] >> (idx & np.uint64(63))) & np.uint64(1)
    assert bool(hit.astype(bool)[c >= 2].all())

    # end-to-end: filtered pair set == unfiltered pair set
    mask_ref = ray.put(bitmap)
    shift = np.uint64(64 - _BITMAP_LOG2)

    def keep(b: pa.Table) -> pa.Table:
        bm = ray.get(mask_ref)
        combo = b["combo"].to_numpy(zero_copy_only=False)
        ix = (combo.view(np.uint64) * mix) >> shift
        h = (bm[(ix >> np.uint64(6)).astype(np.int64)] >> (ix & np.uint64(63))) & np.uint64(1)
        return b.filter(pa.array(h.astype(bool)))

    filtered = _pair_set(ds.map_batches(keep, batch_format="pyarrow"), cfg)
    brute = _pair_set(ds, cfg)
    assert filtered == brute and len(brute) > 0


def test_all_singleton_input_yields_no_candidates():
    """Unique-everything signatures: lsh_candidates returns an empty pair
    dataset with the PAIR schema (the early-exit path when no bit is set
    twice)."""
    cfg = DedupConfig()
    rng = np.random.default_rng(5)
    n = 50
    sig = rng.integers(0, 2**63, (n, cfg.num_perm), dtype=np.int64)
    sig_col = pa.FixedSizeListArray.from_arrays(
        pa.array(sig.ravel(), type=pa.int64()), cfg.num_perm
    )
    t = pa.table(
        {
            "image_id": pa.array([f"u_{i}" for i in range(n)], type=pa.string()),
            "minhash_sig": sig_col,
            "has_sig": pa.array([True] * n),
            "phash": pa.array(rng.integers(0, 2**63, n, dtype=np.int64), type=pa.int64()),
            "caption": pa.array([""] * n, type=pa.string()),
            "winnow_fp": pa.LargeListArray.from_arrays(
                pa.array(np.zeros(n + 1, dtype=np.int64)),
                pa.array([], type=pa.int64()),
            ),
        }
    )
    cand = lsh_candidates(rd.from_arrow(t).repartition(4), cfg)
    got = cand.materialize()
    assert got.count() == 0
    # early-exit path returns a typed empty PAIR table; if a rare bitmap
    # collision admits singleton rows instead, the shuffle path yields an
    # empty result whose schema Ray reports as None — both are "no pairs"
    schema = got.schema()
    assert schema is None or set(schema.names) == {"src_id", "dst_id"}


def test_minhash_digest_prefilter_keeps_planted_recall(tiny_corpus):
    """Opt-in digest prefilter (minhash_prefilter_nibbles=12) must not lose
    planted duplicates: recall vs the oracle stays 1.0 on the tiny corpus
    (planted caption dups sit far above the Jaccard threshold; the screen
    only kills lucky low-J band collisions)."""
    import os

    import pyarrow.parquet as pq

    from dedup_ray.config import DedupConfig
    from dedup_ray.oracle.recall import pair_recall_precision
    from dedup_ray.oracle.refimpl import oracle_clusters
    from dedup_ray.pipelines.neardup import run_neardup

    corpus = os.path.join(tiny_corpus, "images.parquet")
    cfg = DedupConfig(minhash_prefilter_nibbles=12)
    res = run_neardup(corpus, cfg)
    pred = {r["image_id"]: r["cluster_id"] for r in res.clusters.take_all()}
    oc = oracle_clusters(pq.read_table(corpus))
    got = pair_recall_precision(oc, pred)
    assert got["recall"] == 1.0
    assert got["precision"] == 1.0


def test_minhash_digest_prefilter_kills_low_j_junk():
    """A pair whose signatures agree on exactly one band (a lucky 4-perm
    collision, true J ~ 0) is screened out; a pair agreeing on nearly all
    perms survives."""
    import numpy as np
    import pyarrow as pa

    from dedup_ray.config import DedupConfig
    from dedup_ray.stages.lsh import explode_buckets

    cfg = DedupConfig(minhash_prefilter_nibbles=12)
    rng = np.random.default_rng(5)
    base = rng.integers(0, 2**61, 128, dtype=np.uint64)
    lucky = rng.integers(0, 2**61, 128, dtype=np.uint64)
    lucky[0:4] = base[0:4]  # band 0 collides, everything else differs
    near = base.copy()
    near[5] ^= np.uint64(1)  # ~all perms agree

    def row_sig(s):
        return pa.FixedSizeListArray.from_arrays(
            pa.array(s.view(np.int64), type=pa.int64()), 128
        )

    # phashes pairwise FAR apart (hamming ~32) so the phash tier generates
    # nothing and only the minhash tier is in play
    ph = [int(x) for x in rng.integers(0, 2**62, 3, dtype=np.int64)]
    t = pa.table(
        {
            "image_id": pa.array(["a", "b", "c"], type=pa.string()),
            "phash": pa.array(ph, type=pa.int64()),
            "minhash_sig": pa.concat_arrays(
                [row_sig(base), row_sig(lucky), row_sig(near)]
            ),
            "has_sig": pa.array([True, True, True]),
            "winnow_fp": pa.array([[], [], []], type=pa.large_list(pa.int64())),
        }
    )
    ex = explode_buckets(t, cfg)
    assert "mh0" in ex.column_names
    from dedup_ray.stages.lsh import _combo, _pairs_from_runs

    combo = _combo(
        ex["band_id"].to_numpy(zero_copy_only=False),
        ex["band_key"].to_numpy(zero_copy_only=False),
    ).view(np.int64)
    g = ex.append_column("combo", pa.array(combo)).sort_by(
        [("combo", "ascending"), ("image_id", "ascending")]
    )
    fn = _pairs_from_runs(64, cfg.phash_hamming_max, mh_nibbles=12)
    pairs = fn(g)
    got = set(zip(pairs["src_id"].to_pylist(), pairs["dst_id"].to_pylist()))
    assert ("a", "c") in got      # near-identical sigs survive
    assert ("a", "b") not in got  # lucky one-band collision screened
