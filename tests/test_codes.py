"""stages/codes.py: id dictionary-encoding for the flagship's wide stages.

The load-bearing claims: (1) the broadcast and the distributed (range-
partitioned rank) dictionary builds assign IDENTICAL codes; (2) the flagship
produces byte-identical clusters with int-encoding + global pair dedup on
vs the round-3 string path; (3) the pigeonhole-generalized phash combo keys
keep candidate completeness at the verify threshold.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data as rd

from dedup_ray.config import DedupConfig
from dedup_ray.stages.codes import (
    decode_edge_table,
    encode_id_col,
    ranked_id_dictionary,
    sorted_id_dictionary,
)


def _ids_table(n=500, seed=7):
    rng = np.random.default_rng(seed)
    ids = [f"img_{rng.integers(0, 10**9):09d}_{i}" for i in range(n)]
    rng.shuffle(ids)
    return pa.table({"image_id": pa.array(ids, type=pa.string()),
                     "x": pa.array(np.arange(n, dtype=np.int64))})


def test_sorted_vs_ranked_dictionary_identical_codes():
    t = _ids_table()
    ds = rd.from_arrow(t).repartition(8)
    ref = sorted_id_dictionary(ds)
    ns = ray.get(ref)
    want = {v: i for i, v in enumerate(ns.to_pylist())}

    ranked = ranked_id_dictionary(ds, num_parts=7)
    got = {
        r["image_id"]: r["code"] for r in ranked.take_all()
    }
    assert got == want
    # sorted ascending, dense 0..n-1
    assert sorted(want.values()) == list(range(len(want)))
    vals = ns.to_pylist()
    assert vals == sorted(vals)


def test_encode_decode_roundtrip():
    t = _ids_table(n=200)
    ds = rd.from_arrow(t).repartition(4)
    ref = sorted_id_dictionary(ds)
    enc = encode_id_col(ds, ref)
    out = enc.take_all()
    ns = ray.get(ref).to_pylist()
    for r in out:
        assert ns[r["image_id"]] is not None
    # decode an edge table built from the codes
    codes = pa.array([r["image_id"] for r in out[:10]], type=pa.int64())
    edges = pa.table({"src_id": codes, "dst_id": codes})
    dec = decode_edge_table(edges, ref)
    assert dec["src_id"].type == pa.string()
    assert dec["src_id"].to_pylist() == [ns[c.as_py()] for c in codes]


def test_encode_unknown_id_raises():
    t = _ids_table(n=50)
    ds = rd.from_arrow(t).repartition(2)
    ref = sorted_id_dictionary(ds)
    other = rd.from_arrow(
        pa.table({"image_id": pa.array(["nope"], type=pa.string())})
    )
    with pytest.raises(Exception, match="missing from the id dictionary"):
        encode_id_col(other, ref).take_all()


def _clusters_dict(res):
    return {r["image_id"]: r["cluster_id"] for r in res.clusters.take_all()}


def test_flagship_identical_across_id_encodings(tiny_corpus):
    """int-encode + global pair dedup must not change cluster output (the
    round-4 byte-identity requirement): same corpus, four config corners,
    one answer."""
    import os

    from dedup_ray.pipelines.neardup import run_neardup

    tiny_corpus = os.path.join(tiny_corpus, "images.parquet")
    base = None
    for int_ids, dedup in [
        (False, "batch"), (True, "batch"), (True, "global"), (False, "global"),
    ]:
        cfg = DedupConfig(int_encode_ids=int_ids, pair_dedup=dedup)
        got = _clusters_dict(run_neardup(tiny_corpus, cfg))
        if base is None:
            base = got
        else:
            assert got == base, (int_ids, dedup)
    assert base  # tiny corpus has planted dups


def test_phash_combo_keys_pigeonhole():
    """Any pair within Hamming h shares >= 1 combo key whenever
    h <= n_bands - combo_size — including unequal band widths (9 bands)."""
    from dedup_ray.functions.hashing import hamming64, phash_combo_keys

    rng = np.random.default_rng(3)
    base = rng.integers(-(2**62), 2**62, 64, dtype=np.int64)
    for n_bands, s in [(8, 2), (9, 3), (10, 4)]:
        h_max = n_bands - s
        # flip exactly h_max random bits
        flipped = base.copy()
        for i in range(len(base)):
            bits = rng.choice(64, size=h_max, replace=False)
            m = np.int64(0)
            for b in bits:
                m |= np.int64(1) << np.int64(int(b))
            flipped[i] ^= m
        assert (hamming64(base, flipped) == h_max).all()
        ka = phash_combo_keys(base, n_bands, s)
        kb = phash_combo_keys(flipped, n_bands, s)
        assert ((ka == kb).any(axis=1)).all()


def test_phash_combo_keys_pair_default_unchanged():
    """(8, 2) must reproduce the round-3 band-pair keys bit for bit (the
    default config's candidate space is frozen)."""
    from dedup_ray.functions.hashing import phash_bands, phash_combo_keys

    rng = np.random.default_rng(11)
    ph = rng.integers(-(2**62), 2**62, 100, dtype=np.int64)
    got = phash_combo_keys(ph, 8, 2)
    b = phash_bands(ph, 8)
    combos = [(i, j) for i in range(8) for j in range(i + 1, 8)]
    for c, (i, j) in enumerate(combos):
        want = (
            (np.uint64(c) << np.uint64(16))
            | (b[:, i] << np.uint64(8))
            | b[:, j]
        )
        assert (got[:, c] == want).all()


def test_flagship_shuffle_attach_path_identical(tiny_corpus):
    """Forcing the attach SHUFFLE path (attrs above the broadcast bound —
    the 100-TB regime the 4M stress cell hits) must produce identical
    clusters to the broadcast path, int codes and fused verify included."""
    import os

    from dedup_ray.pipelines.neardup import run_neardup

    corpus = os.path.join(tiny_corpus, "images.parquet")
    want = _clusters_dict(run_neardup(corpus, DedupConfig()))
    got = _clusters_dict(
        run_neardup(corpus, DedupConfig(attach_broadcast_max_rows=1))
    )
    assert got == want and want
