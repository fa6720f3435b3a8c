"""Bloom filter kernel properties + the bloom-prefiltered semi join."""

import numpy as np

from dedup_ray.functions.bloom import bloom_build, bloom_params, bloom_probe


def test_no_false_negatives():
    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    m, k = bloom_params(len(keys), 0.01)
    bm = bloom_build(keys, m, k)
    assert bloom_probe(keys, bm, k).all()


def test_false_positive_rate_bounded():
    rng = np.random.default_rng(11)
    keys = rng.integers(0, 2**62, size=20000, dtype=np.int64)
    m, k = bloom_params(len(keys), 0.01)
    bm = bloom_build(keys, m, k)
    probes = rng.integers(-(2**62), -1, size=50000, dtype=np.int64)  # disjoint
    fpr = bloom_probe(probes, bm, k).mean()
    assert fpr <= 0.03, fpr  # target 1%, generous margin


def test_partial_bitmaps_or_merge():
    rng = np.random.default_rng(13)
    keys = rng.integers(0, 2**62, size=4000, dtype=np.int64)
    m, k = bloom_params(len(keys), 0.01)
    whole = bloom_build(keys, m, k)
    merged = bloom_build(keys[:1000], m, k)
    for lo in (1000, 2000, 3000):
        merged |= bloom_build(keys[lo:lo + 1000], m, k)
    assert (whole == merged).all()


def test_empty_and_degenerate():
    m, k = bloom_params(0, 0.01)
    bm = bloom_build(np.empty(0, dtype=np.int64), m, k)
    assert not bloom_probe(np.array([1, 2, 3], dtype=np.int64), bm, k).any()
    assert bloom_probe(np.empty(0, dtype=np.int64), bm, k).shape == (0,)


def test_bloom_semi_join_matches_plain(ray_session):
    """The prefiltered operator must be value-identical to the plain semi
    join — the bitmap moves bytes, never correctness."""
    from dedup_ray.pipelines.relational import (
        bulk_order_priorities,
        bulk_order_priorities_bloom,
    )

    sf_dir = "/root/testdata/sf0.001"
    plain = bulk_order_priorities(sf_dir).to_pandas().sort_values(
        "o_orderpriority").reset_index(drop=True)
    bloom = bulk_order_priorities_bloom(sf_dir).to_pandas().sort_values(
        "o_orderpriority").reset_index(drop=True)
    assert plain.equals(bloom), (plain, bloom)
