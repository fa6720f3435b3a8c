"""Shared pair-generation kernel (stages/pairgen.py): the document path's
skew safety (round-2 review item #1) and the distributed-prepass seam
(review item #3) — exact pair sets and mode-identical outputs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from dedup_ray.stages.pairgen import (
    bucket_counts,
    hot_bucket_counts,
    pairs_from_runs,
    salted_candidate_pairs,
)

N_HOT = 60
CAP = 20


def _doc_buckets() -> rd.Dataset:
    """One adversarial hot band bucket (60 docs, cap 20) + a few cold
    buckets, shuffled row order across 4 blocks."""
    rng = np.random.default_rng(7)
    combo = np.concatenate(
        [np.full(N_HOT, 1111, dtype=np.int64),
         np.array([5, 5, 9, 9, 9, 42], dtype=np.int64)]
    )
    doc = np.concatenate(
        [np.arange(N_HOT, dtype=np.int64) + 100,
         np.array([1, 2, 10, 11, 12, 77], dtype=np.int64)]
    )
    perm = rng.permutation(len(combo))
    t = pa.table({"combo": pa.array(combo[perm]), "doc_id": pa.array(doc[perm])})
    return rd.from_arrow(t).repartition(4)


def _expected_pairs() -> set:
    hot = [i + 100 for i in range(N_HOT)]
    full = {(hot[i], hot[j]) for i in range(N_HOT) for j in range(i + 1, N_HOT)}
    full |= {(1, 2), (10, 11), (10, 12), (11, 12)}
    return full


def _pair_set(ds: rd.Dataset) -> set:
    out = set()
    for t in ray.get(ds.to_arrow_refs()):
        if t.num_rows and "src_id" in t.column_names:
            out.update(zip(t["src_id"].to_pylist(), t["dst_id"].to_pylist()))
    return out


def test_doc_salting_preserves_exact_pair_set():
    """The doc path analog of test_salting: strict salting over an over-cap
    bucket regenerates the complete brute-force pair set (duplicates allowed
    — downstream dedups — but the SET must be exact)."""
    cand = salted_candidate_pairs(_doc_buckets(), "combo", "doc_id", cap=CAP)
    assert _pair_set(cand) == _expected_pairs()


def test_doc_salting_distributed_counts_identical():
    """distributed_counts=True (groupby-sum hot-key detection) yields the
    same exact pair set as the driver-merge default."""
    cand = salted_candidate_pairs(
        _doc_buckets(), "combo", "doc_id", cap=CAP, distributed_counts=True
    )
    assert _pair_set(cand) == _expected_pairs()


def test_unsalted_cap_degrades_connectivity_preserving():
    from dedup_ray.stages.grouped import grouped_runs

    fn = pairs_from_runs("combo", "doc_id", cap=CAP)
    capped = _pair_set(
        grouped_runs(_doc_buckets(), "combo", fn, sort_cols=["combo", "doc_id"])
    )
    full = _expected_pairs()
    assert capped < full
    # star+chain keeps every hot-bucket member connected to the min member
    hot_members = {i + 100 for i in range(N_HOT)}
    covered = {b for a, b in capped if a == 100} | {a for a, _ in capped} | {100}
    assert hot_members <= covered | {x for p in capped for x in p}


def test_bucket_counts_modes_agree():
    u1, t1 = bucket_counts(_doc_buckets(), "combo", distributed=False)
    u2, t2 = bucket_counts(_doc_buckets(), "combo", distributed=True)
    np.testing.assert_array_equal(u1, u2)
    np.testing.assert_array_equal(t1, t2)
    hot = hot_bucket_counts(_doc_buckets(), "combo", CAP, distributed=True)
    np.testing.assert_array_equal(hot[0], np.array([1111]))
    np.testing.assert_array_equal(hot[1], np.array([N_HOT]))
    hot_d = hot_bucket_counts(_doc_buckets(), "combo", CAP, distributed=False)
    np.testing.assert_array_equal(hot[0], hot_d[0])
    np.testing.assert_array_equal(hot[1], hot_d[1])
    assert hot_bucket_counts(_doc_buckets(), "combo", 1000) is None


def test_string_id_pairs_and_salt():
    """The kernel is id-type generic: string ids produce the same pair set
    through the salted path (the flagship's type)."""
    combo = np.full(N_HOT, 77, dtype=np.int64)
    ids = [f"img_{i:03d}" for i in range(N_HOT)]
    t = pa.table({"combo": pa.array(combo), "image_id": pa.array(ids)})
    ds = rd.from_arrow(t).repartition(3)
    cand = salted_candidate_pairs(ds, "combo", "image_id", cap=CAP)
    full = {(ids[i], ids[j]) for i in range(N_HOT) for j in range(i + 1, N_HOT)}
    assert _pair_set(cand) == full


def test_flagship_identical_under_distributed_prepass(tiny_corpus):
    """Review item #3 done-criterion: the flagship's cluster table is
    byte-identical with the prepass routed through the driver merge vs the
    distributed tree-reduce/groupby-sum plan."""
    import os

    from dedup_ray.config import DedupConfig
    from dedup_ray.pipelines.neardup import run_neardup

    path = os.path.join(tiny_corpus, "images.parquet")
    a = run_neardup(path, DedupConfig(salt_hot_buckets=True)).clusters.to_pandas()
    b = run_neardup(
        path, DedupConfig(salt_hot_buckets=True, distributed_prepass=True)
    ).clusters.to_pandas()
    assert a.equals(b)
