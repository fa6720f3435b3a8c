"""Rotation/flip-invariant dedup: dihedral orbit kernels + the pipeline
against an in-process brute force and the generator's planted ground truth."""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from dedup_ray.functions.hashing import (
    _dihedral_orbit,
    dihedral_pixel_hash,
    phash_dihedral64,
    phash64,
)


def _img(seed: int, h: int = 17, w: int = 23) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_orbit_has_8_distinct_shapes_or_views():
    p = _img(0)
    orbit = [np.ascontiguousarray(t) for t in _dihedral_orbit(p)]
    assert len(orbit) == 8
    # non-square: four members have swapped dims
    assert sum(t.shape == (23, 17, 3) for t in orbit) == 4


@pytest.mark.parametrize("k", range(8))
def test_dihedral_hashes_invariant_under_every_transform(k):
    p = _img(1)
    t = np.ascontiguousarray(list(_dihedral_orbit(p))[k])
    assert dihedral_pixel_hash(t) == dihedral_pixel_hash(p)
    assert phash_dihedral64(t) == phash_dihedral64(p)


def test_dihedral_hash_distinct_for_distinct_images():
    hashes = {dihedral_pixel_hash(_img(s)) for s in range(20)}
    assert len(hashes) == 20
    phashes = {phash_dihedral64(_img(s)) for s in range(20)}
    assert len(phashes) > 15  # perceptual: near-unique on random noise


def test_plain_phash_is_not_rotation_invariant():
    # sanity: the new kernel adds something plain phash lacks
    p = _img(2, 32, 48)
    assert phash64(np.rot90(p)) != phash64(p)


@pytest.fixture(scope="module")
def rot_corpus(tmp_path_factory) -> str:
    from dedup_ray.sources.corpus import generate_corpus

    out = str(tmp_path_factory.mktemp("rotc") / "rot")
    generate_corpus(out, scale="tiny", use_ray=False, rot_dups=True)
    return out


def _brute_clusters(corpus_dir: str) -> dict[str, str]:
    """In-process oracle: decode everything, group by the orbit digest."""
    from dedup_ray.functions import codecs

    t = pq.read_table(os.path.join(corpus_dir, "images.parquet"))
    by_dig: dict[str, list[str]] = {}
    for iid, raw, fmt in zip(
        t["image_id"].to_pylist(), t["bytes"].to_pylist(), t["fmt"].to_pylist()
    ):
        d = dihedral_pixel_hash(codecs.decode(raw, fmt)).hex()
        by_dig.setdefault(d, []).append(iid)
    out = {}
    for members in by_dig.values():
        if len(members) >= 2:
            rep = min(members)
            for m in members:
                out[m] = rep
    return out


def test_pipeline_matches_bruteforce_and_planted_gt(rot_corpus, ray_session):
    from dedup_ray.pipelines.neardup import rotation_invariant_clusters

    got = {
        r["image_id"]: r["cluster_id"]
        for r in rotation_invariant_clusters(
            os.path.join(rot_corpus, "images.parquet")
        ).take_all()
    }
    want = _brute_clusters(rot_corpus)
    assert got == want

    # every planted rotated cluster is recovered EXACTLY (lossless fmts ->
    # members decode to exact transforms -> same orbit digest)
    gt = pq.read_table(os.path.join(rot_corpus, "gt_clusters.parquet"))
    rot_rows = [
        (r["image_id"], r["gt_cluster_id"])
        for r in gt.to_pylist()
        if r["dup_class"] == "rotated"
    ]
    assert len(rot_rows) >= 4  # the mix actually planted some
    by_gt: dict[str, set[str]] = {}
    for iid, c in rot_rows:
        by_gt.setdefault(c, set()).add(iid)
    for members in by_gt.values():
        reps = {got.get(m) for m in members}
        assert len(reps) == 1 and None not in reps, members


def test_rot_corpus_declared_dims_match_payload(rot_corpus):
    # 90/270-rotated members swap w/h; the generator must declare the
    # ACTUAL dims or the keys-stage validity filter would drop them
    from dedup_ray.functions import codecs

    t = pq.read_table(os.path.join(rot_corpus, "images.parquet"))
    for r in t.slice(0, 200).to_pylist():
        px = codecs.decode(r["bytes"], r["fmt"])
        assert px.shape == (r["h"], r["w"], 3)
