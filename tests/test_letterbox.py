"""Letterbox/frame-invariant dedup: canonical border-strip kernel properties
+ the pipeline against an in-process brute force and the generator's planted
padded-duplicate ground truth."""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from dedup_ray.pipelines.neardup import letterbox_crop


def _img(seed: int, h: int = 17, w: int = 23) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def _pad(px: np.ndarray, t: int, b: int, l: int, r: int, col) -> np.ndarray:
    out = np.empty((px.shape[0] + t + b, px.shape[1] + l + r, 3), np.uint8)
    out[:, :] = np.asarray(col, dtype=np.uint8)
    out[t : t + px.shape[0], l : l + px.shape[1]] = px
    return out


def test_crop_strips_uniform_border():
    p = _img(0)
    padded = _pad(p, 3, 5, 2, 7, (10, 200, 30))
    assert np.array_equal(letterbox_crop(padded), letterbox_crop(p))


def test_crop_idempotent_and_noop_without_border():
    p = _img(1)
    c = letterbox_crop(p)
    assert np.array_equal(letterbox_crop(c), c)


def test_crop_handles_nested_borders():
    p = _img(2)
    inner = _pad(p, 2, 2, 2, 2, (0, 0, 0))
    outer = _pad(inner, 4, 1, 3, 2, (255, 255, 255))
    assert np.array_equal(letterbox_crop(outer), letterbox_crop(p))


def test_crop_asymmetric_and_zero_sides():
    p = _img(3)
    padded = _pad(p, 0, 9, 0, 0, (77, 77, 77))
    assert np.array_equal(letterbox_crop(padded), letterbox_crop(p))


def test_crop_all_constant_image_unchanged():
    p = np.full((8, 11, 3), 42, dtype=np.uint8)
    assert np.array_equal(letterbox_crop(p), p)


def test_crop_border_color_present_inside_content():
    # content containing pixels of the border color must survive: only
    # FULL edge rows/cols of the corner color are stripped
    p = _img(4)
    p[5:8, 5:8] = (9, 9, 9)
    padded = _pad(p, 2, 2, 2, 2, (9, 9, 9))
    assert np.array_equal(letterbox_crop(padded), letterbox_crop(p))


@pytest.fixture(scope="module")
def pad_corpus(tmp_path_factory) -> str:
    from dedup_ray.sources.corpus import generate_corpus

    out = str(tmp_path_factory.mktemp("padc") / "pad")
    generate_corpus(out, scale="tiny", use_ray=False, pad_dups=True)
    return out


def _brute_clusters(corpus_dir: str) -> dict[str, str]:
    """In-process oracle: decode everything, group by the canonical digest."""
    from dedup_ray.functions import codecs
    from dedup_ray.functions.hashing import pixel_hash

    t = pq.read_table(os.path.join(corpus_dir, "images.parquet"))
    by_dig: dict[str, list[str]] = {}
    for iid, raw, fmt in zip(
        t["image_id"].to_pylist(), t["bytes"].to_pylist(), t["fmt"].to_pylist()
    ):
        d = pixel_hash(letterbox_crop(codecs.decode(raw, fmt))).hex()
        by_dig.setdefault(d, []).append(iid)
    out = {}
    for members in by_dig.values():
        if len(members) >= 2:
            rep = min(members)
            for m in members:
                out[m] = rep
    return out


def test_pipeline_matches_bruteforce_and_planted_gt(pad_corpus, ray_session):
    from dedup_ray.pipelines.neardup import letterbox_dedup_clusters

    got = {
        r["image_id"]: r["cluster_id"]
        for r in letterbox_dedup_clusters(
            os.path.join(pad_corpus, "images.parquet")
        ).take_all()
    }
    want = _brute_clusters(pad_corpus)
    assert got == want

    # every planted padded cluster is recovered EXACTLY (lossless fmts ->
    # members decode to exact pad(content) -> same canonical digest)
    gt = pq.read_table(os.path.join(pad_corpus, "gt_clusters.parquet"))
    pad_rows = [
        (r["image_id"], r["gt_cluster_id"])
        for r in gt.to_pylist()
        if r["dup_class"] == "padded"
    ]
    assert len(pad_rows) >= 4  # the mix actually planted some
    by_gt: dict[str, set[str]] = {}
    for iid, c in pad_rows:
        by_gt.setdefault(c, set()).add(iid)
    for members in by_gt.values():
        reps = {got.get(m) for m in members}
        assert len(reps) == 1 and None not in reps, members


def test_letterbox_stats_matches_kernel_replay(pad_corpus, ray_session):
    from dedup_ray.functions import codecs
    from dedup_ray.pipelines.neardup import letterbox_stats

    got = letterbox_stats(os.path.join(pad_corpus, "images.parquet")).iloc[0]
    t = pq.read_table(os.path.join(pad_corpus, "images.parquet"),
                      columns=["bytes", "fmt"])
    n = nb = 0
    area = 0.0
    for raw, fmt in zip(t["bytes"].to_pylist(), t["fmt"].to_pylist()):
        px = codecs.decode(raw, fmt)
        n += 1
        c = letterbox_crop(px)
        if c.shape != px.shape:
            nb += 1
            area += 1.0 - (c.shape[0] * c.shape[1]) / (px.shape[0] * px.shape[1])
    assert int(got["n_images"]) == n
    assert int(got["n_letterboxed"]) == nb
    assert nb > 0  # the planted mix actually letterboxed some
    assert abs(got["mean_border_area_frac"] - area / nb) < 1e-6
