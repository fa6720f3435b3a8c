"""Image color-histogram similarity search vs in-process brute force,
plus the histogram feature's invariances."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest

from dedup_ray.functions import codecs
from dedup_ray.stages.multimodal import ImageHistogram


def _hist_of(px: np.ndarray) -> np.ndarray:
    npx = px.shape[0] * px.shape[1]
    return np.concatenate(
        [np.bincount((px[:, :, c] >> 5).ravel(), minlength=8) for c in range(3)]
    ).astype(np.float64) / npx


def test_histogram_rotation_invariant_and_normalized():
    px = np.random.default_rng(0).integers(0, 256, (20, 30, 3), dtype=np.uint8)
    b = pa.table(
        {
            "image_id": pa.array(["a", "b"]),
            "bytes": pa.array(
                [codecs.encode(px, "raw"), codecs.encode(np.rot90(px).copy(), "raw")],
                type=pa.binary(),
            ),
            "fmt": pa.array(["raw", "raw"]),
        }
    )
    out = ImageHistogram()(b)
    ha, hb = (np.asarray(r, dtype=np.float64) for r in out["hist"].to_pylist())
    assert np.allclose(ha, hb)         # rotation-invariant
    assert abs(ha.sum() - 3.0) < 1e-5  # each channel sums to 1
    assert np.allclose(ha, _hist_of(px), atol=1e-6)


def test_histogram_drops_undecodable():
    b = pa.table(
        {
            "image_id": pa.array(["bad"]),
            "bytes": pa.array([b"\x00\x01"], type=pa.binary()),
            "fmt": pa.array(["png"]),
        }
    )
    assert ImageHistogram()(b).num_rows == 0


def test_image_histogram_search_matches_bruteforce(ray_session, tiny_corpus):
    import ray.data as rd

    from dedup_ray.stages.multimodal import image_histogram_search

    path = os.path.join(tiny_corpus, "images.parquet")
    got = image_histogram_search(
        rd.read_parquet(path), n_queries=3, k=5
    ).to_pandas()
    assert (got.groupby("query_id")["rank"].max() == 5).all()
    assert (got.query_id != got.image_id).all()

    # brute force over in-process histograms
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    ids = np.asarray(t["image_id"].to_pylist(), dtype=object)
    order = np.argsort(ids)
    ids = ids[order]
    raws = [t["bytes"][int(i)].as_py() for i in order]
    fmts = [t["fmt"][int(i)].as_py() for i in order]
    m = np.stack(
        [
            _hist_of(codecs.decode(r, f)).astype(np.float32).astype(np.float64)
            for r, f in zip(raws, fmts)
        ]
    )
    for qid in got.query_id.unique():
        qi = np.flatnonzero(ids == qid)[0]
        d = ((m - m[qi]) ** 2).sum(axis=1)
        d[qi] = np.inf
        top = np.lexsort((ids, d))[:5]
        want = list(ids[top])
        have = got[got.query_id == qid].sort_values("rank").image_id.tolist()
        assert have == want, (qid, have, want)
