"""Adversarial corpus shapes through the FULL flagship pipeline.

Round-1's driver crash was a layout-dependent edge (schema-dropped empty
groupby blocks); these tests pin the other degenerate layouts a real corpus
can hit: a single row, every row byte-identical (one giant exact class —
the north-rule "identical images" hot key), and every caption identical
while pixels differ (hot MinHash bucket with NO exact collapse to hide
behind).
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dedup_ray.functions import codecs
from dedup_ray.functions.hashing import phash64
from dedup_ray.pipelines.neardup import run_neardup


def _row(rng: np.random.Generator, w: int = 16, h: int = 16):
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    data = codecs.encode(px, "raw")
    return data, w, h, phash64(px)


def _write(path, rows):
    cols = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
    for r in rows:
        for k, v in zip(cols, r):
            cols[k].append(v)
    t = pa.table(
        {
            "image_id": pa.array(cols["image_id"], type=pa.string()),
            "bytes": pa.array(cols["bytes"], type=pa.binary()),
            "w": pa.array(cols["w"], type=pa.int32()),
            "h": pa.array(cols["h"], type=pa.int32()),
            "fmt": pa.array(cols["fmt"], type=pa.string()),
            "caption": pa.array(cols["caption"], type=pa.string()),
            "phash": pa.array(cols["phash"], type=pa.int64()),
        }
    )
    pq.write_table(t, path)
    return str(path)


def test_single_row_corpus(tmp_path, ray_session):
    rng = np.random.default_rng(7)
    data, w, h, ph = _row(rng)
    p = _write(tmp_path / "one.parquet",
               [("only", data, w, h, "raw", "a lonely caption", ph)])
    res = run_neardup(p)
    assert res.stats["total_rows"] == 1
    assert res.stats["duplicate_rows"] == 0
    assert res.clusters.count() == 0


def test_all_rows_identical(tmp_path, ray_session):
    """One giant exact class: must collapse to a single cluster containing
    every row, keeper = min image_id, without feeding LSH a hot bucket."""
    rng = np.random.default_rng(8)
    data, w, h, ph = _row(rng)
    n = 300
    p = _write(
        tmp_path / "same.parquet",
        [(f"img_{i:04d}", data, w, h, "raw", "identical caption text", ph)
         for i in range(n)],
    )
    res = run_neardup(p)
    assert res.stats["total_rows"] == n
    assert res.stats["duplicate_rows"] == n
    assert res.stats["duplicate_clusters"] == 1
    cl = res.clusters.to_pandas()
    assert len(cl) == n
    assert set(cl["cluster_id"]) == {"img_0000"}


def test_same_caption_distinct_images(tmp_path, ray_session):
    """Identical captions over fully random pixels: the caption tier must
    cluster all rows together (exact caption equality IS a dup relation in
    the reference semantics) while the pipeline survives the hot MinHash
    bucket that an all-identical-caption corpus creates."""
    rng = np.random.default_rng(9)
    n = 120
    cap = "the exact same rather long caption repeated across every image"
    rows = []
    for i in range(n):
        data, w, h, ph = _row(rng)
        rows.append((f"img_{i:04d}", data, w, h, "raw", cap, ph))
    p = _write(tmp_path / "hotcap.parquet", rows)
    res = run_neardup(p)
    assert res.stats["total_rows"] == n
    # all rows share the caption -> one cluster of n
    assert res.stats["duplicate_clusters"] == 1
    assert res.stats["duplicate_rows"] == n


def test_all_empty_captions_distinct_images(tmp_path, ray_session):
    """Empty captions must NOT glue distinct images together."""
    rng = np.random.default_rng(10)
    n = 80
    rows = []
    for i in range(n):
        data, w, h, ph = _row(rng)
        rows.append((f"img_{i:04d}", data, w, h, "raw", "", ph))
    p = _write(tmp_path / "emptycap.parquet", rows)
    res = run_neardup(p)
    assert res.stats["total_rows"] == n
    assert res.stats["duplicate_rows"] == 0
