"""quadrant_crop_pairs: planted quadrant crops must pair with their source;
unrelated random images must not pair (no false positives)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def crop_corpus(tmp_path_factory, tiny_corpus):
    from dedup_ray.functions import codecs

    src = pq.read_table(os.path.join(tiny_corpus, "images.parquet"))
    # take 5 distinct source images, plant their TL and BR quadrant crops
    rows = {c: src[c].to_pylist() for c in src.column_names}
    n = len(rows["image_id"])
    ids, blobs, ws, hs, fmts, caps, ph = (
        list(rows["image_id"]), list(rows["bytes"]), list(rows["w"]),
        list(rows["h"]), list(rows["fmt"]), list(rows["caption"]),
        list(rows["phash"]),
    )
    planted = []
    for i in range(5):
        px = codecs.decode(blobs[i], fmts[i])
        h, w = px.shape[0], px.shape[1]
        for tag, crop in (("tl", px[: h // 2, : w // 2]),
                          ("br", px[h // 2 :, w // 2 :])):
            cid = f"crop_{tag}_{ids[i]}"
            ids.append(cid)
            blobs.append(codecs.encode(crop, "raw"))
            ws.append(crop.shape[1])
            hs.append(crop.shape[0])
            fmts.append("raw")
            caps.append("")
            ph.append(0)
            planted.append((ids[i], cid, tag))
    out = tmp_path_factory.mktemp("cropcorpus") / "images.parquet"
    pq.write_table(
        pa.table({"image_id": ids, "bytes": pa.array(blobs, pa.binary()),
                  "w": pa.array(ws, pa.int32()), "h": pa.array(hs, pa.int32()),
                  "fmt": fmts, "caption": caps,
                  "phash": pa.array(ph, pa.int64())}),
        str(out),
    )
    return str(out), planted, n


def test_planted_quadrant_crops_found(crop_corpus):
    from dedup_ray.pipelines.neardup import quadrant_crop_pairs

    path, planted, n_orig = crop_corpus
    df = quadrant_crop_pairs(path).to_pandas()
    got = set(map(tuple, df[["a", "b", "role_a", "role_b"]].values))
    for orig, crop, tag in planted:
        a, b = sorted([orig, crop])
        ra, rb = (tag, "full") if a == orig else ("full", tag)
        assert (a, b, ra, rb) in got, (a, b, ra, rb)

    # control: pairs NOT involving a planted crop can only be generator
    # duplicate-family images whose whole frames are pixel-identical —
    # those match region-for-region (role_a == role_b), never
    # full-vs-quadrant (which would need a size-changing crop we did not
    # plant)
    crops = {c for _, c, _ in planted}
    for a, b, ra, rb in got:
        if a in crops or b in crops:
            continue
        assert ra == rb, (a, b, ra, rb)
