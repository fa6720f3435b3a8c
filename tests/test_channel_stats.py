"""Dataset-level per-channel normalization stats vs a single-process
decode replay — the integer-moment fold makes the comparison exact."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from dedup_ray.functions import codecs
from dedup_ray.stages.multimodal import ChannelStatsPartial, channel_stats


def test_partial_counts_unreadable_and_sums_exactly():
    px = np.random.default_rng(1).integers(0, 256, (7, 5, 3), dtype=np.uint8)
    b = pa.table(
        {
            "image_id": pa.array(["a", "bad"]),
            "bytes": pa.array(
                [codecs.encode(px, "raw"), b"\x00"], type=pa.binary()
            ),
            "fmt": pa.array(["raw", "png"]),
        }
    )
    t = ChannelStatsPartial()(b)
    assert t["pn_bad"][0].as_py() == 1
    assert t["pn_px"][0].as_py() == 35
    flat = px.reshape(-1, 3).astype(np.int64)
    for j, c in enumerate("rgb"):
        assert t[f"ps_{c}"][0].as_py() == int(flat[:, j].sum())
        assert t[f"pq_{c}"][0].as_py() == int((flat[:, j] ** 2).sum())


def test_channel_stats_match_single_process_decode(ray_session, tiny_corpus):
    import ray.data as rd

    path = os.path.join(tiny_corpus, "images.parquet")
    out = channel_stats(rd.read_parquet(path)).to_pandas()
    assert list(out["channel"]) == ["r", "g", "b"]

    t = pq.read_table(path, columns=["bytes", "fmt"])
    s = [0, 0, 0]
    q = [0, 0, 0]
    n_px = 0
    for i in range(t.num_rows):
        px = codecs.decode(t["bytes"][i].as_py(), t["fmt"][i].as_py())
        flat = px.reshape(-1, 3).astype(np.int64)
        n_px += flat.shape[0]
        for j in range(3):
            s[j] += int(flat[:, j].sum())
            q[j] += int((flat[:, j] ** 2).sum())
    assert int(out["n_pixels"].iloc[0]) == n_px
    for j in range(3):
        mean = s[j] / n_px
        std = float(np.sqrt(q[j] / n_px - (s[j] / n_px) ** 2))
        # integer moments -> the driver fold is exact, not approximate
        assert out["mean"].iloc[j] == mean
        assert out["std"].iloc[j] == std
