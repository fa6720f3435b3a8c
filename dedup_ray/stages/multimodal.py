"""Multimodal column operators: decode / feature-extract / resize /
frame-sample as actor-pool map_batches stages.

Images are REAL here (our own codecs); audio/video decode is STUBBED behind
NotImplementedError per the build contract (no codec libs in this container)
— but the Ray-side plumbing (schema, batch size, actor signature, output
layout) is genuine and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from dedup_ray.functions import codecs


class ImageDecoder:
    """bytes+fmt -> decoded stats / features. Real decode via the engine's
    codecs; per-actor state is just the dispatch table (cheap), but the
    class shape is where a real model/codec handle would live."""

    def __init__(self, features: bool = True) -> None:
        self.features = features

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch["bytes"]
        fmts = batch["fmt"].to_pylist()
        n = batch.num_rows
        mean_r = np.zeros(n); mean_g = np.zeros(n); mean_b = np.zeros(n)
        std = np.zeros(n); ok = np.ones(n, dtype=bool)
        for i in range(n):
            try:
                px = codecs.decode(data[i].as_py(), fmts[i])
                mean_r[i], mean_g[i], mean_b[i] = px.reshape(-1, 3).mean(axis=0)
                std[i] = px.std()
            except Exception:
                ok[i] = False
        out = pa.table(
            {
                "image_id": batch["image_id"],
                "decode_ok": pa.array(ok),
                "mean_r": pa.array(np.round(mean_r, 3)),
                "mean_g": pa.array(np.round(mean_g, 3)),
                "mean_b": pa.array(np.round(mean_b, 3)),
                "pixel_std": pa.array(np.round(std, 3)),
            }
        )
        return out


class ImageResizer:
    """bytes -> resized bytes (block-average downsample to <= max_side),
    re-encoded in the same format. Output schema mirrors the input corpus so
    resized tables feed the same pipelines."""

    def __init__(self, max_side: int = 16) -> None:
        self.max_side = max_side

    def _resize(self, px: np.ndarray) -> np.ndarray:
        h, w, _ = px.shape
        s = max(1, int(np.ceil(max(h, w) / self.max_side)))
        if s == 1:
            return px
        th, tw = h // s * s, w // s * s
        view = px[:th, :tw].reshape(th // s, s, tw // s, s, 3)
        return view.mean(axis=(1, 3)).round().astype(np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch["bytes"]
        fmts = batch["fmt"].to_pylist()
        out_b, out_w, out_h = [], [], []
        for i in range(batch.num_rows):
            px = self._resize(codecs.decode(data[i].as_py(), fmts[i]))
            out_b.append(codecs.encode(px, fmts[i]))
            out_h.append(px.shape[0])
            out_w.append(px.shape[1])
        return pa.table(
            {
                "image_id": batch["image_id"],
                "bytes": pa.array(out_b, type=pa.binary()),
                "w": pa.array(out_w, type=pa.int32()),
                "h": pa.array(out_h, type=pa.int32()),
                "fmt": batch["fmt"],
            }
        )


class AudioFeatureStub:
    """Audio decode/feature stage CONTRACT. The container has no audio
    codecs, so __call__ raises NotImplementedError by design; the schema and
    actor wiring are real (swap in a decoder on a cluster with libs)."""

    OUTPUT_SCHEMA = pa.schema(
        [("clip_id", pa.string()), ("duration_s", pa.float64()),
         ("rms", pa.float64()), ("mfcc", pa.list_(pa.float32()))]
    )

    def __init__(self, sample_rate: int = 16000) -> None:
        self.sample_rate = sample_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "audio decode requires codec libs absent from this environment; "
            "this stage defines the schema/actor contract only"
        )


class VideoFrameSamplerStub:
    """Video frame-sampling stage CONTRACT (stub — see AudioFeatureStub)."""

    OUTPUT_SCHEMA = pa.schema(
        [("video_id", pa.string()), ("frame_idx", pa.int32()),
         ("frame_bytes", pa.binary())]
    )

    def __init__(self, every_n: int = 30) -> None:
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "video decode requires codec libs absent from this environment; "
            "this stage defines the schema/actor contract only"
        )


def image_features(images: rd.Dataset, concurrency=(1, 4)) -> rd.Dataset:
    return images.map_batches(
        ImageDecoder, batch_format="pyarrow", batch_size=1024, concurrency=concurrency
    )


def resize_images(images: rd.Dataset, max_side: int = 16, concurrency=(1, 4)) -> rd.Dataset:
    return images.map_batches(
        ImageResizer,
        fn_constructor_args=(max_side,),
        batch_format="pyarrow",
        batch_size=512,
        concurrency=concurrency,
    )
