"""Deterministic synthetic audio/video corpora for the multimodal stages
(the input_hint pattern extended to clips/videos: no external data; content
is a pure function of the seed — reference benchmark/generator.py:24-28)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from dedup_ray.functions.av import encode_fvc, encode_wav


def generate_clips(out_dir: str, n_clips: int = 200, seed: int = 42,
                   sr: int = 8000) -> str:
    """clips table: (clip_id, bytes=WAV PCM16, sr, n_samples). Seeded tone +
    noise mixtures, 0.05-0.5 s each. Cached by path."""
    path = os.path.join(out_dir, "clips.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    ids, blobs, ns = [], [], []
    for i in range(n_clips):
        n = int(rng.integers(sr // 20, sr // 2))
        t = np.arange(n) / sr
        f0 = float(rng.uniform(80, 2000))
        sig = (
            0.6 * np.sin(2 * np.pi * f0 * t)
            + 0.2 * np.sin(2 * np.pi * 2 * f0 * t)
            + 0.1 * rng.standard_normal(n)
        )
        sig /= max(1.0, np.abs(sig).max())
        ids.append(f"clip_{i:06d}")
        blobs.append(encode_wav(sig, sr))
        ns.append(n)
    tmp = path + ".tmp"
    pq.write_table(
        pa.table(
            {
                "clip_id": pa.array(ids, type=pa.string()),
                "bytes": pa.array(blobs, type=pa.binary()),
                "sr": pa.array([sr] * n_clips, type=pa.int32()),
                "n_samples": pa.array(ns, type=pa.int64()),
            }
        ),
        tmp, row_group_size=64, compression="none",
    )
    os.rename(tmp, path)
    return path


def generate_videos(out_dir: str, n_videos: int = 40, seed: int = 42,
                    frames_min: int = 20, frames_max: int = 90,
                    side: int = 24) -> str:
    """videos table: (video_id, bytes=fvc container, n_frames, fps). Frames
    are seeded gradient+noise images in the engine's raw format."""
    path = os.path.join(out_dir, "videos.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed + 1)
    ids, blobs, nf = [], [], []
    for i in range(n_videos):
        n = int(rng.integers(frames_min, frames_max + 1))
        base = rng.integers(0, 256, (side, side, 3), dtype=np.uint8)
        frames = []
        for k in range(n):
            drift = ((base.astype(np.int64) + 3 * k) % 256).astype(np.uint8)
            frames.append(drift)
        ids.append(f"vid_{i:05d}")
        blobs.append(encode_fvc(frames, fmt="raw", fps=30.0))
        nf.append(n)
    tmp = path + ".tmp"
    pq.write_table(
        pa.table(
            {
                "video_id": pa.array(ids, type=pa.string()),
                "bytes": pa.array(blobs, type=pa.binary()),
                "n_frames": pa.array(nf, type=pa.int32()),
                "fps": pa.array([30.0] * n_videos, type=pa.float64()),
            }
        ),
        tmp, row_group_size=8, compression="none",
    )
    os.rename(tmp, path)
    return path


def generate_videos_with_dups(
    out_dir: str, n_videos: int = 40, dup_ratio: float = 0.3, seed: int = 42,
    frames_min: int = 20, frames_max: int = 90, side: int = 24,
) -> str:
    """videos table with PLANTED near-duplicates: a dup row is a trimmed
    copy of an earlier original (10–30% of leading/trailing frames cut), so
    its frame-content set overlaps the source's heavily but not fully —
    the video analog of the image corpus's planted near-dup classes.
    Ground truth: ``gt_source`` column ('' for originals). Cached by path."""
    path = os.path.join(out_dir, "videos_dups.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed + 2)
    ids, blobs, nf, gt = [], [], [], []
    originals: list[tuple[str, list]] = []
    for i in range(n_videos):
        make_dup = originals and rng.random() < dup_ratio
        if make_dup:
            src_id, src_frames = originals[int(rng.integers(len(originals)))]
            cut = max(1, int(len(src_frames) * rng.uniform(0.1, 0.3)))
            frames = src_frames[cut:] if rng.random() < 0.5 else src_frames[:-cut]
            gt.append(src_id)
        else:
            n = int(rng.integers(frames_min, frames_max + 1))
            base = rng.integers(0, 256, (side, side, 3), dtype=np.uint8)
            frames = [
                ((base.astype(np.int64) + 3 * k) % 256).astype(np.uint8)
                for k in range(n)
            ]
            gt.append("")
        vid = f"vid_{i:05d}"
        if not gt[-1]:
            originals.append((vid, frames))
        ids.append(vid)
        blobs.append(encode_fvc(frames, fmt="raw", fps=30.0))
        nf.append(len(frames))
    tmp = path + ".tmp"
    pq.write_table(
        pa.table(
            {
                "video_id": pa.array(ids, type=pa.string()),
                "bytes": pa.array(blobs, type=pa.binary()),
                "n_frames": pa.array(nf, type=pa.int32()),
                "fps": pa.array([30.0] * n_videos, type=pa.float64()),
                "gt_source": pa.array(gt, type=pa.string()),
            }
        ),
        tmp, row_group_size=8, compression="none",
    )
    os.rename(tmp, path)
    return path
