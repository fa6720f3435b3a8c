"""Multimodal column operators: decode / feature-extract / resize /
frame-sample as actor-pool map_batches stages.

Images are REAL (our own codecs). Audio is REAL for WAV PCM16 (stdlib wave +
numpy, functions/av.py). Video sampling is real over the engine's documented
``fvc`` frame container (no standard video codec is self-implementable in a
no-libs container; the decode seam is one function swap on a real cluster).
All payloads ride as opaque ``binary`` columns with typed metadata.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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


class ImageHistogram:
    """bytes+fmt -> normalized 3x8-bin RGB color histogram (24 floats per
    image): the classic cheap content descriptor for color-based similarity
    search — resolution-independent (normalized by pixel count) and
    rotation/flip-invariant by construction. Vectorized per image: one
    bincount per channel over the top-3 bits."""

    OUTPUT_SCHEMA = pa.schema(
        [("image_id", pa.string()), ("hist", pa.list_(pa.float32()))]
    )

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch["bytes"]
        fmts = batch["fmt"].to_pylist()
        ids, hists = [], []
        for i in range(batch.num_rows):
            try:
                px = codecs.decode(data[i].as_py(), fmts[i])
            except Exception:
                continue
            npx = px.shape[0] * px.shape[1]
            h = np.concatenate(
                [
                    np.bincount((px[:, :, c] >> 5).ravel(), minlength=8)
                    for c in range(3)
                ]
            ).astype(np.float32) / np.float32(npx)
            ids.append(batch["image_id"][i].as_py())
            hists.append(h)
        return pa.table(
            {
                "image_id": pa.array(ids, type=pa.string()),
                "hist": pa.array(
                    [h.tolist() for h in hists], type=pa.list_(pa.float32())
                ),
            }
        )


def image_histogram_search(
    images: rd.Dataset, n_queries: int = 5, k: int = 5
) -> rd.Dataset:
    """Color-based image similarity search: for each of the ``n_queries``
    query images (lexicographically-smallest image_ids), the ``k`` nearest
    images by L2 distance over the normalized RGB histogram:
    (query_id, image_id, rank), self-matches excluded.

    Scale shape: identical to ``audio_similarity_search`` / ann_topk — the
    feature extraction is one actor-pool pass (bytes never leave the decode
    task), the tiny query matrix broadcasts via ray.put, each batch emits a
    LOCAL top-k, and the driver merges k·queries·blocks rows."""
    import ray

    feats = images.map_batches(
        ImageHistogram, batch_format="pyarrow", batch_size=512,
        concurrency=(1, 4),
    ).materialize()  # consumed twice: query pick + scan

    def local_min(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(b, sort_keys=[("image_id", "ascending")])
        return b.take(idx[:n_queries])

    q = (
        feats.map_batches(local_min, batch_format="pyarrow")
        .sort("image_id")
        .limit(n_queries)
        .take_all()
    )
    q_ids = [r["image_id"] for r in q]
    q_mat = np.asarray([r["hist"] for r in q], dtype=np.float64)
    ref = ray.put((q_ids, q_mat))

    def block(b: pa.Table) -> pa.Table:
        qi, qm = ray.get(ref)
        ids = np.asarray(b["image_id"].to_pylist(), dtype=object)
        col = b["hist"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        m = col.flatten().to_numpy(zero_copy_only=False).reshape(
            len(ids), -1
        ).astype(np.float64)
        out_q, out_c, out_d = [], [], []
        take = min(k + 1, len(ids))
        for row in range(len(qi)):
            d = ((m - qm[row]) ** 2).sum(axis=1)
            idx = np.argpartition(d, take - 1)[:take]
            out_q.extend([qi[row]] * len(idx))
            out_c.extend(ids[i] for i in idx)
            out_d.extend(float(d[i]) for i in idx)
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.string()),
                "image_id": pa.array(out_c, type=pa.string()),
                "dist": pa.array(out_d, type=pa.float64()),
            }
        )

    local = feats.map_batches(
        block, batch_format="pyarrow", batch_size=4096
    ).to_pandas()
    local = local[local.query_id != local.image_id]
    local = local.sort_values(
        ["query_id", "dist", "image_id"], ascending=[True, True, True]
    )
    top = local.groupby("query_id", as_index=False).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return rd.from_pandas(
        top[["query_id", "image_id", "rank"]].reset_index(drop=True)
    )


class AudioFeatures:
    """Audio decode + feature stage — REAL for WAV PCM16 (stdlib ``wave`` +
    numpy, functions/av.py): per clip, duration, RMS, zero-crossing rate and
    8 log-spaced FFT band energies. Unreadable clips are dropped + counted
    (the validity-filter rule, reference src/hasher.rs:56-60). Other
    containers (mp3/flac/ogg) need codec libs absent here and raise at
    decode — swap the decoder on a cluster that has them."""

    OUTPUT_SCHEMA = pa.schema(
        [("clip_id", pa.string()), ("duration_s", pa.float64()),
         ("rms", pa.float64()), ("zcr", pa.float64()),
         ("band_energy", pa.list_(pa.float32()))]
    )

    def __init__(self, n_bands: int = 8) -> None:
        self.n_bands = n_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        from dedup_ray.functions.av import audio_features, decode_wav

        ids = batch["clip_id"].to_pylist()
        data = batch["bytes"]
        rows = {k: [] for k in ("clip_id", "duration_s", "rms", "zcr", "band_energy")}
        dropped = 0
        for i, cid in enumerate(ids):
            try:
                samples, sr = decode_wav(data[i].as_py())
                f = audio_features(samples, sr, self.n_bands)
            except Exception:
                dropped += 1
                continue
            rows["clip_id"].append(cid)
            rows["duration_s"].append(f["duration_s"])
            rows["rms"].append(f["rms"])
            rows["zcr"].append(f["zcr"])
            rows["band_energy"].append(f["band_energy"])
        if dropped:
            from dedup_ray.state.metrics import inc_counter

            inc_counter("clips_dropped_unreadable", dropped)
        return pa.table(
            {
                "clip_id": pa.array(rows["clip_id"], type=pa.string()),
                "duration_s": pa.array(rows["duration_s"], type=pa.float64()),
                "rms": pa.array(rows["rms"], type=pa.float64()),
                "zcr": pa.array(rows["zcr"], type=pa.float64()),
                "band_energy": pa.array(rows["band_energy"], type=pa.list_(pa.float32())),
            }
        )


class VideoFrameSampler:
    """Video frame sampling — REAL over the engine's documented ``fvc``
    frame container (functions/av.py; no standard video codec is
    self-implementable, so the container is ours while the sampling, decode
    seam and Ray plumbing are genuine). Emits every ``every_n``-th frame as
    (video_id, frame_idx, frame_bytes) rows WITHOUT decoding pixels —
    downstream stages decode only sampled frames."""

    OUTPUT_SCHEMA = pa.schema(
        [("video_id", pa.string()), ("frame_idx", pa.int32()),
         ("frame_bytes", pa.binary())]
    )

    def __init__(self, every_n: int = 30) -> None:
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        from dedup_ray.functions.av import iter_fvc_frames

        ids = batch["video_id"].to_pylist()
        data = batch["bytes"]
        out_id, out_idx, out_b = [], [], []
        dropped = 0
        for i, vid in enumerate(ids):
            try:
                for idx, fb in iter_fvc_frames(data[i].as_py()):
                    if idx % self.every_n == 0:
                        out_id.append(vid)
                        out_idx.append(idx)
                        out_b.append(fb)
            except Exception:
                dropped += 1
        if dropped:
            from dedup_ray.state.metrics import inc_counter

            inc_counter("videos_dropped_unreadable", dropped)
        return pa.table(
            {
                "video_id": pa.array(out_id, type=pa.string()),
                "frame_idx": pa.array(out_idx, type=pa.int32()),
                "frame_bytes": pa.array(out_b, type=pa.binary()),
            }
        )


def audio_feature_extract(clips: rd.Dataset, concurrency=(1, 4)) -> rd.Dataset:
    """clips(clip_id, bytes) -> per-clip audio features (actor pool)."""
    return clips.map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=256, concurrency=concurrency
    )


def sample_video_frames(videos: rd.Dataset, every_n: int = 30,
                        concurrency=(1, 4)) -> rd.Dataset:
    """videos(video_id, bytes) -> sampled (video_id, frame_idx, frame_bytes).
    Large binary payloads: keep batches small (SURVEY memory-aware rule)."""
    return videos.map_batches(
        VideoFrameSampler,
        fn_constructor_args=(every_n,),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
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


def audio_similarity_search(
    feats: rd.Dataset, n_queries: int = 3, k: int = 5
) -> rd.Dataset:
    """Audio similarity search over extracted features: for each of the
    ``n_queries`` query clips (lexicographically-smallest clip_ids), the
    ``k`` nearest clips by L2 distance over the band-energy spectrum
    (rms/zcr excluded: the spectrum is the timbre signature):
    (query_id, clip_id, rank), self-matches excluded.

    Scale shape: mirrors ann_topk — the tiny query matrix broadcasts via
    ray.put, each batch emits its LOCAL top-k from one vectorized distance
    computation, and a driver merge over k·queries·blocks rows finishes.
    ``feats`` must be pinned (materialize/checkpoint) if the caller also
    consumes it elsewhere."""
    import ray

    feats = feats.materialize()  # consumed twice: query pick + scan

    def local_min(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(b, sort_keys=[("clip_id", "ascending")])
        return b.take(idx[:n_queries])

    q = (
        feats.map_batches(local_min, batch_format="pyarrow")
        .sort("clip_id")
        .limit(n_queries)
        .take_all()
    )
    q_ids = [r["clip_id"] for r in q]
    q_mat = np.asarray([r["band_energy"] for r in q], dtype=np.float64)
    ref = ray.put((q_ids, q_mat))

    def block(b: pa.Table) -> pa.Table:
        qi, qm = ray.get(ref)
        ids = np.asarray(b["clip_id"].to_pylist(), dtype=object)
        col = b["band_energy"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        m = col.flatten().to_numpy(zero_copy_only=False).reshape(
            len(ids), -1
        ).astype(np.float64)
        out_q, out_c, out_d = [], [], []
        take = min(k + 1, len(ids))
        for row in range(len(qi)):
            d = ((m - qm[row]) ** 2).sum(axis=1)
            idx = np.argpartition(d, take - 1)[:take]
            out_q.extend([qi[row]] * len(idx))
            out_c.extend(ids[i] for i in idx)
            out_d.extend(float(d[i]) for i in idx)
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.string()),
                "clip_id": pa.array(out_c, type=pa.string()),
                "dist": pa.array(out_d, type=pa.float64()),
            }
        )

    local = feats.map_batches(block, batch_format="pyarrow", batch_size=4096).to_pandas()
    local = local[local.query_id != local.clip_id]
    local = local.sort_values(
        ["query_id", "dist", "clip_id"], ascending=[True, True, True]
    )
    top = local.groupby("query_id", as_index=False).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return rd.from_pandas(
        top[["query_id", "clip_id", "rank"]].reset_index(drop=True)
    )


def video_neardup_clusters(
    videos: rd.Dataset, every_n: int = 3, jaccard_threshold: float = 0.5
) -> rd.Dataset:
    """Video near-duplicate clustering — the flagship's cascade shape on the
    video modality: (cluster_id, video_id), cluster = connected component,
    id = min member. A trimmed/re-cut copy shares most of its FRAME CONTENT
    with its source even though byte blobs and frame counts differ, so:

      1. iterate frames (no pixel decode; the container iterator slices
         bytes) and digest each frame's bytes,
      2. CONTENT-ANCHORED sampling: keep a frame iff its hash ≡ 0 mod
         ``every_n`` — the winnowing trick. Index-based sampling
         (idx % n) breaks under a leading trim (the copy's sampled indices
         hit different CONTENT); anchoring the choice to the hash makes
         the selected set shift-invariant, so source and trimmed copy
         select the same surviving frames,
      3. candidates = videos sharing >= 1 frame hash: explode
         (frame_hash, video_id), ONE grouped_runs emits co-bucket pairs,
      4. verify = exact Jaccard over the two frame-hash sets, computed
         DISTRIBUTED from shared-frame counts + broadcast per-video set
         sizes (never the sets themselves),
      5. union-find over surviving pairs (driver path; edges are dup-rate
         bounded like the flagship's).

    Scale shape: only (hash, id) rows shuffle; frame bytes never leave the
    sampler task. Hot frame hashes (e.g. black frames) would get the LSH
    stage's cap/salt treatment — out of scope for the synthetic corpus,
    documented."""
    import hashlib

    import ray

    from dedup_ray.stages.grouped import (
        drop_sorted_dup_pairs,
        grouped_runs,
        merge_partial_counts,
        run_starts,
    )

    sampled = sample_video_frames(videos, every_n=1)  # all frames; see 2.

    def frame_hashes(b: pa.Table) -> pa.Table:
        ids = b["video_id"].to_pylist()
        data = b["frame_bytes"]
        out_h, out_v = [], []
        for i in range(b.num_rows):
            h = hashlib.blake2b(data[i].as_py(), digest_size=16).hexdigest()
            if int(h[:8], 16) % every_n == 0:  # content-anchored selection
                out_h.append(h)
                out_v.append(ids[i])
        return pa.table(
            {"fh": pa.array(out_h, type=pa.string()),
             "video_id": pa.array(out_v, type=pa.string())}
        )

    fh = sampled.map_batches(
        frame_hashes, batch_format="pyarrow", batch_size=256
    ).materialize()  # consumed twice: set sizes + pair generation

    # per-video sampled-frame-set sizes: GLOBAL distinct hashes per video.
    # One grouped_runs on video_id (the run holds every row of a video, so
    # within-run distinct IS global distinct) — a per-batch distinct summed
    # driver-side would double-count a repeated frame whose occurrences
    # span blocks and silently deflate Jaccard (review finding).
    def size_runs(g: pa.Table) -> pa.Table:
        v = np.asarray(g["video_id"].to_pylist(), dtype=object)
        f = np.asarray(g["fh"].to_pylist(), dtype=object)
        starts = run_starts(v)
        if starts.size == 0:
            return pa.table({"v": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        new_pair = np.ones(len(v), dtype=bool)  # sorted by (video, fh)
        new_pair[1:] = (v[1:] != v[:-1]) | (f[1:] != f[:-1])
        bounds = np.append(starts, len(v))
        n_distinct = np.add.reduceat(new_pair.astype(np.int64), starts)
        return pa.table(
            {"v": pa.array(v[starts], type=pa.string()),
             "n": pa.array(n_distinct[: len(bounds) - 1], type=pa.int64())}
        )

    parts = [t for t in ray.get(
        grouped_runs(fh, "video_id", size_runs, sort_cols=["video_id", "fh"])
        .to_arrow_refs()
    ) if t.num_rows and "v" in t.column_names]
    if not parts:
        return rd.from_arrow(
            pa.schema([("cluster_id", pa.string()), ("video_id", pa.string())])
            .empty_table()
        )
    cat = pa.concat_tables(parts)
    sizes_v, sizes_n = merge_partial_counts(
        np.asarray(cat["v"].to_pylist(), dtype=object),
        cat["n"].to_numpy(zero_copy_only=False),
    )
    sizes_ref = ray.put((sizes_v, sizes_n))

    def pairs_of_runs(g: pa.Table) -> pa.Table:
        f = np.asarray(g["fh"].to_pylist(), dtype=object)
        v = np.asarray(g["video_id"].to_pylist(), dtype=object)
        bounds = np.append(run_starts(f), len(f))
        out_a, out_b = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            vids = np.unique(v[s:e])
            if len(vids) < 2:
                continue
            ai, bi = np.triu_indices(len(vids), k=1)
            out_a.append(vids[ai])
            out_b.append(vids[bi])
        if not out_a:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "shared": pa.array([], pa.int64())})
        a = np.concatenate(out_a)
        bb = np.concatenate(out_b)
        # pre-reduce within the bucket: same pair may share many frames
        order = np.lexsort((bb, a))
        a, bb = a[order], bb[order]
        new = np.ones(len(a), dtype=bool)
        new[1:] = (a[1:] != a[:-1]) | (bb[1:] != bb[:-1])
        starts = np.flatnonzero(new)
        return pa.table(
            {"a": pa.array(a[starts], type=pa.string()),
             "b": pa.array(bb[starts], type=pa.string()),
             "shared": pa.array(
                 np.diff(np.append(starts, len(a))), type=pa.int64()
             )}
        )

    pair_partials = grouped_runs(fh, "fh", pairs_of_runs, sort_cols=["fh", "video_id"])

    # merge per-bucket partial shared-counts (a pair can co-occur in many
    # frame-hash buckets, one partial row per bucket) and verify Jaccard
    def verify(g: pa.Table) -> pa.Table:
        sv, sn = ray.get(sizes_ref)
        a = np.asarray(g["a"].to_pylist(), dtype=object)
        b = np.asarray(g["b"].to_pylist(), dtype=object)
        sh = g["shared"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b, sh = a[order], b[order], sh[order]
        new = np.ones(len(a), dtype=bool)
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(new)
        tot = np.add.reduceat(sh, starts) if len(sh) else sh
        ua, ub = a[starts], b[starts]
        na = sn[np.searchsorted(sv, ua)]
        nb = sn[np.searchsorted(sv, ub)]
        jac = tot / (na + nb - tot)
        keep = jac >= jaccard_threshold
        return pa.table(
            {"src_id": pa.array(ua[keep], type=pa.string()),
             "dst_id": pa.array(ub[keep], type=pa.string())}
        )

    # key partials by the pair (a is a fine shuffle key: all rows of a pair
    # share it) so verify sees every partial of a pair together
    edges = grouped_runs(pair_partials, "a", verify, sort_cols=["a", "b"])

    from dedup_ray.config import DedupConfig
    from dedup_ray.stages.cluster import cluster_stage

    clusters = cluster_stage(edges, DedupConfig())
    return grouped_runs(
        clusters.map_batches(
            lambda t: t.rename_columns(["cluster_id", "video_id"]),
            batch_format="pyarrow",
        ),
        "cluster_id",
        lambda g: drop_sorted_dup_pairs(g, "cluster_id", "video_id"),
        sort_cols=["cluster_id", "video_id"],
    )


class ChannelStatsPartial:
    """bytes+fmt -> ONE partial row of exact integer per-channel pixel
    moments (sum, sum-of-squares, count): uint8 pixels make both moments
    exact int64s, so the dataset-level mean/std fold is order-independent
    and deterministic no matter how blocks land. Actor-pool stage: the
    codec dispatch lives per actor, decode is the per-row work."""

    SCHEMA = pa.schema(
        [("pn_px", pa.int64()), ("pn_bad", pa.int64())]
        + [(f"ps_{c}", pa.int64()) for c in "rgb"]
        + [(f"pq_{c}", pa.int64()) for c in "rgb"]
    )

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch["bytes"]
        fmts = batch["fmt"].to_pylist()
        s = np.zeros(3, dtype=np.int64)
        q = np.zeros(3, dtype=np.int64)
        n_px = 0
        n_bad = 0
        for i in range(batch.num_rows):
            try:
                px = codecs.decode(data[i].as_py(), fmts[i])
            except Exception:
                n_bad += 1
                continue
            flat = px.reshape(-1, 3).astype(np.int64)
            s += flat.sum(axis=0)
            q += (flat * flat).sum(axis=0)
            n_px += flat.shape[0]
        vals = [n_px, n_bad, *s.tolist(), *q.tolist()]
        return pa.table(
            {f.name: pa.array([v], pa.int64())
             for f, v in zip(self.SCHEMA, vals)}
        )


def channel_stats(images: rd.Dataset, concurrency=(1, 8)) -> pa.Table:
    """Dataset-level per-channel normalization constants — (channel, mean,
    std, n_pixels): the mean/std every vision-training pipeline computes
    once over its corpus to normalize inputs (the ImageNet-constants
    job). One streaming decode pass; each batch collapses to a single
    8-int partial row (exact integer moments), the driver folds Python
    ints — overflow-free at any corpus size — and does the two float
    divisions + sqrt once at the end. Rows-only registry entry (sqrt and
    the decode are non-SQL); pytest replays a single-process decode."""
    import ray

    parts = images.map_batches(
        ChannelStatsPartial,
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=concurrency,
    )
    n_px = 0
    n_bad = 0
    s = [0, 0, 0]
    q = [0, 0, 0]
    for t in ray.get(parts.to_arrow_refs()):
        if t.num_rows and "pn_px" in t.column_names:
            n_px += int(pc.sum(t["pn_px"]).as_py() or 0)
            n_bad += int(pc.sum(t["pn_bad"]).as_py() or 0)
            for j, c in enumerate("rgb"):
                s[j] += int(pc.sum(t[f"ps_{c}"]).as_py() or 0)
                q[j] += int(pc.sum(t[f"pq_{c}"]).as_py() or 0)
    out_schema = pa.schema(
        [("channel", pa.string()), ("mean", pa.float64()),
         ("std", pa.float64()), ("n_pixels", pa.int64()),
         ("n_unreadable", pa.int64())]
    )
    if n_px == 0:
        return out_schema.empty_table()
    means = [s[j] / n_px for j in range(3)]
    stds = [
        float(np.sqrt(q[j] / n_px - (s[j] / n_px) ** 2)) for j in range(3)
    ]
    return pa.table(
        {"channel": pa.array(["r", "g", "b"], pa.string()),
         "mean": pa.array(means, pa.float64()),
         "std": pa.array(stds, pa.float64()),
         "n_pixels": pa.array([n_px] * 3, pa.int64()),
         "n_unreadable": pa.array([n_bad] * 3, pa.int64())}
    )
