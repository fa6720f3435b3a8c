"""Audio/video multimodal stages: real WAV decode + features, fvc frame
sampling — codec roundtrips unit-level, stages end-to-end over the
deterministic synthetic corpora."""

import numpy as np
import pytest
import ray.data as rd

from dedup_ray.functions.av import (
    audio_features,
    decode_wav,
    encode_fvc,
    encode_wav,
    fvc_frame_count,
    iter_fvc_frames,
)
from dedup_ray.functions import codecs


def test_wav_roundtrip_mono():
    sr = 8000
    t = np.arange(sr // 4) / sr
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    out, sr2 = decode_wav(encode_wav(sig, sr))
    assert sr2 == sr
    assert out.shape == sig.shape
    assert np.abs(out - sig).max() < 1e-3  # PCM16 quantization only


def test_wav_stereo_downmixes():
    sr = 8000
    st = np.stack([np.ones(100) * 0.5, -np.ones(100) * 0.5], axis=1)
    out, _ = decode_wav(encode_wav(st, sr))
    assert np.abs(out).max() < 1e-3  # L+R cancel


def test_audio_features_shape_and_determinism():
    sr = 8000
    sig = np.sin(2 * np.pi * 100 * np.arange(sr) / sr)
    f1 = audio_features(sig, sr)
    f2 = audio_features(sig, sr)
    assert f1["duration_s"] == pytest.approx(1.0)
    assert 0 < f1["rms"] < 1
    assert f1["zcr"] == f2["zcr"]
    assert f1["band_energy"].shape == (8,)
    assert f1["band_energy"].sum() == pytest.approx(1.0, abs=1e-3)


def test_fvc_roundtrip_and_sampling():
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) for _ in range(7)]
    blob = encode_fvc(frames, fmt="raw", fps=30.0)
    n, fps = fvc_frame_count(blob)
    assert (n, fps) == (7, 30.0)
    got = list(iter_fvc_frames(blob))
    assert [i for i, _ in got] == list(range(7))
    assert all(
        np.array_equal(codecs.decode(b, "raw"), f) for (_, b), f in zip(got, frames)
    )


def test_audio_stage_over_synthetic_corpus(tmp_path):
    from dedup_ray.sources.av_corpus import generate_clips
    from dedup_ray.stages.multimodal import audio_feature_extract

    path = generate_clips(str(tmp_path), n_clips=20)
    out = audio_feature_extract(rd.read_parquet(path)).to_pandas()
    assert len(out) == 20
    assert (out["duration_s"] > 0).all()
    assert (out["rms"] > 0).all()
    assert out["band_energy"].map(len).eq(8).all()


def test_video_stage_over_synthetic_corpus(tmp_path):
    from dedup_ray.sources.av_corpus import generate_videos
    from dedup_ray.stages.multimodal import sample_video_frames

    path = generate_videos(str(tmp_path), n_videos=5)
    vids = rd.read_parquet(path)
    meta = vids.select_columns(["video_id", "n_frames"]).to_pandas()
    out = sample_video_frames(vids, every_n=10).to_pandas()
    expect = int(np.ceil(meta["n_frames"] / 10).sum())
    assert len(out) == expect
    assert (out["frame_idx"] % 10 == 0).all()
    # sampled frames decode back to valid images
    fb = out["frame_bytes"].iloc[0]
    px = codecs.decode(fb, "raw")
    assert px.shape == (24, 24, 3)


def test_unreadable_clip_dropped(tmp_path):
    import pyarrow as pa

    from dedup_ray.stages.multimodal import AudioFeatures

    b = pa.table(
        {
            "clip_id": pa.array(["good", "bad"]),
            "bytes": pa.array(
                [encode_wav(np.zeros(100), 8000), b"not a wav"], type=pa.binary()
            ),
        }
    )
    out = AudioFeatures()(b)
    assert out["clip_id"].to_pylist() == ["good"]


def test_audio_similarity_search_matches_bruteforce(ray_session):
    import numpy as np
    import ray.data as rd

    from dedup_ray.sources.av_corpus import generate_clips
    from dedup_ray.stages.multimodal import (
        audio_feature_extract,
        audio_similarity_search,
    )

    feats_ds = audio_feature_extract(
        rd.read_parquet(generate_clips("/tmp/dedup_ray_av_simtest"))
    ).materialize()
    got = audio_similarity_search(feats_ds, n_queries=3, k=5).to_pandas()
    assert (got.groupby("query_id")["rank"].max() == 5).all()
    assert (got.query_id != got.clip_id).all()

    # brute force over the same features
    f = feats_ds.to_pandas().sort_values("clip_id").reset_index(drop=True)
    m = np.asarray(list(f.band_energy), dtype=np.float64)
    ids = f.clip_id.to_numpy()
    for qid in got.query_id.unique():
        qi = np.flatnonzero(ids == qid)[0]
        d = ((m - m[qi]) ** 2).sum(axis=1)
        d[qi] = np.inf
        order = np.lexsort((ids, d))[:5]
        want = list(ids[order])
        have = got[got.query_id == qid].sort_values("rank").clip_id.tolist()
        assert have == want, (qid, have, want)


def test_video_neardup_clusters_match_planted(ray_session, tmp_path):
    """Trimmed-copy videos must cluster with their source (recall) and
    unrelated videos must stay apart (precision) — ground truth from the
    generator's gt_source column."""
    import pyarrow.parquet as pq

    import ray.data as rd
    from dedup_ray.sources.av_corpus import generate_videos_with_dups
    from dedup_ray.stages.multimodal import video_neardup_clusters

    path = generate_videos_with_dups(str(tmp_path), n_videos=40, dup_ratio=0.4)
    got = video_neardup_clusters(
        rd.read_parquet(path), every_n=3, jaccard_threshold=0.5
    ).to_pandas()
    cl = dict(zip(got.video_id, got.cluster_id))

    gt = pq.read_table(path, columns=["video_id", "gt_source"]).to_pydict()
    planted = [(v, s) for v, s in zip(gt["video_id"], gt["gt_source"]) if s]
    assert planted  # the generator actually planted dups
    # recall: every (copy, source) pair lands in the same cluster
    for v, s in planted:
        assert cl.get(v) is not None and cl.get(v) == cl.get(s), (v, s)
    # precision: clusters contain ONLY one source lineage
    lineage = {v: (s or v) for v, s in zip(gt["video_id"], gt["gt_source"])}
    by_cluster: dict = {}
    for v, c in cl.items():
        by_cluster.setdefault(c, set()).add(lineage[v])
    assert all(len(s) == 1 for s in by_cluster.values()), by_cluster
    # originals with no copy stay unclustered (singleton suppression)
    copied = {s for _, s in planted}
    for v, s in zip(gt["video_id"], gt["gt_source"]):
        if not s and v not in copied:
            assert v not in cl, v
