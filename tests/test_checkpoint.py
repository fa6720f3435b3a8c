"""Checkpoint/resume (north_rule: resumable from checkpoint at any stage
boundary with byte-identical output — generalizes the reference's
crash-recovery apply tests, src/actions.rs:258-325)."""

import json
import os
import shutil

import pytest

from dedup_ray.config import DedupConfig
from dedup_ray.pipelines.neardup import run_neardup


def _clusters_df(res):
    return (
        res.clusters.to_pandas()
        .sort_values(["cluster_id", "image_id"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def ckpt_run(tiny_corpus, tmp_path_factory):
    ck = str(tmp_path_factory.mktemp("ck") / "run1")
    res = run_neardup(os.path.join(tiny_corpus, "images.parquet"), checkpoint_dir=ck)
    return ck, _clusters_df(res), res


def test_manifest_written(ckpt_run):
    ck, _, res = ckpt_run
    with open(os.path.join(ck, "manifest.json")) as f:
        manifest = json.load(f)
    stages = manifest["stages"]
    assert set(stages) == {
        "keys", "exact_tier", "signatures", "candidates", "edges_near", "clusters",
    }
    for name, entry in stages.items():
        assert entry["rows"] >= 0
        assert entry["config_hash"] == manifest["config_hash"]
    assert stages["keys"]["inputs"] == ["input"]
    assert os.path.exists(os.path.join(ck, "report.json"))


def test_full_resume_identical(ckpt_run, tiny_corpus):
    ck, first, _ = ckpt_run
    res2 = run_neardup(os.path.join(tiny_corpus, "images.parquet"), checkpoint_dir=ck)
    assert _clusters_df(res2).equals(first)


def test_mid_run_kill_resume(ckpt_run, tiny_corpus, tmp_path):
    """Simulate a crash after the signature stage: later stage outputs and
    manifest entries vanish; resume must rebuild only the tail and produce
    byte-identical clusters."""
    ck, first, _ = ckpt_run
    ck2 = str(tmp_path / "killed")
    shutil.copytree(ck, ck2)
    with open(os.path.join(ck2, "manifest.json")) as f:
        manifest = json.load(f)
    for dead in ("candidates", "edges_near", "clusters"):
        manifest["stages"].pop(dead)
        shutil.rmtree(os.path.join(ck2, dead))
    # leave a partial temp dir behind, like a true mid-write crash
    os.makedirs(os.path.join(ck2, "candidates.tmp"))
    with open(os.path.join(ck2, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    res = run_neardup(os.path.join(tiny_corpus, "images.parquet"), checkpoint_dir=ck2)
    assert _clusters_df(res).equals(first)
    assert not os.path.exists(os.path.join(ck2, "candidates.tmp"))


def test_config_change_invalidates(ckpt_run, tiny_corpus, tmp_path):
    ck, first, _ = ckpt_run
    ck3 = str(tmp_path / "cfg")
    shutil.copytree(ck, ck3)
    cfg = DedupConfig(phash_hamming_max=2)  # different relation
    res = run_neardup(
        os.path.join(tiny_corpus, "images.parquet"), cfg=cfg, checkpoint_dir=ck3
    )
    with open(os.path.join(ck3, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["config_hash"] == cfg.config_hash()
    # stricter threshold -> no more clusters than before
    assert res.stats["duplicate_clusters"] <= len(set(first.cluster_id))


# ---- per-partition lineage (north_rule: "per-partition ... lineage") ----


@pytest.fixture(scope="module")
def sharded_tiny(tiny_corpus, tmp_path_factory):
    """The tiny corpus re-laid-out as 4 part files (the multi-fragment input
    shape that switches the decode stage to per-chunk checkpointing)."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(tiny_corpus, "images.parquet"))
    d = tmp_path_factory.mktemp("sharded") / "images.parquet"
    os.makedirs(d)
    step = (t.num_rows + 3) // 4
    for i in range(4):
        pq.write_table(
            t.slice(i * step, step), os.path.join(d, f"part-{i:05d}.parquet")
        )
    return str(d)


def test_partitioned_keys_chunk_lineage(ckpt_run, sharded_tiny, tmp_path):
    """Multi-part input + checkpoint dir -> the keys stage commits one chunk
    per input shard (ckpt_chunk_files=1), each with its own lineage entry,
    and the clusters are identical to the single-file run."""
    _, first, _ = ckpt_run
    cfg = DedupConfig(ckpt_chunk_files=1)
    ck = str(tmp_path / "part")
    res = run_neardup(sharded_tiny, cfg=cfg, checkpoint_dir=ck)
    assert _clusters_df(res).equals(first)
    with open(os.path.join(ck, "manifest.json")) as f:
        manifest = json.load(f)
    entry = manifest["stages"]["keys"]
    assert entry["partitioned"] is True
    assert len(entry["chunks"]) == 4
    for key, ce in entry["chunks"].items():
        assert len(ce["lineage"]) == 1
        assert ce["lineage"][0].endswith(".parquet")
        assert os.path.isdir(os.path.join(ck, "keys", key))


def test_partitioned_keys_resume_recomputes_only_missing(
    ckpt_run, sharded_tiny, tmp_path
):
    """Crash mid-decode (one chunk unfinished): resume recomputes ONLY that
    chunk — surviving chunk dirs are untouched (mtime-stable) — and the final
    clusters are byte-identical."""
    _, first, _ = ckpt_run
    cfg = DedupConfig(ckpt_chunk_files=1)
    ck = str(tmp_path / "part2")
    run_neardup(sharded_tiny, cfg=cfg, checkpoint_dir=ck)

    m_path = os.path.join(ck, "manifest.json")
    with open(m_path) as f:
        m = json.load(f)
    # simulate: chunk00002 never committed; everything downstream unfinished
    m["stages"]["keys"]["chunks"].pop("chunk00002")
    shutil.rmtree(os.path.join(ck, "keys", "chunk00002"))
    os.makedirs(os.path.join(ck, "keys", "chunk00002.tmp"))  # mid-write crash
    for dead in ("exact_tier", "signatures", "candidates", "edges_near", "clusters"):
        m["stages"].pop(dead)
        shutil.rmtree(os.path.join(ck, dead))
    with open(m_path, "w") as f:
        json.dump(m, f)

    survivors = ("chunk00000", "chunk00001", "chunk00003")
    before = {
        k: os.path.getmtime(os.path.join(ck, "keys", k)) for k in survivors
    }
    res = run_neardup(sharded_tiny, cfg=cfg, checkpoint_dir=ck)
    assert _clusters_df(res).equals(first)
    after = {k: os.path.getmtime(os.path.join(ck, "keys", k)) for k in survivors}
    assert before == after  # survivors were NOT recomputed
    assert not os.path.exists(os.path.join(ck, "keys", "chunk00002.tmp"))
    with open(m_path) as f:
        m2 = json.load(f)
    assert len(m2["stages"]["keys"]["chunks"]) == 4
