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
