"""True kill -9 resume: a checkpointed run killed mid-pipeline must resume to
byte-identical clusters (north_rule "resumes mid-run"; generalizes the
reference's interrupted-apply recovery test, src/actions.rs:291-325)."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

_RUNNER = """
import sys, ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext; DataContext.get_current().enable_progress_bars = False
import logging; logging.getLogger("ray.data").setLevel(logging.ERROR)
sys.path.insert(0, {repo!r})
from dedup_ray.pipelines.neardup import run_neardup
run_neardup({corpus!r}, checkpoint_dir={ckpt!r})
ray.shutdown()
"""


@pytest.mark.slow
def test_sigkill_mid_run_then_resume(tiny_corpus, tmp_path):
    corpus = os.path.join(tiny_corpus, "images.parquet")
    ckpt = str(tmp_path / "ck")
    script = _RUNNER.format(repo="/root/repo", corpus=corpus, ckpt=ckpt)

    # start a fresh-process run and SIGKILL it once the first stages land
    proc = subprocess.Popen(
        [sys.executable, "-c", script],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        env=dict(os.environ, RAY_ADDRESS=""),
    )
    deadline = time.time() + 240
    killed_after = None
    while time.time() < deadline:
        mpath = os.path.join(ckpt, "manifest.json")
        if os.path.exists(mpath):
            try:
                with open(mpath) as f:
                    stages = list(json.load(f)["stages"])
            except (json.JSONDecodeError, KeyError):
                stages = []
            if len(stages) >= 2:  # mid-run: some stages done, some not
                proc.send_signal(signal.SIGKILL)
                killed_after = stages
                break
        if proc.poll() is not None:  # finished before we could kill: still
            killed_after = ["<completed>"]  # a valid (weaker) resume test
            break
        time.sleep(0.25)
    proc.wait(timeout=60)
    assert killed_after is not None, "runner never produced a manifest"

    # resume in-process (conftest Ray session) and compare to a clean run
    from dedup_ray.pipelines.neardup import run_neardup

    resumed = (
        run_neardup(corpus, checkpoint_dir=ckpt)
        .clusters.to_pandas()
        .sort_values(["cluster_id", "image_id"])
        .reset_index(drop=True)
    )
    clean = (
        run_neardup(corpus)
        .clusters.to_pandas()
        .sort_values(["cluster_id", "image_id"])
        .reset_index(drop=True)
    )
    assert resumed.equals(clean)
