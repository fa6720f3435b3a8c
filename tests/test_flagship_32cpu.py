"""Regression: the round-1 driver crash (KeyError 'count()').

Ray's groupby emits schema-dropped EMPTY blocks in a layout-dependent way —
at num_cpus=32 on a ~1k-row corpus the cascade-decode pre-pass in
stages/keys.py saw blocks without the "count()" column and crashed, while
the same query passed at 4-8 CPUs.  Reproduce the exact failing shape in a
fresh 32-CPU subprocess (the in-process conftest session runs at 4 CPUs and
does NOT reproduce it)."""

import os
import subprocess
import sys

import pytest

_RUNNER = """
import sys, ray, logging
ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext; DataContext.get_current().enable_progress_bars = False
logging.getLogger("ray.data").setLevel(logging.ERROR)
sys.path.insert(0, {repo!r})
from dedup_ray.config import DedupConfig
from dedup_ray.pipelines.neardup import run_neardup
res = run_neardup({corpus!r}, DedupConfig(cascade_decode=True))
n = res.clusters.count()
assert res.stats["total_rows"] > 0
print("CLUSTER_ROWS", n)
ray.shutdown()
"""


@pytest.mark.slow
def test_flagship_cascade_decode_at_32_cpus(tmp_path):
    from dedup_ray.sources.corpus import generate_corpus

    out = str(tmp_path / "c32")
    generate_corpus(out, scale="tiny", n_rows=1000, use_ray=False)
    corpus = os.path.join(out, "images.parquet")
    script = _RUNNER.format(repo="/root/repo", corpus=corpus)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=500,
        env=dict(os.environ, RAY_ADDRESS=""),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "CLUSTER_ROWS" in proc.stdout


_EDGE_RUNNER = """
import sys, ray, logging
ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext; DataContext.get_current().enable_progress_bars = False
logging.getLogger("ray.data").setLevel(logging.ERROR)
sys.path.insert(0, {repo!r})
from dedup_ray.pipelines.neardup import run_neardup
res = run_neardup({corpus!r})
assert res.stats["total_rows"] == {n}
assert res.stats["duplicate_rows"] == {n}
assert res.stats["duplicate_clusters"] == 1
print("EDGE_OK")
ray.shutdown()
"""


@pytest.mark.slow
def test_all_identical_corpus_at_32_cpus(tmp_path):
    """One giant exact class at 32 CPUs: after the exact collapse nearly
    every downstream block is EMPTY — the schema-dropped-empty-block layout
    class that caused the round-1 crash, here stressed across every stage."""
    import numpy as np
    from tests.test_edge_corpora import _row, _write

    rng = np.random.default_rng(8)
    data, w, h, ph = _row(rng)
    n = 500
    corpus = _write(
        tmp_path / "same32.parquet",
        [(f"img_{i:04d}", data, w, h, "raw", "identical caption text", ph)
         for i in range(n)],
    )
    script = _EDGE_RUNNER.format(repo="/root/repo", corpus=corpus, n=n)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=500,
        env=dict(os.environ, RAY_ADDRESS=""),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "EDGE_OK" in proc.stdout
