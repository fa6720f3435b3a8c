"""Incremental admission: clusters(incremental(prior, delta)) must equal
clusters(full(prior ∪ delta)) at the same config (pipelines/incremental.py
docstring has the stage-by-stage equivalence argument)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dedup_ray.pipelines.incremental import run_neardup_incremental
from dedup_ray.pipelines.neardup import run_neardup


def _clusters_df(res):
    return (
        res.clusters.to_pandas()
        .sort_values(["cluster_id", "image_id"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def split_corpus(tiny_corpus, tmp_path_factory):
    """tiny corpus split 80/20 by row index — planted dup classes land on
    both sides, so cross prior/delta near-dup pairs exist by construction."""
    full = os.path.join(tiny_corpus, "images.parquet")
    t = pq.read_table(full)
    d = tmp_path_factory.mktemp("incr")
    delta_mask = np.arange(t.num_rows) % 5 == 0
    prior_p = str(d / "prior.parquet")
    delta_p = str(d / "delta.parquet")
    pq.write_table(t.filter(pa.array(~delta_mask)), prior_p, row_group_size=64)
    pq.write_table(t.filter(pa.array(delta_mask)), delta_p, row_group_size=64)
    return prior_p, delta_p, full


def test_incremental_matches_full(split_corpus, tmp_path):
    prior_p, delta_p, full = split_corpus
    ck = str(tmp_path / "prior_ck")
    run_neardup(prior_p, checkpoint_dir=ck)

    inc = run_neardup_incremental(prior_p, ck, delta_p)
    ref = run_neardup(full)
    assert _clusters_df(inc).equals(_clusters_df(ref))
    assert inc.stats == ref.stats


def test_incremental_rekeys_invalidated_sentinels(split_corpus, tmp_path):
    """A prior phash-unique (cascade-skipped) row whose duplicate arrives in
    the delta must be re-decoded — the counter proves the path engages, and
    the cluster equality above proves it is sufficient."""
    prior_p, delta_p, _ = split_corpus
    ck = str(tmp_path / "ck2")
    run_neardup(prior_p, checkpoint_dir=ck)
    inc = run_neardup_incremental(prior_p, ck, delta_p)
    # the 80/20 split leaves some dup-class members alone on the prior side
    # (sentinel there) with partners in the delta -> rekey count > 0
    assert inc.counters.get("incremental_rekeyed_rows", 0) > 0


def test_incremental_multishard_prior(split_corpus, tmp_path):
    """Prior input as a DIRECTORY of part files: the prior run takes the
    per-partition (chunked) checkpoint path, so the keys stage lands in
    chunkNNNNN/ subdirs — the incremental rekey scan must walk them, and
    the union must still equal the full run."""
    from dedup_ray.config import DedupConfig

    prior_p, delta_p, full = split_corpus
    t = pq.read_table(prior_p)
    shard_dir = tmp_path / "prior_shards"
    shard_dir.mkdir()
    n = t.num_rows
    step = (n + 3) // 4
    for i in range(4):
        pq.write_table(t.slice(i * step, step), str(shard_dir / f"part-{i}.parquet"))
    cfg = DedupConfig(ckpt_chunk_files=2)  # 4 shards -> 2 checkpoint chunks
    ck = str(tmp_path / "ck_shards")
    run_neardup(str(shard_dir), cfg=cfg, checkpoint_dir=ck)
    assert any((tmp_path / "ck_shards" / "keys").glob("chunk*"))

    inc = run_neardup_incremental(str(shard_dir), ck, delta_p, cfg=cfg)
    ref = run_neardup(full, cfg=cfg)
    assert _clusters_df(inc).equals(_clusters_df(ref))
    assert inc.counters.get("incremental_rekeyed_rows", 0) > 0


def test_incremental_rejects_mismatched_checkpoint(split_corpus, tmp_path):
    """A prior checkpoint built under a different config must be refused —
    replaying its keys/edges under new thresholds would be silently wrong."""
    from dedup_ray.config import DedupConfig

    prior_p, delta_p, _ = split_corpus
    ck = str(tmp_path / "ck_cfg")
    run_neardup(prior_p, checkpoint_dir=ck)
    other = DedupConfig(jaccard_threshold=0.99)
    with pytest.raises(ValueError, match="config hash"):
        run_neardup_incremental(prior_p, ck, delta_p, cfg=other)
    with pytest.raises(ValueError, match="checkpoint"):
        run_neardup_incremental(prior_p, str(tmp_path / "nope"), delta_p)


def test_incremental_empty_delta(split_corpus, tmp_path):
    """An empty delta must reproduce the prior clustering exactly."""
    prior_p, _, _ = split_corpus
    ck = str(tmp_path / "ck3")
    res_prior = run_neardup(prior_p, checkpoint_dir=ck)

    t = pq.read_table(prior_p).slice(0, 0)
    empty_p = str(tmp_path / "empty.parquet")
    pq.write_table(t, empty_p)
    inc = run_neardup_incremental(prior_p, ck, empty_p)
    assert _clusters_df(inc).equals(_clusters_df(res_prior))
    assert inc.stats == res_prior.stats
