"""End-to-end flagship pipeline: recall vs oracle, stats vs planted metadata,
degenerate inputs (the analog of the reference's integration suite,
tests/duplicate_detection.rs)."""

import json
import os
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dedup_ray.config import DedupConfig
from dedup_ray.functions import codecs
from dedup_ray.functions.hashing import phash64
from dedup_ray.oracle.recall import pair_recall_precision
from dedup_ray.oracle.refimpl import oracle_clusters
from dedup_ray.pipelines.neardup import run_neardup
from dedup_ray.stages.report import print_human


@pytest.fixture(scope="module")
def tiny_result(tiny_corpus):
    return run_neardup(os.path.join(tiny_corpus, "images.parquet"))


def test_recall_vs_oracle(tiny_result, tiny_corpus):
    images = pq.read_table(os.path.join(tiny_corpus, "images.parquet"))
    orc = oracle_clusters(images)
    cl = tiny_result.clusters.to_pandas()
    pred = dict(zip(cl["image_id"], cl["cluster_id"]))
    m = pair_recall_precision(pred, orc)
    assert m["recall"] >= 0.99, m
    assert m["precision"] >= 0.99, m


def test_stats_match_oracle_counts(tiny_result, tiny_corpus):
    """Stats must agree exactly with the ORACLE's clusters (the relation's
    ground truth); planted metadata is a softer bound since borderline
    planted pairs legitimately fall outside the threshold relation."""
    images = pq.read_table(os.path.join(tiny_corpus, "images.parquet"))
    orc = oracle_clusters(images)
    sizes = Counter(orc.values())
    dup_rows = sum(n for n in sizes.values() if n >= 2)
    dup_clusters = sum(1 for n in sizes.values() if n >= 2)
    s = tiny_result.stats
    with open(os.path.join(tiny_corpus, "metadata.json")) as f:
        meta = json.load(f)
    assert s["total_rows"] == meta["total_rows"]
    assert s["duplicate_rows"] == dup_rows
    assert s["duplicate_clusters"] == dup_clusters
    assert s["wasted_bytes"] > 0
    # planted intent as sanity: within 2%
    assert abs(s["duplicate_rows"] - meta["rows_in_dup_groups"]) <= max(
        2, meta["rows_in_dup_groups"] * 0.02
    )


def test_counters_populated(tiny_result):
    assert tiny_result.counters.get("pairs_verified", 0) > 0
    assert tiny_result.counters.get("edges_emitted", 0) > 0


def test_cluster_rep_is_min_member(tiny_result):
    cl = tiny_result.clusters.to_pandas()
    mins = cl.groupby("cluster_id")["image_id"].min()
    assert (mins.index == mins.values).all()


def test_human_report_format(tiny_result):
    text = print_human(tiny_result.report)
    assert "Duplicate rows:" in text and "clusters" in text


def _unique_corpus(path: str, n: int = 25) -> None:
    rng = np.random.default_rng(11)
    rows = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
    for i in range(n):
        px = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        b = codecs.encode(px, "raw")
        rows["image_id"].append(f"u_{i:04d}")
        rows["bytes"].append(b)
        rows["w"].append(24)
        rows["h"].append(24)
        rows["fmt"].append("raw")
        rows["caption"].append("".join(rng.choice(list("abcdefghijklmnop "), 80)))
        rows["phash"].append(phash64(px))
    t = pa.table(
        {
            "image_id": pa.array(rows["image_id"]),
            "bytes": pa.array(rows["bytes"], type=pa.binary()),
            "w": pa.array(rows["w"], type=pa.int32()),
            "h": pa.array(rows["h"], type=pa.int32()),
            "fmt": pa.array(rows["fmt"]),
            "caption": pa.array(rows["caption"]),
            "phash": pa.array(rows["phash"], type=pa.int64()),
        }
    )
    os.makedirs(path, exist_ok=True)
    pq.write_table(t, os.path.join(path, "images.parquet"))


def test_no_duplicates_corpus(tmp_path):
    _unique_corpus(str(tmp_path))
    res = run_neardup(os.path.join(str(tmp_path), "images.parquet"))
    assert res.stats["duplicate_clusters"] == 0
    assert print_human(res.report) == "No duplicates found."


def test_size_filter_excludes_rows(tiny_corpus):
    """--min-size/--max-size analog (reference tests/size_filters.rs)."""
    cfg = DedupConfig(min_size=10**9)  # nothing passes
    res = run_neardup(os.path.join(tiny_corpus, "images.parquet"), cfg=cfg)
    assert res.stats["duplicate_clusters"] == 0


def test_distributed_unionfind_matches_driver_on_flagship(tiny_corpus):
    """Force the distributed alternating-star path (edge bound 0) and require
    byte-identical clusters vs the driver union-find default."""
    cfg = DedupConfig(driver_unionfind_max_edges=0)
    a = run_neardup(os.path.join(tiny_corpus, "images.parquet"), cfg=DedupConfig())
    b = run_neardup(os.path.join(tiny_corpus, "images.parquet"), cfg=cfg)
    da = a.clusters.to_pandas().sort_values(["cluster_id", "image_id"]).reset_index(drop=True)
    db = b.clusters.to_pandas().sort_values(["cluster_id", "image_id"]).reset_index(drop=True)
    assert da.equals(db)


def test_empty_captions_stay_unclustered(tiny_result, tiny_corpus):
    gt = pq.read_table(os.path.join(tiny_corpus, "gt_clusters.parquet")).to_pandas()
    empties = set(gt[gt.dup_class == "hot_empty_caption"].image_id)
    cl = tiny_result.clusters.to_pandas()
    sizes = Counter(cl.cluster_id)
    clustered = {r.image_id for r in cl.itertuples() if sizes[r.cluster_id] >= 1}
    # empty-caption rows have distinct images; they must not glom together
    assert not (empties & clustered)


def test_neardup_quality_eval(tiny_corpus):
    """The acceptance-metric operator: perfect precision, perfect recall on
    every exactly-recoverable class; the sampled-edit classes (caption_near)
    may have a threshold tail, bounded by the planted-intent sanity margin."""
    from dedup_ray.pipelines.neardup import neardup_quality_eval

    df = neardup_quality_eval(os.path.join(tiny_corpus, "images.parquet"))
    by = df.set_index("dup_class")
    allr = by.loc["__all__"]
    assert allr["pair_precision"] == 1.0
    assert allr["pair_recall"] >= 0.95
    assert allr["matched_pairs"] == allr["pred_pairs"]
    assert int(allr["n_images"]) == 200
    for cls in ("exact_byte", "reencode", "phash_near", "caption_substring"):
        assert by.loc[cls, "pair_recall"] == 1.0, cls
    # degenerate classes plant no pairs
    for cls in ("unique", "hot_empty_caption"):
        assert by.loc[cls, "gt_pairs"] == 0, cls


def test_flagship_counters_query(tiny_corpus, monkeypatch):
    """queries()['flagship_counters'] emits one row per named counter with
    positive values for the stages the tiny corpus exercises."""
    import __ray_entry__ as entry_mod

    monkeypatch.setattr(
        entry_mod, "_corpus",
        lambda sf_dir: os.path.join(tiny_corpus, "images.parquet"),
    )
    df = entry_mod.queries()["flagship_counters"]("ignored")
    got = dict(zip(df["counter"], df["value"]))
    assert got.get("pairs_verified", 0) > 0
    assert got.get("edges_emitted", 0) > 0
    assert (df["value"] >= 0).all()


def test_corpus_dup_estimate(tiny_corpus):
    """Pre-flight estimator: exact distinct counts on the planted corpus,
    ratios consistent with the planted exact-dup classes."""
    from dedup_ray.pipelines.neardup import corpus_dup_estimate

    row = corpus_dup_estimate(
        os.path.join(tiny_corpus, "images.parquet")
    ).iloc[0]
    assert row["n_rows"] == 200
    assert 0 < row["n_distinct_phash"] <= 200
    assert 0 < row["n_distinct_caption"] <= 200
    # planted exact_byte + reencode + hot_identical classes guarantee
    # repeated phashes; near/unique classes keep the ratio well below 1
    assert 0.0 < row["phash_dup_ratio"] < 0.9
    assert row["phash_dup_ratio"] == 1 - (
        row["n_distinct_phash"] / row["n_rows"]
    )


def test_wasted_bytes_by_fmt(tiny_result, tiny_corpus):
    """Per-format waste must partition the report's wasted_bytes total
    exactly, counting every non-keeper member once."""
    from dedup_ray.pipelines.neardup import wasted_bytes_by_fmt

    df = wasted_bytes_by_fmt(os.path.join(tiny_corpus, "images.parquet"))
    assert df["wasted_bytes"].sum() == tiny_result.stats["wasted_bytes"]
    n_dups = tiny_result.stats["duplicate_rows"] - tiny_result.stats[
        "duplicate_clusters"
    ]  # one keeper per cluster
    assert df["n_dup_rows"].sum() == n_dups
    assert (df["wasted_bytes"] > 0).all()
