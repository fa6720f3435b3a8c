"""Session-12 operators: truncation-dup groups, SimHash dedup APPLY, and
the leakage-safe (cluster-keyed) split. Planted tiny fixtures + invariant
checks; value-level parity vs DuckDB runs in the oracle gate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def mini_docs(tmp_path_factory) -> str:
    """Tiny documents table with planted truncation duplicates: docs 0/1
    share their first 40 chars (tails differ), docs 2/3 are full exact
    dups, 4..7 unique, 8 empty."""
    d = tmp_path_factory.mktemp("minidocs")
    head = "the quick brown fox jumps over the lazy dog once more"
    texts = [
        head + " tail alpha goes on and on",
        head + " tail beta diverges here completely",
        "identical pair body text",
        "identical pair body text",
        "completely unrelated document four",
        "another unrelated document five",
        "yet another six",
        "seventh singleton",
        "",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["src0"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_prefix_dup_groups_planted(mini_docs, ray_session):
    from dedup_ray.pipelines.text import prefix_dup_groups

    got = (
        prefix_dup_groups(mini_docs, n_chars=32)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # docs 0/1 share the 32-char prefix; docs 2/3 are exact dups (and so
    # prefix dups); everything else is singleton and must not appear
    want = pd.DataFrame(
        {"doc_id": [0, 1, 2, 3], "group_rep": [0, 0, 2, 2]}
    ).astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_prefix_dup_groups_matches_python_bruteforce(ray_session):
    from dedup_ray.pipelines.text import prefix_dup_groups

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    by_pfx: dict[str, list[int]] = {}
    for i, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        by_pfx.setdefault((x or "")[:32], []).append(i)
    want = sorted(
        (i, min(v))
        for v in by_pfx.values()
        if len(v) >= 2
        for i in v
    )
    got = prefix_dup_groups(SF, n_chars=32).to_pandas()
    assert sorted(zip(got["doc_id"], got["group_rep"])) == want


def test_simhash_dedup_keep_drops_exactly_nonkeepers(ray_session):
    from dedup_ray.functions.unionfind import connected_components
    from dedup_ray.pipelines.text import simhash_dedup_keep, simhash_near_pairs

    pairs = simhash_near_pairs(SF)
    comp = connected_components(
        [(f"{a:012d}", f"{b:012d}") for a, b in zip(pairs["a"], pairs["b"])]
    )
    drop = {int(k) for k, v in comp.items() if int(k) != int(v)}
    kept = set(simhash_dedup_keep(SF).to_pandas()["doc_id"])
    n_docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]).num_rows
    assert kept.isdisjoint(drop)
    assert len(kept) == n_docs - len(drop)
    # keepers of every component survive
    assert all(int(v) in kept for v in comp.values())


def test_leakage_safe_split_keeps_clusters_together(ray_session):
    from dedup_ray.pipelines.curation import leakage_safe_split
    from dedup_ray.pipelines.text import minhash_neardup_clusters

    split = dict(
        zip(*(lambda df: (df["doc_id"], df["split"]))(
            leakage_safe_split(SF).to_pandas()
        ))
    )
    cl = minhash_neardup_clusters(SF)
    # THE property: every near-dup cluster lands wholly in one split
    for _, grp in cl.groupby("cluster_id"):
        assigned = {split[int(d)] for d in grp["doc_id"]}
        assert len(assigned) == 1, grp
    # coverage + sane proportions (90/5/5 within binomial slack)
    n = len(split)
    assert n == pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id"]
    ).num_rows
    frac_train = sum(1 for s in split.values() if s == "train") / n
    assert 0.8 < frac_train < 0.97


def test_leakage_safe_split_unclustered_matches_hash_split(ray_session):
    from dedup_ray.pipelines.curation import hash_split_docs, leakage_safe_split
    from dedup_ray.pipelines.text import minhash_neardup_clusters

    ls = dict(zip(*(lambda df: (df["doc_id"], df["split"]))(
        leakage_safe_split(SF).to_pandas())))
    hs = dict(zip(*(lambda df: (df["doc_id"], df["split"]))(
        hash_split_docs(SF).to_pandas())))
    clustered = set(minhash_neardup_clusters(SF)["doc_id"].astype(int))
    for d, s in ls.items():
        if int(d) not in clustered:
            assert s == hs[d]


def test_threshold_sweep_consistent_with_funnel(ray_session):
    from dedup_ray.config import DedupConfig
    from dedup_ray.pipelines.text import minhash_funnel_stats, minhash_threshold_sweep

    cfg = DedupConfig()
    sweep = minhash_threshold_sweep(SF)
    funnel = minhash_funnel_stats(SF).iloc[0]
    # the sweep histogram partitions the DISTINCT candidate-pair set
    assert int(sweep["n_pairs"].sum()) == int(funnel["n_candidate_pairs"])
    # pairs at/above the configured threshold == the funnel's verified count
    thr = cfg.jaccard_threshold
    above = int(sweep.loc[sweep["est_jaccard"] >= thr, "n_pairs"].sum())
    assert above == int(funnel["n_verified_pairs"])
    assert (sweep["n_pairs"] > 0).all()


def test_temperature_mix_weights_properties(ray_session):
    import pyarrow.parquet as _pq

    from dedup_ray.pipelines.curation import temperature_mix_weights

    w = temperature_mix_weights(SF)
    t = _pq.read_table(f"{SF}/documents.parquet", columns=["source"])
    counts = {}
    for s in t["source"].to_pylist():
        counts[s] = counts.get(s, 0) + 1
    assert dict(zip(w["source"], w["n_docs"])) == counts
    assert abs(w["weight"].sum() - 1.0) < 1e-6
    # alpha < 1 boosts the smallest source above natural share, and
    # deflates the largest
    smallest = w.loc[w["n_docs"].idxmin()]
    largest = w.loc[w["n_docs"].idxmax()]
    if smallest["n_docs"] < largest["n_docs"]:
        assert smallest["boost"] > 1.0 > largest["boost"]


def test_doc_neardup_clusters_coarsens_every_tier(ray_session):
    from dedup_ray.pipelines.text import (
        doc_neardup_clusters,
        minhash_neardup_clusters,
        simhash_near_pairs,
    )

    comp = dict(
        zip(*(lambda df: (df["doc_id"].astype(int), df["cluster_id"]))(
            doc_neardup_clusters(SF)
        ))
    )
    # every minhash cluster is contained in one composed cluster
    mh = minhash_neardup_clusters(SF)
    for _, grp in mh.groupby("cluster_id"):
        assert len({comp[int(d)] for d in grp["doc_id"]}) == 1
    # every simhash pair is joined
    sp = simhash_near_pairs(SF)
    for a, b in zip(sp["a"], sp["b"]):
        assert comp[int(a)] == comp[int(b)]
    # cluster_id is the min member
    by_c: dict[int, list[int]] = {}
    for d, c in comp.items():
        by_c.setdefault(int(c), []).append(int(d))
    for c, members in by_c.items():
        assert c == min(members)
        assert len(members) >= 2


def test_doc_neardup_keep_drops_exactly_nonkeepers(ray_session):
    from dedup_ray.pipelines.text import doc_neardup_clusters, doc_neardup_keep

    cl = doc_neardup_clusters(SF)
    drop = set(cl.loc[cl["doc_id"] != cl["cluster_id"], "doc_id"].astype(int))
    kept = set(doc_neardup_keep(SF).to_pandas()["doc_id"].astype(int))
    n_docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]).num_rows
    assert kept.isdisjoint(drop)
    assert len(kept) == n_docs - len(drop)
    assert set(cl["cluster_id"].astype(int)).issubset(kept)
