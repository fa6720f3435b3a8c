"""Schema-stable empty/degenerate-input behavior for the session-12
operators."""

import os

import pandas as pd
import pytest


@pytest.fixture()
def empty_docs_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_docs"))
    pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "text": pd.Series([], dtype="object"),
            "lang": pd.Series([], dtype="object"),
            "source": pd.Series([], dtype="object"),
            "n_chars": pd.Series([], dtype="int64"),
        }
    ).to_parquet(os.path.join(d, "documents.parquet"))
    return d


@pytest.fixture()
def unique_docs_dir(tmp_path_factory):
    """All-distinct corpus (distinct from the first character on): every
    dedup-family op must return empty / keep everything."""
    d = str(tmp_path_factory.mktemp("unique_docs"))
    words = ["alpha", "bravo", "cedar", "delta", "ember", "fjord", "gusto",
             "haven"]
    texts = [
        f"{words[i]} {i} utterly distinct content block " + words[7 - i] * 3
        for i in range(8)
    ]
    pd.DataFrame(
        {
            "doc_id": pd.Series(range(8), dtype="int64"),
            "text": texts,
            "lang": ["en"] * 8,
            "source": ["s"] * 8,
            "n_chars": pd.Series([len(t) for t in texts], dtype="int64"),
        }
    ).to_parquet(os.path.join(d, "documents.parquet"))
    return d


def test_prefix_dup_groups_empty_and_unique(empty_docs_dir, unique_docs_dir, ray_session):
    from dedup_ray.pipelines.text import prefix_dup_groups

    assert len(prefix_dup_groups(empty_docs_dir).to_pandas()) == 0
    assert len(prefix_dup_groups(unique_docs_dir).to_pandas()) == 0


def test_simhash_dedup_keep_empty_and_unique(empty_docs_dir, unique_docs_dir, ray_session):
    from dedup_ray.pipelines.text import simhash_dedup_keep

    assert len(simhash_dedup_keep(empty_docs_dir).to_pandas()) == 0
    kept = simhash_dedup_keep(unique_docs_dir).to_pandas()
    assert sorted(kept["doc_id"]) == list(range(8))


def test_leakage_safe_split_empty_and_unique(empty_docs_dir, unique_docs_dir, ray_session):
    from dedup_ray.pipelines.curation import hash_split_docs, leakage_safe_split

    assert len(leakage_safe_split(empty_docs_dir).to_pandas()) == 0
    # with no clusters the split degenerates to hash_split_docs exactly
    ls = leakage_safe_split(unique_docs_dir).to_pandas()
    hs = hash_split_docs(unique_docs_dir).to_pandas()
    assert ls.sort_values("doc_id").values.tolist() == \
        hs.sort_values("doc_id").values.tolist()


def test_doc_neardup_clusters_empty_and_unique(empty_docs_dir, unique_docs_dir, ray_session):
    from dedup_ray.pipelines.text import doc_neardup_clusters

    assert len(doc_neardup_clusters(empty_docs_dir)) == 0
    assert len(doc_neardup_clusters(unique_docs_dir)) == 0


def test_minhash_threshold_sweep_empty(empty_docs_dir, ray_session):
    from dedup_ray.pipelines.text import minhash_threshold_sweep

    df = minhash_threshold_sweep(empty_docs_dir)
    assert len(df) == 0


def test_temperature_mix_weights_empty_and_single(empty_docs_dir, unique_docs_dir, ray_session):
    from dedup_ray.pipelines.curation import temperature_mix_weights

    assert len(temperature_mix_weights(empty_docs_dir)) == 0
    w = temperature_mix_weights(unique_docs_dir)
    # one source: weight 1, boost 1
    assert len(w) == 1
    assert w.iloc[0]["weight"] == 1.0
    assert w.iloc[0]["boost"] == 1.0
