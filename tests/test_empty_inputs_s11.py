"""Schema-stable empty-input behavior for the session-11 operators."""

import os

import pandas as pd
import pytest


@pytest.fixture()
def empty_docs_dir(tmp_path):
    d = str(tmp_path)
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


def test_minhash_funnel_stats_empty(empty_docs_dir, ray_session):
    from dedup_ray.pipelines.text import minhash_funnel_stats

    df = minhash_funnel_stats(empty_docs_dir)
    assert len(df) == 1
    row = df.iloc[0]
    for c in ("n_docs", "n_with_sig", "n_buckets", "n_candidate_pairs",
              "n_verified_pairs"):
        assert row[c] == 0, c


def test_minhash_funnel_stats_planted(tmp_path, ray_session):
    """Two identical docs + one distinct: the funnel must show every stage
    agreeing (1 colliding bucket set, 1 candidate pair, 1 verified pair)."""
    d = str(tmp_path)
    dup = "the quick brown fox jumps over the lazy dog " * 5
    other = "completely unrelated content with different words entirely " * 5
    pd.DataFrame(
        {
            "doc_id": pd.Series([1, 2, 3], dtype="int64"),
            "text": [dup, dup, other],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": pd.Series([len(dup), len(dup), len(other)], dtype="int64"),
        }
    ).to_parquet(os.path.join(d, "documents.parquet"))
    from dedup_ray.pipelines.text import minhash_funnel_stats

    row = minhash_funnel_stats(d).iloc[0]
    assert row["n_docs"] == 3
    assert row["n_with_sig"] == 3
    assert row["n_candidate_pairs"] == 1
    assert row["n_verified_pairs"] == 1
    assert row["n_buckets"] >= 1  # identical docs collide in every band
