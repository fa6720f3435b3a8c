"""knn_graph + boilerplate_ngrams: planted-structure and degenerate-input
behavior (schema-stable empties; deterministic tie handling)."""

import os

import numpy as np
import pandas as pd
import pytest


def _write_emb(d: str, vecs: np.ndarray) -> None:
    pd.DataFrame(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "embedding": [v.astype("float64").tolist() for v in vecs],
            "label": np.zeros(len(vecs), dtype=np.int64),
        }
    ).to_parquet(os.path.join(d, "embeddings.parquet"))


def _write_docs(d: str, texts: list[str]) -> None:
    pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(os.path.join(d, "documents.parquet"))


def test_knn_graph_planted_neighbors(tmp_path):
    from dedup_ray.pipelines.ann import knn_graph

    rng = np.random.default_rng(7)
    base = rng.normal(size=(8, 16))
    # vecs 0 and 1 identical; 2 is a scaled copy (cosine 1.0 with both)
    base[1] = base[0]
    base[2] = 3.0 * base[0]
    _write_emb(str(tmp_path), base)
    out = knn_graph(str(tmp_path), k=3)
    assert list(out.columns) == ["src", "dst", "rk"]
    assert (out.groupby("src").size() == 3).all()
    # no self-edges, ranks are 1..3
    assert (out["src"] != out["dst"]).all()
    # src 0's top-2 are the two exact-cosine-1 copies, tie broken by id
    top0 = out[out["src"] == 0].sort_values("rk")["dst"].tolist()
    assert top0[:2] == [1, 2]


def test_knn_graph_fewer_vectors_than_k(tmp_path):
    from dedup_ray.pipelines.ann import knn_graph

    _write_emb(str(tmp_path), np.eye(3))
    out = knn_graph(str(tmp_path), k=10)
    # only n-1 = 2 neighbors exist per vector
    assert (out.groupby("src").size() == 2).all()
    assert len(out) == 6


def test_knn_graph_single_vector_empty(tmp_path):
    from dedup_ray.pipelines.ann import knn_graph

    _write_emb(str(tmp_path), np.ones((1, 4)))
    out = knn_graph(str(tmp_path), k=5)
    assert len(out) == 0
    assert list(out.columns) == ["src", "dst", "rk"]


def test_boilerplate_ngrams_planted(tmp_path):
    from dedup_ray.pipelines.analysis import boilerplate_ngrams

    shared = "alpha beta gamma delta epsilon"
    texts = [
        f"x1 y1 {shared} z1",
        f"x2 {shared} z2 w2",
        "totally different words here nothing repeats at all",
        f"q {shared} r",
        # same 5-gram twice in ONE doc still counts df=1 for that doc
        "u0 u1 u2 u3 u4 pad u0 u1 u2 u3 u4",
    ]
    _write_docs(str(tmp_path), texts)
    out = boilerplate_ngrams(str(tmp_path), n=5, min_df=2).to_pandas()
    got = dict(zip(out["ngram"], out["df"]))
    assert got.get(shared) == 3
    # within-doc repetition alone never reaches min_df=2
    assert "u0 u1 u2 u3 u4" not in got
    assert all(v >= 2 for v in got.values())


def test_boilerplate_ngrams_short_and_empty_docs(tmp_path):
    from dedup_ray.pipelines.analysis import boilerplate_ngrams

    _write_docs(str(tmp_path), ["one two", "", "a b c d"])  # all < n tokens
    # all-empty-block datasets drop their schema in Ray (documented house
    # behavior) — the contract here is zero rows, no crash
    assert boilerplate_ngrams(str(tmp_path), n=5, min_df=2).count() == 0
