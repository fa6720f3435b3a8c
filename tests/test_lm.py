"""Char-bigram LM perplexity scoring: kernel replay + separation property."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def scored(tmp_path_factory, ray_session):
    """Score a corpus of fluent-ish repeated phrasing + planted garbage."""
    rng = np.random.default_rng(5)
    fluent = [
        " ".join(
            rng.choice(
                ["the quick fox", "a lazy dog", "runs over", "jumps the fence",
                 "in the field", "every single day"],
                8,
            )
        )
        for _ in range(80)
    ]
    garbage = [
        "".join(chr(33 + int(c)) for c in rng.integers(0, 90, 60))
        for _ in range(20)
    ]
    docs = fluent + garbage
    d = tmp_path_factory.mktemp("lm")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), type=pa.int64()),
                "text": pa.array(docs, type=pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    from dedup_ray.pipelines.analysis import lm_perplexity_scores

    rows = lm_perplexity_scores(str(d)).take_all()
    return {r["doc_id"]: r for r in rows}, len(fluent), docs


def test_every_doc_scored(scored):
    got, n_fluent, docs = scored
    assert len(got) == len(docs)
    for r in got.values():
        assert r["n_bigrams"] == max(0, len(docs[r["doc_id"]]) - 1)
        assert r["bits_per_bigram"] >= 0


def test_garbage_scores_higher_than_fluent(scored):
    got, n_fluent, docs = scored
    fluent_bits = [got[i]["bits_per_bigram"] for i in range(n_fluent)]
    garbage_bits = [
        got[i]["bits_per_bigram"] for i in range(n_fluent, len(docs))
    ]
    # full separation: worst fluent doc beats best garbage doc
    assert max(fluent_bits) < min(garbage_bits)


def test_empty_and_single_char_docs(tmp_path, ray_session):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "text": pa.array(["", "x", "ab ab ab"], type=pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    from dedup_ray.pipelines.analysis import lm_perplexity_scores

    got = {r["doc_id"]: r for r in lm_perplexity_scores(str(tmp_path)).take_all()}
    assert got[0]["n_bigrams"] == 0 and got[0]["bits_per_bigram"] == 0.0
    assert got[1]["n_bigrams"] == 0
    assert got[2]["n_bigrams"] == 7


def test_kernel_replay_matches_pipeline(scored):
    """Independently recompute one doc's bits from raw counts."""
    got, n_fluent, docs = scored
    # train stats in-process
    from collections import Counter

    cnt: Counter = Counter()
    for t in docs:
        for a, b in zip(t, t[1:]):
            cnt[(a, b)] += 1
    charset = sorted({c for t in docs for c in t})
    v = len(charset)
    prev_tot: Counter = Counter()
    for (a, _), n in cnt.items():
        prev_tot[a] += n
    for doc_id in (0, n_fluent):  # one fluent, one garbage
        t = docs[doc_id]
        bits = []
        for a, b in zip(t, t[1:]):
            n = cnt.get((a, b), 0)
            if n:
                bits.append(-np.log2((n + 1.0) / (prev_tot[a] + v + 1.0)))
            else:
                bits.append(-np.log2(1.0 / (prev_tot[a] + v + 1.0)))
        want = float(np.mean(bits))
        assert abs(got[doc_id]["bits_per_bigram"] - want) < 1e-9, doc_id
