"""Prefix-filter token orders (functions/vocab.py): the Misra-Gries
unbounded-vocabulary fallback must yield the SAME verified pair set as the
exact rarest-first order — the prefix filter is lossless under any total
order (round-2 review item #5)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

SF = "/root/testdata/sf0.001"


def test_mg_compress_guarantee():
    from dedup_ray.functions.vocab import _mg_compress

    rng = np.random.default_rng(0)
    u = np.array([f"t{i}" for i in range(1000)], dtype=object)
    c = rng.integers(1, 50, 1000)
    c[7] = 10_000  # one heavy hitter
    uu, cc = _mg_compress(u, c, 16)
    assert len(uu) <= 16
    assert "t7" in set(uu)  # count >= N/k survives by the MG guarantee
    # estimates never exceed true counts
    est = dict(zip(uu, cc))
    true = dict(zip(u, c))
    assert all(est[t] <= true[t] for t in est)


def test_token_order_probe_exact_vs_mg():
    from dedup_ray.functions.vocab import exact_token_order, mg_token_order

    docs = [["a", "b", "c"], ["b", "c", "d"], ["c", "e"], []]
    t = pa.table(
        {"doc_id": pa.array(range(4), type=pa.int64()),
         "grams": pa.array(docs, type=pa.list_(pa.string()))}
    )
    ds = rd.from_arrow(t)
    ex = exact_token_order(ds)
    flat = pa.array(["a", "b", "c", "d", "e"])
    order, ids = ex.probe(flat)
    # rarest-first: c (df 3) must sort after a/d/e (df 1) and b (df 2)
    assert order[2] == order.max()
    np.testing.assert_array_equal(order, ids)  # exact: identity == order

    mg = mg_token_order(ds, k=2)
    o2, i2 = mg.probe(flat)
    assert len(np.unique(i2)) == 5  # hash identities stay distinct
    # frequent tokens (in the MG summary) order AFTER all hash ids
    assert o2[2] >= (1 << 62)


def test_ngram_jaccard_mg_matches_exact():
    from dedup_ray.pipelines.text import ngram_jaccard_pairs

    a = ngram_jaccard_pairs(SF, vocab_rank="exact")
    b = ngram_jaccard_pairs(SF, vocab_rank="mg")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_containment_mg_matches_exact():
    from dedup_ray.pipelines.text import containment_pairs

    def canon(ds):
        df = ds.to_pandas()
        return df.sort_values(["a", "b"]).reset_index(drop=True)

    a = canon(containment_pairs(SF, vocab_rank="exact"))
    b = canon(containment_pairs(SF, vocab_rank="mg"))
    assert a.equals(b)
