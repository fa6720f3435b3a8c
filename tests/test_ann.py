"""Similarity-search operators: exact baseline vs approximate scale paths."""

import pandas as pd

from dedup_ray.pipelines.ann import (
    ann_ivf_topk,
    ann_topk,
    cosine_neardup_pairs,
    embedding_neardup_lsh,
    lsh_buckets,
)

SF = "/root/testdata/sf0.001"


def test_ann_topk_shape_and_determinism():
    a = ann_topk(SF, k=5, n_queries=3)
    b = ann_topk(SF, k=5, n_queries=3)
    assert a.equals(b)
    assert set(a.columns) == {"query_id", "neighbor_id", "rank"}
    assert (a.groupby("query_id")["rank"].max() == 5).all()
    assert (a.query_id != a.neighbor_id).all()


def test_ann_ivf_recall_vs_exact():
    exact = ann_topk(SF, k=5, n_queries=5)
    approx = ann_ivf_topk(SF, k=5, n_queries=5)
    e = set(map(tuple, exact[["query_id", "neighbor_id"]].values))
    a = set(map(tuple, approx[["query_id", "neighbor_id"]].values))
    recall = len(e & a) / len(e)
    assert recall >= 0.6, recall  # nprobe=4/16 cells on random vectors


def test_cosine_neardup_pairs_symmetric_free():
    pairs = cosine_neardup_pairs(SF, threshold=0.4)
    assert (pairs.a < pairs.b).all()
    assert not pairs.duplicated().any()


def test_lsh_buckets_partition():
    buckets = lsh_buckets(SF).to_pandas()
    assert buckets.n_vecs.sum() == 500  # every vector in exactly one bucket
    assert buckets.bucket.is_unique


def test_embedding_neardup_lsh_vs_brute():
    """Scale path vs brute baseline: precision 1.0 (every emitted pair really
    clears the threshold), recall per the banded collision model, no dups,
    deterministic."""
    brute = cosine_neardup_pairs(SF, threshold=0.3)
    lsh = embedding_neardup_lsh(SF, threshold=0.3)
    assert (lsh.a < lsh.b).all()
    assert not lsh.duplicated().any()
    b = set(map(tuple, brute[["a", "b"]].values))
    l = set(map(tuple, lsh[["a", "b"]].values))
    assert l <= b  # precision 1.0: verify is the same exact threshold
    recall = len(l) / len(b)
    # 8 bands x 4 planes at cos>=0.3: model-expected ~0.5-0.8 on random vecs
    assert recall >= 0.4, recall
    again = embedding_neardup_lsh(SF, threshold=0.3)
    assert lsh.equals(again)


def test_semdedup_matches_bruteforce_within_cells():
    """semdedup_embeddings' drop decisions == the in-process rule (drop iff
    a smaller-id within-cell neighbor has cosine >= tau), using the
    operator's own cell assignments."""
    import numpy as np
    import pyarrow.parquet as pq

    from dedup_ray.pipelines.ann import semdedup_embeddings

    sf = "/root/testdata/sf0.001"
    out = semdedup_embeddings(sf, tau=0.4).take_all()
    t = pq.read_table(f"{sf}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    m = np.asarray(t["embedding"].combine_chunks().flatten()).reshape(
        len(ids), -1
    ).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    assert len(out) == len(ids)  # every vector classified exactly once
    cell = {r["vec_id"]: r["cell"] for r in out}
    kept = {r["vec_id"]: r["kept"] for r in out}
    idx = {v: i for i, v in enumerate(ids)}
    for c in set(cell.values()):
        mem = sorted(i for i in ids if cell[i] == c)
        sub = m[[idx[v] for v in mem]]
        s = sub @ sub.T
        for i, v in enumerate(mem):
            expect = not any(s[j, i] >= 0.4 for j in range(i))
            assert kept[v] == expect, (v, c)


def _exact_l2_topk(k: int, n_queries: int) -> set:
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    m = t["embedding"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    ).reshape(len(ids), -1).astype(np.float64)
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    pairs = set()
    for qi in range(n_queries):
        d = ((m - m[qi]) ** 2).sum(axis=1)
        d[qi] = np.inf
        # smallest-k with neighbor_id tiebreak (ids are sorted, argsort stable)
        top = np.argsort(d, kind="stable")[:k]
        pairs |= {(int(ids[qi]), int(ids[i])) for i in top}
    return pairs


def test_ann_pq_recall_vs_exact_l2():
    from dedup_ray.pipelines.ann import ann_pq_topk

    exact = _exact_l2_topk(k=5, n_queries=5)
    approx = ann_pq_topk(SF, k=5, n_queries=5)
    a = set(map(tuple, approx[["query_id", "neighbor_id"]].values))
    recall = len(exact & a) / len(exact)
    assert recall >= 0.5, recall  # 8x16 codes + 4k-rerank on random vectors
    # determinism
    again = ann_pq_topk(SF, k=5, n_queries=5)
    assert approx.equals(again)


def test_ann_pq_full_shortlist_degenerates_to_exact():
    """With the shortlist covering the whole corpus, the exact re-rank IS the
    brute-force answer — the ADC approximation can only reorder the
    shortlist's tail, never drop a true neighbor."""
    from dedup_ray.pipelines.ann import ann_pq_topk

    exact = _exact_l2_topk(k=5, n_queries=3)
    full = ann_pq_topk(SF, k=5, n_queries=3, rerank=200)  # 1000 > corpus
    f = set(map(tuple, full[["query_id", "neighbor_id"]].values))
    assert f == exact


def test_kmeans_global_train_deterministic_and_converging():
    """Distributed Lloyd contract: (1) two runs are bit-identical (seeded
    init + block-ordered fold); (2) total inertia is non-increasing as
    iterations grow; (3) every vector is assigned (counts sum to corpus)."""
    import pyarrow.parquet as pq

    from dedup_ray.pipelines.ann import kmeans_global_train

    a = kmeans_global_train(SF, k=4, iters=3)
    b = kmeans_global_train(SF, k=4, iters=3)
    assert a.equals(b)
    n = pq.read_metadata(f"{SF}/embeddings.parquet").num_rows
    assert sum(a["n_vecs"].to_pylist()) == n

    def total_inertia(t):
        return sum(
            i * c for i, c in zip(t["inertia"].to_pylist(), t["n_vecs"].to_pylist())
        )

    prev = None
    for iters in (1, 2, 4):
        cur = total_inertia(kmeans_global_train(SF, k=4, iters=iters))
        if prev is not None:
            assert cur <= prev + 1e-9, (iters, cur, prev)
        prev = cur


def test_embedding_pca_matches_numpy_reference():
    import numpy as np
    import pyarrow.parquet as pq

    from dedup_ray.pipelines.ann import embedding_pca

    out = embedding_pca(SF, k=8)
    r = np.array(out["explained_var_ratio"].to_pylist())
    assert (np.diff(r) <= 1e-12).all()          # descending
    assert 0 < r.sum() <= 1.0 + 1e-9

    t = pq.read_table(f"{SF}/embeddings.parquet")
    m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    cov = np.cov(m, rowvar=False, bias=True)
    ev = np.maximum(np.linalg.eigvalsh(cov)[::-1], 0)
    ref = ev[:8] / ev.sum()
    np.testing.assert_allclose(r, ref, rtol=1e-6, atol=1e-9)

    again = embedding_pca(SF, k=8)
    np.testing.assert_allclose(  # stable to reread (batch splits may move)
        r, np.array(again["explained_var_ratio"].to_pylist()), rtol=1e-12
    )
