"""trade_graph_pagerank vs a single-process numpy reference replay."""

import numpy as np
import pyarrow.parquet as pq

from dedup_ray.pipelines.relational import trade_graph_pagerank

SF = "/root/testdata/sf0.001"


def _reference_ranks(iters: int = 12, d: float = 0.85):
    """Dense single-process PageRank over the same bipartite graph."""
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )
    od = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    cust_by_order = dict(
        zip(od["o_orderkey"].to_pylist(), od["o_custkey"].to_pylist())
    )
    w: dict[tuple[int, int], int] = {}
    for ok, sk in zip(li["l_orderkey"].to_pylist(), li["l_suppkey"].to_pylist()):
        cu, su = 2 * cust_by_order[ok], 2 * sk + 1
        w[(cu, su)] = w.get((cu, su), 0) + 1
        w[(su, cu)] = w.get((su, cu), 0) + 1
    keys = np.array(sorted({a for a, _ in w} | {b for _, b in w}), np.int64)
    idx = {int(x): i for i, x in enumerate(keys)}
    n = len(keys)
    mat = np.zeros((n, n))
    for (a, b), ww in w.items():
        mat[idx[a], idx[b]] = ww
    outw = mat.sum(axis=1)
    rank = np.full(n, 1.0 / n)
    for _ in range(iters):
        rank = (1.0 - d) / n + d * (mat.T @ (rank / outw))
    return keys, rank


def test_pagerank_matches_reference_and_sums_to_one():
    top = trade_graph_pagerank(SF, iters=12, k=10_000_000).to_pandas()
    keys, rank = _reference_ranks(iters=12)
    assert len(top) == len(keys)
    np.testing.assert_allclose(top["rank"].sum(), 1.0, rtol=1e-9)
    got = {
        (r.node_type, int(r.key)): r.rank for r in top.itertuples(index=False)
    }
    for x, r in zip(keys, rank):
        nt = "customer" if x % 2 == 0 else "supplier"
        assert abs(got[(nt, int(x) // 2)] - r) < 1e-9


def test_pagerank_stable_across_runs():
    # float fold order follows the shuffle's block layout, so cross-run
    # equality is tolerance-level (1e-12), not bit-level — the documented
    # rows-only contract; exactness vs the reference is the test above
    a = trade_graph_pagerank(SF, iters=4, k=10_000_000).to_pandas()
    b = trade_graph_pagerank(SF, iters=4, k=10_000_000).to_pandas()
    assert len(a) == len(b)
    am = {(r.node_type, int(r.key)): r.rank for r in a.itertuples(index=False)}
    bm = {(r.node_type, int(r.key)): r.rank for r in b.itertuples(index=False)}
    assert am.keys() == bm.keys()
    assert max(abs(am[k] - bm[k]) for k in am) < 1e-12
    # ranked non-increasing
    assert (a["rank"].values[:-1] >= a["rank"].values[1:]).all()


def test_pagerank_rank_as_dataset_matches_driver_path():
    """The at-scale swap (rank vector as a Dataset, two exchanges per
    iteration, no driver-held node state) must agree with the driver loop
    to float-association tolerance on the full node set."""
    a = trade_graph_pagerank(SF, iters=6, k=10_000_000).to_pandas()
    b = trade_graph_pagerank(
        SF, iters=6, k=10_000_000, rank_as_dataset=True
    ).to_pandas()
    assert len(a) == len(b)
    am = {(r.node_type, int(r.key)): r.rank for r in a.itertuples(index=False)}
    bm = {(r.node_type, int(r.key)): r.rank for r in b.itertuples(index=False)}
    assert am.keys() == bm.keys()
    assert max(abs(am[k] - bm[k]) for k in am) < 1e-9
    np.testing.assert_allclose(b["rank"].sum(), 1.0, rtol=1e-9)
    # top-k truncation agrees on membership for a mid-size k
    a10 = trade_graph_pagerank(SF, iters=6, k=10).to_pandas()
    b10 = trade_graph_pagerank(SF, iters=6, k=10, rank_as_dataset=True).to_pandas()
    assert set(zip(a10.node_type, a10.key)) == set(zip(b10.node_type, b10.key))


def test_pagerank_auto_gate_routes_by_node_bound(monkeypatch):
    """rank_as_dataset=None gates on the edge-count node bound: a forced
    tiny DEDUP_PAGERANK_NODE_MAX must route through the dataset path and
    still agree with the driver loop (round-5 verdict #2: the swap engages
    from a measured threshold, not a manual flag)."""
    a = trade_graph_pagerank(SF, iters=3, k=10_000_000).to_pandas()
    monkeypatch.setenv("DEDUP_PAGERANK_NODE_MAX", "1")
    b = trade_graph_pagerank(SF, iters=3, k=10_000_000).to_pandas()
    am = {(r.node_type, int(r.key)): r.rank for r in a.itertuples(index=False)}
    bm = {(r.node_type, int(r.key)): r.rank for r in b.itertuples(index=False)}
    assert am.keys() == bm.keys()
    assert max(abs(am[k] - bm[k]) for k in am) < 1e-9
