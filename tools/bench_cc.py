"""Micro-benchmark: driver union-find vs distributed alternating-star CC.

Reproduces the BASELINE.md "distributed CC vs driver union-find" row:
1M random edges over 600k string node ids (dense giant-component graph),
32 CPUs, byte-identical output check. Usage:

    python tools/bench_cc.py [n_edges] [n_nodes] [shape]

shape = "random" (default; one giant component — the adversarial case for
early retirement, nothing converges until the last round) or "clusters"
(dup-cluster-shaped: many small components with redundant internal edges,
the flagship's real edge distribution — the regime the round-5 early
retirement targets)."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 600_000
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    shape = sys.argv[3] if len(sys.argv) > 3 else "random"
    rng = np.random.default_rng(42)
    if shape == "clusters":
        # dup-cluster shape: components of size 2-16 (heavy on 2-5, like
        # real dup groups), each with a spanning chain + ~equal redundant
        # internal pairs — matches the flagship's post-pair-dedup edge
        # lists (many tiny stars, no giant component)
        sizes = rng.choice(
            [2, 3, 4, 5, 8, 16], p=[0.35, 0.25, 0.18, 0.12, 0.07, 0.03],
            size=max(4, n_nodes // 4),
        )
        sizes = sizes[np.cumsum(sizes) <= n_nodes]
        n_nodes = int(sizes.sum())
        start = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        cluster_of = np.repeat(np.arange(len(sizes)), sizes)
        node = np.arange(n_nodes)
        # spanning chain: (i, i-1) for every non-first member
        chain_mask = node != start[cluster_of]
        a = node[chain_mask]
        b = a - 1
        # redundant internal pairs to reach n_edges
        extra = max(0, n_edges - len(a))
        x = rng.integers(0, n_nodes, extra)
        cx = cluster_of[x]
        y = start[cx] + rng.integers(0, 1 << 30, extra) % sizes[cx]
        m = x != y
        a = np.concatenate([a, x[m]])
        b = np.concatenate([b, y[m]])
    else:
        a = rng.integers(0, n_nodes, n_edges)
        b = rng.integers(0, n_nodes, n_edges)
        keep = a != b
        a, b = a[keep], b[keep]
    ids = np.array([f"img_{i:07d}" for i in range(n_nodes)], dtype=object)
    t = pa.table(
        {
            "src_id": pa.array(list(ids[a]), type=pa.string()),
            "dst_id": pa.array(list(ids[b]), type=pa.string()),
        }
    )
    edges = rd.from_arrow(t).repartition(64).materialize()

    from dedup_ray.stages.cluster import _distributed_star, _driver_unionfind

    load0 = os.getloadavg()
    t0 = time.time()
    drv = _driver_unionfind(edges).to_pandas()
    t_driver = time.time() - t0

    t0 = time.time()
    dist = _distributed_star(edges).to_pandas()
    t_dist = time.time() - t0
    load1 = os.getloadavg()

    identical = drv.reset_index(drop=True).equals(dist.reset_index(drop=True))
    print(
        json.dumps(
            {
                "n_edges": int(len(a)),
                "n_nodes": n_nodes,
                "shape": shape,
                "driver_uf_sec": round(t_driver, 2),
                "distributed_star_sec": round(t_dist, 2),
                "ratio": round(t_dist / t_driver, 2),
                "identical": bool(identical),
                "loadavg_before": load0,
                "loadavg_after": load1,
            }
        )
    )
    ray.shutdown()
    return 0 if identical else 1


if __name__ == "__main__":
    raise SystemExit(main())
