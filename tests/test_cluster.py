"""Clustering: driver union-find vs distributed alternating-star equivalence
(property test over random edge sets) + report stats."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from dedup_ray.config import DedupConfig
from dedup_ray.functions.unionfind import connected_components
from dedup_ray.stages.cluster import _distributed_star, _driver_unionfind, cluster_stage


def _edges_table(pairs):
    return pa.table(
        {
            "src_id": pa.array([a for a, _ in pairs]),
            "dst_id": pa.array([b for _, b in pairs]),
            "evidence": pa.array(["t"] * len(pairs)),
            "score": pa.array([1.0] * len(pairs)),
        }
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_distributed_star_matches_driver(seed):
    rng = np.random.default_rng(seed)
    n = 60
    nodes = [f"n{i:03d}" for i in range(n)]
    pairs = []
    for _ in range(50):
        i, j = rng.integers(0, n, 2)
        if i != j:
            pairs.append((nodes[min(i, j)], nodes[max(i, j)]))
    edges = rd.from_arrow(_edges_table(pairs))
    a = _driver_unionfind(edges).to_pandas()
    b = _distributed_star(rd.from_arrow(_edges_table(pairs))).to_pandas()
    da = dict(zip(a["image_id"], a["cluster_id"]))
    db = dict(zip(b["image_id"], b["cluster_id"]))
    expected = connected_components(pairs)
    assert da == expected
    assert db == expected
    # the vectorized numpy CC agrees with the pointerful union-find
    from dedup_ray.functions.unionfind import connected_components_np

    nodes, root = connected_components_np(
        np.array([p[0] for p in pairs], dtype=object),
        np.array([p[1] for p in pairs], dtype=object),
    )
    dc = dict(zip(nodes.tolist(), nodes[root].tolist()))
    assert dc == expected


def test_cluster_stage_empty():
    cfg = DedupConfig()
    empty = rd.from_arrow(_edges_table([]))
    assert cluster_stage(empty, cfg).count() == 0


def test_cluster_stage_transitive_chain():
    cfg = DedupConfig()
    edges = rd.from_arrow(_edges_table([("a", "b"), ("b", "c"), ("x", "y")]))
    out = cluster_stage(edges, cfg).to_pandas()
    m = dict(zip(out["image_id"], out["cluster_id"]))
    assert m == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
