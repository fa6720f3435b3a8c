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


@pytest.mark.parametrize("seed", [0, 3])
def test_distributed_dictionary_matches_driver(seed):
    """Forcing node_broadcast_max below the node count routes through the
    range-partitioned rank dictionary + join-based encode/decode — output
    must stay byte-identical to driver union-find (round-4 task #3)."""
    rng = np.random.default_rng(seed)
    n = 80
    nodes = [f"n{i:03d}" for i in range(n)]
    pairs = []
    for _ in range(70):
        i, j = rng.integers(0, n, 2)
        if i != j:
            pairs.append((nodes[min(i, j)], nodes[max(i, j)]))
    a = _driver_unionfind(rd.from_arrow(_edges_table(pairs))).to_pandas()
    b = _distributed_star(
        rd.from_arrow(_edges_table(pairs)).repartition(6).materialize(),
        node_broadcast_max=10,
    ).to_pandas()
    assert list(a["image_id"]) == list(b["image_id"])
    assert list(a["cluster_id"]) == list(b["cluster_id"])


def test_early_retirement_mixed_graph():
    """Round-5 early retirement: small stars converge (and retire) in round
    one while a long path component keeps iterating — the final assignment
    must equal driver union-find exactly, and the retirement counters must
    show work actually left the loop early."""
    from dedup_ray.state.metrics import reset_counters, snapshot_counters

    nodes = [f"n{i:03d}" for i in range(40)]
    pairs = [(nodes[0], nodes[1]), (nodes[2], nodes[3]), (nodes[2], nodes[4])]
    # a 20-node path: needs several star rounds to converge
    pairs += [(nodes[10 + i], nodes[11 + i]) for i in range(19)]
    # a redundant clique-ish cluster
    pairs += [
        (nodes[35], nodes[36]), (nodes[35], nodes[37]),
        (nodes[36], nodes[37]), (nodes[35], nodes[37]),
    ]
    a = _driver_unionfind(rd.from_arrow(_edges_table(pairs))).to_pandas()
    reset_counters()
    b = _distributed_star(
        rd.from_arrow(_edges_table(pairs)).repartition(4).materialize()
    ).to_pandas()
    assert list(a["image_id"]) == list(b["image_id"])
    assert list(a["cluster_id"]) == list(b["cluster_id"])
    counters = snapshot_counters()
    assert counters.get("cc_retired_components", 0) >= 3
    assert counters.get("cc_retired_edges", 0) >= 3


def test_early_retirement_all_singleton_stars():
    """A graph that is ALL tiny stars retires entirely at the first check —
    zero fixpoint rounds — and still yields the exact cluster table."""
    pairs = [(f"a{i:02d}", f"b{i:02d}") for i in range(12)]
    # min-id orientation: cluster root is the lexicographic min of each pair
    a = _driver_unionfind(rd.from_arrow(_edges_table(pairs))).to_pandas()
    b = _distributed_star(
        rd.from_arrow(_edges_table(pairs)).repartition(3).materialize()
    ).to_pandas()
    assert list(a["image_id"]) == list(b["image_id"])
    assert list(a["cluster_id"]) == list(b["cluster_id"])


def test_block_contract_preserves_components():
    """Per-block local-CC contraction keeps the component structure and is
    idempotent on a converged star set."""
    from dedup_ray.stages.cluster import _block_contract

    t = pa.table(
        {"u": pa.array([5, 7, 9, 2, 11], type=pa.int64()),
         "v": pa.array([7, 9, 5, 1, 12], type=pa.int64())}
    )
    out = _block_contract(t)
    got = set(zip(out["u"].to_pylist(), out["v"].to_pylist()))
    # components {5,7,9} min 5, {1,2} min 1, {11,12} min 11
    assert got == {(7, 5), (9, 5), (2, 1), (12, 11)}
    # idempotence on the star set
    out2 = _block_contract(out)
    got2 = set(zip(out2["u"].to_pylist(), out2["v"].to_pylist()))
    assert got2 == got
