"""Plain union-find (disjoint set) with path compression + union by size.

Used by (a) the single-process oracle, and (b) the small-edge-count fast path
of the clustering stage (below ``DedupConfig.driver_unionfind_max_edges`` the
verified edge set is tiny relative to the corpus and driver-side union-find
beats an iterative distributed fixpoint). Cluster representative = min member
id, matching the deterministic keeper rule generalized from the reference's
``select_original`` (/root/reference/src/actions.rs:21-26).
"""

from __future__ import annotations

from collections.abc import Iterable


class UnionFind:
    def __init__(self) -> None:
        self.parent: dict[str, str] = {}
        self.size: dict[str, int] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        if p == x:
            self.size.setdefault(x, 1)
            return x
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.size[ra] < self.size[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.size[ra] += self.size[rb]

    def components(self) -> dict[str, str]:
        """node -> cluster_id where cluster_id = min(member ids)."""
        groups: dict[str, list[str]] = {}
        for node in self.parent:
            groups.setdefault(self.find(node), []).append(node)
        out: dict[str, str] = {}
        for members in groups.values():
            rep = min(members)
            for m in members:
                out[m] = rep
        return out


def connected_components(edges: Iterable[tuple[str, str]]) -> dict[str, str]:
    """node -> min-member cluster_id over the edge list (nodes with no edges
    are absent — callers treat absence as a singleton cluster)."""
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    return uf.components()


def cc_codes(a, b, n):
    """Vectorized connected components over integer-coded endpoints: min-code
    hooking + pointer jumping (C-speed). ``a``/``b`` are equal-length int
    arrays of node codes in [0, n); returns ``parent`` where parent[i] is
    the minimum CODE in i's component (a canonical root under whatever order
    the coding imposes — callers wanting min-LABEL roots re-rank after)."""
    import numpy as np

    parent = np.arange(n, dtype=np.int64)
    while True:
        pa_, pb_ = parent[a], parent[b]
        hi = np.maximum(pa_, pb_)
        lo = np.minimum(pa_, pb_)
        np.minimum.at(parent, hi, lo)
        while True:  # pointer jumping to idempotence
            pp = parent[parent]
            if np.array_equal(pp, parent):
                break
            parent = pp
        if (parent[a] == parent[b]).all():
            break
    return parent


def connected_components_np(src, dst):
    """Vectorized connected components: min-label hooking + pointer jumping
    (C-speed; ~10x the pure-Python union-find on 10^5+ edges).

    ``src``/``dst`` are equal-length arrays of node labels (any np-sortable
    dtype). Returns (nodes, root_idx): sorted unique node array and, per
    node, the index INTO ``nodes`` of its component's minimum member — so
    ``nodes[root_idx[i]]`` is node i's cluster id under the min-member
    keeper rule (D3). Property-tested equal to UnionFind.
    """
    import numpy as np

    both = np.concatenate([np.asarray(src), np.asarray(dst)])
    nodes, inv = np.unique(both, return_inverse=True)
    # codes ARE label ranks (np.unique sorts), so min code == min label
    parent = cc_codes(inv[: len(src)], inv[len(src):], len(nodes))
    return nodes, parent
