"""Stage F — connected components (union-find) over verified edges.

The near-dup relation is not transitive-by-construction (unlike the
reference's grouping-by-key equivalence classes, /root/reference/src/
grouping.rs:19-23), so clusters = connected components over the union of all
evidence edges (SURVEY.md D2). Two paths:

* driver union-find — when the edge count is small (verified edges are tiny
  relative to the corpus: dup pairs only), pulling (src,dst) strings to the
  driver and running path-compressed union-find is both faster and exactly
  deterministic. This is a bounded materialization: edges, never rows.
* distributed alternating star — Kiveris et al., "Connected Components in
  MapReduce and Beyond" (SOCC'14): repeat [large-star, small-star] rounds,
  each a map + groupby(min) shuffle over the edge set only, until the edge
  checksum stabilizes. No driver materialization; O(log n) rounds. Used
  above ``cfg.driver_unionfind_max_edges``.

Both produce clusters keyed by min member id (the deterministic keeper rule,
/root/reference/src/actions.rs:21-26) and are property-tested equal.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from dedup_ray.config import DedupConfig
from dedup_ray.functions.unionfind import UnionFind

CLUSTER_SCHEMA = pa.schema([("cluster_id", pa.string()), ("image_id", pa.string())])


def _driver_unionfind(edges: rd.Dataset, max_edges: int | None = None) -> rd.Dataset | None:
    """Stream edges once, then run vectorized min-label connected components.
    Returns None if ``max_edges`` is exceeded mid-stream (caller falls back to
    the distributed algorithm) — avoids a separate count() pass."""
    from dedup_ray.functions.unionfind import connected_components_np

    src_parts: list[np.ndarray] = []
    dst_parts: list[np.ndarray] = []
    seen = 0
    for batch in edges.select_columns(["src_id", "dst_id"]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        seen += batch.num_rows
        if max_edges is not None and seen > max_edges:
            return None
        src_parts.append(np.asarray(batch["src_id"].to_pylist(), dtype=object))
        dst_parts.append(np.asarray(batch["dst_id"].to_pylist(), dtype=object))
    if seen == 0:
        return rd.from_arrow(CLUSTER_SCHEMA.empty_table())
    nodes, root = connected_components_np(
        np.concatenate(src_parts), np.concatenate(dst_parts)
    )
    table = pa.table(
        {
            "cluster_id": pa.array(list(nodes[root]), type=pa.string()),
            "image_id": pa.array(list(nodes), type=pa.string()),
        }
    )
    order = pc.sort_indices(
        table, sort_keys=[("cluster_id", "ascending"), ("image_id", "ascending")]
    )
    return rd.from_arrow(table.take(order))


# ------------------------------------------------------- distributed star


def _large_star_group(g: pa.Table) -> pa.Table:
    u = g["u"][0].as_py()
    nbrs = g["v"].to_pylist()
    m = min(min(nbrs), u)
    out_v = [v for v in nbrs if v > u]
    return pa.table(
        {
            "u": pa.array(out_v, type=pa.string()),
            "v": pa.array([m] * len(out_v), type=pa.string()),
        }
    )


def _small_star_group(g: pa.Table) -> pa.Table:
    u = g["u"][0].as_py()
    nbrs = g["v"].to_pylist()
    m = min(min(nbrs), u)
    out = {v for v in nbrs if v != m}
    out.add(u)
    out.discard(m)
    out_v = sorted(out)
    return pa.table(
        {
            "u": pa.array(out_v, type=pa.string()),
            "v": pa.array([m] * len(out_v), type=pa.string()),
        }
    )


def _checksum(ds: rd.Dataset) -> tuple[int, int]:
    import zlib

    def h(b: pa.Table) -> pa.Table:
        # process-independent checksum (python hash() varies per worker)
        a = np.array(
            [
                zlib.crc32(f"{x}|{y}".encode())
                for x, y in zip(b["u"].to_pylist(), b["v"].to_pylist())
            ],
            dtype=np.int64,
        )
        return pa.table({"s": pa.array([int(a.sum())], type=pa.int64()),
                         "n": pa.array([len(a)], type=pa.int64())})

    agg = ds.map_batches(h, batch_format="pyarrow").sum(["s", "n"])
    return (agg["sum(s)"], agg["sum(n)"])


def _distributed_star(edges: rd.Dataset, max_iters: int = 25) -> rd.Dataset:
    # undirected edge list as (u, v) string pairs, self-loops dropped
    cur = edges.select_columns(["src_id", "dst_id"]).rename_columns(
        {"src_id": "u", "dst_id": "v"}
    )
    prev_sum = None
    for _ in range(max_iters):
        # large star: both orientations, group by u, link big neighbors to min
        both = cur.map_batches(
            lambda b: pa.table(
                {
                    "u": pa.concat_arrays([b["u"].combine_chunks() if isinstance(b["u"], pa.ChunkedArray) else b["u"],
                                           b["v"].combine_chunks() if isinstance(b["v"], pa.ChunkedArray) else b["v"]]),
                    "v": pa.concat_arrays([b["v"].combine_chunks() if isinstance(b["v"], pa.ChunkedArray) else b["v"],
                                           b["u"].combine_chunks() if isinstance(b["u"], pa.ChunkedArray) else b["u"]]),
                }
            ),
            batch_format="pyarrow",
        )
        ls = both.groupby("u").map_groups(_large_star_group, batch_format="pyarrow")
        # small star: orient (max -> min), group, link all to min
        oriented = ls.map_batches(
            lambda b: pa.table(
                {
                    "u": pc.max_element_wise(b["u"], b["v"]),
                    "v": pc.min_element_wise(b["u"], b["v"]),
                }
            ),
            batch_format="pyarrow",
        )
        cur = (
            oriented.groupby("u")
            .map_groups(_small_star_group, batch_format="pyarrow")
            .materialize()
        )
        s = _checksum(cur)
        if s == prev_sum:
            break
        prev_sum = s
    # converged: every edge is (node -> component min)
    out = cur.rename_columns({"u": "image_id", "v": "cluster_id"})
    # add the roots themselves as members of their cluster
    roots = (
        out.groupby("cluster_id")
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        .map_batches(
            lambda b: pa.table(
                {"image_id": b["cluster_id"], "cluster_id": b["cluster_id"]}
            ),
            batch_format="pyarrow",
        )
    )
    merged = out.select_columns(["cluster_id", "image_id"]).union(
        roots.select_columns(["cluster_id", "image_id"])
    )
    # dedup (node may appear twice transiently) + deterministic order
    return merged.groupby(["cluster_id", "image_id"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    ).sort(["cluster_id", "image_id"])


def cluster_stage(edges: rd.Dataset, cfg: DedupConfig) -> rd.Dataset:
    """edges -> clusters (cluster_id = min member id). Nodes without edges
    are implicit singletons and do not appear. Streams the edges ONCE into
    driver union-find; only if the stream exceeds the size bound does it pay
    for the distributed fixpoint (no up-front count pass)."""
    out = _driver_unionfind(edges, max_edges=cfg.driver_unionfind_max_edges)
    if out is not None:
        return out
    return _distributed_star(edges)  # pragma: no cover (exercised in tests explicitly)
