"""Stage B — exact tier: hash-equality grouping -> star edges + rep collapse.

~ the reference's group_by_full_hash (/root/reference/src/hasher.rs:83-85,
51-73): group on a digest, HAVING count>=2 (singleton suppression,
src/grouping.rs:21). Deliberate departures, all for scale:

* groups emit STAR edges (min-member -> each other member), not member lists
  or all pairs: O(n) rows per group, so a 10^6-member identical-image cluster
  (the north-star's named hot case) costs 10^6 edge rows, not 10^12 pairs.
  Connectivity (and thus union-find output) is identical.
* ONE coarse hash-partitioned shuffle per grouping with vectorized run
  processing inside (stages/grouped.py) — no per-group Python, no joins.
* after the exact tier, rows identical in BOTH pixels and caption collapse to
  one representative for the near-dup tiers. Lossless for recall: collapsed
  rows are indistinguishable to every later tier, so the rep's edges stand in
  for all members' (the exact tier de-fangs hot LSH buckets before they
  exist). Singletons are their own rep (invariant D4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from dedup_ray.stages.grouped import grouped_runs, run_starts
from dedup_ray.state.metrics import inc_counter

EDGE_SCHEMA = pa.schema(
    [
        ("src_id", pa.string()),
        ("dst_id", pa.string()),
        ("evidence", pa.string()),
        ("score", pa.float64()),
    ]
)


def _star_edges_runs(key_col: str, evidence: str):
    """Vectorized star-edge emission over all runs of a coarse bucket.
    Rows arrive sorted by (key, image_id), so each run's FIRST row is its
    min-id keeper (D3, /root/reference/src/actions.rs:21-26)."""

    def fn(g: pa.Table) -> pa.Table:
        keys = np.asarray(g[key_col].to_pylist(), dtype=object)
        ids = np.asarray(g["image_id"].to_pylist(), dtype=object)
        starts = run_starts(keys)
        bounds = np.append(starts, len(keys))
        sizes = np.diff(bounds)
        dup_runs = np.flatnonzero(sizes >= 2)
        if dup_runs.size == 0:
            return EDGE_SCHEMA.empty_table()
        # src = run head repeated (size-1); dst = run tail
        src_parts, dst_parts = [], []
        for r in dup_runs:
            s, e = bounds[r], bounds[r + 1]
            src_parts.append(np.repeat(ids[s], e - s - 1))
            dst_parts.append(ids[s + 1 : e])
        src = np.concatenate(src_parts)
        dst = np.concatenate(dst_parts)
        inc_counter(f"exact_dup_groups_{evidence}", int(dup_runs.size))
        n = len(src)
        return pa.table(
            {
                "src_id": pa.array(list(src), type=pa.string()),
                "dst_id": pa.array(list(dst), type=pa.string()),
                "evidence": pa.array([evidence] * n, type=pa.string()),
                "score": pa.array([1.0] * n, type=pa.float64()),
            }
        )

    return fn


def exact_edges(keys: rd.Dataset, key_col: str) -> rd.Dataset:
    """Star edges linking rows equal on ``key_col`` (content_hash /
    pixel_hash). One coarse shuffle of (image_id, key) rows."""
    proj = keys.select_columns(["image_id", key_col])
    return grouped_runs(
        proj,
        key_col,
        _star_edges_runs(key_col, key_col),
        sort_cols=[key_col, "image_id"],
    )


def collapse_reps(keys: rd.Dataset) -> rd.Dataset:
    """One representative row per (pixel_hash, caption_hash) class; rep =
    min(image_id). Output: image_id, phash, caption, caption_hash."""
    out_cols = ["image_id", "phash", "caption", "caption_hash"]
    proj = keys.select_columns(
        ["image_id", "pixel_hash", "caption_hash", "phash", "caption"]
    )

    def add_class_key(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key = pc.binary_join_element_wise(b["pixel_hash"], b["caption_hash"], "|")
        return b.append_column("class_key", key)

    keyed = proj.map_batches(add_class_key, batch_format="pyarrow")

    def first_of_run(g: pa.Table) -> pa.Table:
        keys_arr = np.asarray(g["class_key"].to_pylist(), dtype=object)
        starts = run_starts(keys_arr)
        return g.take(pa.array(starts)).select(out_cols)

    return grouped_runs(
        keyed,
        "class_key",
        first_of_run,
        sort_cols=["class_key", "image_id"],
    )
