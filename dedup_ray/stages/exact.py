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


EXACT_TIER_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),  # 'edge' | 'rep' | 'size'
        ("src_id", pa.string()),
        ("dst_id", pa.string()),
        ("image_id", pa.string()),
        ("phash", pa.int64()),
        ("caption", pa.string()),
        ("caption_hash", pa.string()),
        ("byte_len", pa.int64()),
    ]
)


def exact_tier(keys: rd.Dataset) -> rd.Dataset:
    """FUSED exact tier: ONE coarse shuffle keyed on pixel_hash produces the
    star edges (pixel-equality groups), the collapsed reps (first row per
    (pixel_hash, caption_hash) class), AND per-row 'size' rows
    (image_id, byte_len) for the report aggregates — a tagged union table
    split downstream with cheap filters.

    Three outputs from one shuffle matter: `keys` then has exactly ONE
    consumer, so the expensive decode stage STREAMS into this shuffle with no
    materialization barrier. Works because the rep key (pixel, caption) is a
    refinement of the edge key (pixel): one sort by (pixel_hash,
    caption_hash, image_id) serves all three computations.
    """
    proj = keys.select_columns(
        ["image_id", "pixel_hash", "caption_hash", "phash", "caption", "byte_len"]
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        px = np.asarray(g["pixel_hash"].to_pylist(), dtype=object)
        ch = np.asarray(g["caption_hash"].to_pylist(), dtype=object)
        ids = np.asarray(g["image_id"].to_pylist(), dtype=object)
        n = len(ids)
        # --- edges: runs of pixel_hash; keeper = min id in run (the sort is
        # by (px, ch, id), so min id needs an explicit min over the run)
        pb = np.append(run_starts(px), n)
        src_parts, dst_parts = [], []
        n_groups = 0
        for r in np.flatnonzero(np.diff(pb) >= 2):
            s, e = int(pb[r]), int(pb[r + 1])
            run = ids[s:e]
            rep = run.min()
            others = run[run != rep]
            src_parts.append(np.repeat(rep, len(others)))
            dst_parts.append(others)
            n_groups += 1
        if n_groups:
            inc_counter("exact_dup_groups_pixel_hash", n_groups)
        src = np.concatenate(src_parts) if src_parts else np.empty(0, dtype=object)
        dst = np.concatenate(dst_parts) if dst_parts else np.empty(0, dtype=object)
        # --- reps: first row of each (px, ch) run (sorted by id within run)
        class_keys = np.fromiter(
            (a + "|" + b for a, b in zip(px, ch)), dtype=object, count=n
        )
        rep_idx = run_starts(class_keys)
        reps = g.take(pa.array(rep_idx))
        n_e, n_r = len(src), len(rep_idx)
        none_e: list = [None] * n_e
        return pa.table(
            {
                "kind": pa.array(
                    ["edge"] * n_e + ["rep"] * n_r + ["size"] * n, type=pa.string()
                ),
                "src_id": pa.array(list(src) + [None] * (n_r + n), type=pa.string()),
                "dst_id": pa.array(list(dst) + [None] * (n_r + n), type=pa.string()),
                "image_id": pa.array(
                    none_e + reps["image_id"].to_pylist() + list(ids), type=pa.string()
                ),
                "phash": pa.array(
                    [0] * n_e + reps["phash"].to_pylist() + [0] * n, type=pa.int64()
                ),
                "caption": pa.array(
                    none_e + reps["caption"].to_pylist() + [None] * n, type=pa.string()
                ),
                "caption_hash": pa.array(
                    none_e + reps["caption_hash"].to_pylist() + [None] * n,
                    type=pa.string(),
                ),
                "byte_len": pa.array(
                    [0] * n_e
                    + [0] * n_r
                    + list(g["byte_len"].to_numpy(zero_copy_only=False)),
                    type=pa.int64(),
                ),
            }
        )

    return grouped_runs(
        proj,
        "pixel_hash",
        per_bucket,
        sort_cols=["pixel_hash", "caption_hash", "image_id"],
    )


def split_exact_tier(fused: rd.Dataset) -> tuple[rd.Dataset, rd.Dataset, rd.Dataset]:
    """Tagged union -> (edges, reps, sizes); three filters over one pinned
    dataset."""
    import pyarrow.compute as pc

    def edges_only(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["kind"], "edge"))
        n = b.num_rows
        return pa.table(
            {
                "src_id": b["src_id"],
                "dst_id": b["dst_id"],
                "evidence": pa.array(["pixel_hash"] * n, type=pa.string()),
                "score": pa.array([1.0] * n, type=pa.float64()),
            }
        )

    def reps_only(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["kind"], "rep"))
        return b.select(["image_id", "phash", "caption", "caption_hash"])

    def sizes_only(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["kind"], "size"))
        return b.select(["image_id", "byte_len"])

    return (
        fused.map_batches(edges_only, batch_format="pyarrow"),
        fused.map_batches(reps_only, batch_format="pyarrow"),
        fused.map_batches(sizes_only, batch_format="pyarrow"),
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
