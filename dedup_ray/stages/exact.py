"""Stage B — exact tier: hash-equality grouping -> star edges + rep collapse.

~ the reference's group_by_full_hash (/root/reference/src/hasher.rs:83-85,
51-73): group on a digest, HAVING count>=2 (singleton suppression,
src/grouping.rs:21). Two deliberate departures, both for scale:

* groups emit STAR edges (min-member -> each other member), not member lists
  or all pairs: O(n) rows per group, so a 10^6-member identical-image cluster
  (the north-star's named hot case) costs 10^6 edge rows, not 10^12 pairs.
  Connectivity (and thus union-find output) is identical.
* after the exact tier, rows identical in BOTH pixels and caption collapse to
  one representative for the near-dup tiers. Lossless for recall: collapsed
  rows are indistinguishable to every later tier, so the rep's edges stand in
  for all members' (SURVEY.md §7.3.2 — the exact tier de-fangs hot LSH
  buckets before they exist).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

EDGE_SCHEMA = pa.schema(
    [
        ("src_id", pa.string()),
        ("dst_id", pa.string()),
        ("evidence", pa.string()),
        ("score", pa.float64()),
    ]
)


def _star_edges(group: pa.Table, evidence: str) -> pa.Table:
    """HAVING n>=2 -> edges (min_id -> other members)."""
    n = group.num_rows
    if n < 2:
        return EDGE_SCHEMA.empty_table()
    ids = group["image_id"]
    rep = pc.min(ids).as_py()
    others = ids.filter(pc.not_equal(ids, rep))
    # ids are unique, so exactly n-1 others
    return pa.table(
        {
            "src_id": pa.array([rep] * len(others), type=pa.string()),
            "dst_id": others.combine_chunks() if isinstance(others, pa.ChunkedArray) else others,
            "evidence": pa.array([evidence] * len(others), type=pa.string()),
            "score": pa.array([1.0] * len(others), type=pa.float64()),
        }
    )


def exact_edges(keys: rd.Dataset, key_col: str) -> rd.Dataset:
    """Edges linking rows equal on ``key_col`` (content_hash / pixel_hash).

    The groupby is the shuffle; only (image_id, key) rows move.
    """
    proj = keys.select_columns(["image_id", key_col])
    return proj.groupby(key_col).map_groups(
        lambda g: _star_edges(g, evidence=key_col), batch_format="pyarrow"
    )


def collapse_reps(keys: rd.Dataset) -> rd.Dataset:
    """One representative row per (pixel_hash, caption_hash) class.

    rep = min(image_id), the deterministic keeper rule (D3,
    /root/reference/src/actions.rs:21-26). Output keeps what the near-dup
    tiers need: image_id, phash, caption, caption_hash.
    """

    def pick_rep(group: pa.Table) -> pa.Table:
        idx = pc.index(group["image_id"], pc.min(group["image_id"]).as_py())
        row = group.slice(idx.as_py(), 1)
        return row.select(["image_id", "phash", "caption", "caption_hash"])

    proj = keys.select_columns(
        ["image_id", "pixel_hash", "caption_hash", "phash", "caption"]
    )
    return proj.groupby(["pixel_hash", "caption_hash"]).map_groups(
        pick_rep, batch_format="pyarrow"
    )
