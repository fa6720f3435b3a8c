"""Attach (lookup-join) helpers.

Candidate pairs need per-endpoint attributes (phash, minhash_sig, caption)
for verification. Two strategies, chosen by the small side's size
(ray_guide "Joins and lookups"):

* broadcast — ``ray.put`` the attribute table ONCE, every verify task reads
  the shared object-store copy and look ups are a numpy/dict probe per batch.
  No shuffle. Right for side tables that fit a worker's heap (after the
  exact-tier collapse the rep table is drastically smaller than the corpus).
* shuffle — ``Dataset.join`` (hash-partitioned) twice, once per endpoint.
  The 100 TB path: pairs and attrs are both hash-partitioned on the id, only
  (id, sig, phash, caption) rows move.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


ATTACH_BROADCAST_MAX_ROWS = 2_000_000


class _BroadcastAttacher:
    """map_batches callable holding the broadcast lookup (resolved once per
    actor from the shared object ref, not re-shipped per batch)."""

    def __init__(self, attrs_ref: ray.ObjectRef, columns: list[str]) -> None:
        attrs: pa.Table = ray.get(attrs_ref)
        ids = attrs["image_id"].to_pylist()
        self.index = {v: i for i, v in enumerate(ids)}
        self.attrs = attrs
        self.columns = columns

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = batch
        for side in ("src", "dst"):
            keys = batch[f"{side}_id"].to_pylist()
            rows = np.array([self.index[k] for k in keys], dtype=np.int64)
            taken = self.attrs.take(pa.array(rows))
            for col in self.columns:
                out = out.append_column(f"{side}_{col}", taken[col])
        return out


def attach_pair_attrs(
    pairs: rd.Dataset,
    attrs: rd.Dataset,
    columns: list[str],
    broadcast_max_rows: int = ATTACH_BROADCAST_MAX_ROWS,
    num_partitions: int = 64,
) -> rd.Dataset:
    """pairs(src_id, dst_id, ...) + attrs(image_id, ...) ->
    pairs + {src,dst}_{col...}.

    Strategy auto-selected on the attr row count (a cheap metadata count for
    checkpointed parquet inputs).
    """
    n = attrs.count()
    if n <= broadcast_max_rows:
        tbl = pa.concat_tables(ray.get(attrs.select_columns(["image_id"] + columns).to_arrow_refs()))
        ref = ray.put(tbl)
        # autoscaling pool (min 1) + fractional CPU: a fixed pool could grab
        # every core up-front and starve the upstream shuffle tasks of this
        # same lazy pipeline (observed deadlock on an 8-CPU session)
        return pairs.map_batches(
            _BroadcastAttacher,
            fn_constructor_args=(ref, columns),
            batch_format="pyarrow",
            concurrency=(1, 4),
            num_cpus=0.5,
        )
    # shuffle path: two hash joins
    side = attrs.select_columns(["image_id"] + columns)
    out = pairs.join(
        side,
        join_type="inner",
        num_partitions=num_partitions,
        on=("src_id",),
        right_on=("image_id",),
    )
    for col in columns:
        out = out.rename_columns({col: f"src_{col}"})
    out = out.join(
        side,
        join_type="inner",
        num_partitions=num_partitions,
        on=("dst_id",),
        right_on=("image_id",),
    )
    for col in columns:
        out = out.rename_columns({col: f"dst_{col}"})
    return out
