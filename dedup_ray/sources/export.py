"""Resumable partitioned Parquet sink.

The reference's crash-safe apply step (tmp+rename, leftover cleanup —
/root/reference/src/actions.rs:118-136) generalized to the OUTPUT side of a
pipeline: results are written one directory per key-range partition, each
committed atomically, so a failed export re-run skips finished partitions
instead of rewriting the world. This is the sink-side complement of
state/checkpoint.py's per-stage (and per-chunk) lineage.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd


def export_partitioned(
    ds: rd.Dataset,
    out_dir: str,
    key: str,
    num_partitions: int = 64,
) -> dict:
    """Write ``ds`` as ``out_dir/part=NNNN/data.parquet`` where NNNN =
    hash(key) % num_partitions — one atomically-committed directory per
    partition (tmp + rename + _SUCCESS marker), with a manifest recording
    per-partition row counts. A re-run over the same input SKIPS partitions
    whose marker exists (resume = cheap), and a torn partial write (no
    marker) is discarded and rewritten.

    Scale shape: ONE coarse hash-partition shuffle (the same grouped_runs
    machinery as every wide stage) whose buckets ARE the output partitions;
    each bucket's write happens inside its own task — the driver only
    collects (partition, rows) acks. ``num_partitions`` bounds both task
    memory and the unit of loss on failure; raise it with data size exactly
    like every other bucket knob. Deterministic partition assignment
    (process-independent key hash) is what makes skip-on-resume sound.

    Returns {"partitions_written": n, "partitions_skipped": n, "rows": n}.
    """
    from dedup_ray.stages.grouped import coarse_hash, grouped_runs

    os.makedirs(out_dir, exist_ok=True)
    done = {
        int(d.split("=")[1])
        for d in os.listdir(out_dir)
        if d.startswith("part=")
        and os.path.exists(os.path.join(out_dir, d, "_SUCCESS"))
    }
    done_ref = ray.put(sorted(done))

    def write_bucket(g: pa.Table) -> pa.Table:
        import numpy as np

        ack_schema = pa.schema([("part", pa.int64()), ("rows", pa.int64())])
        if g.num_rows == 0:
            return ack_schema.empty_table()
        part = int(coarse_hash(g[key], num_partitions)[0])
        if part in set(ray.get(done_ref)):
            return pa.table(
                {"part": pa.array([part], pa.int64()),
                 "rows": pa.array([-1], pa.int64())}  # -1 = skipped
            )
        final = os.path.join(out_dir, f"part={part:04d}")
        tmp = final + f".tmp.{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(g.sort_by(key), os.path.join(tmp, "data.parquet"))
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write(str(g.num_rows))
        # discard a torn prior attempt (no _SUCCESS), then commit
        if os.path.isdir(final):
            import shutil

            shutil.rmtree(final)
        os.replace(tmp, final)
        return pa.table(
            {"part": pa.array([part], pa.int64()),
             "rows": pa.array([g.num_rows], pa.int64())}
        )

    acks = grouped_runs(
        ds, key, write_bucket, num_buckets=num_partitions
    ).to_pandas()
    written = acks[acks.rows >= 0] if len(acks) else acks
    skipped = int((acks.rows < 0).sum()) if len(acks) else 0
    stats = {
        "partitions_written": int(len(written)),
        "partitions_skipped": skipped,
        "rows": int(written.rows.sum()) if len(written) else 0,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(
            {
                "key": key,
                "num_partitions": num_partitions,
                "written": {int(r.part): int(r.rows) for r in written.itertuples()},
                "skipped": sorted(int(p) for p in acks[acks.rows < 0].part)
                if len(acks) else [],
            },
            f,
            indent=1,
        )
    return stats
