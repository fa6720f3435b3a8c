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
import re
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

_PART_RE = re.compile(r"^part=(\d{4})$")


def export_partitioned(
    ds: rd.Dataset,
    out_dir: str,
    key: str,
    num_partitions: int = 64,
) -> dict:
    """Write ``ds`` as ``out_dir/part=NNNN/data.parquet`` where NNNN =
    hash(key) % num_partitions — one atomically-committed directory per
    partition (tmp + rename + _SUCCESS marker), with a manifest recording
    the partitioning config and per-partition row counts.

    Resume semantics: a re-run SKIPS partitions whose marker exists —
    skipped rows are dropped by a map-side pre-filter BEFORE the shuffle,
    so resuming a mostly-done export moves only the missing partitions'
    bytes. Leftover ``part=NNNN.tmp.*`` dirs from a crashed attempt are
    swept at start (they never match the committed-name pattern, so a torn
    write can neither crash the resume nor pollute ``part=*/data.parquet``
    globs). A re-run with a DIFFERENT key or partition count is rejected
    against the manifest — mixed hashing schemes in one directory would
    silently duplicate/drop rows on read-back.

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
    manifest_path = os.path.join(out_dir, "manifest.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            prior = json.load(f)
        if prior.get("key") != key or prior.get("num_partitions") != num_partitions:
            raise ValueError(
                f"export dir {out_dir} was written with key="
                f"{prior.get('key')!r}/num_partitions={prior.get('num_partitions')} "
                f"— resuming with key={key!r}/num_partitions={num_partitions} "
                "would mix hashing schemes; use a fresh directory"
            )
    # sweep torn tmp dirs from crashed attempts (reference leftover-cleanup
    # rule, src/actions.rs:127-131)
    for d in os.listdir(out_dir):
        if ".tmp." in d and d.startswith("part="):
            shutil.rmtree(os.path.join(out_dir, d), ignore_errors=True)
    done = {
        int(m.group(1))
        for d in os.listdir(out_dir)
        if (m := _PART_RE.match(d))
        and os.path.exists(os.path.join(out_dir, d, "_SUCCESS"))
    }
    done_arr = np.sort(np.fromiter(done, dtype=np.int64, count=len(done)))
    done_ref = ray.put(done_arr)

    def drop_done(b: pa.Table) -> pa.Table:
        """Map-side pre-filter: rows of committed partitions never shuffle."""
        d = ray.get(done_ref)
        if d.size == 0 or b.num_rows == 0:
            return b
        part = coarse_hash(b[key], num_partitions)
        pos = np.minimum(np.searchsorted(d, part), d.size - 1)
        return b.filter(pa.array(d[pos] != part))

    def write_bucket(g: pa.Table) -> pa.Table:
        ack_schema = pa.schema([("part", pa.int64()), ("rows", pa.int64())])
        if g.num_rows == 0:
            return ack_schema.empty_table()
        part = int(coarse_hash(g[key], num_partitions)[0])
        final = os.path.join(out_dir, f"part={part:04d}")
        tmp = final + f".tmp.{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        # g arrives sorted by key (grouped_runs sort_cols default)
        pq.write_table(g, os.path.join(tmp, "data.parquet"))
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write(str(g.num_rows))
        if os.path.isdir(final):  # torn prior attempt without a marker
            shutil.rmtree(final)
        os.replace(tmp, final)
        return pa.table(
            {"part": pa.array([part], pa.int64()),
             "rows": pa.array([g.num_rows], pa.int64())}
        )

    acks = grouped_runs(
        ds.map_batches(drop_done, batch_format="pyarrow"),
        key, write_bucket, num_buckets=num_partitions,
    ).to_pandas()
    has_acks = len(acks) and "part" in acks.columns
    stats = {
        "partitions_written": int(len(acks)) if has_acks else 0,
        "partitions_skipped": len(done),
        "rows": int(acks.rows.sum()) if has_acks else 0,
    }
    prior_written = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            prior_written = {
                int(k): v for k, v in json.load(f).get("written", {}).items()
            }
    if has_acks:
        prior_written.update(
            {int(r.part): int(r.rows) for r in acks.itertuples()}
        )
    with open(manifest_path + ".tmp", "w") as f:
        json.dump(
            {
                "key": key,
                "num_partitions": num_partitions,
                "written": {str(k): prior_written[k] for k in sorted(prior_written)},
            },
            f,
            indent=1,
        )
    os.replace(manifest_path + ".tmp", manifest_path)
    return stats
