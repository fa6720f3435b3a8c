"""Stage G — report aggregation & sinks.

~ DuplicateReport::from_groups (/root/reference/src/output.rs:39-73):
global stats {total, duplicate_rows, duplicate_clusters, wasted_bytes} where
wasted_bytes generalizes size*(n-1) to sum(byte_len) - byte_len(keeper) per
cluster (members may differ in size across formats). Per-cluster aggregation
is a groupby over the (small) cluster table; global totals are a driver-side
sum of the per-cluster rows — never a full-corpus materialization.

Sinks mirror the reference's human/json/quiet trio
(/root/reference/src/output.rs:76-130, src/main.rs:213-217).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from dedup_ray.stages.join import attach_pair_attrs  # noqa: F401 (sibling API)


BROADCAST_STATS_MAX_ROWS = 2_000_000


_STATS_CACHE: dict[bytes, tuple] = {}


class _StatsPartial:
    """Vectorized per-batch cluster-stat partials over the keys stream.

    The cluster map is shipped once as shared object-store blocks; each
    worker process builds (member-id hash index, int cluster codes, keeper
    flags) ONCE (module cache), then every batch is C-speed: hash probes via
    pandas get_indexer + np.bincount partial sums. Replaces a per-row Python
    dict loop that walked the ENTIRE corpus in the report stage."""

    def __init__(self, refs: list) -> None:
        self.refs = refs

    def _state(self):
        import pandas as pd
        import ray

        key = b"".join(r.binary() for r in self.refs)
        got = _STATS_CACHE.get(key)
        if got is None:
            ctbl = pa.concat_tables(
                [t for t in ray.get(self.refs) if t.num_rows]
            ).combine_chunks()
            member = np.asarray(ctbl["image_id"].to_pylist(), dtype=object)
            cluster = np.asarray(ctbl["cluster_id"].to_pylist(), dtype=object)
            codes, uniques = pd.factorize(cluster)
            got = (
                pd.Index(member),
                codes.astype(np.int64),
                member == cluster,  # member is its cluster's keeper
                len(uniques),
            )
            _STATS_CACHE.clear()
            _STATS_CACHE[key] = got
        return got

    def __call__(self, b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "image_id" not in b.column_names:
            return pa.schema(
                [("cluster_code", pa.int64()), ("pn", pa.int64()),
                 ("psum", pa.int64()), ("pkeep", pa.int64())]
            ).empty_table()
        index, codes, keeper, ncl = self._state()
        pos = index.get_indexer(b["image_id"].to_pylist())
        m = pos >= 0
        pos = pos[m]
        lens = b["byte_len"].to_numpy(zero_copy_only=False).astype(np.int64)[m]
        cc = codes[pos]
        pn = np.bincount(cc, minlength=ncl)
        psum = np.bincount(cc, weights=lens, minlength=ncl).astype(np.int64)
        kf = keeper[pos]
        pkeep = np.bincount(cc[kf], weights=lens[kf], minlength=ncl).astype(np.int64)
        nz = np.flatnonzero(pn)
        return pa.table(
            {
                "cluster_code": pa.array(nz, type=pa.int64()),
                "pn": pa.array(pn[nz], type=pa.int64()),
                "psum": pa.array(psum[nz], type=pa.int64()),
                "pkeep": pa.array(pkeep[nz], type=pa.int64()),
            }
        )


def cluster_stats(
    clusters: rd.Dataset,
    keys: rd.Dataset,
    total_rows: int,
    broadcast_max_rows: int = BROADCAST_STATS_MAX_ROWS,
) -> dict:
    """clusters(cluster_id, image_id) + keys(image_id, byte_len) -> stats.

    wasted_bytes per cluster = sum(byte_len) - byte_len(keeper); the keeper
    IS cluster_id (= min member id), so no extra lookup is needed. Fast path
    broadcasts the cluster map and streams keys once (no join); above the
    threshold it falls back to a hash join + coarse aggregation."""
    import ray

    n_cluster_rows = clusters.count()
    if n_cluster_rows == 0:
        return {
            "total_rows": total_rows,
            "duplicate_rows": 0,
            "duplicate_clusters": 0,
            "wasted_bytes": 0,
        }
    if n_cluster_rows <= broadcast_max_rows:
        refs = [r for r in clusters.to_arrow_refs()]
        partial = _StatsPartial(refs)
        pdf = (
            keys.select_columns(["image_id", "byte_len"])
            .map_batches(partial, batch_format="pyarrow", batch_size=8192)
            .to_pandas()
        )
        g = pdf.groupby("cluster_code").sum()
        return {
            "total_rows": total_rows,
            "duplicate_rows": int(g["pn"].sum()),
            "duplicate_clusters": int(len(g)),
            "wasted_bytes": int((g["psum"] - g["pkeep"]).sum()),
        }

    sizes = keys.select_columns(["image_id", "byte_len"])
    joined = clusters.join(sizes, join_type="inner", num_partitions=32, on=("image_id",))

    def per_cluster(g: pa.Table) -> pa.Table:
        n = g.num_rows
        keeper_idx = pc.index(g["image_id"], pc.min(g["image_id"]).as_py()).as_py()
        total = pc.sum(g["byte_len"]).as_py()
        wasted = total - g["byte_len"][keeper_idx].as_py()
        return pa.table(
            {
                "cluster_id": g["cluster_id"].slice(0, 1),
                "n": pa.array([n], type=pa.int64()),
                "wasted": pa.array([wasted], type=pa.int64()),
            }
        )

    per = joined.groupby("cluster_id").map_groups(per_cluster, batch_format="pyarrow")
    agg = per.sum(["n", "wasted"])
    n_clusters = per.count()
    return {
        "total_rows": total_rows,
        "duplicate_rows": int(agg["sum(n)"]),
        "duplicate_clusters": int(n_clusters),
        "wasted_bytes": int(agg["sum(wasted)"]),
    }


def write_report(
    stats: dict,
    counters: dict,
    path: str,
    clusters_sample: list[dict] | None = None,
) -> dict:
    report = {"stats": stats, "counters": counters}
    if clusters_sample is not None:
        report["groups_sample"] = clusters_sample
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(report, f, indent=2, default=str)
    os.replace(tmp, path)
    return report


def format_bytes(n: float) -> str:
    """Binary-unit formatter (~ /root/reference/src/util.rs:15-29)."""
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if abs(n) < 1024 or unit == "TB":
            return f"{n:.2f} {unit}" if unit != "B" else f"{int(n)} B"
        n /= 1024
    return f"{n:.2f} TB"  # pragma: no cover


def format_number(n: int) -> str:
    """Space-thousands formatter (~ /root/reference/src/util.rs:2-12)."""
    return f"{n:,}".replace(",", " ")


def parse_size(s: str) -> int:
    """'500M'/'2G'/'123' -> bytes (~ /root/reference/benchmark/generator.py:15-21)."""
    s = s.strip().upper()
    units = {"K": 1024, "M": 1024**2, "G": 1024**3, "T": 1024**4}
    if s and s[-1] in units:
        return int(float(s[:-1]) * units[s[-1]])
    return int(s)


def print_human(report: dict, verbose: bool = False) -> str:
    s = report["stats"]
    if s["duplicate_clusters"] == 0:
        return "No duplicates found."
    lines = [
        f"Total rows scanned: {format_number(s['total_rows'])}",
        f"Duplicate rows: {format_number(s['duplicate_rows'])} "
        f"in {format_number(s['duplicate_clusters'])} clusters",
        f"Wasted bytes: {format_bytes(float(s['wasted_bytes']))}",
    ]
    if verbose and report.get("groups_sample"):
        for g in report["groups_sample"]:
            lines.append(f"  {g['cluster_id']}: {g['n']} members")
    return "\n".join(lines)
