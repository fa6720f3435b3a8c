"""General relational operators over the TPC-H-ish driver tables — the
grouped-aggregate / filter / top-k / join / window capabilities the engine
needs around its dedup core. Each has a DuckDB oracle in __ray_entry__.py.

Float outputs are rounded to 2 decimals on BOTH sides (sum order differs
between engines; raw double sums differ in ulps)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from dedup_ray.sources.io import read_view


def q1_pricing_summary(sf_dir: str) -> rd.Dataset:
    """TPC-H Q1 shape: filtered grouped aggregate with per-batch partial
    aggregation before the shuffle. (l_returnflag, l_linestatus, sum_qty,
    sum_price, n_rows)."""

    def partial(b: pa.Table) -> pa.Table:
        import datetime

        cutoff = pa.scalar(datetime.datetime(1998, 9, 2), type=pa.timestamp("us"))
        b = b.filter(pc.less_equal(b["l_shipdate"], cutoff))
        df = b.to_pandas()
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            pq=("l_quantity", "sum"), pp=("l_extendedprice", "sum"), pn=("l_orderkey", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    ds = read_view(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_shipdate", "l_orderkey"],
    )
    agg = ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["l_returnflag", "l_linestatus"]
    ).sum(["pq", "pp", "pn"])
    return agg.map_batches(
        lambda b: pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "sum_qty": pc.round(b["sum(pq)"], 2),
                "sum_price": pc.round(b["sum(pp)"], 2),
                "n_rows": b["sum(pn)"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def filter_count(sf_dir: str) -> rd.Dataset:
    """Predicate pushdown + vectorized filter (~ scanner size/glob
    predicates): lineitem with qty>45 & discount<0.05 counted per returnflag:
    (l_returnflag, n)."""
    ds = read_view(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_discount"],
    )

    def part(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater(b["l_quantity"], 45.0), pc.less(b["l_discount"], 0.05))
        b = b.filter(keep)
        return b.group_by("l_returnflag").aggregate([("l_quantity", "count")]).rename_columns(
            ["l_returnflag", "pn"]
        )

    agg = ds.map_batches(part, batch_format="pyarrow").groupby("l_returnflag").sum("pn")
    return agg.map_batches(
        lambda b: pa.table(
            {"l_returnflag": b["l_returnflag"], "n": b["sum(pn)"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )


def top_orders(sf_dir: str, k: int = 10) -> rd.Dataset:
    """Distributed top-k: per-batch local top-k, then one small sort.
    (o_orderkey, o_totalprice) — values pass through unrecomputed, so the
    hash compare vs DuckDB is exact."""

    def local_topk(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            b, sort_keys=[("o_totalprice", "descending"), ("o_orderkey", "ascending")]
        )
        return b.take(idx[: k])

    ds = read_view(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


def revenue_by_segment(sf_dir: str) -> rd.Dataset:
    """Broadcast hash join (customer is the small side -> ray.put once, probe
    per batch; no shuffle — ray_guide 'Joins and lookups'):
    (c_mktsegment, n_orders, revenue)."""
    cust = read_view(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    class Probe:
        def __init__(self) -> None:
            self.lut = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            df = b.to_pandas()
            df["c_mktsegment"] = df["o_custkey"].map(self.lut)
            g = df.groupby("c_mktsegment", as_index=False).agg(
                pn=("o_orderkey", "size"), pr=("o_totalprice", "sum")
            )
            return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    ds = read_view(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    agg = ds.map_batches(Probe, batch_format="pyarrow", concurrency=(1, 4)).groupby(
        "c_mktsegment"
    ).sum(["pn", "pr"])
    return agg.map_batches(
        lambda b: pa.table(
            {
                "c_mktsegment": b["c_mktsegment"],
                "n_orders": b["sum(pn)"].cast(pa.int64()),
                "revenue": pc.round(b["sum(pr)"], 2),
            }
        ),
        batch_format="pyarrow",
    )


def supplier_nations(sf_dir: str) -> rd.Dataset:
    """Two-hop broadcast join supplier->nation->region:
    (r_name, n_suppliers)."""
    nation = read_view(f"{sf_dir}/nation.parquet").to_pandas()
    region = read_view(f"{sf_dir}/region.parquet").to_pandas()
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    lut = {k: r2name[v] for k, v in n2r.items()}
    ref = ray.put(lut)

    def probe(b: pa.Table) -> pa.Table:
        m = ray.get(ref)
        df = b.to_pandas()
        df["r_name"] = df["s_nationkey"].map(m)
        g = df.groupby("r_name", as_index=False).agg(pn=("s_suppkey", "size"))
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    ds = read_view(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    agg = ds.map_batches(probe, batch_format="pyarrow").groupby("r_name").sum("pn")
    return agg.map_batches(
        lambda b: pa.table(
            {"r_name": b["r_name"], "n_suppliers": b["sum(pn)"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )


def events_hourly(sf_dir: str) -> rd.Dataset:
    """Tumbling-window aggregate over the event stream (batch window per
    ray_guide 'Streaming-shaped workloads'): (event_type, hour_bucket,
    n_events). hour_bucket = epoch_seconds // 3600."""

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        ts_us = df["ts"].astype("datetime64[us]").astype("int64")
        df["hour_bucket"] = (ts_us // 10**6) // 3600
        g = df.groupby(["event_type", "hour_bucket"], as_index=False).agg(
            pn=("event_id", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    ds = read_view(f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "ts"])
    agg = ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["event_type", "hour_bucket"]
    ).sum("pn")
    return agg.map_batches(
        lambda b: pa.table(
            {
                "event_type": b["event_type"],
                "hour_bucket": b["hour_bucket"].cast(pa.int64()),
                "n_events": b["sum(pn)"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def sessionize(sf_dir: str, gap_minutes: int = 30) -> rd.Dataset:
    """Session windows per user (gap-based): groupby(user) -> sorted
    map_groups computing session ids, then per-session stats:
    (user_id, session_idx, n_events, duration_us). Ordering assumption:
    within one user's group, events are sorted by ts inside map_groups."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        gap = g["ts"].diff().dt.total_seconds().fillna(0) > gap_minutes * 60
        sid = gap.cumsum().astype("int64")
        out = (
            g.assign(session_idx=sid)
            .groupby("session_idx", as_index=False)
            .agg(n_events=("event_id", "size"),
                 start=("ts", "min"), end=("ts", "max"))
        )
        out["user_id"] = g["user_id"].iloc[0]
        out["duration_us"] = (
            (out["end"] - out["start"]).dt.total_seconds().mul(1_000_000).round().astype("int64")
        )
        return out[["user_id", "session_idx", "n_events", "duration_us"]]

    ds = read_view(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])
    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")
