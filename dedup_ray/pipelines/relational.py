"""General relational operators over the TPC-H-ish driver tables — the
grouped-aggregate / filter / top-k / join / window capabilities the engine
needs around its dedup core. Each has a DuckDB oracle in __ray_entry__.py.

Float outputs are rounded to 2 decimals on BOTH sides (sum order differs
between engines; raw double sums differ in ulps)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from dedup_ray.sources.io import read_view


_PROBE_CACHE: dict[bytes, tuple] = {}


def q1_pricing_summary(sf_dir: str) -> rd.Dataset:
    """TPC-H Q1 shape: filtered grouped aggregate with per-batch partial
    aggregation before the shuffle. (l_returnflag, l_linestatus, sum_qty,
    sum_price, n_rows)."""

    def partial(b: pa.Table) -> pa.Table:
        import datetime

        cutoff = pa.scalar(datetime.datetime(1998, 9, 2), type=pa.timestamp("us"))
        b = b.filter(pc.less_equal(b["l_shipdate"], cutoff))
        # Arrow C++ hash aggregation — no pandas round-trip in the hot path
        g = b.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("l_orderkey", "count", pc.CountOptions(mode="all"))]
        )
        return pa.table(
            {
                "l_returnflag": g["l_returnflag"],
                "l_linestatus": g["l_linestatus"],
                "pq": g["l_quantity_sum"],
                "pp": g["l_extendedprice_sum"],
                "pn": g["l_orderkey_count"],
            }
        )

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
    (l_returnflag, n). The predicate is ALSO pushed into the scan (row groups
    whose stats exclude it never leave storage); the in-batch filter stays as
    the authoritative row-level gate."""
    import pyarrow.dataset as pads

    ds = read_view(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_discount"],
        predicate=(pads.field("l_quantity") > 45.0)
        & (pads.field("l_discount") < 0.05),
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
    ).to_arrow_refs()
    ref = ray.put(cust)

    class Probe:
        """Broadcast hash join, fully vectorized: the small side is shipped
        once as sorted (key, dict-code) numpy arrays; each batch probes via
        np.searchsorted (O(n log m), C speed) and aggregates with Arrow's
        C++ group_by — no pandas, no per-row Python. Passed as an INSTANCE
        (stateless elastic tasks, per-process cached build) so the ObjectRef
        never sits in actor constructor args (ray#53727 restart warning)."""

        def __init__(self, side_ref: ray.ObjectRef) -> None:
            self.ref = side_ref

        def _side(self):
            got = _PROBE_CACHE.get(self.ref.binary())
            if got is None:
                t = pa.concat_tables(ray.get(ray.get(self.ref))).combine_chunks()
                keys = t["c_custkey"].to_numpy()
                seg = t["c_mktsegment"].combine_chunks().dictionary_encode()
                order = np.argsort(keys, kind="stable")
                got = (keys[order], seg.indices.to_numpy().astype(np.int64)[order],
                       seg.dictionary)
                _PROBE_CACHE.clear()
                _PROBE_CACHE[self.ref.binary()] = got
            return got

        def __call__(self, b: pa.Table) -> pa.Table:
            self.keys, self.codes, self.segments = self._side()
            ck = b["o_custkey"].to_numpy()
            if len(self.keys) == 0:  # degenerate empty small side: inner join = 0 rows
                ck = ck[:0]
                b = b.slice(0, 0)
            pos = np.minimum(np.searchsorted(self.keys, ck), max(len(self.keys) - 1, 0))
            hit = self.keys[pos] == ck  # inner-join: drop FK misses
            code = self.codes[pos[hit]]
            t = pa.table(
                {"seg_code": code, "o_totalprice": b["o_totalprice"].filter(pa.array(hit))}
            )
            g = t.group_by("seg_code").aggregate(
                [("o_totalprice", "sum"),
                 ("o_totalprice", "count", pc.CountOptions(mode="all"))]
            )
            return pa.table(
                {
                    "c_mktsegment": self.segments.take(g["seg_code"]),
                    "pn": g["o_totalprice_count"],
                    "pr": g["o_totalprice_sum"],
                }
            )

    ds = read_view(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    agg = ds.map_batches(Probe(ref), batch_format="pyarrow").groupby(
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
        keys = np.fromiter(m.keys(), dtype=np.int64)
        names = pa.array(list(m.values()))
        order = np.argsort(keys, kind="stable")
        keys, names = keys[order], names.take(pa.array(order))
        nk = b["s_nationkey"].to_numpy()
        if len(keys) == 0:
            nk = nk[:0]
        pos = np.minimum(np.searchsorted(keys, nk), max(len(keys) - 1, 0))
        hit = keys[pos] == nk
        t = pa.table({"r_name": names.take(pa.array(pos[hit]))})
        g = t.group_by("r_name").aggregate(
            [("r_name", "count", pc.CountOptions(mode="all"))]
        )
        return pa.table({"r_name": g["r_name"], "pn": g["r_name_count"]})

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
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        hour = pc.divide(pc.divide(ts_us, 10**6), 3600)  # ints are non-negative: trunc == floor
        t = pa.table({"event_type": b["event_type"], "hour_bucket": hour})
        g = t.group_by(["event_type", "hour_bucket"]).aggregate(
            [("hour_bucket", "count", pc.CountOptions(mode="all"))]
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "hour_bucket": g["hour_bucket"],
                "pn": g["hour_bucket_count"],
            }
        )

    ds = read_view(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])
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
    """Session windows per user (gap-based):
    (user_id, session_idx, n_events, duration_us).

    One vectorized pass per coarse bucket of complete user groups (sorted by
    user_id, ts, event_id): session breaks, per-user cumulative session ids
    and per-session spans all via numpy — task count is independent of the
    number of users (was: one pandas call per user)."""
    from dedup_ray.stages.grouped import grouped_runs

    gap_us = gap_minutes * 60 * 1_000_000
    schema = pa.schema(
        [("user_id", pa.int64()), ("session_idx", pa.int64()),
         ("n_events", pa.int64()), ("duration_us", pa.int64())]
    )

    def sess_runs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return schema.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        tsv = g["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        brk = np.zeros(n, dtype=bool)
        brk[1:] = (tsv[1:] - tsv[:-1]) > gap_us
        brk &= ~new_user
        cum = np.cumsum(brk)
        ustart = np.flatnonzero(new_user)
        base = np.repeat(cum[ustart], np.diff(np.append(ustart, n)))
        sid = cum - base  # per-user session index, 0-based
        sess_start = new_user | brk
        sb = np.flatnonzero(sess_start)
        se = np.append(sb[1:], n)
        return pa.table(
            {
                "user_id": pa.array(uid[sb], type=pa.int64()),
                "session_idx": pa.array(sid[sb], type=pa.int64()),
                "n_events": pa.array(se - sb, type=pa.int64()),
                "duration_us": pa.array(tsv[se - 1] - tsv[sb], type=pa.int64()),
            }
        )

    ds = read_view(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])
    return grouped_runs(ds, "user_id", sess_runs, sort_cols=["user_id", "ts", "event_id"])


def asof_join_clicks(sf_dir: str) -> rd.Dataset:
    """As-of join (attribution window): each purchase event joined to the
    same user's most recent click at or before its timestamp:
    (event_id, user_id, ts, click_ts, lag_us). Purchases with no prior
    click drop out (inner as-of, DuckDB ASOF JOIN semantics).

    Ray-Data-first custom operator: ONE hash-partitioned shuffle on user_id
    (grouped_runs), then a fully vectorized last-click forward-fill per
    bucket — rows sorted by (user_id, ts, event_type) ['click' < 'purchase'
    lexicographically, so an equal-ts click is eligible], click positions
    forward-filled with np.maximum.accumulate, validity = filled position
    inside the row's own user run. Partitioning assumption: one user's rows
    fit a bucket (same as sessionize); no per-user Python calls.
    """
    from dedup_ray.stages.grouped import grouped_runs

    schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("ts", pa.timestamp("us")), ("click_ts", pa.timestamp("us")),
         ("lag_us", pa.int64())]
    )

    def asof_runs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return schema.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        tsv = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        is_click = pc.equal(g["event_type"], "click").to_numpy(zero_copy_only=False)
        idx = np.arange(n, dtype=np.int64)
        last_click = np.maximum.accumulate(np.where(is_click, idx, -1))
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        ustart = np.flatnonzero(new_user)
        run_start = np.repeat(ustart, np.diff(np.append(ustart, n)))
        sel = (~is_click) & (last_click >= run_start)
        src = last_click[sel]
        return pa.table(
            {
                "event_id": pa.array(
                    g["event_id"].to_numpy(zero_copy_only=False)[sel], type=pa.int64()
                ),
                "user_id": pa.array(uid[sel], type=pa.int64()),
                "ts": pa.array(tsv[sel], type=pa.timestamp("us")),
                "click_ts": pa.array(tsv[src], type=pa.timestamp("us")),
                "lag_us": pa.array(tsv[sel] - tsv[src], type=pa.int64()),
            }
        )

    def keep_types(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.is_in(b["event_type"], value_set=pa.array(["click", "purchase"]))
        )

    ds = read_view(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    ).map_batches(keep_types, batch_format="pyarrow")
    return grouped_runs(
        ds, "user_id", asof_runs, sort_cols=["user_id", "ts", "event_type"]
    )


def sliding_window_counts(sf_dir: str, window_minutes: int = 30) -> rd.Dataset:
    """Sliding-window aggregate: for every event, the number of same-user
    events in the preceding ``window_minutes`` (inclusive, RANGE-frame peer
    semantics — equal-ts rows count each other): (event_id, user_id, ts,
    n_win). Oracle: DuckDB `count(*) OVER (PARTITION BY user_id ORDER BY ts
    RANGE INTERVAL .. PRECEDING)`.

    Vectorized per bucket with NO per-user work: each user run is shifted
    onto one shared monotonic axis with inter-run gaps wider than the
    window (run-relative ts + cumsum of run durations + W + 1), after which
    two global np.searchsorted calls yield every row's frame bounds at
    C speed. Gap construction bounds the int64 cumsum by
    n_runs_per_bucket x (max run duration + W); at extreme scale raise
    num_buckets rather than widening buckets.
    """
    from dedup_ray.stages.grouped import grouped_runs

    w_us = window_minutes * 60 * 1_000_000
    schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("ts", pa.timestamp("us")), ("n_win", pa.int64())]
    )

    def win_runs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return schema.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        tsv = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new_user)
        counts = np.diff(np.append(starts, n))
        ts_rel = tsv - np.repeat(tsv[starts], counts)
        last_rel = ts_rel[np.append(starts[1:], n) - 1]  # per-run duration
        shifts = np.concatenate(
            [[0], np.cumsum(last_rel[:-1] + w_us + 1)]
        ).astype(np.int64)
        key = ts_rel + np.repeat(shifts, counts)
        lo = np.searchsorted(key, key - w_us, side="left")
        hi = np.searchsorted(key, key, side="right")
        return pa.table(
            {
                "event_id": pa.array(
                    g["event_id"].to_numpy(zero_copy_only=False), type=pa.int64()
                ),
                "user_id": pa.array(uid, type=pa.int64()),
                "ts": pa.array(tsv, type=pa.timestamp("us")),
                "n_win": pa.array(hi - lo, type=pa.int64()),
            }
        )

    ds = read_view(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    return grouped_runs(
        ds, "user_id", win_runs, sort_cols=["user_id", "ts", "event_id"]
    )


def order_revenue_join(sf_dir: str) -> rd.Dataset:
    """Big-big shuffle hash join (TPC-H Q12 shape): orders ⋈ lineitem on
    orderkey — neither side is broadcastable at scale, so both are
    co-partitioned in ONE shuffle (stages/join.shuffle_join) and the revenue
    aggregate is pre-reduced per bucket before the tiny final groupby:
    (o_orderpriority, n_items, revenue)."""
    from dedup_ray.stages.join import shuffle_join

    orders = read_view(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    items = read_view(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    joined = shuffle_join(orders, items, on="o_orderkey", right_on="l_orderkey")

    def partial(b: pa.Table) -> pa.Table:
        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        t = pa.table({"o_orderpriority": b["o_orderpriority"], "rev": rev})
        g = t.group_by("o_orderpriority").aggregate(
            [("rev", "sum"), ("rev", "count", pc.CountOptions(mode="all"))]
        )
        return pa.table(
            {
                "o_orderpriority": g["o_orderpriority"],
                "pn": g["rev_count"],
                "pr": g["rev_sum"],
            }
        )

    agg = joined.map_batches(partial, batch_format="pyarrow").groupby(
        "o_orderpriority"
    ).sum(["pn", "pr"])
    return agg.map_batches(
        lambda b: pa.table(
            {
                "o_orderpriority": b["o_orderpriority"],
                "n_items": b["sum(pn)"].cast(pa.int64()),
                "revenue": pc.round(b["sum(pr)"], 2),
            }
        ),
        batch_format="pyarrow",
    )


def nation_revenue(sf_dir: str) -> rd.Dataset:
    """Three-table composition (TPC-H Q5 shape): customer -> orders ->
    lineitem revenue per nation: (n_name, n_items, revenue).

    Join plan: the DIMENSION hops (customer->nationkey, nationkey->name)
    are broadcast lookups probed inside map_batches — same bounded-side
    rule as revenue_by_segment, with the shuffle-join fallback documented
    there; the FACT-FACT hop (orders x lineitem) is the one co-partitioned
    shuffle (stages/join.shuffle_join). Revenue is summed as EXACT int64
    ten-thousandths (cents x discount-percent) and divided once at the end,
    so both engines emit bit-identical doubles — no float-sum rounding
    caveat. (Int64 headroom: ~1e9 units/row, overflow only past ~9e9 rows
    per nation — shard the partial key by nation+salt long before that.)"""
    from dedup_ray.stages.join import shuffle_join

    cust = read_view(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    nation = read_view(f"{sf_dir}/nation.parquet").to_pandas()
    n2name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    ck = cust["c_custkey"].to_numpy(dtype=np.int64)
    order_ck = np.argsort(ck, kind="stable")
    ref = ray.put(
        (
            ck[order_ck],
            cust["c_nationkey"].to_numpy(dtype=np.int64)[order_ck],
            n2name,
        )
    )

    def tag_nation(b: pa.Table) -> pa.Table:
        keys, nkeys, names = ray.get(ref)
        okey = b["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(keys, okey), max(len(keys) - 1, 0))
        hit = keys[pos] == okey if len(keys) else np.zeros(len(okey), bool)
        nk = nkeys[pos[hit]]
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"].filter(pa.array(hit)),
                "n_name": pa.array(
                    [names[int(k)] for k in nk], type=pa.string()
                ),
            }
        )

    orders = read_view(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(tag_nation, batch_format="pyarrow")
    items = read_view(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    joined = shuffle_join(orders, items, on="o_orderkey", right_on="l_orderkey")

    def partial(b: pa.Table) -> pa.Table:
        cents = np.round(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        dpct = np.round(
            (1.0 - b["l_discount"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        t = pa.table(
            {"n_name": b["n_name"],
             "r": pa.array(cents * dpct, type=pa.int64())}
        )
        g = t.group_by("n_name").aggregate(
            [("r", "sum"), ("r", "count", pc.CountOptions(mode="all"))]
        )
        return pa.table(
            {"n_name": g["n_name"], "pn": g["r_count"], "pr": g["r_sum"]}
        )

    agg = joined.map_batches(partial, batch_format="pyarrow").groupby(
        "n_name"
    ).sum(["pn", "pr"])
    return agg.map_batches(
        lambda b: pa.table(
            {
                "n_name": b["n_name"],
                "n_items": b["sum(pn)"].cast(pa.int64()),
                "revenue": pc.divide(
                    b["sum(pr)"].cast(pa.float64()), pa.scalar(10000.0)
                ),
            }
        ),
        batch_format="pyarrow",
    )


def event_transitions(sf_dir: str) -> rd.Dataset:
    """Per-user event-type transition counts (first-order Markov matrix):
    (prev_type, next_type, n) over consecutive events of the same user —
    the sequence-analysis staple behind funnel / next-event models.

    Scale shape: the event_gaps shuffle (ONE hash partition on user_id);
    the bucket kernel shifts the type column once and pre-aggregates to
    (prev, next, n) partials, so the final groupby merges at most
    |type-domain|² rows per bucket. Oracle: lag(event_type) window."""
    from dedup_ray.stages.grouped import grouped_runs

    def pair_counts(g: pa.Table) -> pa.Table:
        n = g.num_rows
        empty = pa.table(
            {"prev_type": pa.array([], type=pa.string()),
             "next_type": pa.array([], type=pa.string()),
             "pn": pa.array([], type=pa.int64())}
        )
        if n < 2:
            return empty
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"]
        same = uid[1:] == uid[:-1]
        t = pa.table(
            {"prev_type": et.slice(0, n - 1).combine_chunks(),
             "next_type": et.slice(1, n - 1).combine_chunks()}
        ).filter(pa.array(same))
        if t.num_rows == 0:
            return empty
        agg = t.group_by(["prev_type", "next_type"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"prev_type": agg["prev_type"], "next_type": agg["next_type"],
             "pn": agg["count_all"].cast(pa.int64())}
        )

    ds = read_view(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )
    parts = grouped_runs(
        ds, "user_id", pair_counts, sort_cols=["user_id", "ts", "event_id"]
    )
    agg = parts.groupby(["prev_type", "next_type"]).sum("pn")
    return agg.map_batches(
        lambda b: pa.table(
            {"prev_type": b["prev_type"], "next_type": b["next_type"],
             "n": b["sum(pn)"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )


def bulk_order_priorities(sf_dir: str, min_qty: float = 49.0) -> rd.Dataset:
    """Left-semi shuffle join (TPC-H Q4 shape): orders having at least one
    lineitem with quantity > min_qty, counted per priority. The probe side is
    pre-shrunk per batch (filter + local distinct on the key) BEFORE the
    shuffle, so only qualifying keys move: (o_orderpriority, n_orders)."""
    return _order_priorities_vs_bulk(sf_dir, "semi", min_qty)


def quiet_order_priorities(sf_dir: str, min_qty: float = 49.0) -> rd.Dataset:
    """Left-anti shuffle join: orders with NO lineitem above min_qty, counted
    per priority — the complement of bulk_order_priorities, same single
    co-partitioning shuffle: (o_orderpriority, n_orders)."""
    return _order_priorities_vs_bulk(sf_dir, "anti", min_qty)


def _order_priorities_vs_bulk(sf_dir: str, how: str, min_qty: float) -> rd.Dataset:
    from dedup_ray.stages.join import shuffle_join

    orders = read_view(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )

    def bulk_keys(b: pa.Table) -> pa.Table:
        keys = b.filter(pc.greater(b["l_quantity"], min_qty))["l_orderkey"]
        return pa.table({"l_orderkey": pc.unique(keys)})

    items = read_view(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    ).map_batches(bulk_keys, batch_format="pyarrow")
    hits = shuffle_join(orders, items, on="o_orderkey", right_on="l_orderkey",
                        how=how)
    return _priority_counts(hits)


def _priority_counts(hits: rd.Dataset) -> rd.Dataset:
    """(o_orderpriority, n_orders) from semi/anti-join hits: per-batch
    partial counts before the tiny priority groupby."""

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by("o_orderpriority").aggregate(
            [("o_orderkey", "count", pc.CountOptions(mode="all"))]
        )
        return pa.table(
            {"o_orderpriority": g["o_orderpriority"], "pn": g["o_orderkey_count"]}
        )

    agg = hits.map_batches(partial, batch_format="pyarrow").groupby(
        "o_orderpriority"
    ).sum("pn")
    return agg.map_batches(
        lambda b: pa.table(
            {
                "o_orderpriority": b["o_orderpriority"],
                "n_orders": b["sum(pn)"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def bulk_order_priorities_bloom(
    sf_dir: str, min_qty: float = 49.0, fpp: float = 0.01
) -> rd.Dataset:
    """``bulk_order_priorities`` with a Bloom prefilter on the probe side —
    the 100-TB semi-join reduction made concrete. Value-identical to the
    plain semi join (same oracle SQL): the Bloom bitmap only drops
    GUARANTEED-miss probe rows before the co-partitioning shuffle; false
    positives (~``fpp``) survive to the exact shuffle_join and die there.

    Scale shape: per-batch partial bitmaps (bitwise-OR-mergeable) are built
    worker-side over the already-distinct key rows and folded on the driver
    — driver state is ONE bitmap of m/8 bytes, sized from the probe-side
    metadata row count (an upper bound on distinct keys, so the realized
    fpp only improves). At 1e9+ keys the fold becomes a tree-reduce of the
    same OR and the bitmap ships once via ray.put (zero-copy reads in every
    probe task); the rows the filter prunes never enter the shuffle, which
    is the whole point. Pruned-row count lands in the ``bloom_pruned_rows``
    counter."""
    import ray

    from dedup_ray.functions.bloom import bloom_build, bloom_params, bloom_probe
    from dedup_ray.stages.join import shuffle_join

    items = read_view(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )
    m_bits, k = bloom_params(max(items.count(), 1), fpp)

    def bulk_keys(b: pa.Table) -> pa.Table:
        keys = b.filter(pc.greater(b["l_quantity"], min_qty))["l_orderkey"]
        return pa.table({"l_orderkey": pc.unique(keys)})

    keys_ds = items.map_batches(bulk_keys, batch_format="pyarrow").materialize()

    def bitmap_partial(b: pa.Table) -> pa.Table:
        bm = bloom_build(
            b["l_orderkey"].to_numpy(zero_copy_only=False), m_bits, k
        )
        return pa.table({"bm": pa.array([bm.tobytes()], type=pa.binary())})

    bitmap = np.zeros(m_bits // 64, dtype=np.uint64)
    for t in ray.get(
        keys_ds.map_batches(bitmap_partial, batch_format="pyarrow")
        .to_arrow_refs()
    ):
        if t.num_rows and "bm" in t.column_names:
            for buf in t["bm"].to_pylist():
                bitmap |= np.frombuffer(buf, dtype=np.uint64)
    ref = ray.put(bitmap)

    orders = read_view(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )

    def probe(b: pa.Table) -> pa.Table:
        bm = ray.get(ref)
        keep = bloom_probe(
            b["o_orderkey"].to_numpy(zero_copy_only=False), bm, k
        )
        pruned = int((~keep).sum())
        if pruned:
            from dedup_ray.state.metrics import inc_counter

            inc_counter("bloom_pruned_rows", pruned)
        return b.filter(pa.array(keep))

    survivors = orders.map_batches(probe, batch_format="pyarrow")
    hits = shuffle_join(
        survivors, keys_ds, on="o_orderkey", right_on="l_orderkey", how="semi",
        left_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_orderpriority", pa.string())]
        ),
        right_schema=pa.schema([("l_orderkey", pa.int64())]),
    )
    return _priority_counts(hits)


# Price bands for the range join: [lo, hi) — a small static dimension side.
PRICE_BANDS = [
    ("budget", 0.0, 950.0),
    ("mid", 950.0, 1050.0),
    ("premium", 1050.0, 2000.0),
]


def range_join_price_bands(sf_dir: str) -> rd.Dataset:
    """Non-equi range join: every part matched to the price band whose
    [lo, hi) interval contains its retail price, then aggregated:
    (band, n_parts, avg_price). The dimension side is tiny and static, so
    the join is broadcast binning — np.searchsorted against the sorted band
    edges per batch, no shuffle (the 100 TB path for any small interval
    dimension: ship the edges once, bin vectorized). Parts outside every
    band drop (inner join). Oracle: DuckDB non-equi JOIN ON price >= lo AND
    price < hi over a literal VALUES band table.
    """
    names = [b[0] for b in PRICE_BANDS]
    los = np.array([b[1] for b in PRICE_BANDS])
    his = np.array([b[2] for b in PRICE_BANDS])
    # contiguous check not required: bin against each band's own [lo, hi)
    edges = los  # bands sorted by lo; searchsorted picks candidate band

    def bin_parts(b: pa.Table) -> pa.Table:
        price = b["p_retailprice"].to_numpy()
        cand = np.clip(np.searchsorted(edges, price, side="right") - 1, 0, len(names) - 1)
        hit = (price >= los[cand]) & (price < his[cand])
        cc = cand[hit]
        t = pa.table({"band_code": cc, "price": price[hit]})
        g = t.group_by("band_code").aggregate(
            [("price", "sum"),
             ("price", "count", pc.CountOptions(mode="all"))]
        )
        return pa.table(
            {
                "band_code": g["band_code"],
                "pn": g["price_count"],
                "ps": g["price_sum"],
            }
        )

    ds = read_view(f"{sf_dir}/part.parquet", columns=["p_retailprice"])
    agg = ds.map_batches(bin_parts, batch_format="pyarrow").groupby("band_code").sum(
        ["pn", "ps"]
    )
    name_arr = pa.array(names, type=pa.string())

    def final(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "band": name_arr.take(b["band_code"].cast(pa.int64())),
                "n_parts": b["sum(pn)"].cast(pa.int64()),
                "avg_price": pc.round(
                    pc.divide(b["sum(ps)"], b["sum(pn)"].cast(pa.float64())), 2
                ),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow")


def event_gaps(sf_dir: str) -> rd.Dataset:
    """Lag window: time since the same user's PREVIOUS event:
    (event_id, user_id, ts, gap_us). First event per user drops (inner lag —
    avoids NULL semantics differences). One hash-partitioned shuffle on
    user_id, then a vectorized shifted-difference per bucket — the lag/lead
    primitive rounding out the window family (sessionize / sliding / as-of).
    Oracle: DuckDB lag() OVER (PARTITION BY user_id ORDER BY ts, event_id).
    """
    from dedup_ray.stages.grouped import grouped_runs

    schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("ts", pa.timestamp("us")), ("gap_us", pa.int64())]
    )

    def gap_runs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return schema.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        tsv = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = np.zeros(n, dtype=bool)
        keep[1:] = uid[1:] == uid[:-1]  # has a previous row of the same user
        gap = np.empty(n, dtype=np.int64)
        gap[1:] = tsv[1:] - tsv[:-1]
        return pa.table(
            {
                "event_id": pa.array(
                    g["event_id"].to_numpy(zero_copy_only=False)[keep],
                    type=pa.int64(),
                ),
                "user_id": pa.array(uid[keep], type=pa.int64()),
                "ts": pa.array(tsv[keep], type=pa.timestamp("us")),
                "gap_us": pa.array(gap[keep], type=pa.int64()),
            }
        )

    ds = read_view(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    return grouped_runs(ds, "user_id", gap_runs, sort_cols=["user_id", "ts", "event_id"])


def events_debounced(sf_dir: str, min_gap_s: int = 300) -> rd.Dataset:
    """Debounce filter: keep an event iff it is the user's FIRST event or
    arrived >= ``min_gap_s`` after the user's previous event (lag semantics:
    the gap is measured to the previous RAW event, not the previous kept
    one — that keeps it a pure window expression both engines agree on):
    (event_id, user_id, ts). The stream-hygiene staple — collapsing
    double-clicks / retry storms before sessionization.

    Scale shape: identical to ``event_gaps`` — ONE hash-partitioned shuffle
    on user_id, then a vectorized shifted-difference keep-mask per bucket.
    Oracle: lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id).
    """
    from dedup_ray.stages.grouped import grouped_runs

    gap_us = np.int64(min_gap_s * 1_000_000)
    schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("ts", pa.timestamp("us"))]
    )

    def debounce_runs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return schema.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        tsv = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = np.ones(n, dtype=bool)
        keep[1:] = (uid[1:] != uid[:-1]) | (tsv[1:] - tsv[:-1] >= gap_us)
        return g.filter(pa.array(keep))

    ds = read_view(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    return grouped_runs(
        ds, "user_id", debounce_runs, sort_cols=["user_id", "ts", "event_id"]
    )


def approx_value_quantiles(sf_dir: str, k: int = 256) -> pa.Table:
    """Approximate quantiles of the CONTINUOUS ``events.value`` column via
    the mergeable deterministic KLL/MRL sketch (functions/sketch.py):
    (q, value_est). The unbounded-domain complement of the exact
    histogram-based quantile family — a double column where every value is
    distinct would make the (value, count) histogram as big as the data,
    so the sketch caps state at O(k·log(n/k)) per batch and the driver
    folds per-batch sketches (merge is the sketch's native operation).

    Scale shape: one streamed map emits ≤ k·log(n)-value partial sketches
    per batch; no shuffle; driver state is one sketch. Rows-only query
    (approximate by design); tests/test_sketch.py bounds the rank error vs
    the exact quantiles and checks merge associativity bounds."""
    from dedup_ray.functions.sketch import QuantileSketch

    def partial(b: pa.Table) -> pa.Table:
        sk = QuantileSketch(k).add(
            b["value"].to_numpy(zero_copy_only=False)
        )
        rows = sk.to_rows()
        return pa.table(
            {
                "lvl": pa.array([r[0] for r in rows], type=pa.int32()),
                "vals": pa.array(
                    [r[1] for r in rows], type=pa.list_(pa.float64())
                ),
            }
        )

    parts = (
        read_view(f"{sf_dir}/events.parquet", columns=["value"])
        .map_batches(partial, batch_format="pyarrow")
        .take_all()
    )
    sk = QuantileSketch.from_rows(
        [(r["lvl"], r["vals"]) for r in parts], k
    )
    qs = [0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99]
    return pa.table(
        {
            "q": pa.array(qs, type=pa.float64()),
            "value_est": pa.array(sk.quantiles(qs), type=pa.float64()),
        }
    )


def above_avg_orders(sf_dir: str) -> rd.Dataset:
    """Correlated-aggregate composition: orders priced strictly above their
    own customer's average order price: (o_orderkey, o_custkey,
    o_totalprice). The comparison is EXACT integer arithmetic — price in
    cents times the customer's order count vs the customer's cent sum — so
    both engines decide borderline rows identically (a float avg differs in
    ulps with summation order; cents x n > sum never does).

    Scale shape: ONE hash-partitioned shuffle on o_custkey (grouped_runs);
    the per-bucket kernel is a reduceat sum + repeat — no join, no second
    scan, no driver state. Oracle: sum/count window over o_custkey."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    schema = pa.schema(
        [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
         ("o_totalprice", pa.float64())]
    )

    def keep_above(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return schema.empty_table()
        cust = g["o_custkey"].to_numpy(zero_copy_only=False)
        price = g["o_totalprice"].to_numpy(zero_copy_only=False)
        cents = np.round(price * 100).astype(np.int64)
        starts = run_starts(cust)
        sizes = np.diff(np.append(starts, n))
        s = np.add.reduceat(cents, starts)
        keep = cents * np.repeat(sizes, sizes) > np.repeat(s, sizes)
        return g.select(
            ["o_orderkey", "o_custkey", "o_totalprice"]
        ).filter(pa.array(keep))

    ds = read_view(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    return grouped_runs(ds, "o_custkey", keep_above)


def events_rollup(sf_dir: str) -> rd.Dataset:
    """ROLLUP aggregate: event counts at three levels — (event_type, hour),
    per-type totals, grand total — in ONE pass: (event_type, hour_bucket,
    n_events), with 'ALL'/-1 as the rollup sentinels. The finest level is
    the only distributed aggregation; the coarser levels re-aggregate its
    (small, bounded by distinct groups) output, so rollup costs one extra
    map over the agg table, not another scan. Oracle: DuckDB GROUP BY
    ROLLUP with coalesced sentinels."""

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        hour = pc.divide(pc.divide(ts_us, 10**6), 3600)
        t = pa.table({"event_type": b["event_type"], "hour_bucket": hour})
        g = t.group_by(["event_type", "hour_bucket"]).aggregate(
            [("hour_bucket", "count", pc.CountOptions(mode="all"))]
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "hour_bucket": g["hour_bucket"],
                "pn": g["hour_bucket_count"],
            }
        )

    fine = (
        read_view(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour_bucket"])
        .sum("pn")
    )

    def rollup(b: pa.Table) -> pa.Table:
        # b = the complete fine-level table (single block; it is bounded by
        # distinct (type, hour) pairs, not by the event count)
        et = b["event_type"]
        hour = b["hour_bucket"].cast(pa.int64())
        n = b["sum(pn)"].cast(pa.int64())
        fine_t = pa.table({"event_type": et, "hour_bucket": hour, "n_events": n})
        by_type = pa.table({"event_type": et, "n": n}).group_by(
            "event_type"
        ).aggregate([("n", "sum")])
        mid = pa.table(
            {
                "event_type": by_type["event_type"],
                "hour_bucket": pa.array(
                    np.full(by_type.num_rows, -1), type=pa.int64()
                ),
                "n_events": by_type["n_sum"].cast(pa.int64()),
            }
        )
        grand = pa.table(
            {
                "event_type": pa.array(["ALL"]),
                "hour_bucket": pa.array([-1], type=pa.int64()),
                "n_events": pa.array([int(pc.sum(n).as_py() or 0)], type=pa.int64()),
            }
        )
        return pa.concat_tables([fine_t, mid, grand])

    return fine.repartition(1).map_batches(
        rollup, batch_format="pyarrow", batch_size=None
    )


def distinct_users_by_type(sf_dir: str) -> rd.Dataset:
    """Exact distributed COUNT(DISTINCT user_id) GROUP BY event_type.

    Classic two-level distinct: each batch first collapses to its DISTINCT
    (event_type, user_id) pairs (the combiner — the full event stream never
    shuffles), then ONE coarse hash shuffle on event_type and a vectorized
    run count of distinct pairs per type. Returns (event_type, n_users)."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    def pair_partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": b["event_type"], "user_id": b["user_id"]}
        ).group_by(["event_type", "user_id"]).aggregate([])

    pairs = read_view(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    ).map_batches(pair_partial, batch_format="pyarrow")

    def count_distinct(g: pa.Table) -> pa.Table:
        et = g["event_type"].to_numpy(zero_copy_only=False)
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        if len(et) == 0:
            return pa.table(
                {"event_type": pa.array([], pa.string()),
                 "n_users": pa.array([], pa.int64())}
            )
        # pairs may repeat across source batches; count (et, uid) runs per et run
        new_pair = np.ones(len(et), dtype=bool)
        new_pair[1:] = (et[1:] != et[:-1]) | (uid[1:] != uid[:-1])
        starts = run_starts(et)
        bounds = np.concatenate([starts, [len(et)]])
        cm = np.concatenate([[0], np.cumsum(new_pair)])
        return pa.table(
            {
                "event_type": pa.array(et[starts]),
                "n_users": pa.array(cm[bounds[1:]] - cm[bounds[:-1]], type=pa.int64()),
            }
        )

    return grouped_runs(
        pairs, "event_type", count_distinct, sort_cols=["event_type", "user_id"]
    )


# leading-zero count per byte value — module-level so every batch reuses it
_LZ8 = np.array([8] + [8 - b.bit_length() for b in range(1, 256)], dtype=np.int64)


def _hll_registers(uids: np.ndarray, p: int) -> np.ndarray:
    """HyperLogLog register array (2**p uint8) for a batch of int64 ids.
    Fully vectorized: splitmix64 hash, top-p bits pick the register, the
    leading-zero rank of the remaining bits comes from a byte LUT."""
    from dedup_ray.functions.hashing import splitmix64

    h = splitmix64(uids)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)  # suffix occupies the top 64-p bits; bottom p are 0
    by = w.byteswap().view(np.uint8).reshape(-1, 8)  # big-endian byte order
    nz = by != 0
    first = nz.argmax(axis=1)
    lz = first * 8 + _LZ8[by[np.arange(len(w)), first]]
    rho = np.where(nz.any(axis=1), lz + 1, (64 - p) + 1).astype(np.uint8)
    regs = np.zeros(1 << p, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = regs.size
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:  # small-range (linear counting) correction
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct_users(sf_dir: str, p: int = 10) -> rd.Dataset:
    """Approximate COUNT(DISTINCT user_id) GROUP BY event_type via
    HyperLogLog — the sketch path for when the distinct (type, user) pair
    set itself no longer fits a shuffle (billions of users). Each batch
    emits ONE (event_type, 2**p-byte register blob) row per type present;
    registers merge with an element-wise max in one coarse shuffle. Data
    moved is O(#batches * #types * 2**p bytes), independent of row count.
    ~3% relative error at p=10 (tests assert <5% vs the exact operator).
    Returns (event_type, n_users_approx)."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    def sketch(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(et, kind="stable")
        et, uid = et[order], uid[order]
        starts = run_starts(et)
        bounds = np.concatenate([starts, [len(et)]])
        types, blobs = [], []
        for i in range(len(starts)):
            lo, hi = bounds[i], bounds[i + 1]
            types.append(et[lo])
            blobs.append(_hll_registers(uid[lo:hi], p).tobytes())
        return pa.table(
            {"event_type": pa.array(types, pa.string()),
             "regs": pa.array(blobs, pa.binary())}
        )

    partials = read_view(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    ).map_batches(sketch, batch_format="pyarrow")

    def merge(g: pa.Table) -> pa.Table:
        et = g["event_type"].to_numpy(zero_copy_only=False)
        if len(et) == 0:
            return pa.table(
                {"event_type": pa.array([], pa.string()),
                 "n_users_approx": pa.array([], pa.int64())}
            )
        blobs = g["regs"].to_pylist()
        mat = np.frombuffer(b"".join(blobs), dtype=np.uint8).reshape(len(blobs), -1)
        starts = run_starts(et)
        bounds = np.concatenate([starts, [len(et)]])
        ests = [
            round(_hll_estimate(mat[bounds[i]:bounds[i + 1]].max(axis=0)))
            for i in range(len(starts))
        ]
        return pa.table(
            {"event_type": pa.array(et[starts]),
             "n_users_approx": pa.array(ests, type=pa.int64())}
        )

    return grouped_runs(partials, "event_type", merge)


def customer_order_counts(sf_dir: str) -> rd.Dataset:
    """LEFT OUTER big-big join: every customer with its count of high-value
    orders (o_totalprice > 450000), INCLUDING customers with none:
    (c_custkey, n_big_orders). The left-join mode of
    ``stages/join.shuffle_join`` — unmatched left rows survive with null
    right columns, so the aggregate sees zero-count customers without a
    second pass over the customer table.

    Scale shape: ONE co-partitioning shuffle (neither side broadcastable at
    scale), the order-side predicate pushed into the scan, and the count
    pre-reduced per output block before a tiny (one row per customer)
    groupby merge."""
    import pyarrow.dataset as pads

    from dedup_ray.stages.join import shuffle_join

    cust = read_view(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    big = read_view(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_totalprice"],
        predicate=pads.field("o_totalprice") > 450000.0,
    ).map_batches(
        lambda b: b.filter(pc.greater(b["o_totalprice"], 450000.0)).select(
            ["o_custkey", "o_orderkey"]
        ),
        batch_format="pyarrow",
    )
    joined = shuffle_join(
        cust, big, on="c_custkey", right_on="o_custkey", how="left",
        right_schema=pa.schema(
            [("o_custkey", pa.int64()), ("o_orderkey", pa.int64())]
        ),
    )

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by("c_custkey").aggregate(
            [("o_orderkey", "count", pc.CountOptions(mode="only_valid"))]
        )
        return pa.table(
            {"c_custkey": g["c_custkey"],
             "pn": g["o_orderkey_count"].cast(pa.int64())}
        )

    agg = joined.map_batches(partial, batch_format="pyarrow").groupby(
        "c_custkey"
    ).sum("pn")
    return agg.map_batches(
        lambda b: pa.table(
            {"c_custkey": b["c_custkey"],
             "n_big_orders": b["sum(pn)"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )


def order_lineitem_full(
    sf_dir: str, price_min: float = 400_000.0, qty_min: float = 48.0
) -> rd.Dataset:
    """Full-outer shuffle join: high-value orders vs high-quantity lineitems
    on orderkey — rows from EITHER side with no partner survive with the
    other side's columns null-filled (then sentinel-coalesced to -1.0 so the
    value compare is NaN-free): (okey, o_totalprice, l_quantity).

    Same single co-partitioning shuffle as the inner/left modes; full outer
    adds only the per-bucket right-miss scan (stages/join.py). Both side
    filters run BEFORE the shuffle so only qualifying rows move. Oracle:
    DuckDB FULL OUTER JOIN with the same coalesce.
    """
    from dedup_ray.stages.join import shuffle_join

    orders = read_view(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).map_batches(
        lambda b: b.filter(pc.greater(b["o_totalprice"], price_min)),
        batch_format="pyarrow",
    )
    items = read_view(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    ).map_batches(
        lambda b: b.filter(pc.greater(b["l_quantity"], qty_min)),
        batch_format="pyarrow",
    )
    joined = shuffle_join(
        orders, items, on="o_orderkey", right_on="l_orderkey", how="full",
        left_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_totalprice", pa.float64())]
        ),
        right_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("l_quantity", pa.float64())]
        ),
    )
    return joined.map_batches(
        lambda b: pa.table(
            {
                "okey": b["o_orderkey"],
                "o_totalprice": pc.fill_null(b["o_totalprice"], -1.0),
                "l_quantity": pc.fill_null(b["l_quantity"], -1.0),
            }
        ),
        batch_format="pyarrow",
    )


def user_value_running(sf_dir: str) -> rd.Dataset:
    """Running-total window: cumulative sum of ``value`` per user in event
    order — SUM() OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS
    UNBOUNDED PRECEDING): (event_id, user_id, ts, cum_value).

    One hash-partitioned shuffle on user_id (grouped_runs), then ONE
    np.cumsum per bucket with per-run rebasing — no per-user Python, no
    driver materialization. cum_value is rounded to 4 decimals on both sides
    (the engines' running sums agree to ~1e-10 at these magnitudes but not
    to the last ulp). The rebase (bucket-wide cumsum minus run-prefix) is
    the segmented-cumsum idiom: its absolute float error grows with the
    BUCKET sum, so at much larger per-bucket totals raise num_buckets (or
    cumsum per run via reduceat splits) before trusting 4 decimals."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("ts", pa.timestamp("us")), ("cum_value", pa.float64())]
    )

    def cum_runs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return schema.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        val = g["value"].to_numpy(zero_copy_only=False)
        cs = np.cumsum(val)
        starts = run_starts(uid)
        base = np.where(starts == 0, 0.0, cs[starts - 1])
        run_id = np.repeat(
            np.arange(len(starts)), np.diff(np.append(starts, n))
        )
        return pa.table(
            {
                "event_id": g["event_id"],
                "user_id": g["user_id"],
                "ts": g["ts"],
                "cum_value": pa.array(
                    np.round(cs - base[run_id], 4), type=pa.float64()
                ),
            }
        )

    ds = read_view(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )
    return grouped_runs(
        ds, "user_id", cum_runs, sort_cols=["user_id", "ts", "event_id"]
    )


def heavy_hitter_users(sf_dir: str, k: int = 10, m: int = 4096) -> rd.Dataset:
    """Exact top-k users by event count via a Misra-Gries sketch + exact
    recount — the unbounded-domain scale path for "top keys by frequency":
    (user_id, n_events), sorted by (count desc, user_id), k rows.

    Why not a plain groupby: top_terms-style exact partials are bounded by
    the key DOMAIN; when the domain is unbounded (users, URLs, IPs at
    10^12 rows) the partial tables themselves explode. Misra-Gries keeps
    <= m counters per batch and merges by summing + re-compressing, with
    the classic guarantee true_count - err <= mg_count <= true_count where
    ``err`` is the sum of all compression decrements. The sketch only
    nominates CANDIDATES: every true top-k key provably lands in
    {mg + err >= k-th mg}; a second streamed pass recounts candidates
    exactly (broadcast np.isin probe), so the OUTPUT is exact and
    oracle-checkable, never an estimate. A guard asserts the k-th exact
    count exceeds err (keys absent from the sketch have true <= err);
    if data ever violated it, fall back to the exact grouped count.

    Scale shape: pass 1 moves <= m+1 rows per batch (the sketch), pass 2
    moves <= |candidates| rows per batch — both independent of the key
    domain. Driver state: one <= m-row merge. No shuffle in either pass.
    """
    import ray

    from dedup_ray.stages.grouped import merge_partial_counts

    def mg_partial(b: pa.Table) -> pa.Table:
        vc = b["user_id"].drop_null().value_counts()
        u = vc.field("values").to_numpy(zero_copy_only=False).astype(np.int64)
        c = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        err = 0
        if len(u) > m:
            t = np.partition(c, len(c) - m - 1)[len(c) - m - 1]  # (m+1)-th largest
            c = c - t
            keep = c > 0
            u, c = u[keep], c[keep]
            err = int(t)
        # sentinel row u=-1 carries this batch's decrement (user ids are >= 0)
        return pa.table(
            {
                "u": pa.array(np.concatenate([u, [-1]]), type=pa.int64()),
                "c": pa.array(np.concatenate([c, [err]]), type=pa.int64()),
            }
        )

    ds = read_view(f"{sf_dir}/events.parquet", columns=["user_id"])
    parts = [
        t
        for t in ray.get(
            ds.map_batches(mg_partial, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows and "u" in t.column_names
    ]
    if not parts:
        return rd.from_arrow(
            pa.schema([("user_id", pa.int64()), ("n_events", pa.int64())])
            .empty_table()
        )
    cat = pa.concat_tables(parts)
    u, c = merge_partial_counts(
        cat["u"].to_numpy(zero_copy_only=False),
        cat["c"].to_numpy(zero_copy_only=False),
    )
    err = int(c[u == -1].sum()) if (u == -1).any() else 0
    keep = u != -1
    u, c = u[keep], c[keep]
    if len(u) > m:  # merge-step compression (adds to the error budget)
        t = np.partition(c, len(c) - m - 1)[len(c) - m - 1]
        c = c - t
        sel = c > 0
        u, c = u[sel], c[sel]
        err += int(t)

    def exact_fallback() -> rd.Dataset:
        # drop nulls like the sketch path does (a null key is not a "user")
        # so both internal paths of this operator return the same answer
        agg = (
            ds.map_batches(
                lambda b: pa.table({"u": b["user_id"].drop_null()}),
                batch_format="pyarrow",
            )
            .groupby("u")
            .count()
            .to_pandas()
            .rename(columns={"u": "user_id", "count()": "n_events"})
        )
        agg = agg.sort_values(
            ["n_events", "user_id"], ascending=[False, True]
        ).head(k)
        agg["n_events"] = agg["n_events"].astype("int64")
        return rd.from_pandas(agg.reset_index(drop=True))

    if len(c) == 0:
        # every counter decremented to zero: the sketch carries no signal
        return exact_fallback()
    kth = np.partition(c, len(c) - min(k, len(c)))[len(c) - min(k, len(c))]
    cand = u[c + err >= kth]
    cand_ref = ray.put(np.sort(cand))

    def recount(b: pa.Table) -> pa.Table:
        wanted = ray.get(cand_ref)
        uid = b["user_id"].drop_null().to_numpy(zero_copy_only=False)
        uid = uid[np.isin(uid, wanted)]
        vu, vc_ = np.unique(uid, return_counts=True)
        return pa.table(
            {"u": pa.array(vu, type=pa.int64()),
             "c": pa.array(vc_, type=pa.int64())}
        )

    parts2 = [
        t
        for t in ray.get(
            ds.map_batches(recount, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows and "u" in t.column_names
    ]
    cat2 = pa.concat_tables(parts2)
    u2, c2 = merge_partial_counts(
        cat2["u"].to_numpy(zero_copy_only=False),
        cat2["c"].to_numpy(zero_copy_only=False),
    )
    order = np.lexsort((u2, -c2))[:k]
    top_u, top_c = u2[order], c2[order]
    if len(top_c) < k or (err > 0 and top_c[-1] <= err):
        # fewer candidates than k, or a key ABSENT from the sketch (true
        # count up to err) could displace the k-th — the guarantee is void;
        # do the exact grouped count instead
        return exact_fallback()
    import pandas as pd

    return rd.from_pandas(
        pd.DataFrame({"user_id": top_u, "n_events": top_c})
    )


def orders_global_rank(sf_dir: str, num_parts: int = 64) -> rd.Dataset:
    """Global ROW_NUMBER() over (o_totalprice, o_orderkey) WITHOUT a global
    sort barrier — the north-rule's range-partitioned sort as a user-facing
    operator (the same shape `stages/cluster.py` uses for edge merging):
    (o_orderkey, o_totalprice, rk).

    Three bounded passes over a 2-column projection:
      1. sample — per-batch stride sample of the key, driver picks
         ``num_parts - 1`` splitters from the sorted sample (the terasort
         recipe; sample size is O(num_parts), never the row count);
      2. count — per-batch ``bincount`` of range-partition ids (searchsorted
         vs broadcast splitters), driver prefix-sums to global offsets —
         what moves is O(num_blocks * num_parts) ints;
      3. rank — ONE hash shuffle on the partition id; each range partition
         lands whole, sorts locally by (key, tiebreak), and its ranks are
         offset[pid] + local position. Equal keys share a pid by
         construction (searchsorted is deterministic on the key alone), so
         ranks are exact, not approximate.

    At 10^12 rows: splitter count grows with the cluster, the sample and the
    offset table stay O(num_parts) on the driver, and pass 3 is the same
    one-exchange grouped_runs shuffle as every other wide operator. Skewed
    key values (one price dominating) cap a partition at that key's row
    count — the documented trade of range partitioning; hot single keys
    would need a secondary-key sub-split, which the orderkey tiebreak here
    provides for free if splitters were drawn from (price, orderkey) pairs.
    Oracle: row_number() OVER (ORDER BY o_totalprice, o_orderkey)."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    path = f"{sf_dir}/orders.parquet"
    ds = read_view(path, columns=["o_orderkey", "o_totalprice"])

    # pass 1: bounded deterministic sample of the sort key
    def sample(b: pa.Table) -> pa.Table:
        v = b["o_totalprice"].to_numpy(zero_copy_only=False)
        step = max(1, len(v) // 32)
        return pa.table({"v": pa.array(v[::step], pa.float64())})

    samp_parts = [
        t["v"].to_numpy(zero_copy_only=False)
        for t in ray.get(
            ds.map_batches(sample, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows and "v" in t.column_names
    ]
    if not samp_parts:
        return rd.from_arrow(
            pa.table(
                {"o_orderkey": pa.array([], pa.int64()),
                 "o_totalprice": pa.array([], pa.float64()),
                 "rk": pa.array([], pa.int64())}
            )
        )
    samp = np.sort(np.concatenate(samp_parts))
    # num_parts-1 splitters at even sample quantiles
    idx = (np.arange(1, num_parts) * len(samp)) // num_parts
    splitters = np.unique(samp[idx])
    n_parts = len(splitters) + 1

    def add_pid(b: pa.Table) -> pa.Table:
        v = b["o_totalprice"].to_numpy(zero_copy_only=False)
        pid = np.searchsorted(splitters, v, side="right").astype(np.int64)
        return b.append_column("__pid__", pa.array(pid))

    keyed = ds.map_batches(add_pid, batch_format="pyarrow")

    # pass 2: exact per-partition counts -> global rank offsets
    def pid_counts(b: pa.Table) -> pa.Table:
        c = np.bincount(
            b["__pid__"].to_numpy(zero_copy_only=False), minlength=n_parts
        )
        return pa.table(
            {"pid": pa.array(np.arange(n_parts, dtype=np.int64)),
             "n": pa.array(c.astype(np.int64))}
        )

    totals = np.zeros(n_parts, dtype=np.int64)
    for t in ray.get(
        keyed.map_batches(pid_counts, batch_format="pyarrow").to_arrow_refs()
    ):
        if t.num_rows and "pid" in t.column_names:
            np.add.at(
                totals,
                t["pid"].to_numpy(zero_copy_only=False),
                t["n"].to_numpy(zero_copy_only=False),
            )
    offsets = np.concatenate([[0], np.cumsum(totals)[:-1]])

    # pass 3: one shuffle; ranks assigned per complete range partition
    def rank_runs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return pa.table(
                {"o_orderkey": pa.array([], pa.int64()),
                 "o_totalprice": pa.array([], pa.float64()),
                 "rk": pa.array([], pa.int64())}
            )
        pid = g["__pid__"].to_numpy(zero_copy_only=False)
        starts = run_starts(pid)
        lens = np.diff(np.append(starts, n))
        pos = np.arange(n) - np.repeat(starts, lens)
        rk = offsets[pid] + pos + 1
        return pa.table(
            {"o_orderkey": g["o_orderkey"],
             "o_totalprice": g["o_totalprice"],
             "rk": pa.array(rk, pa.int64())}
        )

    return grouped_runs(
        keyed,
        "__pid__",
        rank_runs,
        sort_cols=["__pid__", "o_totalprice", "o_orderkey"],
    )


def top_event_type_per_user(sf_dir: str) -> rd.Dataset:
    """Per-user MODE: the event_type each user emits most often, tie-break
    lexicographically smallest type: (user_id, top_type, n_events).

    Combiner shape: each batch collapses to (user_id, event_type, n)
    partials via one Arrow group_by (the full stream never shuffles), then
    ONE coarse hash shuffle on user_id; the bucket kernel merges partial
    counts over (user, type) runs with add.reduceat and picks each user's
    argmax with maximum.reduceat + a first-max-index trick (types are sorted
    within the user run, so the first max IS the lexicographic tie-break).
    Oracle: row_number() OVER (PARTITION BY user_id ORDER BY count(*) DESC,
    event_type) = 1."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    def pair_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {"user_id": b["user_id"], "event_type": b["event_type"]}
        ).group_by(["user_id", "event_type"]).aggregate([("user_id", "count")])
        return t.rename_columns(["user_id", "event_type", "n"])

    pairs = read_view(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    ).map_batches(pair_partial, batch_format="pyarrow")

    def mode_runs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "top_type": pa.array([], pa.string()),
                 "n_events": pa.array([], pa.int64())}
            )
        u = g["user_id"].to_numpy(zero_copy_only=False)
        t = g["event_type"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        # merge cross-batch partials: sum n over equal (u, t) runs
        new_pair = np.ones(len(u), dtype=bool)
        new_pair[1:] = (u[1:] != u[:-1]) | (t[1:] != t[:-1])
        ps = np.flatnonzero(new_pair)
        u, t = u[ps], t[ps]
        n = np.add.reduceat(n, ps)
        # per-user argmax, first (= lexicographically smallest) on ties
        us = run_starts(u)
        lens = np.diff(np.append(us, len(u)))
        run_id = np.repeat(np.arange(len(us)), lens)
        maxn = np.maximum.reduceat(n, us)
        cand = np.where(n == maxn[run_id], np.arange(len(u)), len(u))
        pick = np.minimum.reduceat(cand, us)
        return pa.table(
            {"user_id": pa.array(u[pick], pa.int64()),
             "top_type": pa.array(t[pick], pa.string()),
             "n_events": pa.array(n[pick], pa.int64())}
        )

    return grouped_runs(
        pairs, "user_id", mode_runs, sort_cols=["user_id", "event_type"]
    )


def user_event_sequence(sf_dir: str) -> rd.Dataset:
    """Per-user ordered event-type sequence — the session-mining /
    behavioral-clustering input: (user_id, seq, n_events) with seq =
    ','-joined event types by (ts, event_id).

    ONE hash shuffle on user_id; the bucket kernel builds a ListArray
    directly from the run offsets over the already-sorted event_type column
    and joins it with a single Arrow binary_join kernel — no per-user Python.
    Sequence length is bounded by per-user activity (the same bound
    sessionize lives with); a pathological single user caps one bucket.
    Oracle: string_agg(event_type, ',' ORDER BY ts, event_id)."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    def seq_runs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "seq": pa.array([], pa.string()),
                 "n_events": pa.array([], pa.int64())}
            )
        u = g["user_id"].to_numpy(zero_copy_only=False)
        starts = run_starts(u)
        bounds = np.append(starts, n)
        types = g["event_type"]
        if isinstance(types, pa.ChunkedArray):
            types = types.combine_chunks()
        lists = pa.ListArray.from_arrays(
            pa.array(bounds, pa.int32()), types
        )
        seq = pc.binary_join(lists, ",")
        return pa.table(
            {"user_id": pa.array(u[starts], pa.int64()),
             "seq": seq,
             "n_events": pa.array(np.diff(bounds), pa.int64())}
        )

    ds = read_view(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )
    return grouped_runs(
        ds, "user_id", seq_runs, sort_cols=["user_id", "ts", "event_id"]
    )


def user_value_moving_max(sf_dir: str, preceding: int = 3) -> rd.Dataset:
    """ROWS-frame moving window: per-user max(value) over the trailing
    ``preceding``+1 events: (event_id, user_id, ts, max4). Rounds out the
    window family with the bounded-ROWS frame (running = unbounded,
    sliding_window_counts = RANGE). Max involves NO arithmetic, so doubles
    compare bit-identically against the SQL window — no rounding tolerance.

    Same one-shuffle shape as event_gaps: hash-partition on user_id, then a
    k-pass shifted np.maximum inside the bucket (k = frame width, constant),
    masked at run starts so frames never cross users."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    def win_runs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return pa.table(
                {"event_id": pa.array([], pa.int64()),
                 "user_id": pa.array([], pa.int64()),
                 "ts": pa.array([], pa.timestamp("us")),
                 "max4": pa.array([], pa.float64())}
            )
        u = g["user_id"].to_numpy(zero_copy_only=False)
        v = g["value"].to_numpy(zero_copy_only=False)
        starts = run_starts(u)
        lens = np.diff(np.append(starts, n))
        pos = np.arange(n) - np.repeat(starts, lens)
        m = v.copy()
        for k in range(1, preceding + 1):
            idx = np.flatnonzero(pos >= k)
            m[idx] = np.maximum(m[idx], v[idx - k])
        return pa.table(
            {"event_id": g["event_id"],
             "user_id": g["user_id"],
             "ts": g["ts"],
             "max4": pa.array(m, pa.float64())}
        )

    ds = read_view(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )
    return grouped_runs(
        ds, "user_id", win_runs, sort_cols=["user_id", "ts", "event_id"]
    )


def _exact_median_scan(
    ds: rd.Dataset, getv: Callable[[pa.Table], np.ndarray], k: int = 512
) -> tuple[float, int] | None:
    """Sketch-bounded EXACT median of ``getv(batch)`` over a streamed
    dataset (see exact_value_median for the algorithm and scale notes).
    Returns (median, n) with quantile_disc semantics (rank ceil(n/2),
    1-based), or None on an empty input. Two streamed passes, NO shuffle;
    the collected in-bracket slice is ≈ rank-error·n values."""
    from dedup_ray.functions.sketch import QuantileSketch

    def partial(b: pa.Table) -> pa.Table:
        sk = QuantileSketch(k).add(getv(b))
        rows = sk.to_rows()
        if not rows:
            return pa.table(
                {"lvl": pa.array([], pa.int32()),
                 "vals": pa.array([], pa.list_(pa.float64())),
                 "cnt": pa.array([], pa.int64())}
            )
        return pa.table(
            {"lvl": pa.array([r[0] for r in rows], type=pa.int32()),
             "vals": pa.array([r[1] for r in rows], type=pa.list_(pa.float64())),
             "cnt": pa.array([b.num_rows] + [0] * (len(rows) - 1), pa.int64())}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not parts:
        return None
    sk = QuantileSketch.from_rows([(r["lvl"], r["vals"]) for r in parts], k)
    n = int(sum(r["cnt"] for r in parts))
    if n == 0:
        return None
    target = max(1, -(-n // 2))  # rank ceil(n/2), 1-based

    margin = 0.02
    while True:
        lo_q, hi_q = max(0.0, 0.5 - margin), min(1.0, 0.5 + margin)
        lo, hi = sk.quantiles([lo_q, hi_q])
        if lo_q == 0.0:
            lo = -np.inf
        if hi_q == 1.0:
            hi = np.inf

        def scan(b: pa.Table, lo=lo, hi=hi) -> pa.Table:
            v = getv(b)
            inb = v[(v >= lo) & (v <= hi)]
            return pa.table(
                {"below": pa.array([int(np.count_nonzero(v < lo))], pa.int64()),
                 "inb": pa.array([inb.tolist()], pa.list_(pa.float64()))}
            )

        rows2 = ds.map_batches(scan, batch_format="pyarrow").take_all()
        below = sum(r["below"] for r in rows2)
        collected = np.concatenate(
            [np.asarray(r["inb"], np.float64) for r in rows2]
        ) if rows2 else np.empty(0)
        if below < target <= below + collected.size:
            collected.sort()
            return float(collected[target - below - 1]), n
        margin *= 2.0  # sketch error exceeded the margin: widen and retry


def exact_value_median(sf_dir: str, k: int = 512) -> pa.Table:
    """EXACT median of the continuous ``events.value`` column — an unbounded
    double domain where the (value, count) histogram would be as big as the
    data: (median, n_rows).

    Sketch-bounded exact selection, two streamed passes and NO shuffle:
      1. per-batch KLL partial sketches fold driver-side (state O(k·log n));
         the sketch brackets the median with a widening margin around q=0.5;
      2. one pass counts rows strictly below the bracket and collects ONLY
         the in-bracket values (≈ rank-error · n of them — at k=512 well
         under 1% of the column); the exact rank-ceil(n/2) element is then
         selected from the collected slice.
    If the true rank falls outside the bracket (sketch error beyond margin),
    the margin doubles and pass 2 re-runs — a self-correcting loop that
    terminates because the margin reaches q∈[0,1]. At 10^12 rows the
    collected slice is the knob: raise k (error ~ 1/k) or recurse the
    selection inside the bracket instead of collecting it; the loop
    structure here IS that recursion's outer case. Oracle:
    quantile_disc(value, 0.5) — rank ceil(n/2), 1-based, same semantics."""
    ds = read_view(f"{sf_dir}/events.parquet", columns=["value"])
    res = _exact_median_scan(
        ds, lambda b: b["value"].to_numpy(zero_copy_only=False), k
    )
    if res is None:
        return pa.table(
            {"median": pa.array([], pa.float64()),
             "n_rows": pa.array([], pa.int64())}
        )
    med, n = res
    return pa.table(
        {"median": pa.array([med], pa.float64()),
         "n_rows": pa.array([n], pa.int64())}
    )


def value_mad(sf_dir: str, k: int = 512) -> pa.Table:
    """Median absolute deviation of ``events.value`` — the robust spread
    statistic outlier policies are built on: (median, mad, n_rows). Two
    sketch-bounded exact selections (see exact_value_median): pass set 1
    selects the exact median m, pass set 2 the exact median of |value - m|
    — both streamed, no shuffle, driver state O(k*log n). |v - m| is the
    identical double op on both engines, so the result is bit-exact vs
    the oracle."""
    ds = read_view(f"{sf_dir}/events.parquet", columns=["value"])

    def getv(b: pa.Table) -> np.ndarray:
        return b["value"].to_numpy(zero_copy_only=False)

    res = _exact_median_scan(ds, getv, k)
    if res is None:
        return pa.table(
            {"median": pa.array([], pa.float64()),
             "mad": pa.array([], pa.float64()),
             "n_rows": pa.array([], pa.int64())}
        )
    med, n = res
    dev, _ = _exact_median_scan(ds, lambda b: np.abs(getv(b) - med), k)
    return pa.table(
        {"median": pa.array([med], pa.float64()),
         "mad": pa.array([dev], pa.float64()),
         "n_rows": pa.array([n], pa.int64())}
    )


def events_window_dedup(sf_dir: str) -> rd.Dataset:
    """Windowed dedup: the FIRST event per (user_id, event_type, 1-hour
    window): (event_id, user_id, event_type, ts). The streaming-ingestion
    staple — "seen this key in this window already?" — expressed as a batch
    operator: ONE hash shuffle on user_id, then a vectorized
    neighbor-inequality keep mask over (user, type, window) runs (rows are
    sorted by ts within (user, type), so the first row of each window run
    is the earliest). Window ids are integer microsecond floors — no float
    epoch arithmetic to disagree over. Oracle: row_number() OVER (PARTITION
    BY user_id, event_type, epoch_us(ts) // 3600000000) = 1."""
    from dedup_ray.stages.grouped import grouped_runs

    win_us = np.int64(3_600_000_000)

    def dedup_runs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return pa.table(
                {"event_id": pa.array([], pa.int64()),
                 "user_id": pa.array([], pa.int64()),
                 "event_type": pa.array([], pa.string()),
                 "ts": pa.array([], pa.timestamp("us"))}
            )
        u = g["user_id"].to_numpy(zero_copy_only=False)
        t = g["event_type"].to_numpy(zero_copy_only=False)
        w = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // win_us
        keep = np.ones(n, dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (t[1:] != t[:-1]) | (w[1:] != w[:-1])
        return g.select(["event_id", "user_id", "event_type", "ts"]).filter(
            pa.array(keep)
        )

    ds = read_view(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts"],
    )
    return grouped_runs(
        ds, "user_id", dedup_runs,
        sort_cols=["user_id", "event_type", "ts", "event_id"],
    )


def latest_event_per_user(sf_dir: str) -> rd.Dataset:
    """Latest-row-per-key: each user's MOST RECENT event with its payload
    (user_id, event_id, event_type, ts, value) — the dimension-refresh /
    CDC-compaction staple (keep the newest version of every key).

    ONE hash shuffle on user_id; rows arrive sorted by (user, ts, event_id)
    so each run's LAST row is the winner — the keep mask is one shifted
    neighbor-inequality compare, no per-user Python. Ties on ts break to the
    larger event_id (the sort's last row), pinned on both sides.
    Oracle: row_number() OVER (PARTITION BY user_id ORDER BY ts DESC,
    event_id DESC) = 1."""
    from dedup_ray.stages.grouped import grouped_runs

    def last_runs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "event_id": pa.array([], pa.int64()),
                 "event_type": pa.array([], pa.string()),
                 "ts": pa.array([], pa.timestamp("us")),
                 "value": pa.array([], pa.float64())}
            )
        u = g["user_id"].to_numpy(zero_copy_only=False)
        keep = np.ones(n, dtype=bool)
        keep[:-1] = u[:-1] != u[1:]  # last row of each user run
        return g.select(
            ["user_id", "event_id", "event_type", "ts", "value"]
        ).filter(pa.array(keep))

    ds = read_view(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "event_type", "ts", "value"],
    )
    return grouped_runs(
        ds, "user_id", last_runs, sort_cols=["user_id", "ts", "event_id"]
    )


def funnel_conversions(sf_dir: str, window_s: int = 3600) -> rd.Dataset:
    """Funnel analysis: users who performed a 'view' followed by a
    'purchase' within ``window_s`` seconds, with their conversion count:
    (user_id, n_conversions) where n_conversions = number of purchases
    preceded by >=1 view inside the trailing window (view strictly before
    the purchase).

    ONE hash shuffle on user_id; the bucket kernel is fully vectorized: a
    forward-fill (maximum.accumulate over view indices) finds each row's
    most recent view, run-start comparison confines it to the same user,
    and one subtraction applies the window — any view in the window implies
    the LATEST view is in it, so the forward-fill answers the EXISTS. The
    equal-timestamp edge (a view at exactly the purchase ts must not shadow
    an earlier in-window view) is handled by the sort itself: event_type is
    the ts tiebreak and 'purchase' < 'view' alphabetically, so same-ts
    views sort AFTER the purchase and never enter its forward-fill. The SQL
    oracle pays a quadratic self-join for the same answer; at 10^12 events
    this O(n log n)-per-bucket formulation is the point."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    win_us = np.int64(window_s) * np.int64(1_000_000)

    def funnel_runs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        empty = pa.table(
            {"user_id": pa.array([], pa.int64()),
             "n_conversions": pa.array([], pa.int64())}
        )
        if n == 0:
            return empty
        u = g["user_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        tsv = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        is_v = et == "view"
        is_p = et == "purchase"
        if not (is_v.any() and is_p.any()):
            return empty
        starts = run_starts(u)
        lens = np.diff(np.append(starts, n))
        row_start = np.repeat(starts, lens)
        # index of the most recent view at or before each stream position
        vidx = np.where(is_v, np.arange(n), -1)
        ff = np.maximum.accumulate(vidx)
        valid = ff >= row_start  # view belongs to this user's run
        vts = tsv[np.maximum(ff, 0)]
        conv = is_p & valid & (vts < tsv) & (tsv - vts <= win_us)
        cu = u[conv]
        if cu.size == 0:
            return empty
        cs = run_starts(cu)
        return pa.table(
            {"user_id": pa.array(cu[cs], pa.int64()),
             "n_conversions": pa.array(
                 np.diff(np.append(cs, cu.size)), pa.int64())}
        )

    ds = read_view(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    )
    return grouped_runs(
        ds, "user_id", funnel_runs, sort_cols=["user_id", "ts", "event_type"]
    )


def shipping_priority(sf_dir: str, k: int = 10) -> rd.Dataset:
    """TPC-H Q3 shape: top-k unshipped orders by revenue for one market
    segment — (o_orderkey, o_orderdate, revenue), revenue descending,
    orderkey ascending on ties.

    Join plan mirrors nation_revenue: the customer segment filter is a
    BROADCAST membership probe (sorted custkey array shipped once via
    ray.put), the orders date filter rides the same map_batches, and the
    one big-big hop (filtered orders x filtered lineitem) is a single
    co-partitioning shuffle_join. Revenue is summed as exact int64
    ten-thousandths and divided once at the end (bit-identical doubles on
    both engines). Per-order totals come from grouped_runs on o_orderkey —
    only (orderkey, date, partial) rows shuffle — then local top-k per
    bucket + a k-row global sort-limit, so the driver never sees more than
    k rows per bucket."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts
    from dedup_ray.stages.join import shuffle_join

    cutoff = np.datetime64("1998-06-01").astype("datetime64[us]").astype(np.int64)
    cust = read_view(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    keys = np.sort(
        cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"].to_numpy(
            dtype=np.int64
        )
    )
    ref = ray.put(keys)

    def probe_orders(b: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        odate = b["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(ks, ck), max(len(ks) - 1, 0))
        hit = (ks[pos] == ck if len(ks) else np.zeros(len(ck), bool)) & (
            odate < cutoff
        )
        m = pa.array(hit)
        return pa.table(
            {"o_orderkey": b["o_orderkey"].filter(m),
             "o_orderdate": b["o_orderdate"].filter(m)}
        )

    orders = read_view(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(probe_orders, batch_format="pyarrow")

    def ship_filter(b: pa.Table) -> pa.Table:
        sd = b["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        m = pa.array(sd > cutoff)
        return pa.table(
            {"l_orderkey": b["l_orderkey"].filter(m),
             "l_extendedprice": b["l_extendedprice"].filter(m),
             "l_discount": b["l_discount"].filter(m)}
        )

    items = read_view(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(ship_filter, batch_format="pyarrow")
    joined = shuffle_join(orders, items, on="o_orderkey", right_on="l_orderkey")

    def partial(b: pa.Table) -> pa.Table:
        cents = np.round(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        dpct = np.round(
            (1.0 - b["l_discount"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        t = pa.table(
            {"o_orderkey": b["o_orderkey"], "o_orderdate": b["o_orderdate"],
             "r": pa.array(cents * dpct, type=pa.int64())}
        )
        g = t.group_by(["o_orderkey", "o_orderdate"]).aggregate([("r", "sum")])
        return g.rename_columns(["o_orderkey", "o_orderdate", "pr"])

    partials = joined.map_batches(partial, batch_format="pyarrow")

    def order_totals(g: pa.Table) -> pa.Table:
        ok = g["o_orderkey"].to_numpy(zero_copy_only=False)
        pr = g["pr"].to_numpy(zero_copy_only=False)
        starts = run_starts(ok)
        bounds = np.append(starts, len(ok))
        cm = np.concatenate([[0], np.cumsum(pr)])
        tot = cm[bounds[1:]] - cm[bounds[:-1]]
        t = pa.table(
            {"o_orderkey": pa.array(ok[starts], pa.int64()),
             "o_orderdate": g["o_orderdate"].take(pa.array(starts)),
             "revenue": pa.array(
                 tot.astype(np.float64) / 10000.0, pa.float64())}
        )
        idx = pc.sort_indices(
            t, sort_keys=[("revenue", "descending"), ("o_orderkey", "ascending")]
        )
        return t.take(idx[:k])

    return (
        grouped_runs(partials, "o_orderkey", order_totals)
        .sort(["revenue", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


def events_pivot(sf_dir: str) -> rd.Dataset:
    """Per-user event-type pivot: (user_id, n_click, n_error, n_purchase,
    n_signup, n_view) — the wide activity matrix a feature store exports.

    Pivot-early shape: each batch collapses to one row per user already in
    column form (np.add.at scatter into a (users x types) matrix), so the
    shuffle moves pre-pivoted partials — never event rows — and the final
    groupby sums fixed int64 columns. Unknown types are dropped by the
    fixed column map (schema stability beats silent column explosion at
    scale; extend TYPES to widen)."""
    types = ("click", "error", "purchase", "signup", "view")

    def partial(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = b["event_type"].combine_chunks().dictionary_encode()
        col_of = np.array(
            [types.index(v) if v in types else -1
             for v in et.dictionary.to_pylist()],
            dtype=np.int64,
        )
        codes = col_of[et.indices.to_numpy(zero_copy_only=False)]
        uu, inv = np.unique(uid, return_inverse=True)
        m = np.zeros((len(uu), len(types)), np.int64)
        ok = codes >= 0
        np.add.at(m, (inv[ok], codes[ok]), 1)
        return pa.table(
            {"user_id": pa.array(uu, pa.int64()),
             **{f"n_{t}": pa.array(m[:, i], pa.int64())
                for i, t in enumerate(types)}}
        )

    cols = [f"n_{t}" for t in types]
    agg = (
        read_view(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .sum(cols)
    )
    return agg.map_batches(
        lambda b: pa.table(
            {"user_id": b["user_id"],
             **{c: b[f"sum({c})"].cast(pa.int64()) for c in cols}}
        ),
        batch_format="pyarrow",
    )


def user_value_ntile(sf_dir: str, k: int = 4) -> rd.Dataset:
    """NTILE(k) per user over event value: (event_id, user_id, tile) with
    tile in 1..k, ordered by (value, event_id) within the user — the
    per-entity quantile-bucket labeler (spend tiers, engagement bands).

    One hash shuffle on user_id (grouped_runs), then the NTILE size rule —
    first n%k buckets get ceil(n/k) rows — evaluated vectorized per run
    via run ranks; no per-group Python."""
    from dedup_ray.stages.grouped import grouped_runs, run_ranks, run_starts

    def ntile_runs(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy(zero_copy_only=False)
        if len(u) == 0:
            return pa.schema(
                [("event_id", pa.int64()), ("user_id", pa.int64()),
                 ("tile", pa.int64())]
            ).empty_table()
        starts = run_starts(u)
        lens = np.diff(np.append(starts, len(u)))
        r = run_ranks(u)
        n = np.repeat(lens, lens)
        q, rem = n // k, n % k
        big = rem * (q + 1)  # rows covered by the ceil-sized buckets
        tile = np.where(
            r < big,
            r // np.maximum(q + 1, 1),
            rem + (r - big) // np.maximum(q, 1),
        ) + 1
        return pa.table(
            {"event_id": g["event_id"],
             "user_id": g["user_id"],
             "tile": pa.array(tile, type=pa.int64())}
        )

    ds = read_view(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )
    return grouped_runs(
        ds, "user_id", ntile_runs, sort_cols=["user_id", "value", "event_id"]
    )


def value_stats_by_type(sf_dir: str) -> rd.Dataset:
    """Distributed moments per event_type: (event_type, n, mean, stddev)
    — sample stddev, both floats rounded to 4 (sum order differs between
    engines). Single pass: per-batch (count, sum, sumsq) partials, one
    tiny groupby, closed-form combine — the mergeable-moments shape that
    never reshuffles the event stream."""

    def partial(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        t = pa.table(
            {"event_type": b["event_type"],
             "v": b["value"],
             "v2": pa.array(v * v, type=pa.float64())}
        )
        g = t.group_by("event_type").aggregate(
            [("v", "sum"), ("v2", "sum"),
             ("v", "count", pc.CountOptions(mode="all"))]
        )
        return pa.table(
            {"event_type": g["event_type"], "pn": g["v_count"],
             "ps": g["v_sum"], "pq": g["v2_sum"]}
        )

    agg = (
        read_view(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .sum(["pn", "ps", "pq"])
    )

    def final(b: pa.Table) -> pa.Table:
        n = b["sum(pn)"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = b["sum(ps)"].to_numpy(zero_copy_only=False)
        q = b["sum(pq)"].to_numpy(zero_copy_only=False)
        mean = s / n
        var = np.maximum(q - n * mean * mean, 0.0) / np.maximum(n - 1, 1)
        return pa.table(
            {"event_type": b["event_type"],
             "n": pa.array(n.astype(np.int64), pa.int64()),
             "mean": pa.array(np.round(mean, 4), pa.float64()),
             "stddev": pa.array(np.round(np.sqrt(var), 4), pa.float64())}
        )

    return agg.map_batches(final, batch_format="pyarrow")


def revenue_running_by_date(sf_dir: str, num_parts: int = 64) -> rd.Dataset:
    """Global running revenue over orders in (o_orderdate, o_orderkey)
    order WITHOUT a global sort barrier: (o_orderkey, o_orderdate,
    cum_revenue) — the distributed prefix-scan primitive, range-partitioned
    exactly like orders_global_rank but carrying SUMS instead of counts.

    Three bounded passes: (1) stride-sample the date key, driver picks
    splitters; (2) per-batch per-partition cent totals, driver exclusive-
    prefix-sums to partition offsets (O(num_blocks x num_parts) ints move);
    (3) ONE hash shuffle on partition id, local sort + cumsum + offset.
    Revenue accumulates as exact int64 cents and divides once at the end,
    so both engines emit bit-identical doubles. Equal dates share a
    partition by construction (searchsorted on the date alone), so the
    (date, orderkey) tiebreak is resolved inside one partition and the
    scan is exact."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    ds = read_view(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_totalprice"],
    )

    def sample(b: pa.Table) -> pa.Table:
        v = b["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        step = max(1, len(v) // 32)
        return pa.table({"v": pa.array(v[::step], pa.int64())})

    samp_parts = [
        t["v"].to_numpy(zero_copy_only=False)
        for t in ray.get(
            ds.map_batches(sample, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows and "v" in t.column_names
    ]
    empty = pa.table(
        {"o_orderkey": pa.array([], pa.int64()),
         "o_orderdate": pa.array([], pa.timestamp("us")),
         "cum_revenue": pa.array([], pa.float64())}
    )
    if not samp_parts:
        return rd.from_arrow(empty)
    samp = np.sort(np.concatenate(samp_parts))
    idx = (np.arange(1, num_parts) * len(samp)) // num_parts
    splitters = np.unique(samp[idx])
    n_parts = len(splitters) + 1

    def add_pid(b: pa.Table) -> pa.Table:
        v = b["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.round(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        pid = np.searchsorted(splitters, v, side="right").astype(np.int64)
        return pa.table(
            {"o_orderkey": b["o_orderkey"], "o_orderdate": b["o_orderdate"],
             "cents": pa.array(cents), "__pid__": pa.array(pid)}
        )

    keyed = ds.map_batches(add_pid, batch_format="pyarrow").materialize()

    def pid_sums(b: pa.Table) -> pa.Table:
        s = np.bincount(
            b["__pid__"].to_numpy(zero_copy_only=False),
            weights=b["cents"].to_numpy(zero_copy_only=False).astype(np.float64),
            minlength=n_parts,
        ).astype(np.int64)
        return pa.table(
            {"pid": pa.array(np.arange(n_parts, dtype=np.int64)),
             "s": pa.array(s)}
        )

    totals = np.zeros(n_parts, dtype=np.int64)
    for t in ray.get(
        keyed.map_batches(pid_sums, batch_format="pyarrow").to_arrow_refs()
    ):
        if t.num_rows and "s" in t.column_names:
            np.add.at(
                totals,
                t["pid"].to_numpy(zero_copy_only=False),
                t["s"].to_numpy(zero_copy_only=False),
            )
    offsets = np.concatenate([[0], np.cumsum(totals)[:-1]])

    def scan_runs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        pid = g["__pid__"].to_numpy(zero_copy_only=False)
        cents = g["cents"].to_numpy(zero_copy_only=False)
        starts = run_starts(pid)
        lens = np.diff(np.append(starts, len(pid)))
        cum = np.cumsum(cents)
        # restart the cumsum at each pid run, then add the global offset
        base = np.repeat(cum[starts] - cents[starts], lens)
        cumr = cum - base + offsets[pid]
        return pa.table(
            {"o_orderkey": g["o_orderkey"], "o_orderdate": g["o_orderdate"],
             "cum_revenue": pa.array(
                 cumr.astype(np.float64) / 100.0, pa.float64())}
        )

    return grouped_runs(
        keyed, "__pid__", scan_runs,
        sort_cols=["__pid__", "o_orderdate", "o_orderkey"],
    )


def customer_order_dense_rank(sf_dir: str) -> rd.Dataset:
    """Per-customer dense rank of orders by price: (o_orderkey, o_custkey,
    drank) — ties share a rank, gaps close. ONE o_custkey shuffle; the
    bucket kernel is a value-change cumsum rebased at run starts (no
    per-group Python). Oracle: dense_rank() OVER (PARTITION BY o_custkey
    ORDER BY o_totalprice)."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    ds = read_view(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def rank_runs(g: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
             ("drank", pa.int64())]
        )
        if g.num_rows == 0:
            return schema.empty_table()
        ck = g["o_custkey"].to_numpy(zero_copy_only=False)
        v = g["o_totalprice"].to_numpy(zero_copy_only=False)
        starts = run_starts(ck)
        lens = np.diff(np.append(starts, len(ck)))
        step = np.ones(len(ck), dtype=np.int64)
        step[1:] = v[1:] != v[:-1]  # dense: advance only on a new value
        step[starts] = 1
        c = np.cumsum(step)
        drank = c - np.repeat(c[starts] - 1, lens)
        return pa.table(
            {"o_orderkey": g["o_orderkey"], "o_custkey": g["o_custkey"],
             "drank": pa.array(drank, type=pa.int64())}
        )

    return grouped_runs(
        ds, "o_custkey", rank_runs,
        sort_cols=["o_custkey", "o_totalprice"],
    )


def revenue_share_by_segment(sf_dir: str) -> rd.Dataset:
    """Ratio-to-report: per market segment, total revenue and its share of
    the global total — (c_mktsegment, revenue, share). Customer broadcasts
    (dimension side), cents accumulate as exact int64 per-batch partials,
    ONE tiny segment groupby merges them; the grand total folds over the
    (<= segment-domain) agg rows. Both divisions are double/double in both
    engines, so values hash bit-identically with no rounding."""
    cust = read_view(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_arrow_refs()
    ref = ray.put(cust)

    class Probe:
        def __init__(self, side_ref: ray.ObjectRef) -> None:
            self.ref = side_ref

        def _side(self):
            got = _PROBE_CACHE.get(self.ref.binary())
            if got is None:
                t = pa.concat_tables(ray.get(ray.get(self.ref))).combine_chunks()
                keys = t["c_custkey"].to_numpy()
                seg = t["c_mktsegment"].combine_chunks().dictionary_encode()
                order = np.argsort(keys, kind="stable")
                got = (keys[order],
                       seg.indices.to_numpy().astype(np.int64)[order],
                       seg.dictionary)
                _PROBE_CACHE.clear()
                _PROBE_CACHE[self.ref.binary()] = got
            return got

        def __call__(self, b: pa.Table) -> pa.Table:
            keys, codes, segments = self._side()
            ck = b["o_custkey"].to_numpy()
            if len(keys) == 0:
                ck, b = ck[:0], b.slice(0, 0)
            pos = np.minimum(np.searchsorted(keys, ck), max(len(keys) - 1, 0))
            hit = keys[pos] == ck
            code = codes[pos[hit]]
            cents = np.round(
                b["o_totalprice"].to_numpy(zero_copy_only=False)[hit] * 100
            ).astype(np.int64)
            pc_sum = np.bincount(code, weights=cents.astype(np.float64),
                                 minlength=len(segments)).astype(np.int64)
            nz = np.flatnonzero(pc_sum)
            return pa.table(
                {"c_mktsegment": segments.take(pa.array(nz, pa.int64())),
                 "pcents": pa.array(pc_sum[nz], type=pa.int64())}
            )

    agg = (
        read_view(f"{sf_dir}/orders.parquet",
                  columns=["o_custkey", "o_totalprice"])
        .map_batches(Probe(ref), batch_format="pyarrow")
        .groupby("c_mktsegment")
        .sum("pcents")
    )

    def final(b: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("c_mktsegment", pa.string()), ("revenue", pa.float64()),
             ("share", pa.float64())]
        )
        if b.num_rows == 0 or "sum(pcents)" not in b.column_names:
            return schema.empty_table()
        c = b["sum(pcents)"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        total = float(c.sum())
        return pa.table(
            {"c_mktsegment": b["c_mktsegment"],
             "revenue": pa.array(c.astype(np.float64) / 100.0),
             "share": pa.array(c.astype(np.float64) / total)}
        )

    return agg.repartition(1).map_batches(
        final, batch_format="pyarrow", batch_size=None
    )


def events_cube(sf_dir: str) -> rd.Dataset:
    """CUBE aggregate: event counts at all four grouping levels —
    (event_type, hour), per-type, per-hour, grand total — with 'ALL'/-1
    sentinels: (event_type, hour_bucket, n_events). Same one-distributed-
    pass shape as events_rollup; the three coarser levels re-aggregate the
    bounded fine-level table. Oracle: DuckDB GROUP BY CUBE."""

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        hour = pc.divide(pc.divide(ts_us, 10**6), 3600)
        t = pa.table({"event_type": b["event_type"], "hour_bucket": hour})
        g = t.group_by(["event_type", "hour_bucket"]).aggregate(
            [("hour_bucket", "count", pc.CountOptions(mode="all"))]
        )
        return pa.table(
            {"event_type": g["event_type"], "hour_bucket": g["hour_bucket"],
             "pn": g["hour_bucket_count"]}
        )

    fine = (
        read_view(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour_bucket"])
        .sum("pn")
    )

    def cube(b: pa.Table) -> pa.Table:
        et = b["event_type"]
        hour = b["hour_bucket"].cast(pa.int64())
        n = b["sum(pn)"].cast(pa.int64())
        fine_t = pa.table(
            {"event_type": et, "hour_bucket": hour, "n_events": n}
        )
        by_type = pa.table({"event_type": et, "n": n}).group_by(
            "event_type"
        ).aggregate([("n", "sum")])
        lvl_type = pa.table(
            {"event_type": by_type["event_type"],
             "hour_bucket": pa.array(np.full(by_type.num_rows, -1), pa.int64()),
             "n_events": by_type["n_sum"].cast(pa.int64())}
        )
        by_hour = pa.table({"hour_bucket": hour, "n": n}).group_by(
            "hour_bucket"
        ).aggregate([("n", "sum")])
        lvl_hour = pa.table(
            {"event_type": pa.array(["ALL"] * by_hour.num_rows),
             "hour_bucket": by_hour["hour_bucket"],
             "n_events": by_hour["n_sum"].cast(pa.int64())}
        )
        grand = pa.table(
            {"event_type": pa.array(["ALL"]),
             "hour_bucket": pa.array([-1], pa.int64()),
             "n_events": pa.array([int(pc.sum(n).as_py() or 0)], pa.int64())}
        )
        return pa.concat_tables([fine_t, lvl_type, lvl_hour, grand])

    return fine.repartition(1).map_batches(
        cube, batch_format="pyarrow", batch_size=None
    )


def co_event_pairs(sf_dir: str) -> rd.Dataset:
    """Event-type co-occurrence: for every unordered type pair, how many
    users performed BOTH — (ta, tb, n_users), ta < tb. The market-basket /
    co-visitation primitive. Per-batch DISTINCT (user, type) partials
    shrink the shuffle to the distinct-pair volume; ONE user shuffle; the
    bucket kernel dedups within runs and emits triu pairs (bounded by the
    type domain per user), pre-aggregated with Arrow group_by before the
    final tiny pair groupby."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    def distinct_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"user_id": b["user_id"], "event_type": b["event_type"]})
        g = t.group_by(["user_id", "event_type"]).aggregate([])
        return g

    pairs_schema = pa.schema(
        [("ta", pa.string()), ("tb", pa.string()), ("pn", pa.int64())]
    )

    def pair_runs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pairs_schema.empty_table()
        users = g["user_id"].to_numpy(zero_copy_only=False)
        enc = g["event_type"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # dedup (user, type) repeats across batch partials: sorted by
        # (user, type), keep first of each equal neighbor pair
        keep = np.ones(len(users), dtype=bool)
        keep[1:] = (users[1:] != users[:-1]) | (codes[1:] != codes[:-1])
        users, codes = users[keep], codes[keep]
        starts = run_starts(users)
        bounds = np.append(starts, len(users))
        out_a, out_b = [], []
        for r in np.flatnonzero(np.diff(bounds) >= 2):
            run = codes[bounds[r]: bounds[r + 1]]  # sorted, distinct
            iu, ju = np.triu_indices(len(run), 1)
            out_a.append(run[iu])
            out_b.append(run[ju])
        if not out_a:
            return pairs_schema.empty_table()
        t = pa.table(
            {"ca": pa.array(np.concatenate(out_a)),
             "cb": pa.array(np.concatenate(out_b))}
        )
        agg = t.group_by(["ca", "cb"]).aggregate(
            [("ca", "count", pc.CountOptions(mode="all"))]
        )
        dic = enc.dictionary
        return pa.table(
            {"ta": dic.take(agg["ca"]), "tb": dic.take(agg["cb"]),
             "pn": agg["ca_count"].cast(pa.int64())}
        )

    distinct = read_view(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    ).map_batches(distinct_partial, batch_format="pyarrow")
    partial = grouped_runs(distinct, "user_id", pair_runs,
                           sort_cols=["user_id", "event_type"])
    agg = partial.groupby(["ta", "tb"]).sum("pn")

    def final(b: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("ta", pa.string()), ("tb", pa.string()), ("n_users", pa.int64())]
        )
        if b.num_rows == 0 or "sum(pn)" not in b.column_names:
            return schema.empty_table()
        return pa.table(
            {"ta": b["ta"], "tb": b["tb"],
             "n_users": b["sum(pn)"].cast(pa.int64())}
        )

    return agg.map_batches(final, batch_format="pyarrow")


def price_qty_corr(sf_dir: str) -> rd.Dataset:
    """Pearson correlation of line price (exact cents) and quantity over
    lineitem: one row (n, corr). All six moments accumulate as EXACT
    integers — per-batch int64 partials chunk-summed so no intermediate
    exceeds 2^63, folded driver-side as arbitrary-precision Python ints —
    and the final formula performs the identical double conversions as the
    HUGEINT SQL oracle, so the float hashes bit-identically. The shape is
    one streamed projection-pruned pass; only six ints per chunk move."""
    import ray

    def partial(b: pa.Table) -> pa.Table:
        x = np.round(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        y = np.round(
            b["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        # chunk so each partial sum stays far below 2^63 (x*x <= ~1e14)
        bounds = np.arange(0, len(x), 8192)
        rows = {
            "n": np.diff(np.append(bounds, len(x))).astype(np.int64),
            "sx": np.add.reduceat(x, bounds) if len(x) else np.array([], np.int64),
            "sy": np.add.reduceat(y, bounds) if len(x) else np.array([], np.int64),
            "sxy": np.add.reduceat(x * y, bounds) if len(x) else np.array([], np.int64),
            "sxx": np.add.reduceat(x * x, bounds) if len(x) else np.array([], np.int64),
            "syy": np.add.reduceat(y * y, bounds) if len(x) else np.array([], np.int64),
        }
        return pa.table({k: pa.array(v, type=pa.int64()) for k, v in rows.items()})

    parts = [
        t for t in ray.get(
            read_view(f"{sf_dir}/lineitem.parquet",
                      columns=["l_extendedprice", "l_quantity"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows and "n" in t.column_names
    ]
    n = sx = sy = sxy = sxx = syy = 0
    for t in parts:  # Python ints: exact at any magnitude
        n += int(pc.sum(t["n"]).as_py() or 0)
        sx += sum(t["sx"].to_pylist())
        sy += sum(t["sy"].to_pylist())
        sxy += sum(t["sxy"].to_pylist())
        sxx += sum(t["sxx"].to_pylist())
        syy += sum(t["syy"].to_pylist())
    import math

    num = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    corr = (
        float(num) / (math.sqrt(float(vx)) * math.sqrt(float(vy)))
        if vx > 0 and vy > 0
        else 0.0
    )
    return rd.from_arrow(
        pa.table({"n": pa.array([n], pa.int64()),
                  "corr": pa.array([corr], pa.float64())})
    )


def events_hourly_dense(sf_dir: str) -> rd.Dataset:
    """Gap-filled hourly event counts: every hour between the corpus min
    and max appears exactly once, zero-filled when no events landed in it —
    (hour_bucket, n_events). The resample/gap-fill staple dashboards and
    trainers need before windowed models.

    The distributed part is the same bounded (hour, count) partial
    aggregation as events_hourly; the dense axis is generated from the agg
    table's own min/max (the hour DOMAIN is bounded — days x 24 — so the
    fill is a single-block numpy fill, never a per-row scan of events)."""

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        hour = pc.divide(pc.divide(ts_us, 10**6), 3600)
        t = pa.table({"hour_bucket": hour})
        g = t.group_by("hour_bucket").aggregate(
            [("hour_bucket", "count", pc.CountOptions(mode="all"))]
        )
        return pa.table(
            {"hour_bucket": g["hour_bucket"],
             "pn": g["hour_bucket_count"]}
        )

    agg = (
        read_view(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("hour_bucket")
        .sum("pn")
    )

    schema = pa.schema([("hour_bucket", pa.int64()), ("n_events", pa.int64())])

    def densify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(pn)" not in b.column_names:
            return schema.empty_table()
        h = b["hour_bucket"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = b["sum(pn)"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        lo, hi = int(h.min()), int(h.max())
        dense = np.zeros(hi - lo + 1, dtype=np.int64)
        dense[h - lo] = n
        return pa.table(
            {"hour_bucket": pa.array(np.arange(lo, hi + 1), pa.int64()),
             "n_events": pa.array(dense, pa.int64())}
        )

    return agg.repartition(1).map_batches(
        densify, batch_format="pyarrow", batch_size=None
    )


def orders_profile(sf_dir: str) -> rd.Dataset:
    """Data-quality profile of the orders table's numeric columns: one row
    per column — (column, n, n_null, vmin, vmax). The ingest-validation
    staple run before a pipeline trusts a new drop. Per-batch partials
    carry five scalars per column; the driver folds the bounded partial
    table — a streamed single pass, no shuffle."""
    import ray

    cols = ["o_orderkey", "o_custkey", "o_totalprice"]

    def partial(b: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs = [], [], [], [], []
        for c in cols:
            arr = b[c]
            names.append(c)
            ns.append(len(arr))
            nulls.append(arr.null_count)
            valid = arr.drop_null()
            if len(valid):
                mins.append(float(pc.min(valid).as_py()))
                maxs.append(float(pc.max(valid).as_py()))
            else:
                mins.append(np.inf)
                maxs.append(-np.inf)
        return pa.table(
            {"column": pa.array(names), "n": pa.array(ns, pa.int64()),
             "n_null": pa.array(nulls, pa.int64()),
             "vmin": pa.array(mins, pa.float64()),
             "vmax": pa.array(maxs, pa.float64())}
        )

    parts = [
        t for t in ray.get(
            read_view(f"{sf_dir}/orders.parquet", columns=cols)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows and "column" in t.column_names
    ]
    schema = pa.schema(
        [("column", pa.string()), ("n", pa.int64()), ("n_null", pa.int64()),
         ("vmin", pa.float64()), ("vmax", pa.float64())]
    )
    if not parts:
        # empty read still profiles every column (n=0, NULL extrema) — the
        # same degenerate row the SQL aggregate emits
        parts = [pa.table(
            {"column": pa.array(cols), "n": pa.array([0] * len(cols), pa.int64()),
             "n_null": pa.array([0] * len(cols), pa.int64()),
             "vmin": pa.array([np.inf] * len(cols), pa.float64()),
             "vmax": pa.array([-np.inf] * len(cols), pa.float64())}
        )]
    df = pa.concat_tables(parts).to_pandas()
    out = df.groupby("column", sort=True).agg(
        n=("n", "sum"), n_null=("n_null", "sum"),
        vmin=("vmin", "min"), vmax=("vmax", "max"),
    ).reset_index()
    # all-null/empty columns: ±inf sentinels -> SQL-parity NULLs
    out.loc[~np.isfinite(out["vmin"]), "vmin"] = np.nan
    out.loc[~np.isfinite(out["vmax"]), "vmax"] = np.nan
    return rd.from_arrow(pa.Table.from_pandas(out, schema=schema,
                                              preserve_index=False))


def hourly_anomalies(sf_dir: str) -> rd.Dataset:
    """Hours whose event count deviates more than 3 sigma from the hourly
    mean: (hour_bucket, n_events) — volume-anomaly detection for ingest
    monitoring. The distributed part is the bounded hourly partial
    aggregation; the 3-sigma test is the EXACT integer inequality
    (c*k - S)^2 > 9*(k*Q - S^2) over the single agg block (k hours, sum S,
    sum-of-squares Q as Python ints), so no float mean/stddev can flip a
    boundary hour — the same no-float-compare rule as above_avg_orders."""

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        hour = pc.divide(pc.divide(ts_us, 10**6), 3600)
        t = pa.table({"hour_bucket": hour})
        g = t.group_by("hour_bucket").aggregate(
            [("hour_bucket", "count", pc.CountOptions(mode="all"))]
        )
        return pa.table(
            {"hour_bucket": g["hour_bucket"], "pn": g["hour_bucket_count"]}
        )

    agg = (
        read_view(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("hour_bucket")
        .sum("pn")
    )
    schema = pa.schema([("hour_bucket", pa.int64()), ("n_events", pa.int64())])

    def flag(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(pn)" not in b.column_names:
            return schema.empty_table()
        h = b["hour_bucket"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        c = b["sum(pn)"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        k, s = len(c), int(c.sum())
        q = int((c.astype(object) * c.astype(object)).sum())
        dev = c.astype(object) * k - s
        keep = np.asarray(dev * dev > 9 * (k * q - s * s), dtype=bool)
        return pa.table(
            {"hour_bucket": pa.array(h[keep], pa.int64()),
             "n_events": pa.array(c[keep], pa.int64())}
        )

    return agg.repartition(1).map_batches(
        flag, batch_format="pyarrow", batch_size=None
    )


def revenue_rolling_7d(sf_dir: str) -> rd.Dataset:
    """Rolling 7-day revenue over a gap-filled day axis: (day_bucket,
    revenue, rev_7d) — the dashboard/time-series staple. Per-batch daily
    cent partials (bounded by the date domain) merge in one tiny groupby;
    the single-block finish densifies missing days to zero and computes the
    trailing window as a cumsum difference — exact int64 cents throughout,
    divided once, so doubles hash bit-identically. Day gaps matter: the
    window is calendar ROWS over the DENSE axis, not 7 observed rows."""

    def partial(b: pa.Table) -> pa.Table:
        day = pc.divide(
            pc.divide(b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()),
                      10**6),
            86400,
        )
        cents = np.round(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        t = pa.table({"day_bucket": day, "cents": pa.array(cents)})
        g = t.group_by("day_bucket").aggregate([("cents", "sum")])
        return pa.table(
            {"day_bucket": g["day_bucket"], "pc": g["cents_sum"].cast(pa.int64())}
        )

    agg = (
        read_view(f"{sf_dir}/orders.parquet",
                  columns=["o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("day_bucket")
        .sum("pc")
    )
    schema = pa.schema(
        [("day_bucket", pa.int64()), ("revenue", pa.float64()),
         ("rev_7d", pa.float64())]
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(pc)" not in b.column_names:
            return schema.empty_table()
        d = b["day_bucket"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        c = b["sum(pc)"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        lo, hi = int(d.min()), int(d.max())
        dense = np.zeros(hi - lo + 1, dtype=np.int64)
        dense[d - lo] = c
        cum = np.concatenate([[0], np.cumsum(dense)])
        roll = cum[1:] - cum[np.maximum(np.arange(len(dense)) - 6, 0)]
        return pa.table(
            {"day_bucket": pa.array(np.arange(lo, hi + 1), pa.int64()),
             "revenue": pa.array(dense.astype(np.float64) / 100.0),
             "rev_7d": pa.array(roll.astype(np.float64) / 100.0)}
        )

    return agg.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


def repeat_orders_7d(sf_dir: str) -> rd.Dataset:
    """Repeat-purchase detection: orders placed within 7 days of the same
    customer's previous order — (o_orderkey, o_custkey, gap_days). The
    retention/CDC primitive. ONE o_custkey shuffle; the kernel is a shifted
    integer-day difference masked at run starts (the event_gaps shape on
    the orders table). gap is exact integer days both sides."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    ds = read_view(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    schema = pa.schema(
        [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
         ("gap_days", pa.int64())]
    )

    def gaps(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return schema.empty_table()
        ck = g["o_custkey"].to_numpy(zero_copy_only=False)
        day = (
            g["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False) // (86400 * 10**6)
        )
        starts = run_starts(ck)
        gap = np.empty(len(ck), dtype=np.int64)
        gap[1:] = day[1:] - day[:-1]
        first = np.zeros(len(ck), dtype=bool)
        first[starts] = True
        keep = (~first) & (gap <= 7)
        return pa.table(
            {"o_orderkey": g["o_orderkey"].filter(pa.array(keep)),
             "o_custkey": g["o_custkey"].filter(pa.array(keep)),
             "gap_days": pa.array(gap[keep], pa.int64())}
        )

    return grouped_runs(
        ds, "o_custkey", gaps,
        sort_cols=["o_custkey", "o_orderdate", "o_orderkey"],
    )


def orders_denormalized(sf_dir: str) -> rd.Dataset:
    """Star-schema denormalization — the feature-export staple: every
    order flattened with its customer and nation attributes in ONE
    streamed pass: (o_orderkey, o_totalprice, c_name, c_mktsegment,
    n_name). Both dimension hops (customer, nation) are broadcast-probed
    sorted arrays (ray.put once, np.searchsorted per batch) — the fact
    table never shuffles, the exact pattern a 100-TB denormalize needs."""
    import ray

    cust = read_view(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey", "c_mktsegment"],
    ).to_arrow_refs()
    nat = read_view(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_arrow_refs()
    cref, nref = ray.put(cust), ray.put(nat)

    class Denorm:
        def __init__(self, cr, nr) -> None:
            self.cr, self.nr = cr, nr

        def _side(self):
            key = (self.cr.binary(), self.nr.binary())
            got = _PROBE_CACHE.get(key)
            if got is None:
                ct = pa.concat_tables(ray.get(ray.get(self.cr))).combine_chunks()
                nt = pa.concat_tables(ray.get(ray.get(self.nr))).combine_chunks()
                ck = ct["c_custkey"].to_numpy()
                order = np.argsort(ck, kind="stable")
                nk = nt["n_nationkey"].to_numpy()
                norder = np.argsort(nk, kind="stable")
                got = (
                    ck[order],
                    ct["c_name"].take(pa.array(order)),
                    ct["c_mktsegment"].take(pa.array(order)),
                    ct["c_nationkey"].to_numpy()[order],
                    nk[norder],
                    nt["n_name"].take(pa.array(norder)),
                )
                _PROBE_CACHE.clear()
                _PROBE_CACHE[key] = got
            return got

        def __call__(self, b: pa.Table) -> pa.Table:
            ck, cname, cseg, cnat, nk, nname = self._side()
            keys = b["o_custkey"].to_numpy()
            if len(ck) == 0:
                keys, b = keys[:0], b.slice(0, 0)
            pos = np.minimum(np.searchsorted(ck, keys), max(len(ck) - 1, 0))
            hit = ck[pos] == keys  # inner join: drop FK misses
            pos = pos[hit]
            npos = np.minimum(
                np.searchsorted(nk, cnat[pos]), max(len(nk) - 1, 0)
            )
            return pa.table(
                {
                    "o_orderkey": b["o_orderkey"].filter(pa.array(hit)),
                    "o_totalprice": b["o_totalprice"].filter(pa.array(hit)),
                    "c_name": cname.take(pa.array(pos)),
                    "c_mktsegment": cseg.take(pa.array(pos)),
                    "n_name": nname.take(pa.array(npos)),
                }
            )

    return read_view(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(Denorm(cref, nref), batch_format="pyarrow")


def user_lifetimes(sf_dir: str) -> rd.Dataset:
    """User lifetime table — (user_id, n_events, first_ts, last_ts,
    lifespan_days): the per-entity activity summary every retention /
    cohort analysis starts from. Per-batch (user, count, min, max)
    partials shrink the shuffle to distinct users per block; one tiny user
    groupby merges; lifespan is an exact integer floor-day difference."""

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"user_id": b["user_id"], "ts": b["ts"]})
        g = t.group_by("user_id").aggregate(
            [("ts", "count", pc.CountOptions(mode="all")),
             ("ts", "min"), ("ts", "max")]
        )
        return pa.table(
            {"user_id": g["user_id"], "pn": g["ts_count"].cast(pa.int64()),
             "pmin": g["ts_min"], "pmax": g["ts_max"]}
        )

    agg = (
        read_view(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            ray.data.aggregate.Sum("pn"),
            ray.data.aggregate.Min("pmin"),
            ray.data.aggregate.Max("pmax"),
        )
    )
    schema = pa.schema(
        [("user_id", pa.int64()), ("n_events", pa.int64()),
         ("first_ts", pa.timestamp("us")), ("last_ts", pa.timestamp("us")),
         ("lifespan_days", pa.int64())]
    )

    def final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(pn)" not in b.column_names:
            return schema.empty_table()
        first = b["min(pmin)"].cast(pa.timestamp("us"))
        last = b["max(pmax)"].cast(pa.timestamp("us"))
        fd = pc.divide(first.cast(pa.int64()), 86400 * 10**6)
        ld = pc.divide(last.cast(pa.int64()), 86400 * 10**6)
        return pa.table(
            {"user_id": b["user_id"],
             "n_events": b["sum(pn)"].cast(pa.int64()),
             "first_ts": first, "last_ts": last,
             "lifespan_days": pc.subtract(ld, fd).cast(pa.int64())}
        )

    return agg.map_batches(final, batch_format="pyarrow")


def duplicate_event_keys(sf_dir: str) -> pa.Table:
    """Uniqueness assertion — the ingest data-quality check: (user_id, ts,
    n) for every (user_id, ts) key appearing more than once. An exactly-
    once pipeline expects zero rows; nonzero rows name the offending keys.
    Per-batch composite-key count partials, one tiny groupby, HAVING>=2
    dataset-side. Returns a pyarrow Table (violations are a small result
    by contract) so a clean corpus still yields a schema-stable empty
    result — Ray drops the schema of all-empty-block datasets (the
    round-1 crash class)."""

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"user_id": b["user_id"], "ts": b["ts"]})
        g = t.group_by(["user_id", "ts"]).aggregate(
            [("ts", "count", pc.CountOptions(mode="all"))]
        )
        return pa.table(
            {"user_id": g["user_id"], "ts": g["ts"],
             "pn": g["ts_count"].cast(pa.int64())}
        )

    agg = (
        read_view(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "ts"])
        .sum("pn")
    )
    schema = pa.schema(
        [("user_id", pa.int64()), ("ts", pa.timestamp("us")),
         ("n", pa.int64())]
    )

    def having(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(pn)" not in b.column_names:
            return schema.empty_table()
        n = b["sum(pn)"].cast(pa.int64())
        m = pc.greater_equal(n, 2)
        return pa.table(
            {"user_id": b["user_id"].filter(m),
             "ts": b["ts"].cast(pa.timestamp("us")).filter(m),
             "n": n.filter(m)}
        )

    out = agg.map_batches(having, batch_format="pyarrow")
    tables = [t for t in ray.get(out.to_arrow_refs())
              if t.num_rows and "user_id" in t.column_names]
    return pa.concat_tables(tables) if tables else schema.empty_table()


def weekly_revenue_growth(sf_dir: str) -> rd.Dataset:
    """Week-over-week revenue with growth ratio: (week_bucket, revenue,
    growth) where growth = this week's cents / previous week's cents (0.0
    for the first week) — the reporting staple. Weekly cent partials are
    bounded by the date domain; the single-block finish shifts the dense
    week axis. Both divisions are int-derived double/double, so values
    hash bit-identically."""

    def partial(b: pa.Table) -> pa.Table:
        week = pc.divide(
            pc.divide(b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()),
                      10**6),
            604800,
        )
        cents = np.round(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        t = pa.table({"week_bucket": week, "cents": pa.array(cents)})
        g = t.group_by("week_bucket").aggregate([("cents", "sum")])
        return pa.table(
            {"week_bucket": g["week_bucket"],
             "pc": g["cents_sum"].cast(pa.int64())}
        )

    agg = (
        read_view(f"{sf_dir}/orders.parquet",
                  columns=["o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("week_bucket")
        .sum("pc")
    )
    schema = pa.schema(
        [("week_bucket", pa.int64()), ("revenue", pa.float64()),
         ("growth", pa.float64())]
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(pc)" not in b.column_names:
            return schema.empty_table()
        w = b["week_bucket"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        c = b["sum(pc)"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        lo, hi = int(w.min()), int(w.max())
        dense = np.zeros(hi - lo + 1, dtype=np.int64)
        dense[w - lo] = c
        prev = np.concatenate([[0], dense[:-1]])
        growth = np.divide(
            dense.astype(np.float64), prev.astype(np.float64),
            out=np.zeros(len(dense)), where=prev > 0,
        )
        return pa.table(
            {"week_bucket": pa.array(np.arange(lo, hi + 1), pa.int64()),
             "revenue": pa.array(dense.astype(np.float64) / 100.0),
             "growth": pa.array(growth, pa.float64())}
        )

    return agg.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


def retention_cohorts(sf_dir: str) -> rd.Dataset:
    """Cohort retention matrix — (cohort_week, week_offset, n_users):
    users grouped by the Monday-start week of their FIRST event, counted
    distinct in each subsequent week they were active. ONE user shuffle
    (grouped_runs) makes each user's history local, so the first-event
    week and the per-user distinct week set are both exact without a
    second distinct shuffle; per-bucket (cohort, offset) partials are
    bounded by weeks^2, so the final merge groupby is tiny. Week
    truncation is exact integer day math (epoch day + 3 mod 7 = Monday
    index), matching DuckDB's date_trunc('week', ts)."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    events = read_view(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    partial_schema = pa.schema(
        [("cohort_day", pa.int64()), ("week_offset", pa.int64()),
         ("pn", pa.int64())]
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return partial_schema.empty_table()
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = ts // (86_400 * 10**6)
        week_day = day - (day + 3) % 7  # Monday of the event's week
        starts = run_starts(u)
        lens = np.diff(np.append(starts, len(u)))
        cohort = np.repeat(week_day[starts], lens)  # sorted by ts in-run
        offset = (week_day - cohort) // 7  # non-decreasing within a run
        keep = np.ones(len(u), dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (offset[1:] != offset[:-1])
        comp = cohort[keep] * 20_000 + offset[keep]  # offset < 20k weeks
        vals, counts = np.unique(comp, return_counts=True)
        return pa.table(
            {"cohort_day": pa.array(vals // 20_000),
             "week_offset": pa.array(vals % 20_000),
             "pn": pa.array(counts.astype(np.int64))}
        )

    partials = grouped_runs(events, "user_id", per_bucket,
                            sort_cols=["user_id", "ts"])
    agg = partials.groupby(["cohort_day", "week_offset"]).aggregate(
        ray.data.aggregate.Sum("pn")
    )
    schema = pa.schema(
        [("cohort_week", pa.timestamp("us")), ("week_offset", pa.int64()),
         ("n_users", pa.int64())]
    )

    def final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(pn)" not in b.column_names:
            return schema.empty_table()
        week = pc.multiply(b["cohort_day"].cast(pa.int64()), 86_400 * 10**6)
        return pa.table(
            {"cohort_week": week.cast(pa.timestamp("us")),
             "week_offset": b["week_offset"].cast(pa.int64()),
             "n_users": b["sum(pn)"].cast(pa.int64())}
        )

    return agg.map_batches(final, batch_format="pyarrow")


def median_price_by_priority(sf_dir: str) -> rd.Dataset:
    """Grouped EXACT median — (o_orderpriority, median_price, n_orders):
    the per-segment robust center. ONE priority shuffle via grouped_runs
    with sort_cols (priority, price), so each run arrives sorted and the
    rank-ceil(n/2) element is a direct index — no per-group Python, one
    vectorized gather per bucket. Colocating a whole group bounds memory
    by the largest group; past that, swap each group's selection for the
    sketch-bounded two-pass (_exact_median_scan) keyed by group — this
    operator is the bounded-group-count case."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    orders = read_view(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )
    schema = pa.schema(
        [("o_orderpriority", pa.string()), ("median_price", pa.float64()),
         ("n_orders", pa.int64())]
    )

    def med_runs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return schema.empty_table()
        prio = np.asarray(g["o_orderpriority"].to_pylist(), dtype=object)
        v = g["o_totalprice"].to_numpy(zero_copy_only=False)
        starts = run_starts(prio)
        lens = np.diff(np.append(starts, len(prio)))
        idx = starts + (lens + 1) // 2 - 1  # rank ceil(n/2), 0-based
        return pa.table(
            {"o_orderpriority": pa.array(prio[starts]),
             "median_price": pa.array(v[idx]),
             "n_orders": pa.array(lens.astype(np.int64))}
        )

    return grouped_runs(
        orders, "o_orderpriority", med_runs,
        sort_cols=["o_orderpriority", "o_totalprice"],
    )


def _skyline_mask(price: np.ndarray, size: np.ndarray) -> np.ndarray:
    """Keep mask of the 2D skyline (minimize price, maximize size) over
    arrays SORTED by (price asc, size desc). A point is dominated iff an
    earlier strictly-cheaper point has size >= its size, or a same-price
    point has size > its size (the run head, since size sorts desc within
    a price run). Vectorized: one run detection + one prefix max."""
    from dedup_ray.stages.grouped import run_starts

    n = len(price)
    if n == 0:
        return np.zeros(0, dtype=bool)
    starts = run_starts(price)
    lens = np.diff(np.append(starts, n))
    run_max = size[starts]  # size desc within a price run
    # max size over all STRICTLY cheaper runs (-inf for the first run)
    prev = np.concatenate([[-np.inf], np.maximum.accumulate(run_max)[:-1]])
    dominated = (np.repeat(prev, lens) >= size) | (np.repeat(run_max, lens) > size)
    return ~dominated


def pareto_parts(sf_dir: str) -> pa.Table:
    """Skyline / Pareto frontier of the part table — (p_partkey,
    p_retailprice, p_size): parts where no other part is both cheaper-or-
    equal AND larger-or-equal with at least one strict. The classic
    multi-objective shortlist, built distributed: each batch reduces to
    its LOCAL skyline (dominated-locally implies dominated-globally, so
    the filter is lossless), and only those frontier fragments — bounded
    by the distinct-price domain, in practice a sliver of the input —
    reach the driver for the final merge with the same vectorized kernel.
    Past driver scale the merge recurses (skyline-of-skylines is
    associative); comparisons only, no float arithmetic to diverge."""
    ds = read_view(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_retailprice", "p_size"],
    )

    def local_skyline(b: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            b, sort_keys=[("p_retailprice", "ascending"),
                          ("p_size", "descending")]
        )
        b = b.take(order)
        keep = _skyline_mask(
            b["p_retailprice"].to_numpy(zero_copy_only=False),
            b["p_size"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
        return b.filter(pa.array(keep))

    frags = ds.map_batches(local_skyline, batch_format="pyarrow").take_all()
    schema = pa.schema(
        [("p_partkey", pa.int64()), ("p_retailprice", pa.float64()),
         ("p_size", pa.int32())]
    )
    if not frags:
        return schema.empty_table()
    t = pa.Table.from_pylist(frags, schema=schema).sort_by(
        [("p_retailprice", "ascending"), ("p_size", "descending")]
    )
    keep = _skyline_mask(
        t["p_retailprice"].to_numpy(zero_copy_only=False),
        t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64),
    )
    return t.filter(pa.array(keep)).sort_by("p_partkey")


def price_histogram(sf_dir: str, nbins: int = 20) -> pa.Table:
    """Equi-width histogram of order value — (bin, n_orders): the
    distribution dashboard for a continuous double column. Pass 1 folds
    per-batch min/max partials to two driver scalars; pass 2 folds
    per-batch bincounts into one length-``nbins`` vector — both streamed,
    no shuffle, and the bin expression floor((v-lo)*nbins/(hi-lo)) is the
    identical double op sequence DuckDB evaluates, so edges land in the
    same bin on both engines (v == hi clamps to the last bin)."""
    ds = read_view(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])

    def minmax(b: pa.Table) -> pa.Table:
        v = b["o_totalprice"].to_numpy(zero_copy_only=False)
        if len(v) == 0:
            return pa.table({"lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        return pa.table({"lo": pa.array([float(v.min())]),
                         "hi": pa.array([float(v.max())])})

    parts = ds.map_batches(minmax, batch_format="pyarrow").take_all()
    schema = pa.schema([("bin", pa.int64()), ("n_orders", pa.int64())])
    if not parts:
        return schema.empty_table()
    lo = min(r["lo"] for r in parts)
    hi = max(r["hi"] for r in parts)
    width = hi - lo

    def bincount(b: pa.Table) -> pa.Table:
        v = b["o_totalprice"].to_numpy(zero_copy_only=False)
        if width == 0.0:
            bins = np.zeros(len(v), dtype=np.int64)
        else:
            bins = np.floor((v - lo) * nbins / width).astype(np.int64)
            bins = np.minimum(bins, nbins - 1)
        return pa.table(
            {"bin_idx": pa.array(np.arange(nbins, dtype=np.int64)),
             "cnt": pa.array(np.bincount(bins, minlength=nbins).astype(np.int64))}
        )

    counts = ds.map_batches(bincount, batch_format="pyarrow").take_all()
    total = np.zeros(nbins, dtype=np.int64)
    for r in counts:
        total[r["bin_idx"]] += r["cnt"]
    mask = total > 0
    return pa.table(
        {"bin": pa.array(np.flatnonzero(mask).astype(np.int64)),
         "n_orders": pa.array(total[mask])}
    )


def cumulative_users_by_day(sf_dir: str) -> rd.Dataset:
    """Cumulative distinct users by day — (day, n_users_cum): the
    classic growth curve. Distinct-so-far needs each user counted once,
    on their FIRST day: per-batch (user, min day) Arrow partials shrink
    the one user shuffle to distinct users per block; first-day counts
    then collapse to the bounded day domain, where a single-block sorted
    cumsum finishes (the day axis is thousands of rows at any corpus
    size — past that, revenue_running_by_date's range-partitioned scan
    is the swap). All-integer day floors; counts only."""

    def partial(b: pa.Table) -> pa.Table:
        day = pc.multiply(
            pc.divide(b["ts"].cast(pa.int64()), 86_400 * 10**6),
            86_400 * 10**6,
        )
        t = pa.table({"user_id": b["user_id"], "day": day})
        g = t.group_by("user_id").aggregate([("day", "min")])
        return pa.table({"user_id": g["user_id"], "pmin": g["day_min"]})

    firsts = (
        read_view(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(ray.data.aggregate.Min("pmin"))
    )

    def day_counts(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "min(pmin)" not in b.column_names:
            return pa.table({"day": pa.array([], pa.int64()),
                             "pn": pa.array([], pa.int64())})
        t = pa.table({"day": b["min(pmin)"], "one": pa.array(
            np.ones(b.num_rows, dtype=np.int64))})
        g = t.group_by("day").aggregate([("one", "sum")])
        return pa.table({"day": g["day"], "pn": g["one_sum"]})

    agg = firsts.map_batches(day_counts, batch_format="pyarrow").groupby(
        "day"
    ).aggregate(ray.data.aggregate.Sum("pn"))
    schema = pa.schema(
        [("day", pa.timestamp("us")), ("n_users_cum", pa.int64())]
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(pn)" not in b.column_names:
            return schema.empty_table()
        b = b.sort_by("day")
        cum = np.cumsum(b["sum(pn)"].to_numpy(zero_copy_only=False))
        return pa.table(
            {"day": b["day"].cast(pa.timestamp("us")),
             "n_users_cum": pa.array(cum.astype(np.int64))}
        )

    return agg.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


def weighted_discount_by_flag(sf_dir: str) -> rd.Dataset:
    """Quantity-weighted mean discount per return flag — (l_returnflag,
    avg_discount_weighted, n_items): the weighted-average aggregate done
    with EXACT integer moments. Discounts are 2-decimal and quantities
    integral, so sum(round(d*100)*q) and sum(q) fold as int64 partials
    (per-batch, before the tiny flag groupby) and ONE double division at
    the end reproduces the oracle bit-exactly — no float sums whose
    order could differ between engines."""

    def partial(b: pa.Table) -> pa.Table:
        d = b["l_discount"].to_numpy(zero_copy_only=False)
        q = b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        dc = np.rint(d * 100.0).astype(np.int64)
        t = pa.table(
            {"l_returnflag": b["l_returnflag"],
             "sw": pa.array(dc * q), "sq": pa.array(q),
             "n": pa.array(np.ones(len(q), dtype=np.int64))}
        )
        g = t.group_by("l_returnflag").aggregate(
            [("sw", "sum"), ("sq", "sum"), ("n", "sum")]
        )
        return pa.table(
            {"l_returnflag": g["l_returnflag"], "psw": g["sw_sum"],
             "psq": g["sq_sum"], "pn": g["n_sum"]}
        )

    agg = (
        read_view(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_discount", "l_quantity"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            ray.data.aggregate.Sum("psw"),
            ray.data.aggregate.Sum("psq"),
            ray.data.aggregate.Sum("pn"),
        )
    )
    schema = pa.schema(
        [("l_returnflag", pa.string()),
         ("avg_discount_weighted", pa.float64()), ("n_items", pa.int64())]
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(psw)" not in b.column_names:
            return schema.empty_table()
        sw = b["sum(psw)"].to_numpy(zero_copy_only=False).astype(np.int64)
        sq = b["sum(psq)"].to_numpy(zero_copy_only=False).astype(np.int64)
        wavg = sw.astype(np.float64) / (100 * sq).astype(np.float64)
        return pa.table(
            {"l_returnflag": b["l_returnflag"],
             "avg_discount_weighted": pa.array(wavg),
             "n_items": b["sum(pn)"].cast(pa.int64())}
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def customer_revenue_gini(sf_dir: str, num_parts: int = 64) -> pa.Table:
    """EXACT Gini coefficient of per-customer revenue — (gini,
    n_customers): the inequality / concentration metric over the whole
    key population, computed distributed with integer arithmetic.

    Gini needs every customer's global revenue RANK — the terasort
    recipe again (orders_global_rank): (1) per-customer exact cent
    totals (partial-agg + one custkey shuffle, then pinned — O(customers)
    rows, spillable); (2) stride-sample the cents key, driver picks
    splitters (equal values land in ONE partition, so tie ranks stay
    together — and the rank·value sum is tie-permutation-invariant
    anyway); (3) exact per-partition counts give driver prefix offsets;
    (4) ONE pid shuffle, local sort, ranks = offset + arange, and
    chunked int64 partials of sum(rank·cents) / sum(cents) fold
    driver-side as Python ints. gini = (2·S - (n+1)·tot) / (n·tot) with
    the same two double casts and one multiply+divide as the SQL, so the
    float hashes bit-identically. Per-element rank·cents stays below
    2^63 for n·max_cents < 4.6e18 (any realistic corpus); past that the
    kernel splits cents into 32-bit halves."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    def cents_partial(b: pa.Table) -> pa.Table:
        c = np.round(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        t = pa.table({"o_custkey": b["o_custkey"], "c": pa.array(c)})
        g = t.group_by("o_custkey").aggregate([("c", "sum")])
        return pa.table({"o_custkey": g["o_custkey"], "pc": g["c_sum"]})

    percust = (
        read_view(f"{sf_dir}/orders.parquet",
                  columns=["o_custkey", "o_totalprice"])
        .map_batches(cents_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(ray.data.aggregate.Sum("pc"))
        .map_batches(
            lambda b: pa.table({"cents": b["sum(pc)"].cast(pa.int64())})
            if b.num_rows and "sum(pc)" in b.column_names
            else pa.table({"cents": pa.array([], pa.int64())}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    empty = pa.table({"gini": pa.array([], pa.float64()),
                      "n_customers": pa.array([], pa.int64())})

    def sample(b: pa.Table) -> pa.Table:
        v = b["cents"].to_numpy(zero_copy_only=False)
        step = max(1, len(v) // 32)
        return pa.table({"v": pa.array(v[::step], pa.int64())})

    samp = np.sort(np.concatenate(
        [t["v"].to_numpy(zero_copy_only=False) for t in ray.get(
            percust.map_batches(sample, batch_format="pyarrow")
            .to_arrow_refs()
        ) if t.num_rows] or [np.empty(0, np.int64)]
    ))
    if samp.size == 0:
        return empty
    splitters = np.unique(
        samp[np.linspace(0, samp.size - 1, num_parts - 1).astype(np.int64)]
    )

    def pid_counts(b: pa.Table) -> pa.Table:
        v = b["cents"].to_numpy(zero_copy_only=False)
        pid = np.searchsorted(splitters, v, side="right")
        return pa.table(
            {"pid": pa.array(np.arange(len(splitters) + 1, dtype=np.int64)),
             "pn": pa.array(np.bincount(
                 pid, minlength=len(splitters) + 1).astype(np.int64))}
        )

    counts = np.zeros(len(splitters) + 1, dtype=np.int64)
    for t in ray.get(
        percust.map_batches(pid_counts, batch_format="pyarrow").to_arrow_refs()
    ):
        if t.num_rows:
            counts[t["pid"].to_numpy(zero_copy_only=False)] += t[
                "pn"].to_numpy(zero_copy_only=False)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    n = int(counts.sum())

    def add_pid(b: pa.Table) -> pa.Table:
        v = b["cents"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "pid", pa.array(np.searchsorted(splitters, v, side="right"))
        )

    def rank_partials(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"ps": pa.array([], pa.int64()),
                             "pt": pa.array([], pa.int64())})
        pid = g["pid"].to_numpy(zero_copy_only=False)
        c = g["cents"].to_numpy(zero_copy_only=False)
        starts = run_starts(pid)
        lens = np.diff(np.append(starts, len(pid)))
        # global 1-based rank: partition offset + position within the
        # (pid, cents)-sorted run
        base = np.repeat(offsets[pid[starts]] + 1 - starts, lens)
        rk = base + np.arange(len(pid))
        prod = rk * c
        bounds = np.arange(0, len(c), 4096)
        return pa.table(
            {"ps": pa.array(np.add.reduceat(prod, bounds)),
             "pt": pa.array(np.add.reduceat(c, bounds))}
        )

    parts = ray.get(
        grouped_runs(
            percust.map_batches(add_pid, batch_format="pyarrow"),
            "pid", rank_partials, sort_cols=["pid", "cents"],
        ).to_arrow_refs()
    )
    S = tot = 0
    for t in parts:  # Python ints: exact at any magnitude
        if t.num_rows and "ps" in t.column_names:
            S += sum(t["ps"].to_pylist())
            tot += sum(t["pt"].to_pylist())
    if n == 0 or tot == 0:
        return empty
    num = 2 * S - (n + 1) * tot
    gini = float(num) / (float(n) * float(tot))
    return pa.table({"gini": pa.array([gini], pa.float64()),
                     "n_customers": pa.array([n], pa.int64())})


def props_k_stats(sf_dir: str) -> rd.Dataset:
    """Semi-structured payload parse + aggregate — (event_type, n, sum_k,
    min_k, max_k): pull the numeric field out of the JSON ``props`` column
    and profile it per event type. The parse is ONE vectorized RE2 kernel
    (pc.extract_regex) inside the scan task — no per-row Python, and the
    same regex class DuckDB's regexp_extract runs, so both engines see
    identical integers. Per-batch partials collapse each block to the
    event-type domain before the tiny merge; exact int64 sums."""

    def partial(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["props"], pattern=r"(?P<k>[0-9]+)")
        k = pc.struct_field(m, "k").cast(pa.int64())
        t = pa.table({"event_type": b["event_type"], "k": k})
        g = t.group_by("event_type").aggregate(
            [("k", "count", pc.CountOptions(mode="all")),
             ("k", "sum"), ("k", "min"), ("k", "max")]
        )
        return pa.table(
            {"event_type": g["event_type"],
             "pn": g["k_count"].cast(pa.int64()), "ps": g["k_sum"],
             "pmin": g["k_min"], "pmax": g["k_max"]}
        )

    agg = (
        read_view(f"{sf_dir}/events.parquet",
                  columns=["event_type", "props"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            ray.data.aggregate.Sum("pn"), ray.data.aggregate.Sum("ps"),
            ray.data.aggregate.Min("pmin"), ray.data.aggregate.Max("pmax"),
        )
    )
    schema = pa.schema(
        [("event_type", pa.string()), ("n", pa.int64()),
         ("sum_k", pa.int64()), ("min_k", pa.int64()), ("max_k", pa.int64())]
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(pn)" not in b.column_names:
            return schema.empty_table()
        return pa.table(
            {"event_type": b["event_type"],
             "n": b["sum(pn)"].cast(pa.int64()),
             "sum_k": b["sum(ps)"].cast(pa.int64()),
             "min_k": b["min(pmin)"].cast(pa.int64()),
             "max_k": b["max(pmax)"].cast(pa.int64())}
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def custdist(sf_dir: str) -> pa.Table:
    """Customer order-count distribution (TPC-H Q13 shape): how many
    customers placed exactly n orders, INCLUDING zero-order customers —
    the two-level aggregate (aggregate of an aggregate). Level 1 is the
    usual per-batch partial count + ONE custkey shuffle; level 2
    re-aggregates the per-customer table (already collapsed to one row
    per customer) down to the tiny histogram in another partial+shuffle
    pass, so no level ever sees more than O(customers) rows and the
    driver only touches the bounded histogram. The zero bucket comes
    from total_customers - customers_seen (a metadata-cheap count) —
    no LEFT JOIN of the full dimension is materialized. Bounded result
    -> pa.Table: (n_orders, n_custs), ascending n_orders."""

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by("o_custkey").aggregate(
            [("o_custkey", "count", pc.CountOptions(mode="all"))]
        )
        return pa.table({"o_custkey": g["o_custkey"], "pn": g["o_custkey_count"]})

    per_cust = (
        read_view(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .sum("pn")
    )

    def hist_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(pn)" not in b.column_names:
            return pa.table({"n_orders": pa.array([], pa.int64()),
                             "pc": pa.array([], pa.int64())})
        t = pa.table({"n_orders": b["sum(pn)"].cast(pa.int64())})
        g = t.group_by("n_orders").aggregate(
            [("n_orders", "count", pc.CountOptions(mode="all"))]
        )
        return pa.table(
            {"n_orders": g["n_orders"], "pc": g["n_orders_count"].cast(pa.int64())}
        )

    hist = (
        per_cust.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("n_orders")
        .sum("pc")
    )
    rows = hist.take_all()  # bounded: one row per distinct order count
    n_total = read_view(f"{sf_dir}/customer.parquet", columns=["c_custkey"]).count()
    n_orders = [int(r["n_orders"]) for r in rows]
    n_custs = [int(r["sum(pc)"]) for r in rows]
    zero = int(n_total) - sum(n_custs)
    if zero > 0:
        n_orders.append(0)
        n_custs.append(zero)
    order = np.argsort(np.asarray(n_orders, dtype=np.int64)) if n_orders else []
    return pa.table(
        {
            "n_orders": pa.array([n_orders[i] for i in order], pa.int64()),
            "n_custs": pa.array([n_custs[i] for i in order], pa.int64()),
        }
    )


def priority_return_counts(sf_dir: str) -> rd.Dataset:
    """Conditional aggregation over a big-big join (TPC-H Q12 shape): per
    order priority, lineitems returned (flag 'R') vs not — the
    CASE-WHEN-inside-SUM pattern. ONE co-partitioning shuffle
    (stages/join.shuffle_join); both conditional counts are computed as
    0/1 integer columns and pre-reduced per bucket before the 5-row
    final groupby: (o_orderpriority, n_returned, n_other)."""
    from dedup_ray.stages.join import shuffle_join

    orders = read_view(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    items = read_view(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
    )
    joined = shuffle_join(orders, items, on="o_orderkey", right_on="l_orderkey")

    def partial(b: pa.Table) -> pa.Table:
        r = pc.cast(pc.equal(b["l_returnflag"], "R"), pa.int64())
        t = pa.table(
            {
                "o_orderpriority": b["o_orderpriority"],
                "r": r,
                "o": pc.subtract(pa.scalar(1, pa.int64()), r),
            }
        )
        g = t.group_by("o_orderpriority").aggregate([("r", "sum"), ("o", "sum")])
        return pa.table(
            {"o_orderpriority": g["o_orderpriority"], "pr": g["r_sum"],
             "po": g["o_sum"]}
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .sum(["pr", "po"])
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "o_orderpriority": b["o_orderpriority"],
                "n_returned": b["sum(pr)"].cast(pa.int64()),
                "n_other": b["sum(po)"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def promo_revenue_pct(sf_dir: str) -> pa.Table:
    """Conditional revenue share (TPC-H Q14 shape): percent of total
    revenue coming from PROMO-type parts. The part dimension is broadcast
    ONCE (ray.put of sorted partkey + is-promo arrays, per-process cached
    probe); revenue folds as EXACT integer ten-thousandths
    (cents x (1-d) cents) per batch, the per-batch int64 partials are
    folded driver-side as Python ints (overflow-proof at any scale) and
    the single 100.0 * p / t double op sequence matches the oracle
    bit-exactly: 1 row (promo_revenue, total_revenue, promo_pct)."""
    side = pa.concat_tables(
        ray.get(
            read_view(
                f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
            ).to_arrow_refs()
        )
    ).combine_chunks()
    keys = side["p_partkey"].to_numpy()
    promo = pc.equal(side["p_type"], "PROMO").to_numpy(zero_copy_only=False)
    order = np.argsort(keys, kind="stable")
    ref = ray.put((keys[order], promo[order].astype(np.int64)))

    class Partial:
        def __init__(self, side_ref: ray.ObjectRef) -> None:
            self.ref = side_ref

        def _side(self):
            got = _PROBE_CACHE.get(self.ref.binary())
            if got is None:
                got = ray.get(self.ref)
                _PROBE_CACHE.clear()
                _PROBE_CACHE[self.ref.binary()] = got
            return got

        def __call__(self, b: pa.Table) -> pa.Table:
            keys, promo = self._side()
            pk = b["l_partkey"].to_numpy()
            ec = np.rint(
                b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            dc = np.rint(
                (1.0 - b["l_discount"].to_numpy(zero_copy_only=False)) * 100.0
            ).astype(np.int64)
            r = ec * dc
            if len(keys) == 0:
                r = r[:0]
                pk = pk[:0]
            pos = np.minimum(np.searchsorted(keys, pk), max(len(keys) - 1, 0))
            hit = keys[pos] == pk  # inner join: drop FK misses
            is_promo = np.zeros(len(pk), dtype=np.int64)
            is_promo[hit] = promo[pos[hit]]
            r = r * hit  # unmatched lineitems contribute nothing
            return pa.table(
                {
                    "pp": pa.array([int((r * is_promo).sum())], pa.int64()),
                    "pt": pa.array([int(r.sum())], pa.int64()),
                }
            )

    parts = (
        read_view(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(Partial(ref), batch_format="pyarrow")
        .take_all()
    )  # bounded: one tiny row per input batch
    p = sum(int(row["pp"]) for row in parts)
    t = sum(int(row["pt"]) for row in parts)
    pct = (100.0 * float(p)) / float(t) if t else 0.0
    return pa.table(
        {
            "promo_revenue": pa.array([p / 10000.0], pa.float64()),
            "total_revenue": pa.array([t / 10000.0], pa.float64()),
            "promo_pct": pa.array([pct], pa.float64()),
        }
    )


def small_qty_part_revenue(sf_dir: str) -> pa.Table:
    """Fraction-of-group-average correlated filter (TPC-H Q17 shape):
    revenue of lineitems whose quantity is below 20% of their part's
    average quantity. ONE partkey shuffle (grouped_runs) makes every
    part's rows local and sorted; per-run sums via np.add.reduceat give
    the EXACT integer test 5*qc*n < sum_qc (equivalent to
    q < 0.2*avg(q), no float averages that could flip with summation
    order), and each bucket emits a single (n, revenue-cents) partial
    folded driver-side as Python ints: 1 row (n_rows,
    small_qty_revenue)."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    def to_ints(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": b["l_partkey"],
                "qc": pa.array(
                    np.rint(
                        b["l_quantity"].to_numpy(zero_copy_only=False) * 100.0
                    ).astype(np.int64)
                ),
                "ec": pa.array(
                    np.rint(
                        b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
                    ).astype(np.int64)
                ),
            }
        )

    ds = read_view(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    ).map_batches(to_ints, batch_format="pyarrow")

    def bucket(t: pa.Table) -> pa.Table:
        keys = t["l_partkey"].to_numpy()
        qc = t["qc"].to_numpy()
        ec = t["ec"].to_numpy()
        starts = run_starts(keys)
        sums = np.add.reduceat(qc, starts)
        lens = np.diff(np.append(starts, len(keys)))
        s = np.repeat(sums, lens)
        n = np.repeat(lens, lens).astype(np.int64)
        mask = 5 * qc * n < s
        return pa.table(
            {
                "pn": pa.array([int(mask.sum())], pa.int64()),
                "pe": pa.array([int(ec[mask].sum())], pa.int64()),
            }
        )

    parts = grouped_runs(ds, "l_partkey", bucket).take_all()  # <= num_buckets rows
    n = sum(int(r["pn"]) for r in parts)
    e = sum(int(r["pe"]) for r in parts)
    return pa.table(
        {
            "n_rows": pa.array([n], pa.int64()),
            "small_qty_revenue": pa.array([e / 100.0], pa.float64()),
        }
    )


def large_volume_orders(sf_dir: str, min_qty: float = 300.0) -> rd.Dataset:
    """HAVING-threshold join-back (TPC-H Q18 shape): orders whose total
    lineitem quantity exceeds min_qty, with the order row joined back in.
    Per-batch partial qty-cents sums + ONE orderkey shuffle produce the
    per-order totals; the HAVING filter leaves only the rare qualifying
    keys (a threshold this high qualifies a vanishing fraction of orders
    by construction — that selectivity, not luck, is what bounds the
    driver collect), which broadcast as a sorted probe into a second
    orders scan. The fact table never shuffles:
    (o_orderkey, o_totalprice, sum_qty)."""
    thresh_cents = int(round(min_qty * 100))

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "qc": pa.array(
                    np.rint(
                        b["l_quantity"].to_numpy(zero_copy_only=False) * 100.0
                    ).astype(np.int64)
                ),
            }
        )
        g = t.group_by("l_orderkey").aggregate([("qc", "sum")])
        return pa.table({"l_orderkey": g["l_orderkey"], "pq": g["qc_sum"]})

    totals = (
        read_view(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .sum("pq")
    )

    def having(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(pq)" not in b.column_names:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "qc": pa.array([], pa.int64())})
        keep = pc.greater(b["sum(pq)"], thresh_cents)
        b = b.filter(keep)
        return pa.table(
            {"l_orderkey": b["l_orderkey"], "qc": b["sum(pq)"].cast(pa.int64())}
        )

    hot = pa.concat_tables(
        ray.get(totals.map_batches(having, batch_format="pyarrow").to_arrow_refs()),
        promote_options="default",
    )
    keys = hot["l_orderkey"].to_numpy()
    qcs = hot["qc"].to_numpy()
    order = np.argsort(keys, kind="stable")
    ref = ray.put((keys[order], qcs[order]))

    class Probe:
        def __init__(self, side_ref: ray.ObjectRef) -> None:
            self.ref = side_ref

        def _side(self):
            got = _PROBE_CACHE.get(self.ref.binary())
            if got is None:
                got = ray.get(self.ref)
                _PROBE_CACHE.clear()
                _PROBE_CACHE[self.ref.binary()] = got
            return got

        def __call__(self, b: pa.Table) -> pa.Table:
            keys, qcs = self._side()
            ok = b["o_orderkey"].to_numpy()
            if len(keys) == 0:
                ok = ok[:0]
                b = b.slice(0, 0)
            pos = np.minimum(np.searchsorted(keys, ok), max(len(keys) - 1, 0))
            hit = keys[pos] == ok
            return pa.table(
                {
                    "o_orderkey": b["o_orderkey"].filter(pa.array(hit)),
                    "o_totalprice": b["o_totalprice"].filter(pa.array(hit)),
                    "sum_qty": pa.array(qcs[pos[hit]] / 100.0, pa.float64()),
                }
            )

    orders = read_view(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    return orders.map_batches(Probe(ref), batch_format="pyarrow")


def rich_no_urgent_customers(sf_dir: str) -> rd.Dataset:
    """Scalar-subquery threshold + anti-join (TPC-H Q22 shape): customers
    with an above-average account balance who never placed a 1-URGENT
    order. Pass 1 folds (sum of balance cents, count) as Python-int
    partials — the above-average test is the EXACT integer
    cross-multiplication cents*n > total (no float average). The filtered
    customer side then anti-joins the per-batch-deduped urgent custkeys
    in ONE co-partitioning shuffle (stages/join.shuffle_join 'anti'):
    (c_custkey, c_acctbal)."""
    from dedup_ray.stages.join import shuffle_join

    def bal_partial(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "ps": pa.array([int(cents.sum())], pa.int64()),
                "pn": pa.array([len(cents)], pa.int64()),
            }
        )

    cust_path = f"{sf_dir}/customer.parquet"
    parts = (
        read_view(cust_path, columns=["c_acctbal"])
        .map_batches(bal_partial, batch_format="pyarrow")
        .take_all()
    )
    total = sum(int(r["ps"]) for r in parts)
    n = sum(int(r["pn"]) for r in parts)

    def rich(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return b.filter(pa.array(cents * n > total))

    rich_custs = read_view(cust_path, columns=["c_custkey", "c_acctbal"]).map_batches(
        rich, batch_format="pyarrow"
    )

    def urgent_keys(b: pa.Table) -> pa.Table:
        keys = b.filter(pc.equal(b["o_orderpriority"], "1-URGENT"))["o_custkey"]
        return pa.table({"o_custkey": pc.unique(keys)})

    urgent = read_view(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    ).map_batches(urgent_keys, batch_format="pyarrow")
    return shuffle_join(
        rich_custs, urgent, on="c_custkey", right_on="o_custkey", how="anti"
    )


def users_all_types(sf_dir: str) -> rd.Dataset:
    """Relational division (the 'suppliers who supply ALL parts' SQL
    shape): users who performed EVERY event type present in the corpus.
    Pass 1 collapses to the distinct-type domain (bounded, driver-side).
    Pass 2 dedups (user, type) pairs per batch, shuffles ONCE on user
    (grouped_runs), and counts distinct types per user with vectorized
    change detection on the (user, type)-sorted runs — a user qualifies
    iff the count equals the domain size: (user_id)."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    path = f"{sf_dir}/events.parquet"
    types: set[str] = set()
    for t in ray.get(
        read_view(path, columns=["event_type"])
        .map_batches(
            lambda b: pa.table({"t": pc.unique(b["event_type"])}),
            batch_format="pyarrow",
        )
        .to_arrow_refs()
    ):
        if t.num_rows:
            types.update(t["t"].to_pylist())
    n_types = len(types)

    def pair_partial(b: pa.Table) -> pa.Table:
        return (
            pa.table({"user_id": b["user_id"], "event_type": b["event_type"]})
            .group_by(["user_id", "event_type"])
            .aggregate([])
        )

    pairs = read_view(path, columns=["user_id", "event_type"]).map_batches(
        pair_partial, batch_format="pyarrow"
    )

    def divide(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64())})
        u = t["user_id"].to_numpy()
        ty = t["event_type"].combine_chunks().dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        )
        # sorted by (user, type): a pair is new if either component changes
        new_pair = np.ones(len(u), dtype=np.int64)
        new_pair[1:] = (u[1:] != u[:-1]) | (ty[1:] != ty[:-1])
        starts = run_starts(u)
        per_user = np.add.reduceat(new_pair, starts)
        keep = per_user == n_types
        return pa.table({"user_id": pa.array(u[starts][keep], pa.int64())})

    return grouped_runs(
        pairs, "user_id", divide, sort_cols=["user_id", "event_type"]
    )


def pareto_customers_80pct(sf_dir: str, num_parts: int = 64) -> pa.Table:
    """Concentration-coverage threshold (the '80/20' question): how many
    top customers cover 80% of total revenue. Needs every customer's
    global position in revenue-DESC order plus a running total — the
    terasort recipe (customer_revenue_gini): per-customer exact cent
    totals (one custkey shuffle), driver splitters from a stride sample,
    exact per-partition revenue sums give driver prefix offsets, then
    ONE pid shuffle where each partition counts its qualifying rows
    locally: a customer is needed while the revenue BEFORE them is
    under 80% — the EXACT integer test 5*(cum-cents) < 4*tot, which is
    tie-permutation-invariant, so the count is deterministic without a
    custkey tiebreak. 1 row: (n_top_customers, n_customers). int64
    prefix sums are exact below 4.6e18 total cents (any realistic
    corpus); past that the partials split into 32-bit halves."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    def cents_partial(b: pa.Table) -> pa.Table:
        c = np.round(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        t = pa.table({"o_custkey": b["o_custkey"], "c": pa.array(c)})
        g = t.group_by("o_custkey").aggregate([("c", "sum")])
        return pa.table({"o_custkey": g["o_custkey"], "pc": g["c_sum"]})

    percust = (
        read_view(f"{sf_dir}/orders.parquet",
                  columns=["o_custkey", "o_totalprice"])
        .map_batches(cents_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(ray.data.aggregate.Sum("pc"))
        .map_batches(
            lambda b: pa.table({"cents": b["sum(pc)"].cast(pa.int64())})
            if b.num_rows and "sum(pc)" in b.column_names
            else pa.table({"cents": pa.array([], pa.int64())}),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def sample(b: pa.Table) -> pa.Table:
        v = b["cents"].to_numpy(zero_copy_only=False)
        step = max(1, len(v) // 32)
        return pa.table({"v": pa.array(-v[::step], pa.int64())})

    samp = np.sort(np.concatenate(
        [t["v"].to_numpy(zero_copy_only=False) for t in ray.get(
            percust.map_batches(sample, batch_format="pyarrow").to_arrow_refs()
        ) if t.num_rows] or [np.empty(0, np.int64)]
    ))
    if samp.size == 0:
        return pa.table({"n_top_customers": pa.array([0], pa.int64()),
                         "n_customers": pa.array([0], pa.int64())})
    splitters = np.unique(
        samp[np.linspace(0, samp.size - 1, num_parts - 1).astype(np.int64)]
    )

    # exact per-partition counts and revenue sums -> driver prefix offsets
    # (int64 Arrow partials, folded as Python ints below)
    def pid_partials_exact(b: pa.Table) -> pa.Table:
        v = b["cents"].to_numpy(zero_copy_only=False)
        pid = np.searchsorted(splitters, -v, side="right")
        t = pa.table({"pid": pa.array(pid), "c": pa.array(v),
                      "one": pa.array(np.ones(len(v), dtype=np.int64))})
        g = t.group_by("pid").aggregate([("c", "sum"), ("one", "sum")])
        return pa.table({"pid": g["pid"], "ps": g["c_sum"], "pn": g["one_sum"]})

    npart = len(splitters) + 1
    counts = np.zeros(npart, dtype=np.int64)
    sums = [0] * npart  # Python ints: exact at any magnitude
    for t in ray.get(
        percust.map_batches(pid_partials_exact, batch_format="pyarrow")
        .to_arrow_refs()
    ):
        if t.num_rows:
            for pid, ps, pn in zip(t["pid"].to_pylist(), t["ps"].to_pylist(),
                                   t["pn"].to_pylist()):
                sums[pid] += ps
                counts[pid] += pn
    tot = sum(sums)
    n = int(counts.sum())
    rev_before, acc = [], 0
    for s in sums:  # Python-int prefix: exact at any magnitude
        rev_before.append(acc)
        acc += s

    def add_pid(b: pa.Table) -> pa.Table:
        v = b["cents"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "pid", pa.array(np.searchsorted(splitters, -v, side="right"))
        )

    def count_needed(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"pk": pa.array([], pa.int64())})
        pid = g["pid"].to_numpy(zero_copy_only=False)
        c = g["cents"].to_numpy(zero_copy_only=False)
        starts = run_starts(pid)
        total = 0
        for i, s0 in enumerate(starts):
            s1 = starts[i + 1] if i + 1 < len(starts) else len(pid)
            run = c[s0:s1][::-1]  # sorted asc by cents -> reverse for desc
            cum_before = int(rev_before[pid[s0]]) + np.concatenate(
                [[0], np.cumsum(run)[:-1]]
            )
            total += int((5 * cum_before < 4 * tot).sum())
        return pa.table({"pk": pa.array([total], pa.int64())})

    parts = ray.get(
        grouped_runs(
            percust.map_batches(add_pid, batch_format="pyarrow"),
            "pid", count_needed, sort_cols=["pid", "cents"],
        ).to_arrow_refs()
    )
    k = sum(
        sum(t["pk"].to_pylist()) for t in parts
        if t.num_rows and "pk" in t.column_names
    )
    return pa.table({"n_top_customers": pa.array([int(k)], pa.int64()),
                     "n_customers": pa.array([n], pa.int64())})


def event_value_outliers(sf_dir: str) -> rd.Dataset:
    """Per-type 3-sigma row-level outlier detection (training-data outlier
    removal): events whose value deviates from their type's mean by more
    than 3 standard deviations. The test is EXACT INTEGER —
    (c*n - S)^2 > 9*(n*Q - S^2) over cents c and per-type moments
    (n, S, Q) folded driver-side as Python ints — so no float mean/stddev
    whose rounding could flip a borderline row. At scale the products
    overflow int64, so each batch runs a float64 prefilter with a 1e-9
    relative guard band and only the (rare) border rows re-check in
    exact Python-int arithmetic. Oracle side uses HUGEINT for the same
    test. (event_id, user_id, event_type, value) — values pass through
    unrecomputed."""
    path = f"{sf_dir}/events.parquet"

    def moment_partial(b: pa.Table) -> pa.Table:
        c = np.rint(b["value"].to_numpy(zero_copy_only=False) * 100.0).astype(
            np.int64
        )
        t = pa.table(
            {"event_type": b["event_type"], "c": pa.array(c),
             "q": pa.array(c * c),
             "one": pa.array(np.ones(len(c), dtype=np.int64))}
        )
        g = t.group_by("event_type").aggregate(
            [("c", "sum"), ("q", "sum"), ("one", "sum")]
        )
        return pa.table(
            {"event_type": g["event_type"], "ps": g["c_sum"],
             "pq": g["q_sum"], "pn": g["one_sum"]}
        )

    moments: dict[str, list[int]] = {}
    for t in ray.get(
        read_view(path, columns=["event_type", "value"])
        .map_batches(moment_partial, batch_format="pyarrow")
        .to_arrow_refs()
    ):
        if t.num_rows:
            for ty, ps, pq, pn in zip(
                t["event_type"].to_pylist(), t["ps"].to_pylist(),
                t["pq"].to_pylist(), t["pn"].to_pylist()
            ):
                m = moments.setdefault(ty, [0, 0, 0])
                m[0] += pn
                m[1] += ps
                m[2] += pq
    ref = ray.put(moments)

    class Filter:
        def __init__(self, side_ref: ray.ObjectRef) -> None:
            self.ref = side_ref

        def _side(self):
            got = _PROBE_CACHE.get(self.ref.binary())
            if got is None:
                got = ray.get(self.ref)
                _PROBE_CACHE.clear()
                _PROBE_CACHE[self.ref.binary()] = got
            return got

        def __call__(self, b: pa.Table) -> pa.Table:
            mom = self._side()
            c = np.rint(
                b["value"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            enc = b["event_type"].combine_chunks().dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            vocab = enc.dictionary.to_pylist()
            keep = np.zeros(len(c), dtype=bool)
            for code, ty in enumerate(vocab):
                m = mom.get(ty)
                if m is None:
                    continue
                n_i, s_i, q_i = m
                idx = np.nonzero(codes == code)[0]
                cf = c[idx].astype(np.float64)
                lhs = (cf * float(n_i) - float(s_i)) ** 2
                rhs = 9.0 * (float(n_i) * float(q_i) - float(s_i) ** 2)
                scale = np.maximum(np.maximum(np.abs(lhs), abs(rhs)), 1.0)
                sure_out = lhs - rhs > 1e-9 * scale
                border = np.abs(lhs - rhs) <= 1e-9 * scale
                dec = sure_out.copy()
                for j in np.nonzero(border)[0]:  # rare: exact Python ints
                    ci = int(c[idx[j]])
                    dec[j] = (ci * n_i - s_i) ** 2 > 9 * (n_i * q_i - s_i * s_i)
                keep[idx[dec]] = True
            return b.filter(pa.array(keep))

    return read_view(
        path, columns=["event_id", "user_id", "event_type", "value"]
    ).map_batches(Filter(ref), batch_format="pyarrow")


def key_skew_stats(sf_dir: str) -> pa.Table:
    """Key-skew diagnosis for a shuffle key (here events.user_id) — the
    engine's own skew doctor (north-rule skew pattern): 1 row
    (n_keys, n_rows, max_rows_per_key, top1_share). Two passes, both
    bounded: per-batch partial counts + ONE key shuffle give per-key
    totals; a second per-batch partial collapses those to (count, sum,
    max) triples folded driver-side as Python ints. top1_share is the
    single CAST(max AS DOUBLE)/total division the oracle also runs."""

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by("user_id").aggregate(
            [("user_id", "count", pc.CountOptions(mode="all"))]
        )
        return pa.table({"user_id": g["user_id"], "pn": g["user_id_count"]})

    perkey = (
        read_view(f"{sf_dir}/events.parquet", columns=["user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .sum("pn")
    )

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(pn)" not in b.column_names:
            return pa.table({"pk": pa.array([], pa.int64()),
                             "ps": pa.array([], pa.int64()),
                             "pm": pa.array([], pa.int64())})
        n = b["sum(pn)"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {"pk": pa.array([len(n)], pa.int64()),
             "ps": pa.array([int(n.sum())], pa.int64()),
             "pm": pa.array([int(n.max())], pa.int64())}
        )

    k = s = m = 0
    for t in ray.get(
        perkey.map_batches(fold, batch_format="pyarrow").to_arrow_refs()
    ):
        if t.num_rows and "pk" in t.column_names:
            k += sum(t["pk"].to_pylist())
            s += sum(t["ps"].to_pylist())
            m = max(m, max(t["pm"].to_pylist() or [0]))
    share = float(m) / float(s) if s else 0.0
    return pa.table(
        {
            "n_keys": pa.array([k], pa.int64()),
            "n_rows": pa.array([s], pa.int64()),
            "max_rows_per_key": pa.array([m], pa.int64()),
            "top1_share": pa.array([share], pa.float64()),
        }
    )


def top_return_customers(sf_dir: str, k: int = 20) -> rd.Dataset:
    """TPC-H Q10 shape: customers ranked by revenue they RETURNED
    (returnflag 'R') — top k with the customer row joined back:
    (c_custkey, c_name, revenue). Composition: filter at the lineitem
    scan, ONE orderkey shuffle_join to reach o_custkey, per-custkey
    exact ten-thousandth-cents partials + one custkey shuffle, local
    top-k per block on the integer revenue (ties broken by custkey, so
    the cut is deterministic), tiny sort-limit, and a broadcast probe
    of the k winners into the customer scan. Revenue is one int/double
    division shared with the oracle."""
    from dedup_ray.stages.join import shuffle_join

    items = read_view(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )

    def returned(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["l_returnflag"], "R"))
        ec = np.rint(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        dc = np.rint(
            (1.0 - b["l_discount"].to_numpy(zero_copy_only=False)) * 100.0
        ).astype(np.int64)
        return pa.table({"l_orderkey": b["l_orderkey"], "r": pa.array(ec * dc)})

    orders = read_view(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    joined = shuffle_join(
        orders, items.map_batches(returned, batch_format="pyarrow"),
        on="o_orderkey", right_on="l_orderkey",
    )

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by("o_custkey").aggregate([("r", "sum")])
        return pa.table({"o_custkey": g["o_custkey"], "pr": g["r_sum"]})

    percust = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .sum("pr")
    )

    def local_topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(pr)" not in b.column_names:
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "rc": pa.array([], pa.int64())})
        t = pa.table(
            {"o_custkey": b["o_custkey"], "rc": b["sum(pr)"].cast(pa.int64())}
        )
        idx = pc.sort_indices(
            t, sort_keys=[("rc", "descending"), ("o_custkey", "ascending")]
        )
        return t.take(idx[:k])

    top = (
        percust.map_batches(local_topk, batch_format="pyarrow")
        .sort(["rc", "o_custkey"], descending=[True, False])
        .limit(k)
    )
    rows = top.take_all()  # k rows
    keys = np.array([r["o_custkey"] for r in rows], dtype=np.int64)
    rcs = np.array([r["rc"] for r in rows], dtype=np.int64)
    order = np.argsort(keys, kind="stable")
    ref = ray.put((keys[order], rcs[order]))

    class Probe:
        def __init__(self, side_ref: ray.ObjectRef) -> None:
            self.ref = side_ref

        def _side(self):
            got = _PROBE_CACHE.get(self.ref.binary())
            if got is None:
                got = ray.get(self.ref)
                _PROBE_CACHE.clear()
                _PROBE_CACHE[self.ref.binary()] = got
            return got

        def __call__(self, b: pa.Table) -> pa.Table:
            keys, rcs = self._side()
            ck = b["c_custkey"].to_numpy(zero_copy_only=False)
            if len(keys) == 0:
                ck = ck[:0]
                b = b.slice(0, 0)
            pos = np.minimum(np.searchsorted(keys, ck), max(len(keys) - 1, 0))
            hit = keys[pos] == ck
            return pa.table(
                {
                    "c_custkey": b["c_custkey"].filter(pa.array(hit)),
                    "c_name": b["c_name"].filter(pa.array(hit)),
                    "revenue": pa.array(rcs[pos[hit]] / 10000.0, pa.float64()),
                }
            )

    cust = read_view(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    return cust.map_batches(Probe(ref), batch_format="pyarrow")


def order_revenue_join_salted(sf_dir: str, salt: int = 4) -> rd.Dataset:
    """order_revenue_join with HOT-KEY SALTING engaged (salt=4): left rows
    round-robin across salt sub-keys, right rows replicate to all — the
    north-rule skew mitigation exercised END TO END in the correctness
    gate, not just in unit tests: the oracle is the identical SQL as the
    unsalted query, so a wrong pair multiplicity (the failure mode
    salting risks) breaks the value hash immediately."""
    from dedup_ray.stages.join import shuffle_join

    orders = read_view(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    items = read_view(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    joined = shuffle_join(
        orders, items, on="o_orderkey", right_on="l_orderkey", salt=salt
    )

    def partial(b: pa.Table) -> pa.Table:
        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        t = pa.table({"o_orderpriority": b["o_orderpriority"], "rev": rev})
        g = t.group_by("o_orderpriority").aggregate(
            [("rev", "sum"), ("rev", "count", pc.CountOptions(mode="all"))]
        )
        return pa.table(
            {"o_orderpriority": g["o_orderpriority"], "pn": g["rev_count"],
             "pr": g["rev_sum"]}
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .sum(["pn", "pr"])
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "o_orderpriority": b["o_orderpriority"],
                "n_items": b["sum(pn)"].cast(pa.int64()),
                "revenue": pc.round(b["sum(pr)"], 2),
            }
        ),
        batch_format="pyarrow",
    )


def price_qty_histogram2d(sf_dir: str) -> rd.Dataset:
    """2-D equi-width histogram (price x quantity heat map) —
    (price_bin, qty_bin, n): the joint-distribution profile behind
    outlier heuristics and sampling designs. Bins are EXACT INTEGER
    arithmetic on cents (price // $10k, qty // 10), so no float bin-edge
    disagreement is possible; per-batch Arrow group_by partials collapse
    each block to the (small) occupied-cell set before one tiny
    shuffle."""

    def partial(b: pa.Table) -> pa.Table:
        pc_ = np.rint(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        qc = np.rint(
            b["l_quantity"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        t = pa.table(
            {
                "price_bin": pa.array(pc_ // 1_000_000),
                "qty_bin": pa.array(qc // 1_000),
                "one": pa.array(np.ones(len(pc_), dtype=np.int64)),
            }
        )
        g = t.group_by(["price_bin", "qty_bin"]).aggregate([("one", "sum")])
        return pa.table(
            {"price_bin": g["price_bin"], "qty_bin": g["qty_bin"],
             "pn": g["one_sum"]}
        )

    agg = (
        read_view(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_extendedprice", "l_quantity"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["price_bin", "qty_bin"])
        .sum("pn")
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "price_bin": b["price_bin"],
                "qty_bin": b["qty_bin"],
                "n": b["sum(pn)"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def rate_limit_events(sf_dir: str, k: int = 1) -> rd.Dataset:
    """Per-key-per-window rate limiting (throttling repair): keep at most
    k events per (user, hour), earliest first (ties: event_id) — the
    windowed generalization of cap_per_source. ONE (user, hour) shuffle
    via grouped_runs sorted [key, ts, event_id]; survivors are the rows
    whose within-run rank < k (vectorized run_ranks — no per-group
    Python): (event_id, user_id, ts)."""
    from dedup_ray.stages.grouped import grouped_runs, run_ranks

    def add_key(b: pa.Table) -> pa.Table:
        ts = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = ts // 3_600_000_000
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "ts": b["ts"],
                "uh": pa.array(uid * 1_000_000 + hour % 1_000_000),
            }
        )

    ds = read_view(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    ).map_batches(add_key, batch_format="pyarrow")

    def cap(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("event_id", pa.int64()), ("user_id", pa.int64()),
                 ("ts", pa.timestamp("us"))]
            ).empty_table()
        rk = run_ranks(t["uh"].to_numpy(zero_copy_only=False))
        return t.filter(pa.array(rk < k)).select(["event_id", "user_id", "ts"])

    return grouped_runs(ds, "uh", cap, sort_cols=["uh", "ts", "event_id"])


def top_supplier_revenue(sf_dir: str) -> rd.Dataset:
    """TPC-H Q15 shape: the supplier(s) with MAXIMUM total revenue —
    max-equality semi-join, not top-k: every supplier achieving the max
    survives (ties preserved). Per-suppkey exact ten-thousandth-cent
    partials + one suppkey shuffle; per-block (max, argrows) partials
    fold driver-side as Python ints; the tiny winner set broadcasts into
    the supplier scan: (s_suppkey, s_name, total_revenue)."""

    def partial(b: pa.Table) -> pa.Table:
        ec = np.rint(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        dc = np.rint(
            (1.0 - b["l_discount"].to_numpy(zero_copy_only=False)) * 100.0
        ).astype(np.int64)
        t = pa.table({"l_suppkey": b["l_suppkey"], "r": pa.array(ec * dc)})
        g = t.group_by("l_suppkey").aggregate([("r", "sum")])
        return pa.table({"l_suppkey": g["l_suppkey"], "pr": g["r_sum"]})

    persupp = (
        read_view(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .sum("pr")
    )

    def local_max(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(pr)" not in b.column_names:
            return pa.table({"l_suppkey": pa.array([], pa.int64()),
                             "rc": pa.array([], pa.int64())})
        t = pa.table(
            {"l_suppkey": b["l_suppkey"], "rc": b["sum(pr)"].cast(pa.int64())}
        )
        mx = pc.max(t["rc"])
        return t.filter(pc.equal(t["rc"], mx))

    cands = ray.get(
        persupp.map_batches(local_max, batch_format="pyarrow").to_arrow_refs()
    )
    best = None
    winners: list[tuple[int, int]] = []
    for t in cands:
        if t.num_rows == 0 or "l_suppkey" not in t.column_names:
            continue  # schema-dropped empty blocks pass the UDF untouched
        for sk, rc in zip(t["l_suppkey"].to_pylist(), t["rc"].to_pylist()):
            if best is None or rc > best:
                best, winners = rc, [(sk, rc)]
            elif rc == best:
                winners.append((sk, rc))
    keys = np.array(sorted(w[0] for w in winners), dtype=np.int64)
    rcs = {w[0]: w[1] for w in winners}
    ref = ray.put((keys, np.array([rcs[k_] for k_ in keys], dtype=np.int64)))

    class Probe:
        def __init__(self, side_ref: ray.ObjectRef) -> None:
            self.ref = side_ref

        def _side(self):
            got = _PROBE_CACHE.get(self.ref.binary())
            if got is None:
                got = ray.get(self.ref)
                _PROBE_CACHE.clear()
                _PROBE_CACHE[self.ref.binary()] = got
            return got

        def __call__(self, b: pa.Table) -> pa.Table:
            keys, rcs = self._side()
            sk = b["s_suppkey"].to_numpy(zero_copy_only=False)
            if len(keys) == 0:
                sk = sk[:0]
                b = b.slice(0, 0)
            pos = np.minimum(np.searchsorted(keys, sk), max(len(keys) - 1, 0))
            hit = keys[pos] == sk
            return pa.table(
                {
                    "s_suppkey": b["s_suppkey"].filter(pa.array(hit)),
                    "s_name": b["s_name"].filter(pa.array(hit)),
                    "total_revenue": pa.array(
                        rcs[pos[hit]] / 10000.0, pa.float64()
                    ),
                }
            )

    supp = read_view(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    return supp.map_batches(Probe(ref), batch_format="pyarrow")


def nation_trade_volume(sf_dir: str) -> pa.Table:
    """TPC-H Q7 shape — cross-nation trade volume: revenue shipped from a
    supplier nation to a DIFFERENT customer nation, by shipping year:
    (supp_nation, cust_nation, year, revenue). The two-role dimension
    join (nation joined twice under different roles) is the classic
    star-schema wrinkle hash-join planners exist for.

    Composition: revenue cents + ship year compute at the lineitem scan
    (only 4 narrow columns read); ONE big-big orderkey ``shuffle_join``
    reaches o_custkey; supplier->nation and customer->nation are
    BROADCAST probes (sorted-array searchsorted via the shared
    ``_PROBE_CACHE``) — dimensions ship once per worker, never per
    batch; the cross-nation filter drops same-nation rows before any
    aggregation; per-batch partials pre-aggregate on the tiny
    (supp_nk, cust_nk, year) key so the final groupby moves at most
    |nations|^2 x years rows per batch. At warehouse scale where
    customer outgrows broadcast, the documented swap is the salted
    shuffle join proven in ``order_revenue_join_salted``. Revenue is
    exact ten-thousandth-cents ints folded distributively; ONE int/double
    division at the end, shared verbatim with the oracle."""
    from dedup_ray.stages.join import shuffle_join

    def _dim(path: str, cols: list[str], dtypes: list) -> list[np.ndarray]:
        # read_view(...).to_pandas() on an all-empty parquet loses the
        # schema (Ray drops empty-block schemas) — fall back per column
        df = read_view(path, columns=cols).to_pandas()
        return [
            df[c].to_numpy(dt) if c in df.columns else np.array([], dtype=dt)
            for c, dt in zip(cols, dtypes)
        ]

    s_k, s_nk = _dim(
        f"{sf_dir}/supplier.parquet", ["s_suppkey", "s_nationkey"],
        [np.int64, np.int64],
    )
    c_k, c_nk = _dim(
        f"{sf_dir}/customer.parquet", ["c_custkey", "c_nationkey"],
        [np.int64, np.int64],
    )
    n_k, n_nm = _dim(
        f"{sf_dir}/nation.parquet", ["n_nationkey", "n_name"],
        [np.int64, object],
    )

    def _sorted_map(keys: np.ndarray, vals: np.ndarray):
        o = np.argsort(keys, kind="stable")
        return keys[o], vals[o]

    sk, snk = _sorted_map(s_k, s_nk)
    ck, cnk = _sorted_map(c_k, c_nk)
    side_ref = ray.put((sk, snk, ck, cnk))

    items = read_view(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
    )

    def revenue_rows(b: pa.Table) -> pa.Table:
        ec = np.rint(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        dc = np.rint(
            (1.0 - b["l_discount"].to_numpy(zero_copy_only=False)) * 100.0
        ).astype(np.int64)
        yr = (
            b["l_shipdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]").astype(np.int64) + 1970
        )
        return pa.table(
            {"l_orderkey": b["l_orderkey"], "l_suppkey": b["l_suppkey"],
             "yr": pa.array(yr, pa.int64()), "r": pa.array(ec * dc)}
        )

    orders = read_view(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    joined = shuffle_join(
        orders, items.map_batches(revenue_rows, batch_format="pyarrow"),
        on="o_orderkey", right_on="l_orderkey",
        # all-empty mapped datasets answer schema() with None — declare it
        right_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("l_suppkey", pa.int64()),
             ("yr", pa.int64()), ("r", pa.int64())]
        ),
    )

    part_schema = pa.schema(
        [("snk", pa.int64()), ("cnk", pa.int64()), ("yr", pa.int64()),
         ("pr", pa.int64())]
    )

    class NationPartial:
        def __init__(self, ref: ray.ObjectRef) -> None:
            self.ref = ref

        def _side(self):
            got = _PROBE_CACHE.get(self.ref.binary())
            if got is None:
                got = ray.get(self.ref)
                _PROBE_CACHE.clear()
                _PROBE_CACHE[self.ref.binary()] = got
            return got

        def __call__(self, b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "l_suppkey" not in b.column_names:
                return part_schema.empty_table()
            sk, snk, ck, cnk = self._side()
            if len(sk) == 0 or len(ck) == 0:
                return part_schema.empty_table()
            lsk = b["l_suppkey"].to_numpy(zero_copy_only=False)
            lck = b["o_custkey"].to_numpy(zero_copy_only=False)
            spos = np.minimum(np.searchsorted(sk, lsk), max(len(sk) - 1, 0))
            cpos = np.minimum(np.searchsorted(ck, lck), max(len(ck) - 1, 0))
            hit = (sk[spos] == lsk) & (ck[cpos] == lck)
            s_n = snk[spos]
            c_n = cnk[cpos]
            m = hit & (s_n != c_n)
            t = pa.table(
                {"snk": pa.array(s_n[m], pa.int64()),
                 "cnk": pa.array(c_n[m], pa.int64()),
                 "yr": b["yr"].filter(pa.array(m)),
                 "r": b["r"].filter(pa.array(m))}
            )
            g = t.group_by(["snk", "cnk", "yr"]).aggregate([("r", "sum")])
            return pa.table(
                {"snk": g["snk"], "cnk": g["cnk"], "yr": g["yr"],
                 "pr": g["r_sum"].cast(pa.int64())}
            )

    agg = (
        joined.map_batches(NationPartial(side_ref), batch_format="pyarrow")
        .groupby(["snk", "cnk", "yr"])
        .sum("pr")
    )

    o = np.argsort(n_k, kind="stable")
    nk, nm = n_k[o], n_nm[o]

    parts = [
        t for t in ray.get(agg.to_arrow_refs())
        if t.num_rows and "sum(pr)" in t.column_names
    ]
    out_schema = pa.schema(
        [("supp_nation", pa.string()), ("cust_nation", pa.string()),
         ("year", pa.int64()), ("revenue", pa.float64())]
    )
    if not parts:
        return out_schema.empty_table()
    m = pa.concat_tables(parts)  # bounded: <= |nations|^2 x years rows
    snk_a = m["snk"].to_numpy(zero_copy_only=False)
    cnk_a = m["cnk"].to_numpy(zero_copy_only=False)
    sn = nm[np.searchsorted(nk, snk_a)].astype(object)
    cn = nm[np.searchsorted(nk, cnk_a)].astype(object)
    yr = m["yr"].to_numpy(zero_copy_only=False)
    rc = m["sum(pr)"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((yr, cn, sn))
    return pa.table(
        {"supp_nation": pa.array(sn[order], pa.string()),
         "cust_nation": pa.array(cn[order], pa.string()),
         "year": pa.array(yr[order], pa.int64()),
         "revenue": pa.array(rc[order] / 10000.0, pa.float64())}
    )


def trade_graph_pagerank(
    sf_dir: str,
    iters: int = 12,
    d: float = 0.85,
    k: int = 50,
    rank_as_dataset: bool | None = None,
) -> pa.Table:
    """PageRank over the bipartite customer<->supplier trade graph (an
    edge per distinct trading pair, weighted by line-item count): the
    top-``k`` most central nodes, (node_type, key, rank). Graph
    centrality is the influence/importance primitive of every
    entity-resolution and spam-filtering pipeline; done Ray-Data-style it
    is the iterative-graph counterpart of ``kmeans_global_train``'s
    iterative-numeric pattern (same broadcast + partial-fold loop).

    Scale shape: edges are built by ONE big-big orderkey shuffle_join with
    per-batch (cust, supp) pre-aggregation, then materialized ONCE — each
    of the ``iters`` passes re-streams the pinned edge blocks, never the
    base tables. Per iteration the rank vector ships via ray.put (the
    per-actor _PROBE_CACHE keeps it one fetch per worker); each batch
    collapses to (dst, partial-contribution) rows bounded by its distinct
    dst count, and the driver folds those into the next vector — float
    work per iteration is O(edges) distributed + O(nodes) on the driver.
    The node vector is driver-held (customers + suppliers are the SMALL
    dimension side here, exactly like the broadcast-join convention); at
    a scale where nodes outgrow the driver the swap engages AUTOMATICALLY
    (``rank_as_dataset=None`` gates on the materialized edge count — nodes
    <= 2 x edges — against DEDUP_PAGERANK_NODE_MAX, default 20M; pass
    True/False to force): rank-as-Dataset with a per-iteration shuffle
    join on src — see ``_pagerank_rank_as_dataset``; allclose-1e-9 equal
    to this loop, pytest-checked. No dangling mass: every
    node has >= 1 edge by construction (it exists because it traded).
    Rows-only registry entry: float partial sums are order-sensitive, so
    the checked contract is the pytest numpy-reference replay (1e-9) +
    rank-sum == 1 invariant, not a SQL oracle."""
    from dedup_ray.stages.join import shuffle_join

    items = read_view(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )
    orders = read_view(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    joined = shuffle_join(
        orders, items, on="o_orderkey", right_on="l_orderkey"
    )

    edge_schema = pa.schema(
        [("src", pa.int64()), ("dst", pa.int64()), ("pw", pa.int64())]
    )

    def edge_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "o_custkey" not in b.column_names:
            return edge_schema.empty_table()
        cu = 2 * b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        su = 2 * b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64) + 1
        # undirected: both directions, pre-aggregated within the batch
        t = pa.table(
            {"src": pa.array(np.concatenate([cu, su])),
             "dst": pa.array(np.concatenate([su, cu])),
             "w": pa.array(np.ones(2 * len(cu), dtype=np.int64))}
        )
        g = t.group_by(["src", "dst"]).aggregate([("w", "sum")])
        return pa.table(
            {"src": g["src"], "dst": g["dst"],
             "pw": g["w_sum"].cast(pa.int64())}
        )

    edges = (
        joined.map_batches(edge_partial, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .sum("pw")
        .map_batches(
            lambda b: pa.table(
                {"src": b["src"], "dst": b["dst"],
                 "w": b["sum(pw)"].cast(pa.int64())}
            )
            if b.num_rows and "sum(pw)" in b.column_names
            else pa.schema(
                [("src", pa.int64()), ("dst", pa.int64()), ("w", pa.int64())]
            ).empty_table(),
            batch_format="pyarrow",
        )
        .materialize()  # pinned: re-streamed once per iteration
    )

    if rank_as_dataset is None:
        # auto-gate (round-5 verdict #2): the driver loop holds an O(nodes)
        # vector, so it is only legal while the node universe provably fits.
        # Every node carries >= 1 edge, hence nodes <= 2 x edges — the
        # materialized edge count (free metadata) is the observable proxy,
        # exactly like cluster.py's cc_node_broadcast_max gate.
        node_bound = int(
            os.environ.get("DEDUP_PAGERANK_NODE_MAX", 20_000_000)
        )
        rank_as_dataset = 2 * edges.count() > node_bound
    if rank_as_dataset:
        return _pagerank_rank_as_dataset(edges, iters, d, k)

    # node universe + out-weights: bounded fold (one row per node)
    nodes: dict[int, int] = {}
    for t in ray.get(edges.to_arrow_refs()):
        if t.num_rows and "src" in t.column_names:
            g = t.group_by("src").aggregate([("w", "sum")])
            for s, w in zip(
                g["src"].to_numpy(zero_copy_only=False),
                g["w_sum"].to_numpy(zero_copy_only=False),
            ):
                nodes[int(s)] = nodes.get(int(s), 0) + int(w)
    out_schema = pa.schema(
        [("node_type", pa.string()), ("key", pa.int64()),
         ("rank", pa.float64())]
    )
    if not nodes:
        return out_schema.empty_table()
    keys = np.array(sorted(nodes), dtype=np.int64)
    outw = np.array([nodes[int(x)] for x in keys], dtype=np.float64)
    n = len(keys)
    rank = np.full(n, 1.0 / n)

    def make_pass(ref: "ray.ObjectRef"):
        def contrib(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "src" not in b.column_names:
                return pa.schema(
                    [("dst", pa.int64()), ("pc", pa.float64())]
                ).empty_table()
            got = _PROBE_CACHE.get(ref.binary())
            if got is None:
                got = ray.get(ref)
                _PROBE_CACHE.clear()
                _PROBE_CACHE[ref.binary()] = got
            kk, per_w = got
            src = b["src"].to_numpy(zero_copy_only=False)
            dst = b["dst"].to_numpy(zero_copy_only=False)
            w = b["w"].to_numpy(zero_copy_only=False).astype(np.float64)
            c = per_w[np.searchsorted(kk, src)] * w
            ud, inv = np.unique(dst, return_inverse=True)
            pc = np.zeros(len(ud))
            np.add.at(pc, inv, c)
            return pa.table({"dst": pa.array(ud), "pc": pa.array(pc)})

        return contrib

    for _ in range(iters):
        ref = ray.put((keys, d * rank / outw))
        new = np.full(n, (1.0 - d) / n)
        for t in ray.get(
            edges.map_batches(make_pass(ref), batch_format="pyarrow")
            .to_arrow_refs()
        ):
            if t.num_rows and "dst" in t.column_names:
                pos = np.searchsorted(
                    keys, t["dst"].to_numpy(zero_copy_only=False)
                )
                np.add.at(new, pos, t["pc"].to_numpy(zero_copy_only=False))
        rank = new

    order = np.lexsort((keys, -rank))[:k]
    sel, r = keys[order], rank[order]
    return pa.table(
        {"node_type": pa.array(
            np.where(sel % 2 == 0, "customer", "supplier").astype(object),
            pa.string()),
         "key": pa.array(sel // 2, pa.int64()),
         "rank": pa.array(r, pa.float64())}
    )


def _pagerank_rank_as_dataset(
    edges, iters: int, d: float, k: int
) -> pa.Table:
    """At-scale PageRank: the rank vector lives as a (node, rank) Dataset —
    NO driver-held node state (the round-4 verdict's last iterative-state
    watch item, now built; the driver loop in ``trade_graph_pagerank``
    remains the default because customers+suppliers are the small side at
    TPC-H shapes).

    Physical plan: edge weights are normalized by src out-weight ONCE (one
    src-keyed ``grouped_runs`` shuffle, pinned), the node universe is the
    distinct-src table from the same pass shape, and each iteration is
    exactly TWO exchanges — one co-partitioning ``shuffle_join(edges,
    ranks, on=src)`` and one ``groupby(dst).sum`` of per-batch
    pre-aggregated contributions — with the new rank Dataset materialized
    to sever lineage. Every node has >= 1 in-edge (the trade graph is
    undirected by construction), so the teleport base term needs no
    dangling-node repair. Driver state: O(k x blocks) rows at the final
    local-top-k merge, never the node vector. Numerics: same math as the
    driver loop up to float association (rank x d x (w/outw) instead of
    (d x rank / outw) x w; partial sums fold in shuffle order), so parity
    with the driver path is allclose-1e-9, pytest-checked
    (tests/test_pagerank.py)."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts
    from dedup_ray.stages.join import shuffle_join

    rank_schema = pa.schema([("node", pa.int64()), ("rank", pa.float64())])
    out_schema = pa.schema(
        [("node_type", pa.string()), ("key", pa.int64()),
         ("rank", pa.float64())]
    )

    norm_schema = pa.schema(
        [("src", pa.int64()), ("dst", pa.int64()), ("wn", pa.float64())]
    )

    def norm_runs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return norm_schema.empty_table()
        src = g["src"].to_numpy(zero_copy_only=False)
        w = g["w"].to_numpy(zero_copy_only=False).astype(np.float64)
        starts = run_starts(src)
        bounds = np.append(starts, len(src))
        outw = np.repeat(np.add.reduceat(w, starts), np.diff(bounds))
        return pa.table(
            {"src": g["src"], "dst": g["dst"], "wn": pa.array(w / outw)}
        )

    edges_n = grouped_runs(edges, "src", norm_runs).materialize()

    def distinct_src(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"node": pa.array([], type=pa.int64())})
        src = g["src"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(src[run_starts(src)])})

    nodes_ds = grouped_runs(edges_n, "src", distinct_src).materialize()
    n = nodes_ds.count()
    if n == 0:
        return out_schema.empty_table()
    base = (1.0 - d) / n
    init = 1.0 / n

    def init_ranks(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "node" not in b.column_names:
            return rank_schema.empty_table()
        return pa.table(
            {"node": b["node"], "rank": pa.array(np.full(b.num_rows, init))}
        )

    ranks = nodes_ds.map_batches(init_ranks, batch_format="pyarrow").materialize()

    contrib_schema = pa.schema([("node", pa.int64()), ("pc", pa.float64())])

    def contrib(b: pa.Table) -> pa.Table:
        # joined batch: src (merged key), dst, wn (left), rank (right)
        if b.num_rows == 0 or "dst" not in b.column_names:
            return contrib_schema.empty_table()
        pc = (
            d
            * b["rank"].to_numpy(zero_copy_only=False)
            * b["wn"].to_numpy(zero_copy_only=False)
        )
        dst = b["dst"].to_numpy(zero_copy_only=False)
        ud, inv = np.unique(dst, return_inverse=True)
        agg = np.zeros(len(ud))
        np.add.at(agg, inv, pc)
        return pa.table({"node": pa.array(ud), "pc": pa.array(agg)})

    def fold_rank(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(pc)" not in b.column_names:
            return rank_schema.empty_table()
        return pa.table(
            {"node": b["node"],
             "rank": pa.array(
                 base + b["sum(pc)"].to_numpy(zero_copy_only=False)
             )}
        )

    for _ in range(iters):
        joined = shuffle_join(edges_n, ranks, on="src", right_on="node")
        ranks = (
            joined.map_batches(contrib, batch_format="pyarrow")
            .groupby("node")
            .sum("pc")
            .map_batches(fold_rank, batch_format="pyarrow")
            .materialize()
        )

    def local_topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "rank" not in b.column_names:
            return rank_schema.empty_table()
        nd = b["node"].to_numpy(zero_copy_only=False)
        r = b["rank"].to_numpy(zero_copy_only=False)
        o = np.lexsort((nd, -r))[:k]
        return pa.table({"node": pa.array(nd[o]), "rank": pa.array(r[o])})

    parts = [
        t
        for t in ray.get(
            ranks.map_batches(local_topk, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows and "rank" in t.column_names
    ]
    if not parts:
        return out_schema.empty_table()
    m = pa.concat_tables(parts)  # bounded: <= k x blocks rows
    nd = m["node"].to_numpy(zero_copy_only=False)
    r = m["rank"].to_numpy(zero_copy_only=False)
    o = np.lexsort((nd, -r))[:k]
    sel, rr = nd[o], r[o]
    return pa.table(
        {"node_type": pa.array(
            np.where(sel % 2 == 0, "customer", "supplier").astype(object),
            pa.string()),
         "key": pa.array(sel // 2, pa.int64()),
         "rank": pa.array(rr, pa.float64())}
    )


def _dim_arrays(path: str, cols: list[str], dtypes: list) -> list[np.ndarray]:
    """Driver-side read of a SMALL dimension table as numpy columns (schema-
    safe on all-empty inputs — Ray drops empty-block schemas, so missing
    columns come back as typed empties)."""
    df = read_view(path, columns=cols).to_pandas()
    return [
        df[c].to_numpy(dt) if c in df.columns else np.array([], dtype=dt)
        for c, dt in zip(cols, dtypes)
    ]


def _sorted_by_key(key: np.ndarray, *vals: np.ndarray):
    o = np.argsort(key, kind="stable")
    return (key[o],) + tuple(v[o] for v in vals)


def _probe(sorted_keys: np.ndarray, probe: np.ndarray):
    """searchsorted probe: (positions clamped, hit mask)."""
    if len(sorted_keys) == 0:
        return np.zeros(len(probe), dtype=np.int64), np.zeros(len(probe), bool)
    pos = np.minimum(np.searchsorted(sorted_keys, probe), len(sorted_keys) - 1)
    return pos, sorted_keys[pos] == probe


def forecast_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q6 shape — the forecasting-revenue-change scalar: revenue that
    would have been gained by eliminating mid-band discounts on small
    orders in one shipping year. Pure scan-side predicate + distributive
    sum: ZERO shuffles — each batch folds to one partial (revenue, count)
    pair and the driver adds a handful of ints. The predicate (year 1996,
    discount 5-7 cents, quantity < 24) is evaluated on exact integer
    cents so the Ray and SQL sides agree bit-for-bit; only the final
    /10000.0 is floating point (shared verbatim with the oracle)."""
    items = read_view(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )

    part_schema = pa.schema([("pr", pa.int64()), ("pn", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "l_shipdate" not in b.column_names:
            return part_schema.empty_table()
        yr = (
            b["l_shipdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]").astype(np.int64) + 1970
        )
        dc = np.rint(
            b["l_discount"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        qc = np.rint(
            b["l_quantity"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        m = (yr == 1996) & (dc >= 5) & (dc <= 7) & (qc < 2400)
        ec = np.rint(
            b["l_extendedprice"].to_numpy(zero_copy_only=False)[m] * 100.0
        ).astype(np.int64)
        return pa.table(
            {"pr": pa.array([int((ec * dc[m]).sum())], pa.int64()),
             "pn": pa.array([int(m.sum())], pa.int64())}
        )

    rev, n = 0, 0
    for t in ray.get(
        items.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if t.num_rows and "pr" in t.column_names:
            rev += int(pc.sum(t["pr"]).as_py() or 0)
            n += int(pc.sum(t["pn"]).as_py() or 0)
    return pa.table(
        {"revenue": pa.array([rev / 10000.0], pa.float64()),
         "n_items": pa.array([n], pa.int64())}
    )


def brand_qty_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q19 shape — discounted revenue under an OR of three
    (brand, size-range, quantity-range) branches: the disjunctive
    multi-table predicate that defeats naive pushdown. The part side is
    tiny and ships ONCE as sorted (partkey, brand-code, size) arrays via
    ray.put + the per-process _PROBE_CACHE; each lineitem batch probes
    with searchsorted and evaluates all three branches vectorized — no
    shuffle at all, the result folds to one scalar pair. Quantity
    comparisons run on exact integer hundredths; revenue on exact
    integer ten-thousandth-cents with ONE final double division."""
    p_k, p_b, p_s = _dim_arrays(
        f"{sf_dir}/part.parquet", ["p_partkey", "p_brand", "p_size"],
        [np.int64, object, np.int64],
    )
    # brand -> small int code; unknown brands get -1 (never match)
    brands = ["Brand#1", "Brand#7", "Brand#20"]
    code = np.full(len(p_b), -1, dtype=np.int64)
    for i, br in enumerate(brands):
        code[p_b == br] = i
    pk, pcode, psize = _sorted_by_key(p_k, code, p_s)
    side_ref = ray.put((pk, pcode, psize))

    items = read_view(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    part_schema = pa.schema([("pr", pa.int64()), ("pn", pa.int64())])

    class BranchProbe:
        def __init__(self, ref: ray.ObjectRef) -> None:
            self.ref = ref

        def _side(self):
            got = _PROBE_CACHE.get(self.ref.binary())
            if got is None:
                got = ray.get(self.ref)
                _PROBE_CACHE.clear()
                _PROBE_CACHE[self.ref.binary()] = got
            return got

        def __call__(self, b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "l_partkey" not in b.column_names:
                return part_schema.empty_table()
            pk, pcode, psize = self._side()
            lp = b["l_partkey"].to_numpy(zero_copy_only=False)
            pos, hit = _probe(pk, lp)
            bc = np.where(hit, pcode[pos], -1)
            sz = np.where(hit, psize[pos], -1)
            qc = np.rint(
                b["l_quantity"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            m = (
                ((bc == 0) & (sz >= 1) & (sz <= 15)
                 & (qc >= 100) & (qc <= 2000))
                | ((bc == 1) & (sz >= 10) & (sz <= 30)
                   & (qc >= 1000) & (qc <= 3500))
                | ((bc == 2) & (sz >= 20) & (sz <= 50)
                   & (qc >= 2000) & (qc <= 5000))
            )
            ec = np.rint(
                b["l_extendedprice"].to_numpy(zero_copy_only=False)[m] * 100.0
            ).astype(np.int64)
            dc = np.rint(
                (1.0 - b["l_discount"].to_numpy(zero_copy_only=False)[m])
                * 100.0
            ).astype(np.int64)
            return pa.table(
                {"pr": pa.array([int((ec * dc).sum())], pa.int64()),
                 "pn": pa.array([int(m.sum())], pa.int64())}
            )

    rev, n = 0, 0
    for t in ray.get(
        items.map_batches(BranchProbe(side_ref), batch_format="pyarrow")
        .to_arrow_refs()
    ):
        if t.num_rows and "pr" in t.column_names:
            rev += int(pc.sum(t["pr"]).as_py() or 0)
            n += int(pc.sum(t["pn"]).as_py() or 0)
    return pa.table(
        {"revenue": pa.array([rev / 10000.0], pa.float64()),
         "n_items": pa.array([n], pa.int64())}
    )


def market_share(sf_dir: str) -> pa.Table:
    """TPC-H Q8 shape — national market share: within orders placed by
    ASIA-region customers, the fraction of line-item revenue supplied by
    NATION_7, per order year. (year, nation_revenue, total_revenue,
    mkt_share).

    Composition: ONE big-big orderkey ``shuffle_join`` (lineitem revenue
    rows x orders) reaches o_custkey + order year; customer->nationkey,
    nation->regionkey and supplier->nationkey are BROADCAST probes
    shipped once per worker via the _PROBE_CACHE. Each batch folds to at
    most |years| x 2 partial rows (year, in-nation?, revenue), so the
    final groupby moves a handful of rows. Numerator and denominator are
    exact ten-thousandth-cents ints; the share is ONE double division,
    shared verbatim with the oracle."""
    from dedup_ray.stages.join import shuffle_join

    c_k, c_nk = _dim_arrays(
        f"{sf_dir}/customer.parquet", ["c_custkey", "c_nationkey"],
        [np.int64, np.int64],
    )
    n_k, n_nm, n_rk = _dim_arrays(
        f"{sf_dir}/nation.parquet", ["n_nationkey", "n_name", "n_regionkey"],
        [np.int64, object, np.int64],
    )
    r_k, r_nm = _dim_arrays(
        f"{sf_dir}/region.parquet", ["r_regionkey", "r_name"],
        [np.int64, object],
    )
    s_k, s_nk = _dim_arrays(
        f"{sf_dir}/supplier.parquet", ["s_suppkey", "s_nationkey"],
        [np.int64, np.int64],
    )
    asia = r_k[r_nm == "ASIA"]
    asia_nations = n_k[np.isin(n_rk, asia if len(asia) else [-1])]
    target = n_k[n_nm == "NATION_7"]
    target_nk = int(target[0]) if len(target) else -1
    ck, cnk = _sorted_by_key(c_k, c_nk)
    sk, snk = _sorted_by_key(s_k, s_nk)
    side_ref = ray.put((ck, cnk, sk, snk, np.sort(asia_nations), target_nk))

    items = read_view(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def rev_rows(b: pa.Table) -> pa.Table:
        ec = np.rint(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        dc = np.rint(
            (1.0 - b["l_discount"].to_numpy(zero_copy_only=False)) * 100.0
        ).astype(np.int64)
        return pa.table(
            {"l_orderkey": b["l_orderkey"], "l_suppkey": b["l_suppkey"],
             "r": pa.array(ec * dc)}
        )

    orders = read_view(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey",
                                             "o_orderdate"]
    )
    joined = shuffle_join(
        orders, items.map_batches(rev_rows, batch_format="pyarrow"),
        on="o_orderkey", right_on="l_orderkey",
        right_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("l_suppkey", pa.int64()),
             ("r", pa.int64())]
        ),
    )

    part_schema = pa.schema(
        [("yr", pa.int64()), ("in_nation", pa.int64()), ("pr", pa.int64())]
    )

    class ShareProbe:
        def __init__(self, ref: ray.ObjectRef) -> None:
            self.ref = ref

        def _side(self):
            got = _PROBE_CACHE.get(self.ref.binary())
            if got is None:
                got = ray.get(self.ref)
                _PROBE_CACHE.clear()
                _PROBE_CACHE[self.ref.binary()] = got
            return got

        def __call__(self, b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "l_suppkey" not in b.column_names:
                return part_schema.empty_table()
            ck, cnk, sk, snk, asia_sorted, target_nk = self._side()
            cpos, chit = _probe(ck, b["o_custkey"].to_numpy(zero_copy_only=False))
            spos, shit = _probe(sk, b["l_suppkey"].to_numpy(zero_copy_only=False))
            c_n = np.where(chit, cnk[cpos], -1)
            in_region = np.zeros(len(c_n), dtype=bool)
            if len(asia_sorted):
                apos, ahit = _probe(asia_sorted, c_n)
                in_region = ahit
            m = chit & shit & in_region
            if not m.any():
                return part_schema.empty_table()
            yr = (
                b["o_orderdate"].to_numpy(zero_copy_only=False)[m]
                .astype("datetime64[Y]").astype(np.int64) + 1970
            )
            in_nation = (np.where(shit, snk[spos], -1)[m] == target_nk).astype(
                np.int64
            )
            t = pa.table(
                {"yr": pa.array(yr), "in_nation": pa.array(in_nation),
                 "r": b["r"].filter(pa.array(m))}
            )
            g = t.group_by(["yr", "in_nation"]).aggregate([("r", "sum")])
            return pa.table(
                {"yr": g["yr"], "in_nation": g["in_nation"],
                 "pr": g["r_sum"].cast(pa.int64())}
            )

    agg = (
        joined.map_batches(ShareProbe(side_ref), batch_format="pyarrow")
        .groupby(["yr", "in_nation"])
        .sum("pr")
    )
    out_schema = pa.schema(
        [("year", pa.int64()), ("nation_revenue", pa.float64()),
         ("total_revenue", pa.float64()), ("mkt_share", pa.float64())]
    )
    parts = [
        t for t in ray.get(agg.to_arrow_refs())
        if t.num_rows and "sum(pr)" in t.column_names
    ]
    if not parts:
        return out_schema.empty_table()
    m = pa.concat_tables(parts)  # bounded: <= years x 2 rows
    yrs = m["yr"].to_numpy(zero_copy_only=False)
    inn = m["in_nation"].to_numpy(zero_copy_only=False)
    rv = m["sum(pr)"].to_numpy(zero_copy_only=False).astype(np.int64)
    uy = np.unique(yrs)
    nat = np.zeros(len(uy), dtype=np.int64)
    tot = np.zeros(len(uy), dtype=np.int64)
    for i, y in enumerate(uy):
        sel = yrs == y
        tot[i] = rv[sel].sum()
        nat[i] = rv[sel & (inn == 1)].sum()
    return pa.table(
        {"year": pa.array(uy, pa.int64()),
         "nation_revenue": pa.array(nat / 10000.0, pa.float64()),
         "total_revenue": pa.array(tot / 10000.0, pa.float64()),
         "mkt_share": pa.array(
             nat.astype(np.float64) / tot.astype(np.float64), pa.float64()
         )}
    )


def product_profit(sf_dir: str) -> pa.Table:
    """TPC-H Q9 shape — product-type profit by supplier nation and ship
    year, over parts whose name contains 'red': profit = discounted
    revenue minus retail cost (retailprice x quantity — the sandbox
    schema has no partsupp/supplycost, so retail price is the documented
    cost proxy; same join tree, same math shape). (nation, year, profit).

    Composition: NO shuffle-join at all — part (partkey -> retail-cents,
    name-match flag) and supplier->nation are broadcast probes; profit
    folds per batch to at most |nations| x |years| partial rows on exact
    ten-thousandth-cent ints, then one tiny groupby. The only all-to-all
    is that final bounded aggregate."""
    p_k, p_nm, p_rp = _dim_arrays(
        f"{sf_dir}/part.parquet", ["p_partkey", "p_name", "p_retailprice"],
        [np.int64, object, np.float64],
    )
    red = np.fromiter(("red" in s for s in p_nm), dtype=bool, count=len(p_nm))
    rp_c = np.rint(p_rp * 100.0).astype(np.int64)
    pk, pred, prp = _sorted_by_key(p_k, red, rp_c)
    s_k, s_nk = _dim_arrays(
        f"{sf_dir}/supplier.parquet", ["s_suppkey", "s_nationkey"],
        [np.int64, np.int64],
    )
    n_k, n_nm = _dim_arrays(
        f"{sf_dir}/nation.parquet", ["n_nationkey", "n_name"],
        [np.int64, object],
    )
    sk, snk = _sorted_by_key(s_k, s_nk)
    side_ref = ray.put((pk, pred, prp, sk, snk))

    items = read_view(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
                 "l_discount", "l_shipdate"],
    )

    part_schema = pa.schema(
        [("nk", pa.int64()), ("yr", pa.int64()), ("pp", pa.int64())]
    )

    class ProfitProbe:
        def __init__(self, ref: ray.ObjectRef) -> None:
            self.ref = ref

        def _side(self):
            got = _PROBE_CACHE.get(self.ref.binary())
            if got is None:
                got = ray.get(self.ref)
                _PROBE_CACHE.clear()
                _PROBE_CACHE[self.ref.binary()] = got
            return got

        def __call__(self, b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "l_partkey" not in b.column_names:
                return part_schema.empty_table()
            pk, pred, prp, sk, snk = self._side()
            ppos, phit = _probe(pk, b["l_partkey"].to_numpy(zero_copy_only=False))
            spos, shit = _probe(sk, b["l_suppkey"].to_numpy(zero_copy_only=False))
            m = phit & shit & np.where(phit, pred[ppos], False)
            if not m.any():
                return part_schema.empty_table()
            ec = np.rint(
                b["l_extendedprice"].to_numpy(zero_copy_only=False)[m] * 100.0
            ).astype(np.int64)
            dc = np.rint(
                (1.0 - b["l_discount"].to_numpy(zero_copy_only=False)[m])
                * 100.0
            ).astype(np.int64)
            qc = np.rint(
                b["l_quantity"].to_numpy(zero_copy_only=False)[m] * 100.0
            ).astype(np.int64)
            profit = ec * dc - prp[ppos][m] * qc
            yr = (
                b["l_shipdate"].to_numpy(zero_copy_only=False)[m]
                .astype("datetime64[Y]").astype(np.int64) + 1970
            )
            t = pa.table(
                {"nk": pa.array(snk[spos][m]), "yr": pa.array(yr),
                 "p": pa.array(profit)}
            )
            g = t.group_by(["nk", "yr"]).aggregate([("p", "sum")])
            return pa.table(
                {"nk": g["nk"], "yr": g["yr"],
                 "pp": g["p_sum"].cast(pa.int64())}
            )

    agg = (
        items.map_batches(ProfitProbe(side_ref), batch_format="pyarrow")
        .groupby(["nk", "yr"])
        .sum("pp")
    )
    out_schema = pa.schema(
        [("nation", pa.string()), ("year", pa.int64()),
         ("profit", pa.float64())]
    )
    parts = [
        t for t in ray.get(agg.to_arrow_refs())
        if t.num_rows and "sum(pp)" in t.column_names
    ]
    if not parts:
        return out_schema.empty_table()
    m = pa.concat_tables(parts)  # bounded: <= |nations| x |years| rows
    nk_s, nm_s = _sorted_by_key(n_k, n_nm)
    nka = m["nk"].to_numpy(zero_copy_only=False)
    pos, hit = _probe(nk_s, nka)
    names = np.where(hit, nm_s[pos], "?").astype(object)
    yr = m["yr"].to_numpy(zero_copy_only=False)
    pr = m["sum(pp)"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((-yr, names))
    return pa.table(
        {"nation": pa.array(names[order], pa.string()),
         "year": pa.array(yr[order], pa.int64()),
         "profit": pa.array(pr[order] / 10000.0, pa.float64())}
    )


def sole_blame_suppliers(sf_dir: str, k: int = 20) -> pa.Table:
    """TPC-H Q21 shape — suppliers solely responsible for a bad order:
    within finished ('F') multi-supplier orders, the supplier who is the
    ONLY one with a returned ('R') line item takes the blame; count
    blamed orders per supplier, top-``k``. The EXISTS (another supplier
    participated) + NOT EXISTS (no other supplier returned) pair is the
    classic double-correlated-subquery pattern.

    Composition — ONE shuffle total: lineitem folds per batch to distinct
    (orderkey, suppkey, any-R) partials; status-'F' orders enter the SAME
    orderkey-keyed grouped_runs shuffle as sentinel rows (suppkey = -1,
    the shuffle_join union-tag trick inlined), so a single pass per
    bucket does the global pair dedup, the F-order semi-join membership
    test AND both correlated conditions vectorized per run (run length
    >= 2, exactly one R supplier) — no per-order Python. The per-bucket
    (supplier, count) partials are bounded by |suppliers|, so they fold
    driver-side with the broadcast name lookup + top-k. Replaces a
    groupby + semi-join + grouped_runs + groupby chain (4 shuffles,
    measured 19 s at sf0.1) with one."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    items = read_view(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_returnflag"],
    )

    pair_schema = pa.schema(
        [("l_orderkey", pa.int64()), ("l_suppkey", pa.int64()),
         ("isr", pa.int64())]
    )

    def pair_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "l_orderkey" not in b.column_names:
            return pair_schema.empty_table()
        isr = pc.equal(b["l_returnflag"], "R").cast(pa.int64())
        t = pa.table(
            {"l_orderkey": b["l_orderkey"], "l_suppkey": b["l_suppkey"],
             "isr": isr}
        )
        g = t.group_by(["l_orderkey", "l_suppkey"]).aggregate([("isr", "max")])
        return pa.table(
            {"l_orderkey": g["l_orderkey"], "l_suppkey": g["l_suppkey"],
             "isr": g["isr_max"].cast(pa.int64())}
        )

    pairs = items.map_batches(pair_partial, batch_format="pyarrow")

    # F orders as sentinel rows of the SAME schema: suppkey -1 sorts before
    # every real supplier, so a run's sentinel (if any) is its first row
    f_marks = read_view(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderstatus"]
    ).map_batches(
        lambda b: (lambda keys: pa.table(
            {"l_orderkey": keys,
             "l_suppkey": pa.array(
                 np.full(len(keys), -1, dtype=np.int64), pa.int64()),
             "isr": pa.array(np.zeros(len(keys), dtype=np.int64), pa.int64())}
        ))(b.filter(pc.equal(b["o_orderstatus"], "F"))["o_orderkey"])
        if b.num_rows and "o_orderstatus" in b.column_names
        else pair_schema.empty_table(),
        batch_format="pyarrow",
    )

    blame_schema = pa.schema([("s", pa.int64()), ("n", pa.int64())])

    def blame_runs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.column_names:
            return blame_schema.empty_table()
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        isr = t["isr"].to_numpy(zero_copy_only=False)
        # F membership: orderkeys carrying a sentinel row (unique per order)
        f_keys = ok[sk == -1]
        rr = sk != -1
        ok, sk, isr = ok[rr], sk[rr], isr[rr]
        if len(ok) == 0:
            return blame_schema.empty_table()
        # global (orderkey, suppkey) dedup: isr = max over duplicate pairs
        pfirst = np.ones(len(ok), dtype=bool)
        pfirst[1:] = (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])
        pstarts = np.flatnonzero(pfirst)
        isr = np.maximum.reduceat(isr, pstarts)
        ok, sk = ok[pfirst], sk[pfirst]
        starts = run_starts(ok)
        bounds = np.append(starts, len(ok))
        ns = np.diff(bounds)  # suppliers per order
        nr = np.add.reduceat(isr, starts)  # R-suppliers per order
        pos = np.searchsorted(f_keys, ok[starts])
        has_f = (pos < len(f_keys)) & (f_keys[np.minimum(pos, len(f_keys) - 1)]
                                       == ok[starts]) if len(f_keys) else (
            np.zeros(len(starts), dtype=bool))
        good = has_f & (ns >= 2) & (nr == 1)  # EXISTS + NOT EXISTS pair
        # the blamed supplier: the single isr==1 row within each good run
        row_good = np.repeat(good, ns) & (isr == 1)
        blamed = sk[row_good]
        if len(blamed) == 0:
            return blame_schema.empty_table()
        u, c = np.unique(blamed, return_counts=True)
        return pa.table(
            {"s": pa.array(u, pa.int64()), "n": pa.array(c, pa.int64())}
        )

    agg = grouped_runs(
        pairs.union(f_marks), "l_orderkey", blame_runs,
        sort_cols=["l_orderkey", "l_suppkey"],
    )

    s_k, s_nm = _dim_arrays(
        f"{sf_dir}/supplier.parquet", ["s_suppkey", "s_name"],
        [np.int64, object],
    )
    sk_s, snm_s = _sorted_by_key(s_k, s_nm)
    out_schema = pa.schema(
        [("s_name", pa.string()), ("numwait", pa.int64())]
    )
    parts = [
        t for t in ray.get(agg.to_arrow_refs())
        if t.num_rows and "s" in t.column_names
    ]
    if not parts:
        return out_schema.empty_table()
    m = pa.concat_tables(parts)  # bounded: <= |suppliers| rows per bucket
    if m.num_rows == 0:
        return out_schema.empty_table()
    mg = m.group_by("s").aggregate([("n", "sum")])
    sa = mg["s"].to_numpy(zero_copy_only=False)
    na = mg["n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    pos, hit = _probe(sk_s, sa)
    names = np.where(hit, snm_s[pos], "?").astype(object)
    order = np.lexsort((names, -na))[:k]
    return pa.table(
        {"s_name": pa.array(names[order], pa.string()),
         "numwait": pa.array(na[order], pa.int64())}
    )


def min_cost_supplier(sf_dir: str, p_size: int = 25, region: str = "EUROPE") -> pa.Table:
    """TPC-H Q2 shape — min-cost supplier per part (correlated MIN
    subquery + multi-hop dimension join): for every part of one size,
    the cheapest regional supplier, where "supply cost" is the minimum
    observed line price for that (part, supplier) pair (the testdata has
    no partsupp table; distinct lineitem pairs ARE the supply relation).

    Shape: supplier->nation->region hops resolve driver-side (bounded
    dimensions, the repo's broadcast convention); lineitem folds per
    batch to (pk, sk, min-cents) Arrow partials probed against the
    part-size and regional-supplier key sets — most rows die in the map
    task; ONE (pk, sk) groupby-min merges the partials; the correlated
    per-part MIN + min-suppkey tiebreak is a vectorized run kernel in
    ONE more grouped_runs pass. Exact integer cents throughout; the only
    double is the final /100.0 shared with the oracle:
    (p_partkey, s_suppkey, min_cost) sorted by p_partkey."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    p_k, p_sz = _dim_arrays(
        f"{sf_dir}/part.parquet", ["p_partkey", "p_size"], [np.int64, np.int64]
    )
    want_parts = np.sort(p_k[p_sz == p_size])

    r_k, r_nm = _dim_arrays(
        f"{sf_dir}/region.parquet", ["r_regionkey", "r_name"], [np.int64, object]
    )
    n_k, n_rk = _dim_arrays(
        f"{sf_dir}/nation.parquet", ["n_nationkey", "n_regionkey"],
        [np.int64, np.int64],
    )
    s_k, s_nk = _dim_arrays(
        f"{sf_dir}/supplier.parquet", ["s_suppkey", "s_nationkey"],
        [np.int64, np.int64],
    )
    want_regions = r_k[r_nm == region]
    want_nations = np.sort(n_k[np.isin(n_rk, want_regions)])
    want_sks = np.sort(s_k[np.isin(s_nk, want_nations)])

    part_schema = pa.schema(
        [("pk", pa.int64()), ("sk", pa.int64()), ("cc", pa.int64())]
    )

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "l_partkey" not in b.column_names:
            return part_schema.empty_table()
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        _, hit_p = _probe(want_parts, pk)
        _, hit_s = _probe(want_sks, sk)
        keep = hit_p & hit_s
        if not keep.any():
            return part_schema.empty_table()
        cc = np.rint(
            b["l_extendedprice"].to_numpy(zero_copy_only=False)[keep] * 100.0
        ).astype(np.int64)
        t = pa.table(
            {"pk": pa.array(pk[keep]), "sk": pa.array(sk[keep]),
             "cc": pa.array(cc)}
        )
        g = t.group_by(["pk", "sk"]).aggregate([("cc", "min")])
        return pa.table({"pk": g["pk"], "sk": g["sk"], "cc": g["cc_min"]})

    supply = (
        read_view(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["pk", "sk"])
        .min("cc")
        .map_batches(
            lambda b: pa.table(
                {"pk": b["pk"], "sk": b["sk"],
                 "cc": b["min(cc)"].cast(pa.int64())}
            )
            if b.num_rows and "min(cc)" in b.column_names
            else part_schema.empty_table(),
            batch_format="pyarrow",
        )
    )

    out_schema = pa.schema(
        [("p_partkey", pa.int64()), ("s_suppkey", pa.int64()),
         ("min_cost", pa.float64())]
    )

    def argmin_runs(t: pa.Table) -> pa.Table:
        pk = t["pk"].to_numpy(zero_copy_only=False)
        if len(pk) == 0:
            return out_schema.empty_table()
        sk = t["sk"].to_numpy(zero_copy_only=False)
        cc = t["cc"].to_numpy(zero_copy_only=False)
        starts = run_starts(pk)
        lens = np.diff(np.append(starts, len(pk)))
        mn = np.minimum.reduceat(cc, starts)
        # winner = min suppkey among rows hitting the per-part min; rows
        # arrive sorted by (pk, sk), so first match per run wins
        at_min = cc == np.repeat(mn, lens)
        first = np.zeros(len(pk), dtype=bool)
        # index of first at-min row in each run: argmax of at_min per run
        cum = np.cumsum(at_min)
        run_prior = np.concatenate([[0], cum[starts[1:] - 1]]) if len(starts) > 1 else np.array([0])
        first_idx = np.searchsorted(cum, run_prior + 1)
        first[first_idx] = True
        keep = first & at_min
        return pa.table(
            {"p_partkey": pa.array(pk[keep]), "s_suppkey": pa.array(sk[keep]),
             "min_cost": pa.array(cc[keep] / 100.0, pa.float64())}
        )

    parts = [
        t for t in ray.get(
            grouped_runs(supply, "pk", argmin_runs,
                         sort_cols=["pk", "sk"]).to_arrow_refs()
        )
        if t.num_rows and "p_partkey" in t.column_names
    ]
    if not parts:
        return out_schema.empty_table()
    m = pa.concat_tables(parts)  # bounded: <= |parts of this size| rows
    return m.sort_by("p_partkey")


def important_parts(sf_dir: str, nationkey: int = 9, per_mille: int = 1) -> pa.Table:
    """TPC-H Q11 shape — important stock: per-part line value from one
    nation's suppliers, keeping parts whose value exceeds a fixed
    fraction (``per_mille``/1000) of that nation's total. The HAVING
    threshold is a scalar subquery over the SAME aggregate.

    One streamed pass: per-batch (pk, cents) Arrow partials filtered by
    the broadcast nation supplier set; a pk groupby merges them; the agg
    table is bounded by the part DOMAIN so the driver folds the global
    total as a Python int and applies the EXACT integer test
    ``vc * 1000 > per_mille * total`` (no float shares):
    (l_partkey, value) sorted by l_partkey."""
    s_k, s_nk = _dim_arrays(
        f"{sf_dir}/supplier.parquet", ["s_suppkey", "s_nationkey"],
        [np.int64, np.int64],
    )
    want_sks = np.sort(s_k[s_nk == nationkey])

    part_schema = pa.schema([("pk", pa.int64()), ("vc", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "l_partkey" not in b.column_names:
            return part_schema.empty_table()
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        _, hit = _probe(want_sks, sk)
        if not hit.any():
            return part_schema.empty_table()
        t = pa.table(
            {
                "pk": b["l_partkey"].filter(pa.array(hit)),
                "vc": pa.array(
                    np.rint(
                        b["l_extendedprice"].to_numpy(zero_copy_only=False)[hit]
                        * 100.0
                    ).astype(np.int64)
                ),
            }
        )
        g = t.group_by("pk").aggregate([("vc", "sum")])
        return pa.table({"pk": g["pk"], "vc": g["vc_sum"]})

    agg = (
        read_view(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("pk")
        .sum("vc")
    )
    parts = [
        t for t in ray.get(agg.to_arrow_refs())
        if t.num_rows and "sum(vc)" in t.column_names
    ]
    out_schema = pa.schema(
        [("l_partkey", pa.int64()), ("value", pa.float64())]
    )
    if not parts:
        return out_schema.empty_table()
    m = pa.concat_tables(parts)  # bounded by the part domain
    pk = m["pk"].to_numpy(zero_copy_only=False)
    vc = m["sum(vc)"].to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(vc.sum())  # Python int — no int64 overflow at scale
    keep = np.array([int(v) * 1000 > per_mille * total for v in vc], dtype=bool)
    order = np.argsort(pk[keep], kind="stable")
    return pa.table(
        {
            "l_partkey": pa.array(pk[keep][order]),
            "value": pa.array(vc[keep][order] / 100.0, pa.float64()),
        }
    )


def part_supplier_counts(sf_dir: str) -> pa.Table:
    """TPC-H Q16 shape — parts/supplier relationship: distinct supplier
    count per (p_brand, p_type, p_size), excluding "complaint" suppliers
    (negative account balance — the testdata's analog of the LIKE
    '%Complaints%' comment filter). The NOT IN + COUNT(DISTINCT) over a
    derived supply relation is the defining pattern.

    Distinct (pk, sk) partials fold per batch (the bad-supplier probe
    kills excluded rows map-side); then ONE sk-keyed grouped_runs shuffle
    does ALL remaining dedup in a single pass — a supplier's rows are
    co-located, so the kernel dedups (sk, pk) globally, maps pk to a
    driver-factorized part-attr triple code, dedups (sk, triple) and
    emits bounded (code, count) partials; the triple domain folds
    driver-side (cross-domain-bounded, the house convention). Replaces a
    3-shuffle chain measured at 28 s with one shuffle (~5 s at sf0.1):
    (p_brand, p_type, p_size, supplier_cnt) sorted by count desc."""
    from dedup_ray.stages.grouped import grouped_runs
    s_k, s_ab = _dim_arrays(
        f"{sf_dir}/supplier.parquet", ["s_suppkey", "s_acctbal"],
        [np.int64, np.float64],
    )
    bad_sks = np.sort(s_k[s_ab < 0])
    p_k, p_b, p_t, p_s = _dim_arrays(
        f"{sf_dir}/part.parquet",
        ["p_partkey", "p_brand", "p_type", "p_size"],
        [np.int64, object, object, np.int64],
    )
    pk_s, pb_s, pt_s, ps_s = _sorted_by_key(p_k, p_b, p_t, p_s)

    pair_schema = pa.schema([("pk", pa.int64()), ("sk", pa.int64())])

    def pair_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "l_partkey" not in b.column_names:
            return pair_schema.empty_table()
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        _, is_bad = _probe(bad_sks, sk)
        keep = ~is_bad
        t = pa.table(
            {"pk": b["l_partkey"].filter(pa.array(keep)),
             "sk": pa.array(sk[keep])}
        )
        g = t.group_by(["pk", "sk"]).aggregate([])
        return g

    # factorize the (brand, type, size) triples once, driver-side: codes
    # travel through the shuffle instead of three variable-width columns
    trip = {}
    code_of = np.empty(len(pk_s), dtype=np.int64)
    for i in range(len(pk_s)):
        key = (pb_s[i], pt_s[i], int(ps_s[i]))
        code_of[i] = trip.setdefault(key, len(trip))
    n_codes = len(trip)
    attrs = list(trip.keys())  # code -> (brand, type, size)

    code_schema = pa.schema([("code", pa.int64()), ("pc", pa.int64())])

    def kernel(g: pa.Table) -> pa.Table:
        # bucket holds COMPLETE sk-groups sorted by (sk, pk): one pass
        # dedups (sk, pk) globally, maps pk -> triple code, dedups
        # (sk, code) and counts per code
        if g.num_rows == 0 or "sk" not in g.column_names:
            return code_schema.empty_table()
        sk = g["sk"].to_numpy(zero_copy_only=False)
        pk = g["pk"].to_numpy(zero_copy_only=False)
        first = np.ones(len(sk), dtype=bool)
        first[1:] = (sk[1:] != sk[:-1]) | (pk[1:] != pk[:-1])
        sk, pk = sk[first], pk[first]
        pos, hit = _probe(pk_s, pk)
        sk, code = sk[hit], code_of[pos[hit]]
        if len(sk) == 0:
            return code_schema.empty_table()
        # distinct (sk, code): sk-major sort order survives the dedup above,
        # but codes within an sk run are unordered — lexsort then first-flag
        o = np.lexsort((code, sk))
        sk, code = sk[o], code[o]
        keep = np.ones(len(sk), dtype=bool)
        keep[1:] = (sk[1:] != sk[:-1]) | (code[1:] != code[:-1])
        vals, cnts = np.unique(code[keep], return_counts=True)
        return pa.table(
            {"code": pa.array(vals, pa.int64()),
             "pc": pa.array(cnts.astype(np.int64), pa.int64())}
        )

    pairs = read_view(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    ).map_batches(pair_partial, batch_format="pyarrow")
    partials = grouped_runs(pairs, "sk", kernel, sort_cols=["sk", "pk"])

    out_schema = pa.schema(
        [("p_brand", pa.string()), ("p_type", pa.string()),
         ("p_size", pa.int64()), ("supplier_cnt", pa.int64())]
    )
    total = np.zeros(n_codes, dtype=np.int64)
    for t in ray.get(partials.to_arrow_refs()):
        if t.num_rows and "code" in t.column_names:
            np.add.at(total, t["code"].to_numpy(zero_copy_only=False),
                      t["pc"].to_numpy(zero_copy_only=False))
    nz = np.flatnonzero(total)
    if len(nz) == 0:
        return out_schema.empty_table()
    br = np.asarray([attrs[c][0] for c in nz], dtype=object)
    ty = np.asarray([attrs[c][1] for c in nz], dtype=object)
    sz = np.asarray([attrs[c][2] for c in nz], dtype=np.int64)
    cnt = total[nz]
    order = np.lexsort((sz, ty, br, -cnt))
    return pa.table(
        {
            "p_brand": pa.array(br[order], pa.string()),
            "p_type": pa.array(ty[order], pa.string()),
            "p_size": pa.array(sz[order]),
            "supplier_cnt": pa.array(cnt[order]),
        }
    )


def excess_share_suppliers(
    sf_dir: str, year: int = 1995, prefix: str = "small ", nationkey: int = 9
) -> pa.Table:
    """TPC-H Q20 shape — suppliers with an excess share: suppliers from
    one nation who, for at least one part whose name starts with
    ``prefix``, shipped MORE THAN HALF of that part's total quantity in
    one year. The doubly-nested IN (suppliers ⊃ parts ⊃ per-pair vs
    per-part aggregate) is the defining pattern.

    The prefix-part key set and nation supplier set resolve driver-side
    and broadcast; lineitem rows filter + fold to (pk, sk, qty-cents)
    partials per batch; ONE pk grouped_runs pass makes each part's rows
    local and sorted by (pk, sk), so the kernel computes BOTH aggregate
    granularities vectorized — per-part totals at pk run starts, per
    (pk, sk) sums at pair run starts — and applies the EXACT integer
    dominance test ``2*q > total``. Qualifying suppliers dedup in a tiny
    groupby and take names from the broadcast dimension:
    (s_suppkey, s_name) sorted by s_suppkey."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    p_k, p_nm = _dim_arrays(
        f"{sf_dir}/part.parquet", ["p_partkey", "p_name"], [np.int64, object]
    )
    want_parts = np.sort(
        p_k[np.array([str(n).startswith(prefix) for n in p_nm], dtype=bool)]
    ) if len(p_k) else p_k
    s_k, s_nm, s_nk = _dim_arrays(
        f"{sf_dir}/supplier.parquet", ["s_suppkey", "s_name", "s_nationkey"],
        [np.int64, object, np.int64],
    )

    part_schema = pa.schema(
        [("pk", pa.int64()), ("sk", pa.int64()), ("qc", pa.int64())]
    )

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "l_partkey" not in b.column_names:
            return part_schema.empty_table()
        yr = pc.year(b["l_shipdate"]).to_numpy(zero_copy_only=False)
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        _, hit = _probe(want_parts, pk)
        keep = hit & (yr == year)
        if not keep.any():
            return part_schema.empty_table()
        t = pa.table(
            {
                "pk": pa.array(pk[keep]),
                "sk": b["l_suppkey"].filter(pa.array(keep)),
                "qc": pa.array(
                    np.rint(
                        b["l_quantity"].to_numpy(zero_copy_only=False)[keep]
                        * 100.0
                    ).astype(np.int64)
                ),
            }
        )
        g = t.group_by(["pk", "sk"]).aggregate([("qc", "sum")])
        return pa.table({"pk": g["pk"], "sk": g["sk"], "qc": g["qc_sum"]})

    ds = read_view(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    ).map_batches(partial, batch_format="pyarrow")

    hot_schema = pa.schema([("sk", pa.int64())])

    def dominance_runs(t: pa.Table) -> pa.Table:
        pk = t["pk"].to_numpy(zero_copy_only=False)
        if len(pk) == 0:
            return hot_schema.empty_table()
        sk = t["sk"].to_numpy(zero_copy_only=False)
        qc = t["qc"].to_numpy(zero_copy_only=False)
        # pair runs merge cross-batch partials; part runs give the totals
        pair_change = np.concatenate(
            [[0], np.flatnonzero((pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])) + 1]
        )
        q = np.add.reduceat(qc, pair_change)
        pair_pk = pk[pair_change]
        pair_sk = sk[pair_change]
        pstarts = run_starts(pair_pk)
        plens = np.diff(np.append(pstarts, len(pair_pk)))
        tot = np.repeat(np.add.reduceat(q, pstarts), plens)
        win = 2 * q > tot
        if not win.any():
            return hot_schema.empty_table()
        return pa.table({"sk": pa.array(np.unique(pair_sk[win]))})

    agg = grouped_runs(
        ds, "pk", dominance_runs, sort_cols=["pk", "sk"]
    ).groupby("sk").count()
    parts = [
        t for t in ray.get(agg.to_arrow_refs())
        if t.num_rows and "sk" in t.column_names
    ]
    out_schema = pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string())])
    if not parts:
        return out_schema.empty_table()
    hot = np.unique(
        pa.concat_tables(
            [t.select(["sk"]) for t in parts]
        )["sk"].to_numpy(zero_copy_only=False)
    )  # bounded by the supplier domain
    sk_s, snm_s, snk_s = _sorted_by_key(s_k, s_nm, s_nk)
    pos, hit = _probe(sk_s, hot)
    keep = hit & (snk_s[pos] == nationkey)
    ks = hot[keep]
    nm = snm_s[pos[keep]].astype(object)
    order = np.argsort(ks, kind="stable")
    return pa.table(
        {"s_suppkey": pa.array(ks[order], pa.int64()),
         "s_name": pa.array(nm[order], pa.string())}
    )


def late_ship_priorities(sf_dir: str, grace_days: int = 60) -> rd.Dataset:
    """TPC-H Q4 shape — order priority checking: per priority, how many
    orders have AT LEAST ONE line shipped ``grace_days`` or more after the
    order date (the testdata's lateness analog of Q4's commit-vs-receipt
    test): (o_orderpriority, order_count).

    The correlated EXISTS collapses to an aggregate: EXISTS(ship >=
    odate + g) == max(ship) >= odate + g, so lineitem folds to ONE
    int64 max-per-order partial per batch before its only shuffle — the
    fact table never moves a second time and the join input is one row
    per order. One orderkey shuffle_join against orders, an exact integer
    microsecond comparison (g days = g*86400e6 us, both engines compare
    timestamps exactly), then per-batch priority count partials into a
    priority-domain-bounded groupby. Reference analog: the HAVING>=2
    census over a derived per-group aggregate (src/grouping.rs)."""
    from dedup_ray.stages.join import shuffle_join

    out_schema = pa.schema(
        [("o_orderpriority", pa.string()), ("order_count", pa.int64())]
    )
    part_schema = pa.schema([("lk", pa.int64()), ("ms", pa.int64())])

    def ship_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "l_orderkey" not in b.column_names:
            return part_schema.empty_table()
        t = pa.table(
            {"lk": b["l_orderkey"],
             # normalize to us before the int view: external writers may
             # store ns-unit timestamps
             "ms": b["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64())}
        )
        g = t.group_by("lk").aggregate([("ms", "max")])
        return pa.table({"lk": g["lk"], "ms": g["ms_max"]})

    maxship = (
        read_view(f"{sf_dir}/lineitem.parquet",
                  columns=["l_orderkey", "l_shipdate"])
        .map_batches(ship_partial, batch_format="pyarrow")
        .groupby("lk")
        .max("ms")
    )

    def tidy(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "max(ms)" not in b.column_names:
            return part_schema.empty_table()
        return pa.table({"lk": b["lk"], "ms": b["max(ms)"].cast(pa.int64())})

    maxship = maxship.map_batches(tidy, batch_format="pyarrow")

    orders = read_view(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda b: pa.table(
            {"o_orderkey": b["o_orderkey"],
             "od": b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()),
             "o_orderpriority": b["o_orderpriority"]}
        )
        if b.num_rows and "o_orderkey" in b.column_names
        else pa.schema([("o_orderkey", pa.int64()), ("od", pa.int64()),
                        ("o_orderpriority", pa.string())]).empty_table(),
        batch_format="pyarrow",
    )

    joined = shuffle_join(
        orders, maxship, on="o_orderkey", right_on="lk",
        # explicit schemas: all-empty inputs drop the datasets' own
        left_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("od", pa.int64()),
             ("o_orderpriority", pa.string())]
        ),
        right_schema=part_schema,
    )
    grace_us = grace_days * 86_400_000_000

    def late_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "ms" not in b.column_names:
            return pa.schema(
                [("o_orderpriority", pa.string()), ("pn", pa.int64())]
            ).empty_table()
        ms = b["ms"].to_numpy(zero_copy_only=False)
        od = b["od"].to_numpy(zero_copy_only=False)
        late = b.filter(pa.array(ms >= od + grace_us))
        g = late.group_by("o_orderpriority").aggregate(
            [("o_orderkey", "count", pc.CountOptions(mode="all"))]
        )
        return pa.table(
            {"o_orderpriority": g["o_orderpriority"],
             "pn": g["o_orderkey_count"].cast(pa.int64())}
        )

    agg = joined.map_batches(late_partial, batch_format="pyarrow").groupby(
        "o_orderpriority"
    ).sum("pn")

    def final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(pn)" not in b.column_names:
            return out_schema.empty_table()
        return pa.table(
            {"o_orderpriority": b["o_orderpriority"],
             "order_count": b["sum(pn)"].cast(pa.int64())}
        )

    return agg.map_batches(final, batch_format="pyarrow")


def _exact_two_rank_scan(
    ds: rd.Dataset,
    getv: Callable[[pa.Table], np.ndarray],
    q: float,
    k: int = 512,
) -> tuple[float, float, int] | None:
    """Sketch-bounded EXACT selection of the TWO order statistics that
    bracket quantile ``q`` under percentile_cont semantics: 0-based index
    i0 = floor((n-1)*q) and i0+1 (clamped to n-1). Same two-streamed-pass,
    self-widening structure as ``_exact_median_scan`` — the adjacent ranks
    always share one bracket, so interpolated percentiles cost exactly
    what the median does. Returns (lo, hi, n) or None on empty input."""
    from dedup_ray.functions.sketch import QuantileSketch

    def partial(b: pa.Table) -> pa.Table:
        sk = QuantileSketch(k).add(getv(b))
        rows = sk.to_rows()
        if not rows:
            return pa.table(
                {"lvl": pa.array([], pa.int32()),
                 "vals": pa.array([], pa.list_(pa.float64())),
                 "cnt": pa.array([], pa.int64())}
            )
        return pa.table(
            {"lvl": pa.array([r[0] for r in rows], type=pa.int32()),
             "vals": pa.array([r[1] for r in rows], type=pa.list_(pa.float64())),
             "cnt": pa.array([b.num_rows] + [0] * (len(rows) - 1), pa.int64())}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not parts:
        return None
    sk = QuantileSketch.from_rows([(r["lvl"], r["vals"]) for r in parts], k)
    n = int(sum(r["cnt"] for r in parts))
    if n == 0:
        return None
    i0 = int(np.floor((n - 1) * q))          # 0-based lower order stat
    r_lo, r_hi = i0 + 1, min(i0 + 2, n)       # 1-based ranks to select

    margin = 0.02
    while True:
        lo_q, hi_q = max(0.0, q - margin), min(1.0, q + margin)
        lo, hi = sk.quantiles([lo_q, hi_q])
        if lo_q == 0.0:
            lo = -np.inf
        if hi_q == 1.0:
            hi = np.inf

        def scan(b: pa.Table, lo=lo, hi=hi) -> pa.Table:
            v = getv(b)
            inb = v[(v >= lo) & (v <= hi)]
            return pa.table(
                {"below": pa.array([int(np.count_nonzero(v < lo))], pa.int64()),
                 "inb": pa.array([inb.tolist()], pa.list_(pa.float64()))}
            )

        rows2 = ds.map_batches(scan, batch_format="pyarrow").take_all()
        below = sum(r["below"] for r in rows2)
        collected = np.concatenate(
            [np.asarray(r["inb"], np.float64) for r in rows2]
        ) if rows2 else np.empty(0)
        if below < r_lo and r_hi <= below + collected.size:
            collected.sort()
            return (
                float(collected[r_lo - below - 1]),
                float(collected[r_hi - below - 1]),
                n,
            )
        margin *= 2.0


def value_percentile(sf_dir: str, q: float = 0.9, k: int = 512) -> pa.Table:
    """EXACT interpolated percentile (percentile_cont semantics) of the
    continuous ``events.value`` column: (pct, n_rows) — the SLO/latency
    percentile every monitoring pipeline needs, exact rather than
    sketch-approximate. Generalizes exact_value_median from rank-select to
    linear interpolation: select the two bracketing order statistics with
    ONE sketch-bounded exact scan (same cost as the median), then
    interpolate with the literal expression the oracle uses —
    lo + (hi - lo) * f with f = (n-1)*q - floor((n-1)*q), every double op
    shared so the hashes match bit-exactly. Streams, no shuffle; driver
    state O(k log n) + the in-bracket slice."""
    ds = read_view(f"{sf_dir}/events.parquet", columns=["value"])
    res = _exact_two_rank_scan(
        ds, lambda b: b["value"].to_numpy(zero_copy_only=False), q, k
    )
    if res is None:
        return pa.table(
            {"pct": pa.array([], pa.float64()),
             "n_rows": pa.array([], pa.int64())}
        )
    lo, hi, n = res
    f = (n - 1) * q - np.floor((n - 1) * q)
    val = lo + (hi - lo) * f
    return pa.table(
        {"pct": pa.array([float(val)], pa.float64()),
         "n_rows": pa.array([n], pa.int64())}
    )


def zone_map_stats(sf_dir: str, table: str = "events",
                   column: str = "value") -> rd.Dataset:
    """Parquet zone-map audit — per row group of every physical shard, the
    footer's (n_rows, min, max) for one column: (shard, row_group, n_rows,
    vmin, vmax). This is the data-skipping diagnostic behind predicate
    pushdown at 100 TB: before adding a filter, read THIS (footers only,
    never data pages) to see what fraction of row groups a range predicate
    could prune — unsorted layouts show full-range zone maps everywhere and
    predict pushdown won't help until a sort/cluster-by fixes the layout
    (the reference's walk-time subtree pruning, src/scanner.rs, lifted to
    columnar storage). Each task opens only its shard's footer, so the scan
    is O(files) metadata reads fanned out over the cluster, not a data
    scan; shards stream through from_items exactly like checkpoint lineage
    (sources/io.list_shards ordering)."""
    from dedup_ray.sources.io import list_shards

    out_schema = pa.schema(
        [("shard", pa.string()), ("row_group", pa.int64()),
         ("n_rows", pa.int64()), ("vmin", pa.float64()),
         ("vmax", pa.float64())]
    )
    shards = list_shards(f"{sf_dir}/{table}.parquet")

    def footer(b: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        if b.num_rows == 0 or "item" not in b.column_names:
            return out_schema.empty_table()
        sh, rg, nr, mn, mx = [], [], [], [], []
        for path in b["item"].to_pylist():
            md = pq.ParquetFile(path).metadata
            try:
                ci = md.schema.to_arrow_schema().get_field_index(column)
            except Exception:
                continue
            for g in range(md.num_row_groups):
                col = md.row_group(g).column(ci)
                st = col.statistics
                sh.append(os.path.basename(path))
                rg.append(g)
                nr.append(md.row_group(g).num_rows)
                mn.append(float(st.min) if st and st.has_min_max else None)
                mx.append(float(st.max) if st and st.has_min_max else None)
        return pa.table(
            {"shard": pa.array(sh, pa.string()),
             "row_group": pa.array(rg, pa.int64()),
             "n_rows": pa.array(nr, pa.int64()),
             "vmin": pa.array(mn, pa.float64()),
             "vmax": pa.array(mx, pa.float64())}
        )

    return rd.from_items(shards).map_batches(footer, batch_format="pyarrow")


def value_percentile_by_type(sf_dir: str, q: float = 0.9) -> rd.Dataset:
    """Grouped EXACT interpolated percentile (percentile_cont per key) —
    (event_type, p90, n_rows): the per-segment SLO percentile. Same ONE
    grouped_runs shuffle as median_price_by_priority, sorted (type,
    value), so both bracketing order statistics of each run are direct
    index gathers; interpolation uses the oracle-shared expression
    lo + (hi - lo) * f with f = (n-1)*q - floor((n-1)*q) (the scalar
    value_percentile's parity argument, applied per run). Bounded group
    count; past that, swap per-group selection for the sketch-bounded
    _exact_two_rank_scan keyed by group."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    events = read_view(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )
    schema = pa.schema(
        [("event_type", pa.string()), ("p90", pa.float64()),
         ("n_rows", pa.int64())]
    )

    def pct_runs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "event_type" not in g.column_names:
            return schema.empty_table()
        et = np.asarray(g["event_type"].to_pylist(), dtype=object)
        v = g["value"].to_numpy(zero_copy_only=False)
        starts = run_starts(et)
        lens = np.diff(np.append(starts, len(et)))
        nf = (lens - 1).astype(np.float64) * q
        i0 = np.floor(nf)
        f = nf - i0
        lo = v[starts + i0.astype(np.int64)]
        hi = v[starts + np.minimum(i0.astype(np.int64) + 1, lens - 1)]
        return pa.table(
            {"event_type": pa.array(et[starts]),
             "p90": pa.array(lo + (hi - lo) * f, pa.float64()),
             "n_rows": pa.array(lens.astype(np.int64))}
        )

    return grouped_runs(
        events, "event_type", pct_runs, sort_cols=["event_type", "value"]
    )


def referential_integrity(sf_dir: str) -> pa.Table:
    """Foreign-key orphan audit — for each FK relation, how many fact rows
    reference a missing parent: (relation, n_orphans). The pre-join data-
    quality gate every warehouse load runs; non-zero rows mean a join
    below will silently drop data.

    lineitem->orders is big-big, so it uses the union-tag pattern: per-
    batch (orderkey, row-count) partials + orders-side sentinel rows enter
    ONE grouped_runs shuffle; a run with no sentinel is an orphan key and
    contributes its row count. lineitem->part/supplier and orders->customer
    probe broadcast sorted key sets map-side (bounded dimensions) and fold
    scalar per-batch counts — no extra shuffle. All four relations stream;
    output is 4 rows."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    p_k, = _dim_arrays(f"{sf_dir}/part.parquet", ["p_partkey"], [np.int64])
    s_k, = _dim_arrays(f"{sf_dir}/supplier.parquet", ["s_suppkey"], [np.int64])
    c_k, = _dim_arrays(f"{sf_dir}/customer.parquet", ["c_custkey"], [np.int64])
    p_s, s_s, c_s = np.sort(p_k), np.sort(s_k), np.sort(c_k)

    cnt_schema = pa.schema([("np_", pa.int64()), ("ns", pa.int64())])

    def li_dim_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "l_partkey" not in b.column_names:
            return cnt_schema.empty_table()
        _, hit_p = _probe(p_s, b["l_partkey"].to_numpy(zero_copy_only=False))
        _, hit_s = _probe(s_s, b["l_suppkey"].to_numpy(zero_copy_only=False))
        return pa.table(
            {"np_": pa.array([int(np.count_nonzero(~hit_p))], pa.int64()),
             "ns": pa.array([int(np.count_nonzero(~hit_s))], pa.int64())}
        )

    li = read_view(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey"],
    )
    orph_part = orph_supp = 0
    for t in ray.get(
        li.select_columns(["l_partkey", "l_suppkey"])
        .map_batches(li_dim_partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if t.num_rows and "np_" in t.column_names:
            orph_part += int(pc.sum(t["np_"]).as_py() or 0)
            orph_supp += int(pc.sum(t["ns"]).as_py() or 0)

    oc_schema = pa.schema([("n", pa.int64())])

    def ord_cust_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "o_custkey" not in b.column_names:
            return oc_schema.empty_table()
        _, hit = _probe(c_s, b["o_custkey"].to_numpy(zero_copy_only=False))
        return pa.table(
            {"n": pa.array([int(np.count_nonzero(~hit))], pa.int64())}
        )

    orph_cust = 0
    for t in ray.get(
        read_view(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
        .map_batches(ord_cust_partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if t.num_rows and "n" in t.column_names:
            orph_cust += int(pc.sum(t["n"]).as_py() or 0)

    # lineitem -> orders: big-big, union-tag single shuffle. cnt = -1 marks
    # the parent side (orders keys are unique, <=1 sentinel per run).
    key_schema = pa.schema([("k", pa.int64()), ("cnt", pa.int64())])

    def li_key_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "l_orderkey" not in b.column_names:
            return key_schema.empty_table()
        ks = b["l_orderkey"].to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(ks, return_counts=True)
        return pa.table(
            {"k": pa.array(vals, pa.int64()),
             "cnt": pa.array(cnts.astype(np.int64), pa.int64())}
        )

    def ord_key_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "o_orderkey" not in b.column_names:
            return key_schema.empty_table()
        keys = b["o_orderkey"]
        return pa.table(
            {"k": keys,
             "cnt": pa.array(np.full(len(keys), -1, dtype=np.int64))}
        )

    tagged = (
        li.select_columns(["l_orderkey"])
        .map_batches(li_key_partial, batch_format="pyarrow")
        .union(
            read_view(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
            .map_batches(ord_key_partial, batch_format="pyarrow")
        )
    )

    orph_schema = pa.schema([("n", pa.int64())])

    def orphan_runs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "k" not in g.column_names:
            return orph_schema.empty_table()
        k = g["k"].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        starts = run_starts(k)
        bounds = np.append(starts, len(k))
        # sentinel (-1) sorts first within a run when sorted by (k, cnt)
        has_parent = cnt[starts] == -1
        sums = np.add.reduceat(cnt, starts)
        # runs with a parent included its -1 in the sum; orphans didn't
        orphan_rows = np.where(has_parent, 0, sums)
        return pa.table(
            {"n": pa.array([int(orphan_rows.sum())], pa.int64())}
        )

    orph_ord = 0
    for t in ray.get(
        grouped_runs(tagged, "k", orphan_runs,
                     sort_cols=["k", "cnt"]).to_arrow_refs()
    ):
        if t.num_rows and "n" in t.column_names:
            orph_ord += int(pc.sum(t["n"]).as_py() or 0)

    rels = ["lineitem->orders", "lineitem->part", "lineitem->supplier",
            "orders->customer"]
    vals = [orph_ord, orph_part, orph_supp, orph_cust]
    order = np.argsort(np.asarray(rels, dtype=object))
    return pa.table(
        {
            "relation": pa.array(
                [rels[i] for i in order], pa.string()),
            "n_orphans": pa.array(
                [int(vals[i]) for i in order], pa.int64()),
        }
    )


def user_day_streaks(sf_dir: str) -> rd.Dataset:
    """Gaps-and-islands: per user, the count of distinct active days and the
    longest run of CONSECUTIVE active days: (user_id, n_active_days,
    longest_streak). The retention staple (login streaks) and the canonical
    gaps-and-islands window shape, rounding out the window family next to
    sessionize (time gaps) and user_value_moving_max (ROWS frames).

    Scale shape: per-batch (user_id, day) distinct shrinks the shuffle to at
    most one row per user-day seen in the batch, then ONE hash-partitioned
    user shuffle; streak detection is a double reduceat over the sorted
    bucket (cross-batch day dedup -> day-diff run boundaries -> per-streak
    lengths -> per-user max/sum), no per-user Python. All-int outputs —
    exact parity with the oracle's day - row_number() island grouping."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    schema = pa.schema(
        [("user_id", pa.int64()), ("n_active_days", pa.int64()),
         ("longest_streak", pa.int64())]
    )

    def day_pairs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.schema(
                [("user_id", pa.int64()), ("day", pa.int64())]
            ).empty_table()
        day = pc.divide(
            b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            86_400_000_000,
        )
        t = pa.table({"user_id": b["user_id"], "day": day})
        return t.group_by(["user_id", "day"]).aggregate([])

    def streak_runs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return schema.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        day = g["day"].to_numpy(zero_copy_only=False)
        # cross-batch (user, day) dedup: sorted, so drop equal neighbours
        keep = np.ones(n, dtype=bool)
        keep[1:] = (uid[1:] != uid[:-1]) | (day[1:] != day[:-1])
        uid, day = uid[keep], day[keep]
        new_streak = np.ones(len(uid), dtype=bool)
        new_streak[1:] = (uid[1:] != uid[:-1]) | (day[1:] - day[:-1] != 1)
        sstart = np.flatnonzero(new_streak)
        slen = np.diff(np.append(sstart, len(uid))).astype(np.int64)
        suser = uid[sstart]
        ustart = run_starts(suser)
        if len(ustart) == 0:
            return schema.empty_table()
        return pa.table(
            {
                "user_id": pa.array(suser[ustart], pa.int64()),
                "n_active_days": pa.array(
                    np.add.reduceat(slen, ustart), pa.int64()),
                "longest_streak": pa.array(
                    np.maximum.reduceat(slen, ustart), pa.int64()),
            }
        )

    ds = read_view(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    pairs = ds.map_batches(day_pairs, batch_format="pyarrow")
    return grouped_runs(
        pairs, "user_id", streak_runs, sort_cols=["user_id", "day"]
    )


def price_slope_by_priority(sf_dir: str) -> pa.Table:
    """EXACT grouped least-squares trend: per order priority, the slope and
    intercept of o_totalprice (cents) regressed on o_orderdate (epoch day):
    (o_orderpriority, n, slope_cents_per_day, intercept_cents). The
    drift-detection primitive — "are rush orders getting more expensive?" —
    and the exact-linear-regression shape next to price_qty_corr's exact
    correlation.

    Scale shape: the five regression moments (n, Σx, Σy, Σxy, Σx²) fold as
    per-batch int64 partials through Arrow hash aggregation (x = epoch day,
    y = integer cents — both exact), then as unbounded Python ints on the
    driver (priority cardinality is bounded); NO shuffle at all. The finish
    is two single divisions of exactly-computed integers — slope =
    (nΣxy-ΣxΣy)/(nΣx²-(Σx)²), intercept via the cleared-denominator form —
    so both engines round the same two rationals to double once (HUGEINT
    arithmetic on the oracle side)."""
    import ray

    part_schema = pa.schema(
        [("prio", pa.string()), ("n", pa.int64()), ("sx", pa.int64()),
         ("sy", pa.int64()), ("sxy", pa.int64()), ("sxx", pa.int64())]
    )

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "o_orderpriority" not in b.column_names:
            return part_schema.empty_table()
        x = (
            b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False) // 86_400_000_000
        )
        y = np.round(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        t = pa.table(
            {"prio": b["o_orderpriority"],
             "x": pa.array(x, pa.int64()), "y": pa.array(y, pa.int64()),
             "xy": pa.array(x * y, pa.int64()),
             "xx": pa.array(x * x, pa.int64())}
        )
        g = t.group_by("prio").aggregate(
            [("x", "count"), ("x", "sum"), ("y", "sum"),
             ("xy", "sum"), ("xx", "sum")]
        )
        return pa.table(
            {"prio": g["prio"], "n": g["x_count"].cast(pa.int64()),
             "sx": g["x_sum"], "sy": g["y_sum"],
             "sxy": g["xy_sum"], "sxx": g["xx_sum"]}
        )

    ds = read_view(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderdate", "o_totalprice"],
    )
    acc: dict[str, list[int]] = {}
    for t in ray.get(
        ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if t.num_rows == 0 or "prio" not in t.column_names:
            continue
        for row in t.to_pylist():  # bounded: |priorities| rows per block
            a = acc.setdefault(row["prio"], [0, 0, 0, 0, 0])
            a[0] += row["n"]; a[1] += row["sx"]; a[2] += row["sy"]
            a[3] += row["sxy"]; a[4] += row["sxx"]
    prios = sorted(acc)
    slopes, intercepts, ns = [], [], []
    for p in prios:
        n, sx, sy, sxy, sxx = (int(v) for v in acc[p])
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        if den == 0:  # degenerate group (single x) — NULL, DuckDB's x/0
            slopes.append(None)
            intercepts.append(None)
        else:
            slopes.append(float(num) / float(den))
            intercepts.append(float(sy * den - num * sx) / float(n * den))
        ns.append(n)
    return pa.table(
        {"o_orderpriority": pa.array(prios, pa.string()),
         "n": pa.array(ns, pa.int64()),
         "slope_cents_per_day": pa.array(slopes, pa.float64()),
         "intercept_cents": pa.array(intercepts, pa.float64())}
    )


def _copurchase_graph_stats(sf_dir: str) -> tuple:
    """Shared engine for ``copurchase_triangles`` / ``copurchase_clustering``
    — returns (n_nodes, n_edges, n_wedges, n_triangles) over the part
    co-purchase graph (parts are adjacent iff some order contains both):
    the graph-density /
    community-structure signal next to trade_graph_pagerank — triangle
    counting is the standard first step of clustering-coefficient and
    cohesion analysis over co-occurrence graphs.
    ``copurchase_clustering`` reuses this run to finish the coefficient.

    Scale shape — the classic degree-oriented edge-iterator, four honest
    shuffles and nothing driver-unbounded:
      1. pair generation: ONE orderkey shuffle; per-run vectorized distinct
         parts -> all a<b pairs by index arithmetic (no Python pair loops);
      2. edge dedup: ONE shuffle on the lower endpoint (pairs sharing `a`
         co-locate; neighbour-compare dedup), emitting per-batch bounded
         degree partials folded driver-side (state O(|parts|); the
         documented swap past broadcast size is a rank join);
      3. wedge generation: edges oriented low-rank -> high-rank by the
         broadcast (degree, id) total order — the orientation that bounds
         out-degree at O(sqrt(|E|)) so Σ C(outdeg,2) stays near-linear even
         with hub parts — then ONE shuffle on src emits out-neighbour pairs;
      4. triangle match: wedges and oriented edges (cnt=-1 sentinels) enter
         the SAME shuffle keyed on the wedge's first endpoint
         (shuffle_join's union-tag trick); a (v,w) run containing its
         sentinel contributes its wedge count. Per-bucket int sums fold
         driver-side.
    Exact int64 output; the oracle is the canonical x<y<z three-way
    self-join, which counts each triangle exactly once as the orientation
    does."""
    import ray
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    def pair_gen(g: pa.Table) -> pa.Table:
        empty = pa.schema([("a", pa.int64()), ("b", pa.int64())])
        if g.num_rows == 0:
            return empty.empty_table()
        ok = g["l_orderkey"].to_numpy(zero_copy_only=False)
        pk = g["l_partkey"].to_numpy(zero_copy_only=False)
        keep = np.ones(len(ok), dtype=bool)  # distinct (order, part)
        keep[1:] = (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])
        ok, pk = ok[keep], pk[keep]
        starts = run_starts(ok)
        sizes = np.diff(np.append(starts, len(ok)))
        ranks = np.arange(len(ok)) - starts.repeat(sizes)
        reps = (sizes.repeat(sizes) - ranks - 1).astype(np.int64)
        total = int(reps.sum())
        if total == 0:
            return empty.empty_table()
        left = np.repeat(np.arange(len(ok)), reps)
        csum = np.concatenate([[0], np.cumsum(reps)[:-1]])
        right = np.arange(total) - csum.repeat(reps) + left + 1
        return pa.table(
            {"a": pa.array(pk[left], pa.int64()),
             "b": pa.array(pk[right], pa.int64())}
        )

    li = read_view(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    pairs = grouped_runs(
        li, "l_orderkey", pair_gen, sort_cols=["l_orderkey", "l_partkey"]
    )

    deg_schema = pa.schema([("node", pa.int64()), ("d", pa.int64())])

    def dedup_edges(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.schema(
                [("a", pa.int64()), ("b", pa.int64())]
            ).empty_table()
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        keep = np.ones(len(a), dtype=bool)
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return pa.table(
            {"a": pa.array(a[keep], pa.int64()),
             "b": pa.array(b[keep], pa.int64())}
        )

    # edge dedup must finish before degrees exist -> pin it once (two
    # consumers: degree partials + oriented-edge emit) instead of letting
    # the lazy DAG re-run the whole pair stage per consumer
    edges = grouped_runs(
        pairs, "a", dedup_edges, sort_cols=["a", "b"]
    ).materialize()

    def degree_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "a" not in b.column_names:
            return deg_schema.empty_table()
        both = pa.concat_arrays(
            [b["a"].combine_chunks(), b["b"].combine_chunks()]
        )
        vc = both.value_counts()
        return pa.table(
            {"node": vc.field("values"),
             "d": vc.field("counts").cast(pa.int64())}
        )

    deg: dict[int, int] = {}
    n_edges = 0
    for t in ray.get(
        edges.map_batches(degree_partial, batch_format="pyarrow")
        .to_arrow_refs()
    ):
        if t.num_rows == 0 or "node" not in t.column_names:
            continue
        nodes = t["node"].to_numpy(zero_copy_only=False)
        ds_ = t["d"].to_numpy(zero_copy_only=False)
        n_edges += int(ds_.sum())
        for nd, dv in zip(nodes.tolist(), ds_.tolist()):
            deg[nd] = deg.get(nd, 0) + dv
    n_edges //= 2
    # total order: (degree, id) ascending -> dense rank per node, shipped
    # as (sorted node ids, rank) arrays for vectorized searchsorted lookup
    order = sorted(deg, key=lambda x: (deg[x], x))
    nodes_sorted = np.array(sorted(deg), dtype=np.int64)
    ranks_arr = np.empty(len(order), dtype=np.int64)
    ranks_arr[np.searchsorted(nodes_sorted, np.array(order, np.int64))] = (
        np.arange(len(order), dtype=np.int64)
    )
    rank_ref = ray.put((nodes_sorted, ranks_arr))

    def orient(b: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("src", pa.int64()), ("dst", pa.int64())]
        )
        if b.num_rows == 0 or "a" not in b.column_names:
            return empty.empty_table()
        ns, ra_ = ray.get(rank_ref)
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        ra = ra_[np.searchsorted(ns, a)]
        rb = ra_[np.searchsorted(ns, bb)]
        lo = ra < rb
        return pa.table(
            {"src": pa.array(np.where(lo, a, bb), pa.int64()),
             "dst": pa.array(np.where(lo, bb, a), pa.int64())}
        )

    oriented = edges.map_batches(orient, batch_format="pyarrow")

    wedge_schema = pa.schema(
        [("v", pa.int64()), ("w", pa.int64()), ("cnt", pa.int64())]
    )

    def wedge_gen(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return wedge_schema.empty_table()
        ns, ra_ = ray.get(rank_ref)
        src = g["src"].to_numpy(zero_copy_only=False)
        dst = g["dst"].to_numpy(zero_copy_only=False)
        rd_ = ra_[np.searchsorted(ns, dst)]
        # per-src out-neighbour list ordered by rank, so emitted (v, w)
        # pairs are rank-ordered and match oriented edges directly
        o = np.lexsort((rd_, src))
        src, dst = src[o], dst[o]
        starts = run_starts(src)
        sizes = np.diff(np.append(starts, len(src)))
        ranks = np.arange(len(src)) - starts.repeat(sizes)
        reps = (sizes.repeat(sizes) - ranks - 1).astype(np.int64)
        total = int(reps.sum())
        if total == 0:
            return wedge_schema.empty_table()
        left = np.repeat(np.arange(len(src)), reps)
        csum = np.concatenate([[0], np.cumsum(reps)[:-1]])
        right = np.arange(total) - csum.repeat(reps) + left + 1
        return pa.table(
            {"v": pa.array(dst[left], pa.int64()),
             "w": pa.array(dst[right], pa.int64()),
             "cnt": pa.array(np.ones(total, np.int64))}
        )

    wedges = grouped_runs(oriented, "src", wedge_gen)

    def edge_sentinels(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "src" not in b.column_names:
            return wedge_schema.empty_table()
        return pa.table(
            {"v": b["src"], "w": b["dst"],
             "cnt": pa.array(np.full(b.num_rows, -1, np.int64))}
        )

    tagged = wedges.union(
        oriented.map_batches(edge_sentinels, batch_format="pyarrow")
    )

    def tri_runs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.schema([("n", pa.int64())]).empty_table()
        v = g["v"].to_numpy(zero_copy_only=False)
        w = g["w"].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        neq = (v[1:] != v[:-1]) | (w[1:] != w[:-1])
        starts = np.concatenate([[0], np.flatnonzero(neq) + 1])
        # sentinel (-1) sorts first within its (v, w) run
        has_edge = cnt[starts] == -1
        sums = np.add.reduceat(cnt, starts)
        tri = np.where(has_edge, sums + 1, 0)  # +1 cancels the sentinel
        return pa.table({"n": pa.array([int(tri.sum())], pa.int64())})

    n_tri = 0
    for t in ray.get(
        grouped_runs(
            tagged, "v", tri_runs, sort_cols=["v", "w", "cnt"]
        ).to_arrow_refs()
    ):
        if t.num_rows and "n" in t.column_names:
            n_tri += int(pc.sum(t["n"]).as_py() or 0)
    # open-wedge denominator for the clustering coefficient, from the
    # already-folded (bounded) degree table — d*(d-1)/2 is exact (even
    # product) and Python ints never overflow
    n_wedges = sum(d * (d - 1) // 2 for d in deg.values())
    return len(deg), n_edges, n_wedges, n_tri


def copurchase_triangles(sf_dir: str) -> pa.Table:
    """Triangle count on the part co-purchase graph: (n_edges,
    n_triangles). See ``_copurchase_graph_stats`` for the distributed
    degree-oriented edge-iterator shape and the scale audit."""
    _, n_edges, _, n_tri = _copurchase_graph_stats(sf_dir)
    return pa.table(
        {"n_edges": pa.array([n_edges], pa.int64()),
         "n_triangles": pa.array([n_tri], pa.int64())}
    )


def copurchase_clustering(sf_dir: str) -> pa.Table:
    """Global clustering coefficient of the part co-purchase graph:
    (n_nodes, n_edges, n_wedges, n_triangles, global_clustering) with
    coefficient = 3·triangles / open wedges (Σ C(deg,2)) — the cohesion
    summary built on the same four-shuffle triangle engine; the wedge
    denominator costs nothing extra (it folds from the bounded degree
    table already needed for orientation). The single double/double
    division is shared with the oracle (HUGEINT numerator there); an
    edgeless graph yields NULL, matching DuckDB x/0."""
    n_nodes, n_edges, n_wedges, n_tri = _copurchase_graph_stats(sf_dir)
    coeff = (
        float(3 * n_tri) / float(n_wedges) if n_wedges else None
    )
    return pa.table(
        {"n_nodes": pa.array([n_nodes], pa.int64()),
         "n_edges": pa.array([n_edges], pa.int64()),
         "n_wedges": pa.array([n_wedges], pa.int64()),
         "n_triangles": pa.array([n_tri], pa.int64()),
         "global_clustering": pa.array([coeff], pa.float64())}
    )


def overlapping_order_spans(sf_dir: str) -> rd.Dataset:
    """Interval self-join by plane sweep: per customer, the number of pairs
    of their orders whose ACTIVITY SPANS overlap: (o_custkey,
    n_overlapping_pairs), customers with no overlap omitted. An order's
    span is [least(order day, first ship day), greatest(order day, last
    ship day)] — well-defined even on this synthetic data where shipments
    can precede the order date. The interval-join family member next to
    asof_join_clicks (point-to-latest) and range_join_price_bands
    (point-in-band): here both sides are intervals, the shape Ray Data has
    no native operator for.

    Scale shape — two honest shuffles, no pair materialization:
      1. span assembly: order rows ride the SAME orderkey shuffle as their
         lineitems (union-tag: is_order=1 carries custkey), per-run
         min/max via reduceat; orphan lineitems and lineitem-less orders
         drop as the oracle's inner join does;
      2. counting: ONE custkey shuffle, then the classic sweep — sort by
         (cust, lo) and for each interval count later-starting intervals
         with lo_j <= hi_i via a start/query event merge: lexsort events
         by (cust, value, kind), cumsum start-events, subtract per-run
         offsets and ranks. Overlap COUNTS, never the O(n²) pair list,
         leave each bucket — a hot customer costs one sort, not a blowup.
    All-int; exact parity with the oracle's interval-predicate self-join."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    row_schema = pa.schema(
        [("k", pa.int64()), ("cust", pa.int64()), ("day", pa.int64()),
         ("is_order", pa.int64())]
    )

    def order_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "o_orderkey" not in b.column_names:
            return row_schema.empty_table()
        day = pc.divide(
            b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()),
            86_400_000_000,
        )
        return pa.table(
            {"k": b["o_orderkey"], "cust": b["o_custkey"], "day": day,
             "is_order": pa.array(np.ones(b.num_rows, np.int64))}
        )

    def line_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "l_orderkey" not in b.column_names:
            return row_schema.empty_table()
        day = pc.divide(
            b["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64()),
            86_400_000_000,
        )
        return pa.table(
            {"k": b["l_orderkey"],
             "cust": pa.array(np.full(b.num_rows, -1, np.int64)),
             "day": day,
             "is_order": pa.array(np.zeros(b.num_rows, np.int64))}
        )

    orders = read_view(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(order_rows, batch_format="pyarrow")
    lines = read_view(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(line_rows, batch_format="pyarrow")

    span_schema = pa.schema(
        [("cust", pa.int64()), ("lo", pa.int64()), ("hi", pa.int64())]
    )

    def span_runs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return span_schema.empty_table()
        k = g["k"].to_numpy(zero_copy_only=False)
        cust = g["cust"].to_numpy(zero_copy_only=False)
        day = g["day"].to_numpy(zero_copy_only=False)
        iso = g["is_order"].to_numpy(zero_copy_only=False)
        starts = run_starts(k)
        bounds = np.append(starts, n)
        sizes = np.diff(bounds)
        n_ord = np.add.reduceat(iso, starts)
        # keep runs with exactly one order row AND >=1 lineitem row
        keep = (n_ord == 1) & (sizes >= 2)
        if not keep.any():
            return span_schema.empty_table()
        lo = np.minimum.reduceat(day, starts)[keep]
        hi = np.maximum.reduceat(day, starts)[keep]
        # the order row's cust is the run max (lineitems carry -1)
        cu = np.maximum.reduceat(cust, starts)[keep]
        return pa.table(
            {"cust": pa.array(cu, pa.int64()),
             "lo": pa.array(lo, pa.int64()),
             "hi": pa.array(hi, pa.int64())}
        )

    spans = grouped_runs(orders.union(lines), "k", span_runs)

    out_schema = pa.schema(
        [("o_custkey", pa.int64()), ("n_overlapping_pairs", pa.int64())]
    )

    def sweep_runs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return out_schema.empty_table()
        cust = g["cust"].to_numpy(zero_copy_only=False)
        lo = g["lo"].to_numpy(zero_copy_only=False)
        hi = g["hi"].to_numpy(zero_copy_only=False)
        # event merge: starts (kind 0, value lo) and queries (kind 1,
        # value hi); within (cust, value) starts come first so ties count
        ev_cust = np.concatenate([cust, cust])
        ev_val = np.concatenate([lo, hi])
        ev_kind = np.concatenate(
            [np.zeros(n, np.int64), np.ones(n, np.int64)]
        )
        ev_iv = np.concatenate([np.arange(n), np.arange(n)])
        o = np.lexsort((ev_kind, ev_val, ev_cust))
        kind_s = ev_kind[o]
        cust_s = ev_cust[o]
        seen = np.cumsum(1 - kind_s)  # starts seen so far, inclusive
        rstart = run_starts(cust_s)
        # starts seen before this customer's first event
        prior = (seen - (1 - kind_s))[rstart]
        offs = np.repeat(prior, np.diff(np.append(rstart, len(cust_s))))
        cnt_le = seen - offs  # same-cust starts with lo <= this value
        q = kind_s == 1
        per_iv = np.zeros(n, np.int64)
        per_iv[ev_iv[o][q]] = cnt_le[q]
        # rank of each interval within its (cust, lo) sort order
        ord_iv = np.lexsort((lo, cust))
        ranks = np.empty(n, np.int64)
        istart = run_starts(cust[ord_iv])
        isz = np.diff(np.append(istart, n))
        ranks[ord_iv] = np.arange(n) - istart.repeat(isz)
        pairs = per_iv - ranks - 1
        # ties on lo: a query hi_i counts ALL starts with lo <= hi_i,
        # including later-ranked equal-lo intervals — exactly the j>i,
        # lo_j <= hi_i sweep set once ranks are subtracted
        tot = np.add.reduceat(pairs[ord_iv], istart)
        cu = cust[ord_iv][istart]
        m = tot > 0
        return pa.table(
            {"o_custkey": pa.array(cu[m], pa.int64()),
             "n_overlapping_pairs": pa.array(tot[m], pa.int64())}
        )

    return grouped_runs(spans, "cust", sweep_runs, sort_cols=["cust", "lo"])


def rolling_7d_dau(sf_dir: str) -> pa.Table:
    """EXACT rolling 7-day distinct active users per day: (day, dau_7d) for
    every day in the corpus' [min, max] span, zeros included. Distinct
    counts do NOT partial-sum (unlike revenue_rolling_7d's money), so the
    exact distributed shape is the WINDOW EXPLODE: each distinct
    (user, day) activity expands to its ≤7 covering window days, ONE
    user-keyed shuffle dedups (user, wday) — a user active on overlapping
    days would otherwise double-count — and per-batch bounded (wday, n)
    partials fold driver-side (state = the day span, bounded). The
    documented approximate swap at extreme spans is one HLL sketch per
    window day (approx_distinct_users' machinery).

    All-int; oracle = generate_series LEFT JOIN the exploded distinct set."""
    import ray
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    def day_pairs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.schema(
                [("user_id", pa.int64()), ("day", pa.int64())]
            ).empty_table()
        day = pc.divide(
            b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            86_400_000_000,
        )
        t = pa.table({"user_id": b["user_id"], "day": day})
        return t.group_by(["user_id", "day"]).aggregate([])

    ds = read_view(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    pairs = ds.map_batches(day_pairs, batch_format="pyarrow").materialize()

    # global day bounds from per-batch scalar partials
    lo_hi: list[int] = []
    for t in ray.get(
        pairs.map_batches(
            lambda b: pa.table(
                {"lo": pa.array(
                    [pc.min(b["day"]).as_py()], pa.int64()),
                 "hi": pa.array(
                    [pc.max(b["day"]).as_py()], pa.int64())}
            )
            if b.num_rows and "day" in b.column_names
            else pa.schema(
                [("lo", pa.int64()), ("hi", pa.int64())]
            ).empty_table(),
            batch_format="pyarrow",
        ).to_arrow_refs()
    ):
        if t.num_rows and "lo" in t.column_names:
            lo_hi.append(
                (pc.min(t["lo"]).as_py(), pc.max(t["hi"]).as_py())
            )
    out_schema = pa.schema([("day", pa.int64()), ("dau_7d", pa.int64())])
    if not lo_hi:
        return out_schema.empty_table()
    lo_day = min(a for a, _ in lo_hi)
    hi_day = max(b for _, b in lo_hi)

    def explode(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "day" not in b.column_names:
            return pa.schema(
                [("user_id", pa.int64()), ("wday", pa.int64())]
            ).empty_table()
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        day = b["day"].to_numpy(zero_copy_only=False)
        wday = (day[:, None] + np.arange(7)[None, :]).ravel()
        uid7 = np.repeat(uid, 7)
        keep = wday <= hi_day
        return pa.table(
            {"user_id": pa.array(uid7[keep], pa.int64()),
             "wday": pa.array(wday[keep], pa.int64())}
        )

    exploded = pairs.map_batches(explode, batch_format="pyarrow")

    def count_runs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return pa.schema(
                [("wday", pa.int64()), ("n", pa.int64())]
            ).empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        wd = g["wday"].to_numpy(zero_copy_only=False)
        keep = np.ones(n, dtype=bool)
        keep[1:] = (uid[1:] != uid[:-1]) | (wd[1:] != wd[:-1])
        wd = wd[keep]
        vals, counts = np.unique(wd, return_counts=True)
        return pa.table(
            {"wday": pa.array(vals, pa.int64()),
             "n": pa.array(counts.astype(np.int64), pa.int64())}
        )

    dau = np.zeros(hi_day - lo_day + 1, dtype=np.int64)
    for t in ray.get(
        grouped_runs(
            exploded, "user_id", count_runs, sort_cols=["user_id", "wday"]
        ).to_arrow_refs()
    ):
        if t.num_rows == 0 or "wday" not in t.column_names:
            continue
        wd = t["wday"].to_numpy(zero_copy_only=False)
        nn = t["n"].to_numpy(zero_copy_only=False)
        np.add.at(dau, wd - lo_day, nn)
    days = np.arange(lo_day, hi_day + 1, dtype=np.int64)
    return pa.table(
        {"day": pa.array(days, pa.int64()),
         "dau_7d": pa.array(dau, pa.int64())}
    )


def association_rules(sf_dir: str, min_pair: int = 2) -> pa.Table:
    """Market-basket association rules over co-purchased parts: for every
    part pair bought together in >= ``min_pair`` orders, both directed
    rules (antecedent, consequent, n_pair, n_ant, support, confidence)
    with support = n_pair/n_orders and confidence = n_pair/n_antecedent —
    the recommender/data-mining precursor built from exact counts, next to
    co_event_pairs (co-occurrence only, no rule strengths).

    Scale shape: ONE orderkey shuffle computes everything the rules need —
    the kernel dedups (order, part), emits bucket-preaggregated pair
    counts (kind 0), per-part distinct-order partials (kind 1, bounded by
    |parts|) and a runs-per-bucket row (kind 2) from the same pass — then
    ONE pair-keyed shuffle merges pair counts. Only rules at/above the
    support floor reach the driver (a report-sized table by construction);
    the two ratios are single divisions of exact ints on both sides."""
    import ray
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    tag_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("n", pa.int64()),
         ("kind", pa.int64())]
    )

    def order_kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return tag_schema.empty_table()
        ok = g["l_orderkey"].to_numpy(zero_copy_only=False)
        pk = g["l_partkey"].to_numpy(zero_copy_only=False)
        keep = np.ones(len(ok), dtype=bool)  # distinct (order, part)
        keep[1:] = (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])
        ok, pk = ok[keep], pk[keep]
        starts = run_starts(ok)
        sizes = np.diff(np.append(starts, len(ok)))
        ranks = np.arange(len(ok)) - starts.repeat(sizes)
        reps = (sizes.repeat(sizes) - ranks - 1).astype(np.int64)
        total = int(reps.sum())
        cols = {"a": [], "b": [], "n": [], "kind": []}
        if total:
            left = np.repeat(np.arange(len(ok)), reps)
            csum = np.concatenate([[0], np.cumsum(reps)[:-1]])
            right = np.arange(total) - csum.repeat(reps) + left + 1
            pa_, pb_ = pk[left], pk[right]
            # bucket-level pre-aggregation before the pair shuffle
            o = np.lexsort((pb_, pa_))
            pa_, pb_ = pa_[o], pb_[o]
            neq = (pa_[1:] != pa_[:-1]) | (pb_[1:] != pb_[:-1])
            ps = np.concatenate([[0], np.flatnonzero(neq) + 1])
            cnt = np.diff(np.append(ps, total)).astype(np.int64)
            cols["a"].append(pa_[ps])
            cols["b"].append(pb_[ps])
            cols["n"].append(cnt)
            cols["kind"].append(np.zeros(len(ps), np.int64))
        # per-part distinct-order counts (each (o, p) already distinct)
        vals, counts = np.unique(pk, return_counts=True)
        cols["a"].append(vals)
        cols["b"].append(np.full(len(vals), -1, np.int64))
        cols["n"].append(counts.astype(np.int64))
        cols["kind"].append(np.ones(len(vals), np.int64))
        # order count for the support denominator
        cols["a"].append(np.array([-1], np.int64))
        cols["b"].append(np.array([-1], np.int64))
        cols["n"].append(np.array([len(starts)], np.int64))
        cols["kind"].append(np.array([2], np.int64))
        return pa.table(
            {k: pa.array(np.concatenate(v), pa.int64())
             for k, v in cols.items()}
        )

    li = read_view(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    tagged = grouped_runs(
        li, "l_orderkey", order_kernel,
        sort_cols=["l_orderkey", "l_partkey"],
    ).materialize()

    n_part: dict[int, int] = {}
    n_orders = 0
    for t in ray.get(
        tagged.map_batches(
            lambda b: b.filter(pc.not_equal(b["kind"], 0))
            if b.num_rows and "kind" in b.column_names else b,
            batch_format="pyarrow",
        ).to_arrow_refs()
    ):
        if t.num_rows == 0 or "kind" not in t.column_names:
            continue
        kind = t["kind"].to_numpy(zero_copy_only=False)
        av = t["a"].to_numpy(zero_copy_only=False)
        nv = t["n"].to_numpy(zero_copy_only=False)
        singles = kind == 1
        for p, c in zip(av[singles].tolist(), nv[singles].tolist()):
            n_part[p] = n_part.get(p, 0) + c
        n_orders += int(nv[kind == 2].sum())

    def pair_merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.schema(
                [("a", pa.int64()), ("b", pa.int64()), ("nab", pa.int64())]
            ).empty_table()
        av = g["a"].to_numpy(zero_copy_only=False)
        bv = g["b"].to_numpy(zero_copy_only=False)
        nv = g["n"].to_numpy(zero_copy_only=False)
        neq = (av[1:] != av[:-1]) | (bv[1:] != bv[:-1])
        ps = np.concatenate([[0], np.flatnonzero(neq) + 1])
        tot = np.add.reduceat(nv, ps)
        m = tot >= min_pair
        return pa.table(
            {"a": pa.array(av[ps][m], pa.int64()),
             "b": pa.array(bv[ps][m], pa.int64()),
             "nab": pa.array(tot[m], pa.int64())}
        )

    pair_rows = tagged.map_batches(
        lambda b: b.filter(pc.equal(b["kind"], 0))
        if b.num_rows and "kind" in b.column_names else b,
        batch_format="pyarrow",
    )
    merged = grouped_runs(
        pair_rows, "a", pair_merge, sort_cols=["a", "b"]
    )

    out_schema = pa.schema(
        [("antecedent", pa.int64()), ("consequent", pa.int64()),
         ("n_pair", pa.int64()), ("n_ant", pa.int64()),
         ("support", pa.float64()), ("confidence", pa.float64())]
    )
    ants, cons, npair, nant = [], [], [], []
    for t in ray.get(merged.to_arrow_refs()):
        if t.num_rows == 0 or "a" not in t.column_names:
            continue
        for a_, b_, nab in zip(
            t["a"].to_pylist(), t["b"].to_pylist(), t["nab"].to_pylist()
        ):
            ants += [a_, b_]
            cons += [b_, a_]
            npair += [nab, nab]
            nant += [n_part[a_], n_part[b_]]
    if not ants:
        return out_schema.empty_table()
    order = np.lexsort((np.asarray(cons), np.asarray(ants)))
    ants = np.asarray(ants, np.int64)[order]
    cons = np.asarray(cons, np.int64)[order]
    npair = np.asarray(npair, np.int64)[order]
    nant = np.asarray(nant, np.int64)[order]
    return pa.table(
        {"antecedent": pa.array(ants, pa.int64()),
         "consequent": pa.array(cons, pa.int64()),
         "n_pair": pa.array(npair, pa.int64()),
         "n_ant": pa.array(nant, pa.int64()),
         "support": pa.array(
             [n / n_orders for n in npair.tolist()], pa.float64()),
         "confidence": pa.array(
             [p / q for p, q in zip(npair.tolist(), nant.tolist())],
             pa.float64())}
    )
