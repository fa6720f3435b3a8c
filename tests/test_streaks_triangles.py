"""user_day_streaks (gaps-and-islands), price_slope_by_priority (exact
grouped least squares) and copurchase_triangles (degree-oriented triangle
count): planted fixtures with hand-computable answers plus empty inputs."""

import os

import numpy as np
import pandas as pd
import pytest


DAY_US = 86_400_000_000


def _write_events_days(d: str, user_days: dict[int, list[int]]) -> None:
    rows_u, rows_d = [], []
    for u, days in user_days.items():
        for day in days:
            rows_u.append(u)
            rows_d.append(day)
    n = len(rows_u)
    pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(
                np.asarray(rows_d, dtype=np.int64) * DAY_US + 1234, unit="us"
            ),
            "user_id": np.asarray(rows_u, dtype=np.int64),
            "event_type": ["a"] * n,
            "value": np.zeros(n),
            "props": ["{}"] * n,
        }
    ).to_parquet(os.path.join(d, "events.parquet"))


def test_streaks_planted(tmp_path):
    from dedup_ray.pipelines.relational import user_day_streaks

    # user 1: 1,2,3,7,8 -> longest 3, active 5 (day 2 duplicated in input)
    # user 2: single day -> 1/1; user 3: all gaps -> longest 1, active 3
    _write_events_days(
        str(tmp_path),
        {1: [1, 2, 2, 3, 7, 8], 2: [5], 3: [10, 20, 30]},
    )
    out = (
        user_day_streaks(str(tmp_path))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert out["user_id"].tolist() == [1, 2, 3]
    assert out["n_active_days"].tolist() == [5, 1, 3]
    assert out["longest_streak"].tolist() == [3, 1, 1]


def test_streaks_empty(tmp_path):
    from dedup_ray.pipelines.relational import user_day_streaks

    _write_events_days(str(tmp_path), {})
    assert user_day_streaks(str(tmp_path)).count() == 0


def _write_orders(d: str, prio: list[str], days: list[int],
                  price: list[float]) -> None:
    n = len(prio)
    pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_custkey": np.zeros(n, dtype=np.int64),
            "o_orderstatus": ["O"] * n,
            "o_totalprice": np.asarray(price, dtype=np.float64),
            "o_orderdate": pd.to_datetime(
                np.asarray(days, dtype=np.int64) * DAY_US, unit="us"
            ),
            "o_orderpriority": prio,
        }
    ).to_parquet(os.path.join(d, "orders.parquet"))


def test_slope_matches_polyfit(tmp_path):
    from dedup_ray.pipelines.relational import price_slope_by_priority

    rng = np.random.default_rng(7)
    days = rng.integers(0, 1000, size=400).tolist()
    price = np.round(
        rng.uniform(10, 5000, size=400), 2
    ).tolist()
    _write_orders(str(tmp_path), ["1-URGENT"] * 400, days, price)
    out = price_slope_by_priority(str(tmp_path)).to_pandas()
    assert out["n"].tolist() == [400]
    x = np.asarray(days, dtype=np.float64)
    y = np.round(np.asarray(price) * 100)
    slope, intercept = np.polyfit(x, y, 1)
    assert out["slope_cents_per_day"].iloc[0] == pytest.approx(slope)
    assert out["intercept_cents"].iloc[0] == pytest.approx(intercept)


def test_slope_exact_two_points(tmp_path):
    from dedup_ray.pipelines.relational import price_slope_by_priority

    # two points -> slope exactly (y2-y1)/(x2-x1) cents/day
    _write_orders(
        str(tmp_path), ["A", "A", "B"], [0, 10, 3], [1.00, 21.00, 5.0]
    )
    out = (
        price_slope_by_priority(str(tmp_path))
        .to_pandas()
        .set_index("o_orderpriority")
    )
    assert out.loc["A", "slope_cents_per_day"] == 200.0
    assert out.loc["A", "intercept_cents"] == 100.0


def _write_lineitem(d: str, orders: list[int], parts: list[int]) -> None:
    n = len(orders)
    pd.DataFrame(
        {
            "l_orderkey": np.asarray(orders, dtype=np.int64),
            "l_partkey": np.asarray(parts, dtype=np.int64),
            "l_suppkey": np.zeros(n, dtype=np.int64),
            "l_linenumber": np.arange(n, dtype=np.int32),
            "l_quantity": np.ones(n),
            "l_extendedprice": np.ones(n),
            "l_discount": np.zeros(n),
            "l_tax": np.zeros(n),
            "l_returnflag": ["N"] * n,
            "l_linestatus": ["O"] * n,
            "l_shipdate": pd.to_datetime([0] * n, unit="s"),
        }
    ).to_parquet(os.path.join(d, "lineitem.parquet"))


def test_triangles_planted(tmp_path):
    from dedup_ray.pipelines.relational import copurchase_triangles

    # order 1 = {1,2,3} -> triangle (1,2,3); order 2 = {3,4} adds an edge;
    # order 3 = {1,2} duplicates an existing edge (dedup); order 4 = {2,3,4}
    # -> triangle (2,3,4) and closes NO new triangle with part 1.
    # edges: 12 13 23 34 24 -> triangles: 123, 234 = 2; n_edges = 5
    _write_lineitem(
        str(tmp_path),
        [1, 1, 1, 2, 2, 3, 3, 4, 4, 4],
        [1, 2, 3, 3, 4, 1, 2, 2, 3, 4],
    )
    out = copurchase_triangles(str(tmp_path)).to_pydict()
    assert out["n_edges"] == [5]
    assert out["n_triangles"] == [2]


def test_triangles_hub_and_empty(tmp_path):
    from dedup_ray.pipelines.relational import copurchase_triangles

    # star around part 0 (orders of size 2) -> many edges, zero triangles
    orders, parts = [], []
    for i in range(1, 30):
        orders += [i, i]
        parts += [0, i]
    _write_lineitem(str(tmp_path), orders, parts)
    out = copurchase_triangles(str(tmp_path)).to_pydict()
    assert out["n_edges"] == [29]
    assert out["n_triangles"] == [0]

    empty = os.path.join(str(tmp_path), "e")
    os.makedirs(empty)
    _write_lineitem(empty, [], [])
    out = copurchase_triangles(empty).to_pydict()
    assert out["n_edges"] == [0]
    assert out["n_triangles"] == [0]


def test_clustering_coefficient_triangle_plus_tail(tmp_path):
    from dedup_ray.pipelines.relational import copurchase_clustering

    # triangle {1,2,3} + pendant 3-4: deg = 2,2,3,1 -> wedges 1+1+3+0 = 5,
    # triangles 1 -> coefficient 3/5
    _write_lineitem(
        str(tmp_path), [1, 1, 1, 2, 2], [1, 2, 3, 3, 4]
    )
    out = copurchase_clustering(str(tmp_path)).to_pydict()
    assert out["n_nodes"] == [4]
    assert out["n_edges"] == [4]
    assert out["n_wedges"] == [5]
    assert out["n_triangles"] == [1]
    assert out["global_clustering"][0] == pytest.approx(0.6)


def _write_orders_lines_spans(d: str, spans: dict[int, list[tuple]]) -> None:
    """spans: cust -> [(orderday, [shipdays...]), ...]"""
    ok, oc, od, lk, ld = [], [], [], [], []
    key = 0
    for cust, orders in spans.items():
        for oday, ships in orders:
            key += 1
            ok.append(key)
            oc.append(cust)
            od.append(oday)
            for s in ships:
                lk.append(key)
                ld.append(s)
    pd.DataFrame(
        {
            "o_orderkey": np.asarray(ok, dtype=np.int64),
            "o_custkey": np.asarray(oc, dtype=np.int64),
            "o_orderstatus": ["O"] * len(ok),
            "o_totalprice": np.ones(len(ok)),
            "o_orderdate": pd.to_datetime(
                np.asarray(od, dtype=np.int64) * DAY_US, unit="us"
            ),
            "o_orderpriority": ["1"] * len(ok),
        }
    ).to_parquet(os.path.join(d, "orders.parquet"))
    n = len(lk)
    pd.DataFrame(
        {
            "l_orderkey": np.asarray(lk, dtype=np.int64),
            "l_partkey": np.ones(n, dtype=np.int64),
            "l_suppkey": np.zeros(n, dtype=np.int64),
            "l_linenumber": np.arange(n, dtype=np.int32),
            "l_quantity": np.ones(n),
            "l_extendedprice": np.ones(n),
            "l_discount": np.zeros(n),
            "l_tax": np.zeros(n),
            "l_returnflag": ["N"] * n,
            "l_linestatus": ["O"] * n,
            "l_shipdate": pd.to_datetime(
                np.asarray(ld, dtype=np.int64) * DAY_US, unit="us"
            ),
        }
    ).to_parquet(os.path.join(d, "lineitem.parquet"))


def test_overlapping_spans_planted(tmp_path):
    from dedup_ray.pipelines.relational import overlapping_order_spans

    # cust 1: spans [0,10], [5,7], [10,30] -> pairs ([0,10],[5,7]) and the
    #         boundary TIE ([0,10],[10,30]); [5,7] vs [10,30] disjoint -> 2
    # cust 2: [0,5] and a DEGENERATE order (ship day 2 before order day 8
    #         -> span [2,8]) -> overlap; [9,9] touches neither
    #         ([2,8] vs [9,9]: 9 > 8) -> 1 pair
    # cust 3: lineitem-less order is EXCLUDED (inner join): only 1 span
    #         left -> no row
    _write_orders_lines_spans(
        str(tmp_path),
        {
            1: [(0, [10, 3]), (5, [7]), (10, [30])],
            2: [(0, [5]), (8, [2]), (9, [9])],
            3: [(1, []), (2, [3])],
        },
    )
    out = (
        overlapping_order_spans(str(tmp_path))
        .to_pandas()
        .sort_values("o_custkey")
        .reset_index(drop=True)
    )
    assert out["o_custkey"].tolist() == [1, 2]
    assert out["n_overlapping_pairs"].tolist() == [2, 1]


def test_rolling_7d_dau_planted(tmp_path):
    from dedup_ray.pipelines.relational import rolling_7d_dau

    # user 1 active days 0 and 3 (covers wdays 0-6 and 3-9, deduped);
    # user 2 active day 8. span = [0, 8] (wdays past max day clipped)
    _write_events_days(str(tmp_path), {1: [0, 3, 3], 2: [8]})
    out = rolling_7d_dau(str(tmp_path)).to_pydict()
    assert out["day"] == list(range(0, 9))
    #       day:      0  1  2  3  4  5  6  7  8
    # user1 windows:  x  x  x  x  x  x  x  x  x   (0-6 U 3-9, clipped at 8)
    # user2 windows:                          x
    assert out["dau_7d"] == [1, 1, 1, 1, 1, 1, 1, 1, 2]


def test_rolling_7d_dau_empty(tmp_path):
    from dedup_ray.pipelines.relational import rolling_7d_dau

    _write_events_days(str(tmp_path), {})
    assert rolling_7d_dau(str(tmp_path)).num_rows == 0
