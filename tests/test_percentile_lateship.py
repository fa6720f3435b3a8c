"""value_percentile (exact interpolated percentile) and
late_ship_priorities (Q4-shape EXISTS collapse): numpy-reference replay,
planted lateness, and empty-input behavior."""

import os

import numpy as np
import pandas as pd
import pytest


def _write_events(d: str, values: np.ndarray) -> None:
    n = len(values)
    pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(np.arange(n), unit="s"),
            "user_id": np.zeros(n, dtype=np.int64),
            "event_type": ["a"] * n,
            "value": values.astype("float64"),
            "props": ["{}"] * n,
        }
    ).to_parquet(os.path.join(d, "events.parquet"))


@pytest.mark.parametrize("q", [0.5, 0.9, 0.99])
def test_value_percentile_matches_numpy_linear(tmp_path, q):
    from dedup_ray.pipelines.relational import value_percentile

    rng = np.random.default_rng(11)
    vals = rng.exponential(scale=40.0, size=3001)
    _write_events(str(tmp_path), vals)
    out = value_percentile(str(tmp_path), q=q).to_pandas()
    assert out["n_rows"].iloc[0] == len(vals)
    # numpy 'linear' interpolation == percentile_cont semantics
    expect = np.quantile(vals, q, method="linear")
    assert out["pct"].iloc[0] == pytest.approx(expect, rel=0, abs=1e-9)


def test_value_percentile_exact_rank_boundary(tmp_path):
    from dedup_ray.pipelines.relational import value_percentile

    # (n-1)*q integral -> f == 0, result must be EXACTLY the order stat
    vals = np.arange(11, dtype=np.float64) * 3.5
    _write_events(str(tmp_path), vals)
    out = value_percentile(str(tmp_path), q=0.9).to_pandas()
    assert out["pct"].iloc[0] == vals[9]


def test_value_percentile_empty(tmp_path):
    from dedup_ray.pipelines.relational import value_percentile

    _write_events(str(tmp_path), np.array([], dtype="float64"))
    out = value_percentile(str(tmp_path)).to_pandas()
    assert len(out) == 0
    assert list(out.columns) == ["pct", "n_rows"]


def _write_orders_lineitem(d: str, orders: pd.DataFrame, lines: pd.DataFrame):
    orders.to_parquet(os.path.join(d, "orders.parquet"))
    lines.to_parquet(os.path.join(d, "lineitem.parquet"))


def test_late_ship_priorities_planted(tmp_path):
    from dedup_ray.pipelines.relational import late_ship_priorities

    base = pd.Timestamp("1995-01-01")
    orders = pd.DataFrame(
        {
            "o_orderkey": np.array([1, 2, 3], dtype=np.int64),
            "o_custkey": np.zeros(3, dtype=np.int64),
            "o_orderstatus": ["O"] * 3,
            "o_totalprice": np.ones(3),
            "o_orderdate": [base] * 3,
            "o_orderpriority": ["1-URGENT", "1-URGENT", "2-HIGH"],
        }
    )
    lines = pd.DataFrame(
        {
            "l_orderkey": np.array([1, 1, 2, 3], dtype=np.int64),
            "l_partkey": np.zeros(4, dtype=np.int64),
            "l_suppkey": np.zeros(4, dtype=np.int64),
            "l_quantity": np.ones(4),
            "l_extendedprice": np.ones(4),
            "l_shipdate": [
                base + pd.Timedelta(days=10),   # order 1: one early line...
                base + pd.Timedelta(days=61),   # ...and one late -> counts once
                base + pd.Timedelta(days=60),   # order 2: exactly 60d -> late (>=)
                base + pd.Timedelta(days=59),   # order 3: never late
            ],
        }
    )
    _write_orders_lineitem(str(tmp_path), orders, lines)
    out = late_ship_priorities(str(tmp_path), grace_days=60).to_pandas()
    got = dict(zip(out["o_orderpriority"], out["order_count"]))
    assert got == {"1-URGENT": 2}


def test_late_ship_priorities_empty(tmp_path):
    from dedup_ray.pipelines.relational import late_ship_priorities

    _write_orders_lineitem(
        str(tmp_path),
        pd.DataFrame(
            {
                "o_orderkey": pd.Series([], dtype="int64"),
                "o_custkey": pd.Series([], dtype="int64"),
                "o_orderstatus": pd.Series([], dtype="object"),
                "o_totalprice": pd.Series([], dtype="float64"),
                "o_orderdate": pd.Series([], dtype="datetime64[us]"),
                "o_orderpriority": pd.Series([], dtype="object"),
            }
        ),
        pd.DataFrame(
            {
                "l_orderkey": pd.Series([], dtype="int64"),
                "l_partkey": pd.Series([], dtype="int64"),
                "l_suppkey": pd.Series([], dtype="int64"),
                "l_quantity": pd.Series([], dtype="float64"),
                "l_extendedprice": pd.Series([], dtype="float64"),
                "l_shipdate": pd.Series([], dtype="datetime64[us]"),
            }
        ),
    )
    assert late_ship_priorities(str(tmp_path)).count() == 0


def test_zone_map_stats_multiple_row_groups(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dedup_ray.pipelines.relational import zone_map_stats

    n = 1000
    t = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "value": pa.array([float(i) for i in range(n)], pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"), row_group_size=250)
    out = zone_map_stats(str(tmp_path)).to_pandas()
    assert len(out) == 4
    assert out["n_rows"].sum() == n
    # sorted layout -> disjoint zone maps, fully prunable
    out = out.sort_values("row_group").reset_index(drop=True)
    assert out["vmin"].tolist() == [0.0, 250.0, 500.0, 750.0]
    assert out["vmax"].tolist() == [249.0, 499.0, 749.0, 999.0]


def test_value_percentile_by_type_numpy_replay(tmp_path):
    from dedup_ray.pipelines.relational import value_percentile_by_type

    rng = np.random.default_rng(5)
    n = 900
    types = rng.choice(["a", "b", "c"], size=n)
    vals = rng.normal(size=n) * 10
    pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(np.arange(n), unit="s"),
            "user_id": np.zeros(n, dtype=np.int64),
            "event_type": types,
            "value": vals,
            "props": ["{}"] * n,
        }
    ).to_parquet(os.path.join(str(tmp_path), "events.parquet"))
    out = value_percentile_by_type(str(tmp_path), q=0.9).to_pandas()
    got = dict(zip(out["event_type"], out["p90"]))
    for t in "abc":
        expect = np.quantile(vals[types == t], 0.9, method="linear")
        assert got[t] == pytest.approx(expect, abs=1e-9)
    assert out["n_rows"].sum() == n


def test_referential_integrity_planted_orphans(tmp_path):
    from dedup_ray.pipelines.relational import referential_integrity

    d = str(tmp_path)
    pd.DataFrame({"p_partkey": np.array([1, 2], dtype=np.int64)}).to_parquet(
        os.path.join(d, "part.parquet"))
    pd.DataFrame({"s_suppkey": np.array([10], dtype=np.int64)}).to_parquet(
        os.path.join(d, "supplier.parquet"))
    pd.DataFrame({"c_custkey": np.array([100], dtype=np.int64)}).to_parquet(
        os.path.join(d, "customer.parquet"))
    pd.DataFrame(
        {"o_orderkey": np.array([1000, 1001], dtype=np.int64),
         "o_custkey": np.array([100, 999], dtype=np.int64)}  # 1 orphan cust
    ).to_parquet(os.path.join(d, "orders.parquet"))
    pd.DataFrame(
        {
            # 2 rows pointing at missing order 1002; 1 missing part 3;
            # 2 missing supplier 11
            "l_orderkey": np.array([1000, 1002, 1002, 1001], dtype=np.int64),
            "l_partkey": np.array([1, 2, 3, 1], dtype=np.int64),
            "l_suppkey": np.array([10, 11, 11, 10], dtype=np.int64),
        }
    ).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = referential_integrity(d).to_pandas()
    got = dict(zip(out["relation"], out["n_orphans"]))
    assert got == {
        "lineitem->orders": 2,
        "lineitem->part": 1,
        "lineitem->supplier": 2,
        "orders->customer": 1,
    }
