"""Schema-stable empty-input behavior for the session-8 TPC-H operators
(Q6/Q19/Q8/Q9/Q21 shapes — same failure class as VERDICT round-1
what's-wrong #1: Ray drops the schema of all-empty-block datasets and
zero-row blocks bypass UDFs)."""

import os

import pandas as pd
import pytest


@pytest.fixture()
def empty_sf8(tmp_path):
    d = str(tmp_path)
    pd.DataFrame(
        {
            "l_orderkey": pd.Series([], dtype="int64"),
            "l_partkey": pd.Series([], dtype="int64"),
            "l_suppkey": pd.Series([], dtype="int64"),
            "l_quantity": pd.Series([], dtype="float64"),
            "l_extendedprice": pd.Series([], dtype="float64"),
            "l_discount": pd.Series([], dtype="float64"),
            "l_returnflag": pd.Series([], dtype="object"),
            "l_shipdate": pd.Series([], dtype="datetime64[us]"),
        }
    ).to_parquet(os.path.join(d, "lineitem.parquet"))
    pd.DataFrame(
        {
            "o_orderkey": pd.Series([], dtype="int64"),
            "o_custkey": pd.Series([], dtype="int64"),
            "o_orderstatus": pd.Series([], dtype="object"),
            "o_orderdate": pd.Series([], dtype="datetime64[us]"),
        }
    ).to_parquet(os.path.join(d, "orders.parquet"))
    pd.DataFrame(
        {
            "p_partkey": pd.Series([], dtype="int64"),
            "p_name": pd.Series([], dtype="object"),
            "p_brand": pd.Series([], dtype="object"),
            "p_size": pd.Series([], dtype="int64"),
            "p_retailprice": pd.Series([], dtype="float64"),
        }
    ).to_parquet(os.path.join(d, "part.parquet"))
    pd.DataFrame(
        {
            "s_suppkey": pd.Series([], dtype="int64"),
            "s_name": pd.Series([], dtype="object"),
            "s_nationkey": pd.Series([], dtype="int64"),
        }
    ).to_parquet(os.path.join(d, "supplier.parquet"))
    pd.DataFrame(
        {
            "c_custkey": pd.Series([], dtype="int64"),
            "c_nationkey": pd.Series([], dtype="int64"),
        }
    ).to_parquet(os.path.join(d, "customer.parquet"))
    pd.DataFrame(
        {
            "n_nationkey": pd.Series([], dtype="int64"),
            "n_name": pd.Series([], dtype="object"),
            "n_regionkey": pd.Series([], dtype="int64"),
        }
    ).to_parquet(os.path.join(d, "nation.parquet"))
    pd.DataFrame(
        {
            "r_regionkey": pd.Series([], dtype="int64"),
            "r_name": pd.Series([], dtype="object"),
        }
    ).to_parquet(os.path.join(d, "region.parquet"))
    return d


def test_scan_scalars_empty(empty_sf8, ray_session):
    from dedup_ray.pipelines.relational import brand_qty_revenue, forecast_revenue

    t = forecast_revenue(empty_sf8)
    assert t.num_rows == 1 and t.column_names == ["revenue", "n_items"]
    assert t["n_items"][0].as_py() == 0 and t["revenue"][0].as_py() == 0.0
    t = brand_qty_revenue(empty_sf8)
    assert t.num_rows == 1 and t.column_names == ["revenue", "n_items"]
    assert t["n_items"][0].as_py() == 0


def test_join_shapes_empty(empty_sf8, ray_session):
    from dedup_ray.pipelines.relational import (
        market_share,
        product_profit,
        sole_blame_suppliers,
    )

    t = market_share(empty_sf8)
    assert t.num_rows == 0
    assert t.column_names == [
        "year", "nation_revenue", "total_revenue", "mkt_share"
    ]
    t = product_profit(empty_sf8)
    assert t.num_rows == 0 and t.column_names == ["nation", "year", "profit"]
    t = sole_blame_suppliers(empty_sf8)
    assert t.num_rows == 0 and t.column_names == ["s_name", "numwait"]
