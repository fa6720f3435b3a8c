"""Schema-stable empty-input behavior for the session-9 TPC-H operators
(Q2/Q11/Q16/Q20 shapes — Ray drops the schema of all-empty-block datasets
and zero-row blocks bypass map_batches UDFs, so every driver-side fold must
guard missing columns)."""

import os

import pandas as pd
import pytest


@pytest.fixture()
def empty_sf9(tmp_path):
    d = str(tmp_path)
    pd.DataFrame(
        {
            "l_orderkey": pd.Series([], dtype="int64"),
            "l_partkey": pd.Series([], dtype="int64"),
            "l_suppkey": pd.Series([], dtype="int64"),
            "l_quantity": pd.Series([], dtype="float64"),
            "l_extendedprice": pd.Series([], dtype="float64"),
            "l_shipdate": pd.Series([], dtype="datetime64[us]"),
        }
    ).to_parquet(os.path.join(d, "lineitem.parquet"))
    pd.DataFrame(
        {
            "p_partkey": pd.Series([], dtype="int64"),
            "p_name": pd.Series([], dtype="object"),
            "p_brand": pd.Series([], dtype="object"),
            "p_type": pd.Series([], dtype="object"),
            "p_size": pd.Series([], dtype="int64"),
        }
    ).to_parquet(os.path.join(d, "part.parquet"))
    pd.DataFrame(
        {
            "s_suppkey": pd.Series([], dtype="int64"),
            "s_name": pd.Series([], dtype="object"),
            "s_nationkey": pd.Series([], dtype="int64"),
            "s_acctbal": pd.Series([], dtype="float64"),
        }
    ).to_parquet(os.path.join(d, "supplier.parquet"))
    pd.DataFrame(
        {
            "n_nationkey": pd.Series([], dtype="int64"),
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


def test_q2_q11_shapes_empty(empty_sf9, ray_session):
    from dedup_ray.pipelines.relational import important_parts, min_cost_supplier

    t = min_cost_supplier(empty_sf9)
    assert t.num_rows == 0
    assert t.column_names == ["p_partkey", "s_suppkey", "min_cost"]
    t = important_parts(empty_sf9)
    assert t.num_rows == 0 and t.column_names == ["l_partkey", "value"]


def test_q16_q20_shapes_empty(empty_sf9, ray_session):
    from dedup_ray.pipelines.relational import (
        excess_share_suppliers,
        part_supplier_counts,
    )

    t = part_supplier_counts(empty_sf9)
    assert t.num_rows == 0
    assert t.column_names == ["p_brand", "p_type", "p_size", "supplier_cnt"]
    t = excess_share_suppliers(empty_sf9)
    assert t.num_rows == 0 and t.column_names == ["s_suppkey", "s_name"]
