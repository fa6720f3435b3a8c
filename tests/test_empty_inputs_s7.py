"""Schema-stable empty-input behavior for the session-7 operators
(same failure class as VERDICT round-1 what's-wrong #1: Ray drops the
schema of all-empty-block datasets and zero-row blocks bypass UDFs)."""

import os

import pandas as pd
import pytest


@pytest.fixture()
def empty_sf7(tmp_path):
    d = str(tmp_path)
    pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "text": pd.Series([], dtype="object"),
            "lang": pd.Series([], dtype="object"),
            "source": pd.Series([], dtype="object"),
            "n_chars": pd.Series([], dtype="int64"),
        }
    ).to_parquet(os.path.join(d, "documents.parquet"))
    pd.DataFrame(
        {
            "l_orderkey": pd.Series([], dtype="int64"),
            "l_suppkey": pd.Series([], dtype="int64"),
            "l_extendedprice": pd.Series([], dtype="float64"),
            "l_discount": pd.Series([], dtype="float64"),
            "l_shipdate": pd.Series([], dtype="datetime64[us]"),
        }
    ).to_parquet(os.path.join(d, "lineitem.parquet"))
    pd.DataFrame(
        {
            "o_orderkey": pd.Series([], dtype="int64"),
            "o_custkey": pd.Series([], dtype="int64"),
        }
    ).to_parquet(os.path.join(d, "orders.parquet"))
    pd.DataFrame(
        {
            "s_suppkey": pd.Series([], dtype="int64"),
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
        }
    ).to_parquet(os.path.join(d, "nation.parquet"))
    return d


def test_bm25_and_weighted_sample_empty(empty_sf7, ray_session):
    from dedup_ray.pipelines.analysis import bm25_search
    from dedup_ray.pipelines.curation import weighted_sample_docs

    t = bm25_search(empty_sf7)
    assert t.num_rows == 0 and t.column_names == ["doc_id", "score"]
    t = weighted_sample_docs(empty_sf7)
    assert t.num_rows == 0 and t.column_names == ["doc_id", "skey"]


def test_nation_trade_volume_and_pagerank_empty(empty_sf7, ray_session):
    from dedup_ray.pipelines.relational import (
        nation_trade_volume,
        trade_graph_pagerank,
    )

    t = nation_trade_volume(empty_sf7)
    assert t.num_rows == 0
    assert t.column_names == ["supp_nation", "cust_nation", "year", "revenue"]
    t = trade_graph_pagerank(empty_sf7, iters=2)
    assert t.num_rows == 0
    assert t.column_names == ["node_type", "key", "rank"]


def test_channel_stats_empty(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from dedup_ray.stages.multimodal import channel_stats

    p = os.path.join(str(tmp_path), "images.parquet")
    pq.write_table(
        pa.schema(
            [("image_id", pa.string()), ("bytes", pa.binary()),
             ("fmt", pa.string())]
        ).empty_table(),
        p,
    )
    t = channel_stats(rd.read_parquet(p))
    assert t.num_rows == 0
