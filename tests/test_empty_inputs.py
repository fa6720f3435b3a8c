"""Schema-stable empty-input behavior for the session-4 operators.

Ray drops the schema of datasets made solely of empty blocks — the exact
failure class behind the round-1 flagship crash (VERDICT.md What's wrong
#1) — so every operator must survive an empty table without a KeyError
and return its declared schema (or its documented degenerate row)."""

import os

import pandas as pd
import pytest


@pytest.fixture()
def empty_sf(tmp_path):
    pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "text": pd.Series([], dtype="object"),
            "lang": pd.Series([], dtype="object"),
            "source": pd.Series([], dtype="object"),
            "n_chars": pd.Series([], dtype="int64"),
        }
    ).to_parquet(os.path.join(str(tmp_path), "documents.parquet"))
    pd.DataFrame(
        {
            "event_id": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "event_type": pd.Series([], dtype="object"),
            "ts": pd.Series([], dtype="datetime64[us]"),
            "value": pd.Series([], dtype="float64"),
        }
    ).to_parquet(os.path.join(str(tmp_path), "events.parquet"))
    pd.DataFrame(
        {
            "o_orderkey": pd.Series([], dtype="int64"),
            "o_custkey": pd.Series([], dtype="int64"),
            "o_totalprice": pd.Series([], dtype="float64"),
            "o_orderdate": pd.Series([], dtype="datetime64[us]"),
            "o_orderpriority": pd.Series([], dtype="object"),
        }
    ).to_parquet(os.path.join(str(tmp_path), "orders.parquet"))
    pd.DataFrame(
        {
            "l_orderkey": pd.Series([], dtype="int64"),
            "l_quantity": pd.Series([], dtype="float64"),
            "l_extendedprice": pd.Series([], dtype="float64"),
            "l_discount": pd.Series([], dtype="float64"),
            "l_returnflag": pd.Series([], dtype="object"),
        }
    ).to_parquet(os.path.join(str(tmp_path), "lineitem.parquet"))
    return str(tmp_path)


def test_doc_operators_empty(empty_sf, ray_session):
    from dedup_ray.pipelines.curation import (
        above_avg_sources,
        chunk_docs,
        interleave_sources,
        stratified_split_docs,
    )
    from dedup_ray.pipelines.text import normalized_dedup_groups

    assert normalized_dedup_groups(empty_sf).num_rows == 0
    assert chunk_docs(empty_sf).count() == 0
    assert above_avg_sources(empty_sf).count() == 0
    assert interleave_sources(empty_sf).count() == 0
    assert stratified_split_docs(empty_sf).count() == 0


def test_event_operators_empty(empty_sf, ray_session):
    from dedup_ray.pipelines.relational import (
        co_event_pairs,
        events_cube,
        events_hourly_dense,
    )

    assert co_event_pairs(empty_sf).count() == 0
    assert events_hourly_dense(empty_sf).count() == 0
    # CUBE still emits the grand-total row on empty input in SQL; the Ray
    # side returns empty (no fine-level rows) — document the divergence by
    # asserting the Ray contract here
    assert events_cube(empty_sf).count() in (0, 1)


def test_order_operators_empty(empty_sf, ray_session):
    from dedup_ray.pipelines.relational import (
        customer_order_dense_rank,
        orders_profile,
        price_qty_corr,
        revenue_running_by_date,
    )

    assert customer_order_dense_rank(empty_sf).count() == 0
    assert revenue_running_by_date(empty_sf).count() == 0
    corr = price_qty_corr(empty_sf).to_pandas()
    assert corr.to_dict("records") == [{"n": 0, "corr": 0.0}]
    prof = orders_profile(empty_sf).to_pandas()
    assert len(prof) == 3
    assert (prof["n"] == 0).all()
    assert prof["vmin"].isna().all() and prof["vmax"].isna().all()


def test_term_cooccurrence_empty(empty_sf, ray_session):
    from dedup_ray.pipelines.analysis import term_cooccurrence

    assert term_cooccurrence(empty_sf).count() == 0


def test_session5_operators_empty(empty_sf, ray_session):
    from dedup_ray.pipelines.curation import upsert_docs
    from dedup_ray.pipelines.relational import (
        cumulative_users_by_day,
        customer_revenue_gini,
        median_price_by_priority,
        pareto_parts,
        price_histogram,
        retention_cohorts,
        value_mad,
        weighted_discount_by_flag,
    )

    assert retention_cohorts(empty_sf).count() == 0
    assert cumulative_users_by_day(empty_sf).count() == 0
    assert value_mad(empty_sf).num_rows == 0
    assert median_price_by_priority(empty_sf).count() == 0
    assert price_histogram(empty_sf).num_rows == 0
    assert customer_revenue_gini(empty_sf).num_rows == 0
    assert weighted_discount_by_flag(empty_sf).count() == 0
    assert upsert_docs(empty_sf).count() == 0


def test_pareto_empty_part_table(tmp_path, ray_session):
    import pandas as pd
    import os

    from dedup_ray.pipelines.relational import pareto_parts

    pd.DataFrame(
        {
            "p_partkey": pd.Series([], dtype="int64"),
            "p_retailprice": pd.Series([], dtype="float64"),
            "p_size": pd.Series([], dtype="int32"),
        }
    ).to_parquet(os.path.join(str(tmp_path), "part.parquet"))
    assert pareto_parts(str(tmp_path)).num_rows == 0
