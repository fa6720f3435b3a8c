"""Edge-case tests for the session-3 relational operators — the inputs the
sf-table oracle parity can't exercise: equal-timestamp funnel shadowing,
all-ties range partitioning, degenerate median inputs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _write_events(tmp_path, rows):
    df = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    df["ts"] = pd.to_datetime(df["ts"], unit="s").astype("datetime64[us]")
    df.to_parquet(tmp_path / "events.parquet", index=False)
    return str(tmp_path)


def test_funnel_equal_ts_view_does_not_shadow_earlier_view(tmp_path):
    """A view at EXACTLY the purchase ts must neither count as a conversion
    nor shadow an earlier in-window view (the forward-fill edge the sort's
    event_type tiebreak handles)."""
    from dedup_ray.pipelines.relational import funnel_conversions

    t0 = 1_700_000_000
    sf = _write_events(
        tmp_path,
        [
            # user 1: view 10s before purchase + view AT the purchase ts
            # -> converts (the earlier view), the equal-ts view is ignored
            (1, t0 - 10, 1, "view", 0.0, ""),
            (2, t0, 1, "view", 0.0, ""),
            (3, t0, 1, "purchase", 5.0, ""),
            # user 2: ONLY an equal-ts view -> no conversion
            (4, t0, 2, "view", 0.0, ""),
            (5, t0, 2, "purchase", 5.0, ""),
            # user 3: view outside the 1h window -> no conversion
            (6, t0 - 3601, 3, "view", 0.0, ""),
            (7, t0, 3, "purchase", 5.0, ""),
            # user 4: view exactly window_s before -> converts (<= bound)
            (8, t0 - 3600, 4, "view", 0.0, ""),
            (9, t0, 4, "purchase", 5.0, ""),
            # user 5: two purchases after one view, both in window -> 2
            (10, t0 - 5, 5, "view", 0.0, ""),
            (11, t0, 5, "purchase", 5.0, ""),
            (12, t0 + 1, 5, "purchase", 5.0, ""),
        ],
    )
    got = (
        funnel_conversions(sf)
        .to_pandas()
        .set_index("user_id")["n_conversions"]
        .to_dict()
    )
    assert got == {1: 1, 4: 1, 5: 2}


def test_global_rank_all_equal_keys(tmp_path):
    """Every o_totalprice identical: one range partition swallows the whole
    table and ranks must still be exact via the orderkey tiebreak."""
    from dedup_ray.pipelines.relational import orders_global_rank

    n = 1000
    pd.DataFrame(
        {
            "o_orderkey": np.random.RandomState(7).permutation(n),
            "o_custkey": np.zeros(n, dtype=np.int64),
            "o_orderstatus": ["F"] * n,
            "o_totalprice": np.full(n, 42.0),
            "o_orderdate": pd.to_datetime(["2024-01-01"] * n),
            "o_orderpriority": ["1-URGENT"] * n,
        }
    ).to_parquet(tmp_path / "orders.parquet", index=False)
    got = orders_global_rank(str(tmp_path)).to_pandas().sort_values("rk")
    assert list(got["rk"]) == list(range(1, n + 1))
    # ties broken by orderkey ascending
    assert list(got["o_orderkey"]) == list(range(n))


def test_global_rank_tiny_table(tmp_path):
    """Fewer rows than num_parts: splitters collapse, ranks stay exact."""
    from dedup_ray.pipelines.relational import orders_global_rank

    pd.DataFrame(
        {
            "o_orderkey": [3, 1, 2],
            "o_custkey": [0, 0, 0],
            "o_orderstatus": ["F"] * 3,
            "o_totalprice": [30.0, 10.0, 20.0],
            "o_orderdate": pd.to_datetime(["2024-01-01"] * 3),
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    ).to_parquet(tmp_path / "orders.parquet", index=False)
    got = (
        orders_global_rank(str(tmp_path))
        .to_pandas()
        .sort_values("rk")
        .reset_index(drop=True)
    )
    assert list(got["o_orderkey"]) == [1, 2, 3]
    assert list(got["rk"]) == [1, 2, 3]


@pytest.mark.parametrize("n", [1, 2, 101, 1000])
def test_exact_median_matches_numpy_rank(tmp_path, n):
    """Median = value at rank ceil(n/2) (1-based), incl. degenerate sizes
    and heavy duplication."""
    from dedup_ray.pipelines.relational import exact_value_median

    rng = np.random.RandomState(n)
    vals = np.round(rng.standard_normal(n) * 10, 1)  # many exact duplicates
    _write_events(
        tmp_path,
        [
            (i, 1_700_000_000 + i, i % 7, "view", float(v), "")
            for i, v in enumerate(vals)
        ],
    )
    got = exact_value_median(str(tmp_path)).to_pandas()
    want = float(np.sort(vals)[int(np.ceil(n / 2)) - 1])
    assert got["n_rows"][0] == n
    assert got["median"][0] == want
