"""Mergeable quantile sketch: rank-error bounds vs exact, merge behavior,
determinism, and the pipeline wrapper."""

from __future__ import annotations

import numpy as np
import pytest

from dedup_ray.functions.sketch import QuantileSketch

QS = [0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99]


def _rank_err(data: np.ndarray, q: float, est: float) -> float:
    return abs(np.searchsorted(np.sort(data), est, side="right") / data.size - q)


@pytest.mark.parametrize("dist", ["uniform", "lognormal", "bimodal"])
def test_rank_error_bounded(dist):
    rng = np.random.default_rng(7)
    n = 200_000
    if dist == "uniform":
        data = rng.uniform(0, 1e6, n)
    elif dist == "lognormal":
        data = rng.lognormal(0, 3, n)
    else:
        data = np.concatenate([rng.normal(0, 1, n // 2), rng.normal(100, 5, n // 2)])
    sk = QuantileSketch(256)
    for chunk in np.array_split(data, 50):  # streamed adds
        sk.add(chunk)
    assert sk.n == n
    for q, est in zip(QS, sk.quantiles(QS)):
        assert _rank_err(data, q, est) < 0.05, (dist, q)


def test_merge_matches_single_sketch_error():
    rng = np.random.default_rng(1)
    a, b = rng.exponential(5, 60_000), rng.exponential(5, 40_000)
    both = np.concatenate([a, b])
    merged = QuantileSketch(256).add(a).merge(QuantileSketch(256).add(b))
    assert merged.n == both.size
    for q, est in zip(QS, merged.quantiles(QS)):
        assert _rank_err(both, q, est) < 0.05, q


def test_deterministic_and_small_exact():
    data = np.arange(100, dtype=np.float64)
    s1 = QuantileSketch(256).add(data)
    s2 = QuantileSketch(256).add(data)
    assert s1.quantiles(QS) == s2.quantiles(QS)
    # below k: no compaction -> exact quantile_disc values
    assert s1.quantiles([0.5]) == [49.0]
    assert s1.quantiles([1.0]) == [99.0]


def test_nan_and_empty():
    sk = QuantileSketch(16)
    assert np.isnan(sk.quantiles([0.5])[0])
    sk.add(np.array([np.nan, 1.0, np.nan]))
    assert sk.n == 1
    assert sk.quantiles([0.5]) == [1.0]


def test_row_roundtrip_preserves_estimates():
    rng = np.random.default_rng(2)
    sk = QuantileSketch(64).add(rng.normal(0, 1, 10_000))
    rt = QuantileSketch.from_rows(sk.to_rows(), 64)
    assert rt.n == sk.n
    assert rt.quantiles(QS) == sk.quantiles(QS)


def test_pipeline_vs_exact(ray_session):
    import duckdb

    from dedup_ray.pipelines.relational import approx_value_quantiles

    sf = "/root/testdata/sf0.001"
    got = approx_value_quantiles(sf).to_pydict()
    vals = duckdb.sql(
        f"SELECT value FROM read_parquet('{sf}/events.parquet')"
    ).fetchnumpy()["value"]
    for q, est in zip(got["q"], got["value_est"]):
        assert _rank_err(vals, q, est) < 0.06, q
