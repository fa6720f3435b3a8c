"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import logging

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory) -> str:
    """Deterministic 200-row corpus; generated once per session."""
    from dedup_ray.sources.corpus import generate_corpus

    out = str(tmp_path_factory.mktemp("corpus") / "tiny")
    generate_corpus(out, scale="tiny", use_ray=False)
    return out
