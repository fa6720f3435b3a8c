"""Pipeline counters (north_rule: "per-partition lineage + metrics").

A single named Ray actor accumulates counters from any task/actor in the
job (capped buckets, verified pairs, dropped rows...). Counter writes are
fire-and-forget (``.remote`` without get) so the hot path never blocks;
reads happen at stage boundaries and land in the checkpoint manifest.

~ the reference's AtomicUsize progress counter
(/root/reference/src/main.rs:186,198-201), raised to cluster scope.
"""

from __future__ import annotations

import ray

_ACTOR_NAME = "dedup_ray_metrics"


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self) -> None:
        self.counts: dict[str, int] = {}

    def inc(self, key: str, n: int = 1) -> None:
        self.counts[key] = self.counts.get(key, 0) + n

    def snapshot(self) -> dict[str, int]:
        return dict(self.counts)

    def reset(self) -> None:
        self.counts.clear()


_HANDLE = None


def _get_actor():
    # named (job-scoped, NOT detached: dies with the driver so test sessions
    # and bench subprocesses never leak actors across ray.init boundaries).
    # The handle MUST be cached: a named non-detached actor is destroyed when
    # its creator's last handle is GC'd, so an uncached handle would give
    # every worker its own ephemeral actor and counters would vanish.
    global _HANDLE
    if _HANDLE is None:
        _HANDLE = MetricsActor.options(name=_ACTOR_NAME, get_if_exists=True).remote()
    return _HANDLE


def inc_counter(key: str, n: int = 1) -> None:
    """Fire-and-forget increment; safe to call from inside map_batches."""
    try:
        _get_actor().inc.remote(key, n)
    except Exception:  # metrics must never fail the pipeline
        pass


def snapshot_counters() -> dict[str, int]:
    """Read the counters, settling first: ``inc_counter`` is fire-and-forget
    from worker tasks, so a snapshot taken the instant a pipeline returns
    can race increments still in flight to the actor (observed as a rare
    pairs_verified=0 flake under ambient box load). Poll until two
    consecutive snapshots agree (bounded ~1 s); when the system is already
    quiescent this costs exactly one extra actor round-trip."""
    import time

    try:
        h = _get_actor()
        prev = ray.get(h.snapshot.remote())
        for _ in range(20):
            time.sleep(0.05)
            cur = ray.get(h.snapshot.remote())
            if cur == prev:
                return cur
            prev = cur
        return prev
    except Exception:
        return {}


def reset_counters() -> None:
    try:
        ray.get(_get_actor().reset.remote())
    except Exception:
        pass
