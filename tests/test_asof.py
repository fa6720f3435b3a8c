"""as-of join semantics on planted edge cases (equal-ts click counts;
purchase before any click drops; users never bleed into each other)."""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from dedup_ray.pipelines.relational import asof_join_clicks


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, minute)


def test_asof_edge_semantics(tmp_path, ray_session):
    rows = [
        # user 1: click@1, purchase@5 -> attributed to click@1 (lag 4 min)
        (1, _ts(1), 1, "click"),
        (2, _ts(5), 1, "purchase"),
        # user 1: click@5 EXACTLY at purchase2's ts -> equal-ts click wins
        (3, _ts(7), 1, "click"),
        (4, _ts(7), 1, "purchase"),
        # user 2: purchase BEFORE any click -> dropped; later one attributed
        (5, _ts(2), 2, "purchase"),
        (6, _ts(3), 2, "click"),
        (7, _ts(9), 2, "purchase"),
        # user 3: clicks only -> nothing emitted; must not leak into user 2
        (8, _ts(0), 3, "click"),
        # other event types are ignored entirely
        (9, _ts(4), 1, "view"),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[3] for r in rows], type=pa.string()),
            "value": pa.array([0.0] * len(rows), type=pa.float64()),
            "props": pa.array(["{}"] * len(rows), type=pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")

    out = asof_join_clicks(str(tmp_path)).to_pandas().sort_values("event_id")
    got = {
        int(r.event_id): (int(r.user_id), r.click_ts.to_pydatetime(), int(r.lag_us))
        for r in out.itertuples()
    }
    assert got == {
        2: (1, _ts(1), 4 * 60 * 1_000_000),
        4: (1, _ts(7), 0),
        7: (2, _ts(3), 6 * 60 * 1_000_000),
    }


def test_sliding_window_peer_semantics(tmp_path, ray_session):
    """RANGE-frame peers: equal-ts rows count each other (both directions);
    window boundary is inclusive; users are isolated."""
    from dedup_ray.pipelines.relational import sliding_window_counts

    rows = [
        (1, _ts(0), 1),   # alone at window start
        (2, _ts(29), 1),  # 29 min later: within 30 min of event 1 -> 2
        (3, _ts(31), 1),  # within 30 of ev2, NOT of ev1 (31>30) -> 2
        (4, _ts(31), 1),  # PEER of ev3 (equal ts): both count both -> 3
        (5, _ts(31), 2),  # other user, same ts: isolated -> 1
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array(["view"] * len(rows), type=pa.string()),
            "value": pa.array([0.0] * len(rows), type=pa.float64()),
            "props": pa.array(["{}"] * len(rows), type=pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = sliding_window_counts(str(tmp_path)).to_pandas()
    got = dict(zip(out["event_id"], out["n_win"]))
    # ev2 at +29 min: inclusive boundary keeps ev1. ev3/ev4 at +31: ev1 out.
    assert got == {1: 1, 2: 2, 3: 3, 4: 3, 5: 1}


def _random_events(seed: int, n: int = 300, users: int = 5, slots: int = 60):
    """Events with heavy ts collisions (small slot grid) to stress peer and
    equal-ts semantics."""
    import numpy as np

    rng = np.random.default_rng(seed)
    ts = [_ts(0) + datetime.timedelta(minutes=int(m)) for m in rng.integers(0, slots, n)]
    kinds = rng.choice(["click", "purchase", "view"], n).tolist()
    uid = rng.integers(1, users + 1, n).tolist()
    return pa.table(
        {
            "event_id": pa.array(list(range(1, n + 1)), type=pa.int64()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": pa.array(uid, type=pa.int64()),
            "event_type": pa.array(kinds, type=pa.string()),
            "value": pa.array([0.0] * n, type=pa.float64()),
            "props": pa.array(["{}"] * n, type=pa.string()),
        }
    )


def test_sliding_window_matches_bruteforce(tmp_path, ray_session):
    from dedup_ray.pipelines.relational import sliding_window_counts

    t = _random_events(seed=123)
    pq.write_table(t, tmp_path / "events.parquet")
    out = sliding_window_counts(str(tmp_path)).to_pandas()
    got = dict(zip(out["event_id"], out["n_win"]))
    rows = list(zip(t["event_id"].to_pylist(), t["user_id"].to_pylist(),
                    t["ts"].to_pylist()))
    w = datetime.timedelta(minutes=30)
    for eid, u, ts in rows:
        expect = sum(1 for _, u2, ts2 in rows if u2 == u and ts - w <= ts2 <= ts)
        assert got[eid] == expect, (eid, got[eid], expect)


def test_asof_matches_bruteforce(tmp_path, ray_session):
    from dedup_ray.pipelines.relational import asof_join_clicks

    t = _random_events(seed=321)
    pq.write_table(t, tmp_path / "events.parquet")
    out = asof_join_clicks(str(tmp_path)).to_pandas()
    got = {int(r.event_id): r.click_ts.to_pydatetime() for r in out.itertuples()}
    rows = list(zip(t["event_id"].to_pylist(), t["user_id"].to_pylist(),
                    t["ts"].to_pylist(), t["event_type"].to_pylist()))
    expect = {}
    for eid, u, ts, kind in rows:
        if kind != "purchase":
            continue
        clicks = [ts2 for _, u2, ts2, k2 in rows if u2 == u and k2 == "click" and ts2 <= ts]
        if clicks:
            expect[eid] = max(clicks)
    assert got == expect
