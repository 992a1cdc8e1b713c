"""Tumbling-window aggregation + JSON field extraction over an
events-shaped table: hand-computed windows, block invariance, missing
fields."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

from kmerray.extras.events import (HOUR_US, json_int_field,
                                   sessionized_user_stats,
                                   tumbling_window_agg,
                                   user_history_features)


@pytest.fixture(scope="module")
def events_table():
    base = 1_700_000_000_000_000        # epoch micros
    rows = [
        # user 1: two events same hour, one the next hour
        (0, base + 10, 1, 1.25, '{"k": 7}'),
        (1, base + 20, 1, 2.50, '{"k": 8}'),
        (2, base + HOUR_US + 5, 1, 0.75, '{"k": 9}'),
        # user 2: one event, props without k
        (3, base + 30, 2, 10.00, '{"x": 1}'),
    ]
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
        "props": pa.array([r[4] for r in rows]),
    })


def test_tumbling_window_agg(ray_session, events_table):
    ds = ray.data.from_arrow(events_table)
    out = (tumbling_window_agg(ds).to_pandas()
           .sort_values(["user_id", "win"]).reset_index(drop=True))
    base_win = 1_700_000_000_000_000 // HOUR_US
    assert out["user_id"].tolist() == [1, 1, 2]
    assert out["win"].tolist() == [base_win, base_win + 1, base_win]
    assert out["n_events"].tolist() == [2, 1, 1]
    assert out["sum_cents"].tolist() == [375, 75, 1000]


def test_tumbling_window_block_invariant(ray_session):
    rng = np.random.default_rng(3)
    n = 500
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(
            1_700_000_000_000_000
            + rng.integers(0, 5 * HOUR_US, size=n), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 20, size=n), pa.int64()),
        "value": pa.array(np.round(rng.uniform(0, 100, n), 2)),
        "props": pa.array(['{"k": 1}'] * n),
    })
    key = ["user_id", "win"]
    a = (tumbling_window_agg(ray.data.from_arrow(t)).to_pandas()
         .sort_values(key).reset_index(drop=True))
    b = (tumbling_window_agg(ray.data.from_arrow(t).repartition(11))
         .to_pandas().sort_values(key).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert a["n_events"].sum() == n


def test_sessionized_user_stats(ray_session):
    base = 1_700_000_000_000_000
    gap = HOUR_US
    # user 1: events at 0, 10min, 2h (break), 2h10m -> two 2-event
    # sessions; user 2: one event
    t = pa.table({
        "event_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "ts": pa.array([base, base + 600_000_000,
                        base + 2 * HOUR_US,
                        base + 2 * HOUR_US + 600_000_000,
                        base + 5], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "value": pa.array([1.00, 2.00, 3.00, 4.00, 5.00]),
    })
    out = (sessionized_user_stats(ray.data.from_arrow(t), gap_us=gap)
           .to_pandas().sort_values(["user_id", "session_seq"])
           .reset_index(drop=True))
    assert out["user_id"].tolist() == [1, 1, 2]
    assert out["session_seq"].tolist() == [1, 2, 1]
    assert out["n_events"].tolist() == [2, 2, 1]
    assert out["duration_us"].tolist() == [600_000_000, 600_000_000, 0]
    assert out["sum_cents"].tolist() == [300, 700, 500]


def test_user_history_features_exclusive(ray_session):
    base = 1_700_000_000_000_000
    t = pa.table({
        "event_id": pa.array([0, 1, 2, 3], pa.int64()),
        "ts": pa.array([base, base + 1, base + 2, base], pa.timestamp("us")),
        "user_id": pa.array([7, 7, 7, 9], pa.int64()),
        "value": pa.array([1.50, 2.00, 0.25, 9.00]),
    })
    out = (user_history_features(ray.data.from_arrow(t)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert out["prior_n"].tolist() == [0, 1, 2, 0]
    assert out["prior_cents"].tolist() == [0, 150, 350, 0]


def test_events_window_ops_block_invariant(ray_session):
    rng = np.random.default_rng(11)
    n = 400
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(
            1_700_000_000_000_000
            + rng.integers(0, 40 * HOUR_US, size=n), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 13, size=n), pa.int64()),
        "value": pa.array(np.round(rng.uniform(0, 50, n), 2)),
    })
    for fn, key in [(sessionized_user_stats, ["user_id", "session_seq"]),
                    (user_history_features, ["event_id"])]:
        a = (fn(ray.data.from_arrow(t)).to_pandas()
             .sort_values(key).reset_index(drop=True))
        b = (fn(ray.data.from_arrow(t).repartition(9)).to_pandas()
             .sort_values(key).reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)
    # sessions partition the events: counts add back up
    s = sessionized_user_stats(ray.data.from_arrow(t)).to_pandas()
    assert s["n_events"].sum() == n


def test_json_int_field(ray_session, events_table):
    ds = ray.data.from_arrow(events_table)
    out = (json_int_field(ds).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert out["k"].tolist() == [7, 8, 9, -1]


def test_rolling_user_features_hand_computed(ray_session):
    from kmerray.extras.events import rolling_user_features
    base = 1_700_000_000_000_000
    # user 7: four events, last one >1h after the first two;
    # user 9: two events at the SAME ts (RANGE peers must both count)
    t = pa.table({
        "event_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "ts": pa.array([base, base + 10, base + HOUR_US + 20,
                        base + HOUR_US + 30, base, base], pa.timestamp("us")),
        "user_id": pa.array([7, 7, 7, 7, 9, 9], pa.int64()),
        "value": pa.array([1.00, 2.00, 4.00, 8.00, 0.50, 0.25]),
    })
    out = (rolling_user_features(ray.data.from_arrow(t), n_prev=1)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    # ROWS 1 PRECEDING: pairwise sums within user, event_id tiebreak
    assert out["roll_n"].tolist() == [1, 2, 2, 2, 1, 2]
    assert out["roll_cents"].tolist() == [100, 300, 600, 1200, 50, 75]
    # RANGE 1h PRECEDING: event 2 is 1h+20us after event 0 -> only
    # event 1 (1h+10us? no: +10us -> within 1h of event 2) ... compute:
    # ev2 at base+1h+20: window [base+20, base+1h+20] -> excludes ev0
    # (base) and ev1 (base+10) -> n=1.  ev3 at base+1h+30: window
    # [base+30, ...] -> includes ev2 only -> n=2.
    assert out["tw_n"].tolist() == [1, 2, 1, 2, 2, 2]
    assert out["tw_cents"].tolist() == [100, 300, 400, 1200, 75, 75]


def test_rolling_user_features_block_invariant(ray_session):
    from kmerray.extras.events import rolling_user_features
    rng = np.random.default_rng(23)
    n = 500
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(
            1_700_000_000_000_000
            + rng.integers(0, 30 * HOUR_US, size=n), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 11, size=n), pa.int64()),
        "value": pa.array(np.round(rng.uniform(0, 50, n), 2)),
    })
    a = (rolling_user_features(ray.data.from_arrow(t)).to_pandas()
         .sort_values("event_id").reset_index(drop=True))
    b = (rolling_user_features(ray.data.from_arrow(t).repartition(7),
                               n_buckets=5).to_pandas()
         .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    # pandas cross-check for the ROWS frame
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    cents = np.round(df["value"].to_numpy() * 100).astype(np.int64)
    df["cents"] = cents
    exp = (df.groupby("user_id")["cents"]
           .rolling(4, min_periods=1).sum().reset_index(level=0))
    df["exp_roll"] = exp["cents"].astype(np.int64)
    m = a.merge(df[["event_id", "exp_roll"]], on="event_id")
    assert (m["roll_cents"] == m["exp_roll"]).all()


def test_drop_consecutive_dups(ray_session):
    from kmerray.extras.events import drop_consecutive_dups
    base = 1_700_000_000_000_000
    t = pa.table({
        "event_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "ts": pa.array([base + i for i in range(6)], pa.timestamp("us")),
        "user_id": pa.array([7, 7, 7, 7, 9, 9], pa.int64()),
        # user 7: 1.00, 1.00 (dup), 2.00, 2.00 (dup); user 9: 1.00, 1.00
        "value": pa.array([1.00, 1.00, 2.00, 2.00, 1.00, 1.00]),
    })
    out = drop_consecutive_dups(ray.data.from_arrow(t)).to_pandas()
    assert sorted(out["event_id"].tolist()) == [0, 2, 4]
    a = drop_consecutive_dups(
        ray.data.from_arrow(t).repartition(4), n_buckets=3).to_pandas()
    assert sorted(a["event_id"].tolist()) == [0, 2, 4]
