"""Event-time windowing (stages/window.py): tumbling, sliding,
sessionization, last-write-wins — vs pandas ground truth."""

import numpy as np
import pandas as pd
import ray.data

from opentelemetry_collector_contrib_ray.stages.window import (
    last_write_wins,
    sessionize,
    sliding,
    tumbling,
)


def _events():
    ts = pd.to_datetime(
        [
            "2024-01-01 00:05:00",
            "2024-01-01 00:20:00",
            "2024-01-01 01:10:00",  # >30min gap → new session for u1
            "2024-01-01 00:59:00",
            "2024-01-01 02:30:00",
        ]
    )
    return pd.DataFrame(
        {
            "user": ["u1", "u1", "u1", "u2", "u2"],
            "ts": ts,
            "value": [1.0, 2.0, 3.0, 4.0, 5.0],
            "seq": [0, 1, 2, 3, 4],
        }
    )


def test_tumbling_counts():
    out = (
        tumbling(ray.data.from_pandas(_events()), ["user"], "ts", every="hour")
        .to_pandas()
        .sort_values(["user", "window_start"])
    )
    assert out["count"].tolist() == [2, 1, 1, 1]


def test_sliding_explodes_each_event_into_k_windows():
    out = sliding(
        ray.data.from_pandas(_events()), ["user"], "ts", size_minutes=60, step_minutes=30
    ).to_pandas()
    # each event in exactly 2 windows → total count = 2 × 5
    assert out["count"].sum() == 10
    # event at 00:05 lands in windows starting 23:30 (prev day) and 00:00
    u1 = out[out["user"] == "u1"].set_index("window_start")["count"]
    assert u1[pd.Timestamp("2024-01-01 00:00:00")] >= 1


def test_sessionize_gap_splits():
    out = (
        sessionize(ray.data.from_pandas(_events()), "user", "ts", gap_seconds=1800)
        .to_pandas()
        .sort_values(["user", "session_id"])
        .reset_index(drop=True)
    )
    u1 = out[out["user"] == "u1"]
    assert len(u1) == 2  # 00:05+00:20 together, 01:10 separate
    assert u1["n_events"].tolist() == [2, 1]
    u2 = out[out["user"] == "u2"]
    assert len(u2) == 2


def test_last_write_wins():
    out = (
        last_write_wins(
            ray.data.from_pandas(_events()), ["user"], "ts", "value", order_cols=["ts", "seq"]
        )
        .to_pandas()
        .sort_values("user")
    )
    assert out["value_last"].tolist() == [3.0, 5.0]
