"""Join operators: broadcast, partitioned bucketed hash join, native."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from opentelemetry_collector_contrib_ray.stages.join import (
    broadcast_join,
    bucketed_hash_join,
    native_join,
)


def _sides():
    left = rd.from_pandas(
        pd.DataFrame({"k": [1, 2, 3, 4, 2], "a": list("xyzwv")})
    )
    right = rd.from_pandas(pd.DataFrame({"k": [2, 3, 5], "b": ["B2", "B3", "B5"]}))
    return left, right


def test_bucketed_inner():
    left, right = _sides()
    out = (
        bucketed_hash_join(left, right, "k", num_buckets=4)
        .to_pandas()
        .sort_values(["k", "a"])
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [2, 2, 3]
    assert out["b"].tolist() == ["B2", "B2", "B3"]


def test_bucketed_left():
    left, right = _sides()
    out = (
        bucketed_hash_join(left, right, "k", how="left", num_buckets=4)
        .to_pandas()
        .sort_values(["k", "a"])
        .reset_index(drop=True)
    )
    assert len(out) == 5
    assert out.loc[out["k"] == 1, "b"].isna().all()


def test_broadcast_join():
    left, _ = _sides()
    small = pa.table({"k": [2, 3], "b": ["B2", "B3"]})
    out = broadcast_join(left, small, "k").to_pandas().sort_values(["k", "a"])
    assert len(out) == 5  # left join keeps all
    assert out.loc[out["k"] == 2, "b"].tolist() == ["B2", "B2"]


def test_native_join():
    left, right = _sides()
    out = (
        native_join(left, right, "k", num_partitions=2)
        .to_pandas()
        .sort_values(["k", "a"])
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [2, 2, 3]
