"""metricstransformprocessor semantics (label ops + aggregate_labels,
processor/metricstransformprocessor/datapoint_aggregation.go:34-175)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from opentelemetry_collector_contrib_ray.stages.metricstransform import (
    add_label,
    aggregate_label_values,
    aggregate_labels,
    calculate_metric,
    delete_label_value,
    merge_histograms,
    toggle_scalar_type,
    update_label,
)


def _points():
    return pd.DataFrame(
        {
            "svc": ["a", "a", "b", "b"],
            "host": ["h1", "h2", "h1", "h2"],
            "value": [1.0, 2.0, 3.0, 4.0],
        }
    )


def test_update_label_rename_and_remap():
    t = pa.table({"svc": ["a", "b"]})
    out = update_label(t, "svc", new_name="service", value_map={"a": "alpha"})
    assert out["service"].to_pylist() == ["alpha", "b"]
    assert "svc" not in out.column_names


def test_add_and_delete_label():
    t = pa.table({"svc": ["a", "b"], "value": [1.0, 2.0]})
    out = add_label(t, "env", "prod")
    assert out["env"].to_pylist() == ["prod", "prod"]
    out = delete_label_value(out, "svc", "a")
    assert out["svc"].to_pylist() == ["b"]


def test_toggle_scalar_type():
    t = pa.table({"value": pa.array([1, 2], pa.int64())})
    out = toggle_scalar_type(t)
    assert out["value"].type == pa.float64()


def test_aggregate_labels_sum_drops_host():
    ds = ray.data.from_pandas(_points())
    out = aggregate_labels(ds, ["svc"], aggregation="sum").to_pandas().sort_values("svc")
    assert out["value_sum"].tolist() == [3.0, 7.0]


def test_aggregate_label_values():
    ds = ray.data.from_pandas(_points())
    out = (
        aggregate_label_values(ds, "svc", {"a": "all", "b": "all"}, ["svc"])
        .to_pandas()
    )
    assert out["value_sum"].tolist() == [10.0]


def test_merge_histograms():
    df = pd.DataFrame(
        {
            "k": ["x", "x"],
            "bucket_0": [1, 2],
            "bucket_1": [3, 4],
            "count": [4, 6],
            "sum": [10.0, 20.0],
        }
    )
    out = merge_histograms(ray.data.from_pandas(df), ["k"], ["bucket_0", "bucket_1"]).to_pandas()
    row = out.iloc[0]
    assert row["bucket_0_sum"] == 3 and row["bucket_1_sum"] == 7
    assert row["count_sum"] == 10 and row["sum_sum"] == 30.0


def test_calculate_metric():
    t = pa.table({"a": [10.0], "b": [4.0]})
    out = calculate_metric(t, "pct", "b", "percent", "a")
    assert out["pct"].to_pylist() == [40.0]
    out = calculate_metric(t, "scaled", "a", "multiply", 2.5)
    assert out["scaled"].to_pylist() == [25.0]


def _combine_in():
    # metrics_transform_processor_testcases_test.go:1162-1175 input set
    return pd.DataFrame(
        {
            "metric_name": ["Metric1", "metric2", "metric3"],
            "start": [1, 2, 3],
            "value": [1.0, 2.0, 3.0],
        }
    )


def test_combine_submatch_labels():
    """testcases_test.go:1153-1188 'combine': named + unnamed capture
    groups become labels ($1 / namedsubmatch), lower-cased submatches."""
    from opentelemetry_collector_contrib_ray.stages.metricstransform import (
        combine_metrics,
    )

    ds = ray.data.from_pandas(_combine_in())
    out = combine_metrics(
        ds,
        r"^([mM]etric)(?P<namedsubmatch>[12])$",
        "new",
        label_cols=["start"],
        submatch_case="lower",
    ).to_pandas().sort_values("namedsubmatch").reset_index(drop=True)
    assert out["metric_name"].tolist() == ["new", "new"]
    assert out["$1"].tolist() == ["metric", "metric"]  # lower-cased
    assert out["namedsubmatch"].tolist() == ["1", "2"]
    assert out["value_sum"].tolist() == [1.0, 2.0]


def test_combine_no_matches_passthrough():
    """testcases_test.go:1190-1227: nothing matches → stream unchanged."""
    from opentelemetry_collector_contrib_ray.stages.metricstransform import (
        combine_metrics,
    )

    ds = ray.data.from_pandas(_combine_in())
    out = combine_metrics(
        ds,
        r"^X(metric)(?P<namedsubmatch>[12])$",
        "new",
        label_cols=["start"],
        keep_unmatched=True,
    ).to_pandas()
    assert sorted(out["metric_name"]) == ["Metric1", "metric2", "metric3"]
    assert sorted(out["value_sum"]) == [1.0, 2.0, 3.0]


def test_combine_single_match_upper():
    """testcases_test.go:1228-1266 'combine_single_match' with upper."""
    from opentelemetry_collector_contrib_ray.stages.metricstransform import (
        combine_metrics,
    )

    ds = ray.data.from_pandas(_combine_in())
    out = combine_metrics(
        ds,
        r"^([mM]etric)(?P<namedsubmatch>[1])$",
        "new",
        label_cols=["start"],
        submatch_case="upper",
        keep_unmatched=True,
    ).to_pandas()
    newrow = out[out["metric_name"] == "new"]
    assert len(newrow) == 1
    assert newrow["$1"].iloc[0] == "METRIC" and newrow["namedsubmatch"].iloc[0] == "1"
    assert sorted(out["metric_name"]) == ["metric2", "metric3", "new"]


def test_combine_aggregate_merges_points():
    """testcases_test.go:1268-1302 'combine_aggregate': points sharing
    the grouped label tuple merge with the aggregation (1+2=3)."""
    from opentelemetry_collector_contrib_ray.stages.metricstransform import (
        combine_metrics,
    )

    df = pd.DataFrame(
        {
            "metric_name": ["metric1", "metric2", "metric3"],
            "start": [1, 1, 3],
            "value": [1.0, 2.0, 3.0],
        }
    )
    out = combine_metrics(
        ray.data.from_pandas(df), r"^metric[12]$", "new", label_cols=["start"]
    ).to_pandas()
    assert len(out) == 1
    assert out["value_sum"].iloc[0] == 3.0 and out["metric_name"].iloc[0] == "new"
