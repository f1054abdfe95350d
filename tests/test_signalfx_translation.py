"""Tests for stages/signalfx_translation.py — semantics ported from
exporter/signalfxexporter/translation/translator.go and
translator_test.go (rule-by-rule behavior plus the wide-rule planner
over Ray datasets)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from opentelemetry_collector_contrib_ray.stages.signalfx_translation import (
    SfxTranslateBatch,
    translate_datapoints,
    validate_rules,
)

DIMS = ["host", "state", "dir"]


def dp_table(rows):
    """rows: list of dicts with metric/metric_type/ts/vi/vd/dims."""
    cols = {
        "metric": pa.array([r["metric"] for r in rows], pa.string()),
        "metric_type": pa.array([r.get("metric_type", "gauge") for r in rows], pa.string()),
        "ts": pa.array([r.get("ts", 0) for r in rows], pa.int64()),
        "value_int": pa.array([r.get("vi") for r in rows], pa.int64()),
        "value_double": pa.array([r.get("vd") for r in rows], pa.float64()),
    }
    for d in DIMS:
        cols[d] = pa.array([r.get(d) for r in rows], pa.string())
    return pa.table(cols)


def apply_local(rules, rows):
    return SfxTranslateBatch(rules, DIMS)(dp_table(rows)).to_pylist()


class TestValidate:
    def test_unknown_action(self):
        with pytest.raises(ValueError, match="unknown"):
            validate_rules([{"action": "bogus"}])

    def test_required_fields(self):
        with pytest.raises(ValueError, match="mapping"):
            validate_rules([{"action": "rename_metrics"}])
        with pytest.raises(ValueError, match="0 value"):
            validate_rules([{"action": "divide_int", "scale_factors_int": {"m": 0}}])
        with pytest.raises(ValueError, match="aggregation_method"):
            validate_rules(
                [
                    {
                        "action": "aggregate_metric",
                        "metric_name": "m",
                        "aggregation_method": "median",
                        "without_dimensions": ["host"],
                    }
                ]
            )

    def test_single_global_rename_dimension_keys(self):
        r = {"action": "rename_dimension_keys", "mapping": {"a": "b"}}
        with pytest.raises(ValueError, match="only one"):
            validate_rules([r, dict(r)])

    def test_calculate_only_division(self):
        with pytest.raises(ValueError, match="invalid operator"):
            validate_rules(
                [
                    {
                        "action": "calculate_new_metric",
                        "metric_name": "m",
                        "operand1_metric": "a",
                        "operand2_metric": "b",
                        "operator": "*",
                    }
                ]
            )


class TestLocalRules:
    def test_rename_dimension_keys(self):
        out = apply_local(
            [{"action": "rename_dimension_keys", "mapping": {"host": "dir"}}],
            [{"metric": "m", "vi": 1, "host": "h1"}],
        )
        assert out[0]["host"] is None and out[0]["dir"] == "h1"

    def test_rename_dimension_keys_scoped_to_metrics(self):
        out = apply_local(
            [
                {
                    "action": "rename_dimension_keys",
                    "mapping": {"host": "dir"},
                    "metric_names": ["m1"],
                }
            ],
            [
                {"metric": "m1", "vi": 1, "host": "a"},
                {"metric": "m2", "vi": 1, "host": "b"},
            ],
        )
        assert out[0]["dir"] == "a" and out[1]["host"] == "b" and out[1]["dir"] is None

    def test_rename_metrics_with_copy_and_add_dimensions(self):
        out = apply_local(
            [
                {
                    "action": "rename_metrics",
                    "mapping": {"old": "new"},
                    "copy_dimensions": {"host": "dir"},
                    "add_dimensions": {"state": "added"},
                }
            ],
            [{"metric": "old", "vi": 1, "host": "h"}, {"metric": "keep", "vi": 2}],
        )
        assert out[0]["metric"] == "new" and out[0]["dir"] == "h"
        assert out[0]["state"] == "added"
        assert out[1]["metric"] == "keep" and out[1]["state"] is None

    def test_scales(self):
        out = apply_local(
            [
                {"action": "multiply_int", "scale_factors_int": {"a": 10}},
                {"action": "divide_int", "scale_factors_int": {"b": 4}},
                {"action": "multiply_float", "scale_factors_float": {"c": 0.5}},
            ],
            [
                {"metric": "a", "vi": 3},
                {"metric": "b", "vi": -9},  # Go -9/4 = -2 (trunc toward zero)
                {"metric": "c", "vd": 8.0},
            ],
        )
        assert out[0]["value_int"] == 30
        assert out[1]["value_int"] == -2
        assert out[2]["value_double"] == 4.0

    def test_convert_values(self):
        out = apply_local(
            [
                {
                    "action": "convert_values",
                    "types_mapping": {"a": "int", "b": "double", "c": "int"},
                }
            ],
            [
                {"metric": "a", "vd": 9.8},  # int64(9.8) = 9
                {"metric": "b", "vi": 5},
                {"metric": "c", "vi": 7},  # already int → unchanged
            ],
        )
        assert out[0]["value_int"] == 9 and out[0]["value_double"] is None
        assert out[1]["value_double"] == 5.0 and out[1]["value_int"] is None
        assert out[2]["value_int"] == 7

    def test_copy_metrics_with_dimension_filter(self):
        out = apply_local(
            [
                {
                    "action": "copy_metrics",
                    "mapping": {"m": "m2"},
                    "dimension_key": "state",
                    "dimension_values": ["ok"],
                }
            ],
            [
                {"metric": "m", "vi": 1, "state": "ok"},
                {"metric": "m", "vi": 2, "state": "bad"},
            ],
        )
        metrics = sorted(r["metric"] for r in out)
        assert metrics == ["m", "m", "m2"]
        copied = [r for r in out if r["metric"] == "m2"][0]
        assert copied["value_int"] == 1

    def test_split_metric(self):
        # splitMetric (translator.go:781-809): rename by dim value,
        # remove the dim; unmapped value or missing dim → unchanged
        out = apply_local(
            [
                {
                    "action": "split_metric",
                    "metric_name": "m",
                    "dimension_key": "state",
                    "mapping": {"read": "m.read"},
                }
            ],
            [
                {"metric": "m", "vi": 1, "state": "read"},
                {"metric": "m", "vi": 2, "state": "write"},
                {"metric": "m", "vi": 3},
            ],
        )
        assert out[0]["metric"] == "m.read" and out[0]["state"] is None
        assert out[1]["metric"] == "m" and out[1]["state"] == "write"
        assert out[2]["metric"] == "m"

    def test_drop_metrics(self):
        out = apply_local(
            [{"action": "drop_metrics", "metric_names": ["a", "b"]}],
            [{"metric": "a", "vi": 1}, {"metric": "c", "vi": 2}],
        )
        assert [r["metric"] for r in out] == ["c"]

    def test_drop_dimensions_scoped_and_valued(self):
        out = apply_local(
            [
                {
                    "action": "drop_dimensions",
                    "metric_names": ["m*"],
                    "dimension_pairs": {"host": [], "state": ["bad"]},
                }
            ],
            [
                {"metric": "m1", "vi": 1, "host": "h", "state": "bad"},
                {"metric": "m1", "vi": 2, "host": "h", "state": "ok"},
                {"metric": "x", "vi": 3, "host": "h", "state": "bad"},
            ],
        )
        assert out[0]["host"] is None and out[0]["state"] is None
        assert out[1]["host"] is None and out[1]["state"] == "ok"
        # metric matcher miss → untouched
        assert out[2]["host"] == "h" and out[2]["state"] == "bad"


def _collect(ds, dims):
    df = ds.to_pandas()
    return df.sort_values(["metric", "ts"] + dims, kind="stable").reset_index(drop=True)


class TestWideRules:
    def test_aggregate_metric_sum_and_count(self, ray_session):
        rows = [
            {"metric": "cpu", "vi": 1, "host": "a", "state": "x", "ts": 1},
            {"metric": "cpu", "vi": 2, "host": "b", "state": "x", "ts": 1},
            {"metric": "cpu", "vi": 4, "host": "a", "state": "y", "ts": 1},
            {"metric": "other", "vi": 9, "host": "a", "ts": 1},
        ]
        ds = ray.data.from_arrow(dp_table(rows))
        out, _ = translate_datapoints(
            ds,
            [
                {
                    "action": "aggregate_metric",
                    "metric_name": "cpu",
                    "aggregation_method": "sum",
                    "without_dimensions": ["host"],
                }
            ],
            DIMS,
        )
        df = _collect(out, ["state"])
        cpu = df[df["metric"] == "cpu"]
        assert len(cpu) == 2
        by_state = dict(zip(cpu["state"], cpu["value_int"]))
        assert by_state == {"x": 3, "y": 4}
        assert (cpu["host"].isna()).all()
        assert len(df[df["metric"] == "other"]) == 1

    def test_aggregate_metric_count_becomes_gauge(self, ray_session):
        rows = [
            {"metric": "m", "metric_type": "counter", "vi": 5, "host": "a", "ts": 1},
            {"metric": "m", "metric_type": "counter", "vi": 6, "host": "b", "ts": 1},
        ]
        ds = ray.data.from_arrow(dp_table(rows))
        out, _ = translate_datapoints(
            ds,
            [
                {
                    "action": "aggregate_metric",
                    "metric_name": "m",
                    "aggregation_method": "count",
                    "without_dimensions": ["host"],
                }
            ],
            DIMS,
        )
        df = out.to_pandas()
        assert len(df) == 1
        assert df["value_int"].iloc[0] == 2
        assert df["metric_type"].iloc[0] == "gauge"

    def test_calculate_new_metric_division(self, ray_session):
        rows = [
            {"metric": "used", "vi": 30, "host": "a", "ts": 1},
            {"metric": "total", "vi": 100, "host": "a", "ts": 1},
            {"metric": "used", "vi": 1, "host": "b", "ts": 1},
            {"metric": "total", "vi": 0, "host": "b", "ts": 1},  # div-by-0 skipped
        ]
        ds = ray.data.from_arrow(dp_table(rows))
        out, _ = translate_datapoints(
            ds,
            [
                {
                    "action": "calculate_new_metric",
                    "metric_name": "util",
                    "operand1_metric": "used",
                    "operand2_metric": "total",
                    "operator": "/",
                }
            ],
            DIMS,
        )
        df = out.to_pandas()
        util = df[df["metric"] == "util"]
        assert len(util) == 1
        assert util["value_double"].iloc[0] == pytest.approx(0.3)
        assert util["host"].iloc[0] == "a"
        assert len(df) == 5  # originals kept

    def test_delta_metric(self, ray_session):
        rows = [
            {"metric": "c", "metric_type": "cumulative_counter", "vi": 10, "host": "a", "ts": 1},
            {"metric": "c", "metric_type": "cumulative_counter", "vi": 25, "host": "a", "ts": 2},
            {"metric": "c", "metric_type": "cumulative_counter", "vi": 5, "host": "a", "ts": 3},  # reset
            {"metric": "c", "metric_type": "cumulative_counter", "vi": 100, "host": "b", "ts": 1},
        ]
        ds = ray.data.from_arrow(dp_table(rows))
        out, _ = translate_datapoints(
            ds,
            [{"action": "delta_metric", "mapping": {"c": "c.delta"}}],
            DIMS,
        )
        df = out.to_pandas()
        deltas = df[df["metric"] == "c.delta"].sort_values("ts")
        # first point per series dropped; reset emits current value
        assert list(deltas["value_int"]) == [15, 5]
        assert (deltas["metric_type"] == "gauge").all()
        assert len(df[df["metric"] == "c"]) == 4

    def test_fused_chain_local_wide_local(self, ray_session):
        rows = [
            {"metric": "bytes", "vi": 1024, "host": "a", "ts": 1},
            {"metric": "bytes", "vi": 2048, "host": "b", "ts": 1},
        ]
        ds = ray.data.from_arrow(dp_table(rows))
        out, _ = translate_datapoints(
            ds,
            [
                {"action": "divide_int", "scale_factors_int": {"bytes": 1024}},
                {"action": "rename_metrics", "mapping": {"bytes": "kib"}},
                {
                    "action": "aggregate_metric",
                    "metric_name": "kib",
                    "aggregation_method": "avg",
                    "without_dimensions": ["host"],
                },
                {"action": "rename_metrics", "mapping": {"kib": "kib.mean"}},
            ],
            DIMS,
        )
        df = out.to_pandas()
        assert len(df) == 1
        assert df["metric"].iloc[0] == "kib.mean"
        assert df["value_double"].iloc[0] == pytest.approx(1.5)
