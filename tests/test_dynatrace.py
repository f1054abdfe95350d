"""Tests for the dynatrace line renderer (stages/sinks.py,
dynatraceexporter/serialization/serialization.go)."""

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.sinks import (
    dt_normalize,
    render_dynatrace_lines,
)


def lines(t, **kw):
    return render_dynatrace_lines(t, **kw)["line"].to_pylist()


def tbl(**cols):
    n = max(len(v) for v in cols.values())
    base = {"name": ["m"] * n, "ts_ns": [1_600_000_000_000_000_000] * n}
    base.update(cols)
    return pa.table(base)


class TestNormalize:
    def test_rules(self):
        import pandas as pd

        s = pd.Series(["cpu.usage", "123bad!!x", "...", "a_", "x" * 300])
        out = dt_normalize(s, 250).tolist()
        # disallowed → '_', leading digits/dots stripped, trailing '_'
        # stripped, capped at max, empty → None
        assert out[0] == "cpu.usage"
        assert out[1] == "bad_x"
        assert out[2] is None
        assert out[3] == "a"
        assert len(out[4]) == 250


class TestLines:
    def test_int_line_with_prefix_and_tags(self):
        out = lines(
            tbl(value_int=[42], host=["web-1"]),
            prefix="otel",
            label_cols=["host"],
        )
        assert out == ['otel.m,host="web-1" 42 1600000000000']

    def test_float_trim_quirk(self):
        # serializeFloat64: "%.6f" then TrimRight over charset "0." —
        # 100.0 renders as "1" (reference quirk kept, serialization.go:170-181)
        out = lines(tbl(value_double=[100.0, 0.5, 0.0]))
        assert [ln.split(" ")[1] for ln in out] == ["1", "0.5", "0"]

    def test_quote_escape_order_quirk(self):
        # quotes escaped first, then backslashes doubled (:133-135)
        out = lines(tbl(value_int=[1], host=['h"x']), label_cols=["host"])
        assert out == ['m,host="h\\\\"x" 1 1600000000000']

    def test_histogram_min_max_are_avg(self):
        out = lines(tbl(hist_sum=[19.5], hist_count=[2]))
        assert out == ["m gauge,min=9.75,max=9.75,sum=19.5,count=2 1600000000000"]

    def test_zero_count_voids_metric_name(self):
        t = pa.table(
            {
                "name": ["lat", "lat", "ok"],
                "ts_ns": [0, 0, 0],
                "hist_sum": [5.0, 9.0, 1.5],
                "hist_count": [2, 0, 3],
            }
        )
        out = lines(t)
        # the count==0 point voids BOTH lat points (serialization.go:44-47)
        assert len(out) == 1 and out[0].startswith("ok ")

    def test_unnormalizable_name_dropped(self):
        out = lines(tbl(name=["..."], value_int=[1]))
        assert out == []
