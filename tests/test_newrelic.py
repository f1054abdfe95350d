"""newrelicexporter transformer semantics, ported from
exporter/newrelicexporter/transformer_test.go (see stage docstring
for file:line citations)."""

import numpy as np
import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.newrelic import (
    NewRelicLogTransformer,
    NewRelicMetricTransformer,
    NewRelicSpanTransformer,
)


def _attrs(s: str) -> dict:
    return dict(kv.split("=", 1) for kv in s.split(";")) if s else {}


def _span_table(rows: list[dict]) -> pa.Table:
    cols: dict[str, list] = {}
    keys = sorted({k for r in rows for k in r})
    for k in keys:
        cols[k] = [r.get(k) for r in rows]
    return pa.table(cols)


class TestSpan:
    # TestTransformSpan: basic span, error span, kind, dropped counts
    def test_basic_span(self):
        t = _span_table(
            [
                dict(
                    trace_id="01" * 16,
                    span_id="02" * 8,
                    parent_span_id="03" * 8,
                    name="root",
                    start_ns=1_000_000_000,
                    end_ns=2_000_000_000,
                )
            ]
        )
        out = NewRelicSpanTransformer()(t).to_pandas()
        r = out.iloc[0]
        assert r["span_id"] == "02" * 8
        assert r["trace_id"] == "01" * 16
        assert r["parent_id"] == "03" * 8
        assert r["timestamp_ms"] == 1000
        assert r["duration_us"] == 1_000_000
        # unset status / unspecified kind add no attributes
        assert _attrs(r["attrs"]) == {}

    def test_invalid_ids_are_errors(self):
        t = _span_table(
            [
                dict(trace_id="0" * 32, span_id="02" * 8, name="bad-trace",
                     start_ns=0, end_ns=0),
                dict(trace_id="01" * 16, span_id="zz" * 8, name="bad-span",
                     start_ns=0, end_ns=0),
                dict(trace_id="01" * 16, span_id="02" * 8, name="ok",
                     start_ns=0, end_ns=0),
            ]
        )
        out = NewRelicSpanTransformer()(t).to_pandas()
        assert list(out["name"]) == ["ok"]
        assert out["n_invalid"].sum() == 2

    def test_status_and_kind_attrs(self):
        t = _span_table(
            [
                dict(trace_id="01" * 16, span_id="02" * 8, name="err",
                     kind="SERVER", status_code=2, status_message="boom",
                     start_ns=0, end_ns=0),
                dict(trace_id="01" * 16, span_id="03" * 8, name="ok",
                     kind="client", status_code=1, status_message="",
                     start_ns=0, end_ns=0),
                dict(trace_id="01" * 16, span_id="04" * 8, name="unset-msg",
                     kind=None, status_code=0, status_message="ignored",
                     start_ns=0, end_ns=0),
            ]
        )
        out = NewRelicSpanTransformer()(t).to_pandas()
        a0 = _attrs(out.iloc[0]["attrs"])
        assert a0["otel.status_code"] == "ERROR"
        assert a0["otel.status_description"] == "boom"
        assert a0["span.kind"] == "server"
        a1 = _attrs(out.iloc[1]["attrs"])
        assert a1["otel.status_code"] == "OK"
        assert "otel.status_description" not in a1
        assert a1["span.kind"] == "client"
        # unset code → no status attrs even with a message
        assert _attrs(out.iloc[2]["attrs"]) == {}

    def test_dropped_counts_and_overrides(self):
        t = _span_table(
            [
                dict(trace_id="01" * 16, span_id="02" * 8, name="s",
                     dropped_attributes_count=3, dropped_events_count=2,
                     start_ns=0, end_ns=0,
                     **{"collector.name": "evil", "custom": "v"}),
            ]
        )
        tr = NewRelicSpanTransformer(
            collector=("otelcol", "1.0"),
            attr_cols=["collector.name", "custom"],
        )
        out = tr(t).to_pandas()
        a = _attrs(out.iloc[0]["attrs"])
        assert a["otel.dropped_attributes_count"] == "3"
        assert a["otel.dropped_events_count"] == "2"
        assert a["custom"] == "v"
        # span attr shadowed by the collector override is excluded
        assert "collector.name" not in a
        common = _attrs(out.iloc[0]["common_attrs"])
        assert common["collector.name"] == "otelcol"
        assert common["collector.version"] == "1.0"

    # TestCommonAttributes: resource + instrumentation + overrides
    def test_common_attributes(self):
        tr = NewRelicSpanTransformer(
            resource_attrs={"resource": "R1"},
            instrumentation=("test", "0.0.1"),
            collector=("otelcol", "0.0.1"),
        )
        c = _attrs(tr.common_attrs)
        assert c == {
            "resource": "R1",
            "instrumentation.name": "test",
            "instrumentation.version": "0.0.1",
            "collector.name": "otelcol",
            "collector.version": "0.0.1",
        }


def _metric_table(rows: list[dict]) -> pa.Table:
    keys = sorted({k for r in rows for k in r})
    return pa.table({k: [r.get(k) for r in rows] for k in keys})


class TestMetric:
    # TestTransformGauge
    def test_gauge(self):
        t = _metric_table(
            [dict(name="g", dtype="double_gauge", value=42.5,
                  start_ns=5_000_000_000, ts_ns=10_000_000_000, unit="1",
                  description="desc")]
        )
        out = NewRelicMetricTransformer()(t).to_pandas()
        r = out.iloc[0]
        assert r["nr_type"] == "gauge"
        assert r["value"] == 42.5
        # gauges stamp Timestamp; StartTimestamp ignored
        assert r["timestamp_ms"] == 10_000
        assert r["interval_ms"] == 0
        a = _attrs(r["attrs"])
        assert a["unit"] == "1" and a["description"] == "desc"

    # TestTransformSum: delta → Count at start + interval;
    # cumulative → Gauge at ts
    def test_sum_temporality(self):
        t = _metric_table(
            [
                dict(name="c", dtype="int_sum", temporality="delta", value=7.0,
                     start_ns=1_000_000_000, ts_ns=3_000_000_000),
                dict(name="c", dtype="double_sum", temporality="cumulative",
                     value=9.0, start_ns=1_000_000_000, ts_ns=3_000_000_000),
            ]
        )
        out = NewRelicMetricTransformer()(t).to_pandas()
        delta, cumu = out.iloc[0], out.iloc[1]
        assert delta["nr_type"] == "count"
        assert delta["timestamp_ms"] == 1_000
        assert delta["interval_ms"] == 2_000
        assert cumu["nr_type"] == "gauge"
        assert cumu["timestamp_ms"] == 3_000

    # TestUnsupportedMetricTypes: histograms dropped
    def test_histogram_dropped(self):
        t = _metric_table(
            [
                dict(name="h", dtype="histogram", value=0.0, start_ns=0, ts_ns=0),
                dict(name="g", dtype="int_gauge", value=1.0, start_ns=0, ts_ns=0),
            ]
        )
        out = NewRelicMetricTransformer()(t).to_pandas()
        assert list(out["name"]) == ["g"]
        assert out["n_dropped"].sum() == 1

    # TestTransformDeltaSummary: min iff first q==0, max iff last q==1
    def test_summary_quantiles(self):
        t = _metric_table(
            [
                dict(name="s", dtype="summary", count=10, sum=100.0,
                     q_first=0.0, q_first_v=1.5, q_last=1.0, q_last_v=9.5,
                     start_ns=1_000_000_000, ts_ns=2_000_000_000),
                dict(name="s", dtype="summary", count=3, sum=30.0,
                     q_first=0.5, q_first_v=4.0, q_last=0.9, q_last_v=8.0,
                     start_ns=0, ts_ns=1_000_000_000),
                dict(name="s", dtype="summary", count=1, sum=5.0,
                     q_first=1.0, q_first_v=5.0, q_last=1.0, q_last_v=5.0,
                     start_ns=0, ts_ns=0),
            ]
        )
        out = NewRelicMetricTransformer()(t).to_pandas()
        full, mid, lone = out.iloc[0], out.iloc[1], out.iloc[2]
        assert full["nr_type"] == "summary"
        assert full["min"] == 1.5 and full["max"] == 9.5
        assert full["timestamp_ms"] == 1_000 and full["interval_ms"] == 1_000
        assert np.isnan(mid["min"]) and np.isnan(mid["max"])
        # a single quantile==1 sets max only
        assert np.isnan(lone["min"]) and lone["max"] == 5.0


class TestLog:
    # TestTransformer_Log
    def test_message_fallback_and_attrs(self):
        t = _metric_table(
            [
                dict(body="hello", log_name="n1", ts_ns=2_000_000_000,
                     severity_text="INFO", severity_number=9,
                     trace_id="0a" * 16, span_id="0b" * 8,
                     dropped_attributes_count=4, custom="x"),
                dict(body="", log_name="n2", ts_ns=0, severity_text="",
                     severity_number=0, trace_id="", span_id="",
                     dropped_attributes_count=0, custom=None),
            ]
        )
        out = NewRelicLogTransformer(attr_cols=["custom"])(t).to_pandas()
        r0 = out.iloc[0]
        assert r0["message"] == "hello"
        assert r0["timestamp_ms"] == 2000
        a = _attrs(r0["attrs"])
        assert a["name"] == "n1"
        assert a["log.level"] == "INFO"
        assert a["log.levelNum"] == "9"
        assert a["trace.id"] == "0a" * 16
        assert a["span.id"] == "0b" * 8
        assert a["otel.dropped_attributes_count"] == "4"
        assert a["custom"] == "x"
        r1 = out.iloc[1]
        # empty body → record name is the message
        assert r1["message"] == "n2"
        a1 = _attrs(r1["attrs"])
        assert a1 == {"name": "n2"}
