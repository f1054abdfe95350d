"""alibabacloudlogserviceexporter semantics, ported from
exporter/alibabacloudlogserviceexporter/
{logsdata,tracedata,metricsdata}_to_logservice_test.go and
sanitize_test.go."""

import pandas as pd
import pyarrow as pa

from opentelemetry_collector_contrib_ray.stages.alibaba_sls import (
    SlsLogTranslator,
    SlsSpanTranslator,
    format_go_g,
    format_metric_name,
    sanitize_key,
    sls_metric_logs,
)


def _t(rows):
    keys = sorted({k for r in rows for k in r})
    return pa.table({k: [r.get(k) for r in rows] for k in keys})


class TestSanitize:
    def test_sanitize_key(self):
        # sanitize_test.go semantics
        assert sanitize_key("foo.bar") == "foo_bar"
        assert sanitize_key("0digit") == "key_0digit"
        assert sanitize_key("_under") == "key_under"
        assert sanitize_key("ok_name") == "ok_name"
        assert sanitize_key("") == ""

    def test_format_metric_name(self):
        # ':' stays, '.' and '-' become '_'
        assert format_metric_name("a.b-c:d_e") == "a_b_c:d_e"
        assert format_metric_name("clean_name:x") == "clean_name:x"


class TestGoFloatFormat:
    def test_format_go_g(self):
        # Go strconv.FormatFloat(v, 'g', -1, 64) reference values
        cases = {
            0.0: "0",
            1.0: "1",
            100.0: "100",
            1.5: "1.5",
            0.25: "0.25",
            -2.5: "-2.5",
            1e16: "10000000000000000",
            1e20: "100000000000000000000",
            1e21: "1e+21",
            1e-4: "0.0001",
            1e-5: "1e-05",
            1.5e-5: "1.5e-05",
            123456789.123: "123456789.123",
        }
        for v, want in cases.items():
            assert format_go_g(v) == want, (v, format_go_g(v), want)

    def test_go_switches_at_exp21_not_16(self):
        # Python repr(1e16) == '1e+16' but Go prints the decimal form
        # until exp 21 (strconv/ftoa.go: shortest 'g' uses eprec 21)
        assert format_go_g(2e16) == "20000000000000000"
        assert format_go_g(1e16) != repr(1e16)


class TestLogs:
    def test_null_body_dropped_and_fields(self):
        tr = SlsLogTranslator(
            resource_attrs={"host.name": "h1", "service.name": "svc",
                            "env": "prod"},
            instrumentation=("lib", "2.0"),
            attr_cols=["k1", "k2"],
        )
        out = tr(
            _t(
                [
                    dict(ts_ns=2_500_000_000, severity_number=9,
                         severity_text="INFO", log_name="n1", body="hello",
                         flags=255, k1="v1", k2=None),
                    dict(ts_ns=0, severity_number=0, severity_text="",
                         log_name="n2", body=None, flags=0, k1=None, k2=None),
                ]
            )
        ).to_pandas()
        assert len(out) == 1
        assert out["n_dropped"].sum() == 1
        r = out.iloc[0]
        assert r["time_sec"] == 2
        assert r["host"] == "h1" and r["service"] == "svc"
        assert r["resource"] == '{"env":"prod"}'
        assert r["otlp_name"] == "lib" and r["otlp_version"] == "2.0"
        assert r["timeUnixNano"] == "2500000000"
        assert r["severityNumber"] == "9"
        assert r["attribute"] == '{"k1":"v1"}'
        assert r["content"] == "hello"
        assert r["flags"] == "ff"  # hex


class TestSpans:
    def test_span_fields(self):
        out = SlsSpanTranslator(attr_cols=["a"])(
            _t(
                [
                    dict(trace_id="0A" * 16, span_id="0b" * 8,
                         parent_span_id="0" * 16, name="op", kind="SERVER",
                         start_ns=1_500_000_000, end_ns=3_000_000_000,
                         status_code=2, status_message="bad",
                         trace_state="k=v", n_links=2, n_events=1, a="x"),
                ]
            )
        ).to_pandas()
        r = out.iloc[0]
        assert r["time_sec"] == 3
        assert r["traceID"] == "0a" * 16
        assert r["parentSpanID"] == ""  # zero parent → ""
        assert r["kind"] == "server"
        # microseconds (:123-135)
        assert r["start"] == "1500000" and r["end"] == "3000000"
        assert r["duration"] == "1500000"
        assert r["statusCode"] == "ERROR"
        assert r["statusMessage"] == "bad"
        assert r["attribute"] == '{"a":"x"}'
        assert r["n_links"] == 2 and r["n_logs"] == 1

    def test_status_and_kind_defaults(self):
        out = SlsSpanTranslator()(
            _t([dict(trace_id="0a" * 16, span_id="0b" * 8, name="x",
                     start_ns=0, end_ns=0, status_code=0, kind=None)])
        ).to_pandas()
        assert out.iloc[0]["statusCode"] == "UNSET"
        assert out.iloc[0]["kind"] == "unspecified"


class TestMetrics:
    def test_gauge_row(self):
        df = pd.DataFrame(
            [dict(name="cpu.usage", dtype="gauge", value=1.5,
                  ts_ns=2_000_000_001, host="h-1", shard=None)]
        )
        out = sls_metric_logs(df, label_cols=["host", "shard"])
        r = out.iloc[0]
        assert r["__name__"] == "cpu_usage"
        assert r["__labels__"] == "host#$#h-1"  # None label absent
        assert r["__time_nano__"] == "2000000001"
        assert r["__value__"] == "1.5"

    def test_labels_sorted_and_sanitized(self):
        df = pd.DataFrame(
            [dict(name="m", dtype="gauge", value=1.0, ts_ns=0,
                  **{"z.key": "1", "a.key": "2"})]
        )
        out = sls_metric_logs(df, label_cols=["z.key", "a.key"])
        assert out.iloc[0]["__labels__"] == "a_key#$#2|z_key#$#1"

    def test_histogram_expansion(self):
        df = pd.DataFrame(
            [dict(name="lat", dtype="histogram", value=None, ts_ns=10,
                  sum=99.5, count=7, bounds=[1.0, 5.0],
                  bucket_counts=[3, 2, 2], host="h")]
        )
        out = sls_metric_logs(df, label_cols=["host"])
        assert list(out["__name__"]) == [
            "lat_sum", "lat_count", "lat_bucket", "lat_bucket", "lat_bucket",
        ]
        assert out.iloc[0]["__value__"] == "99.5"
        assert out.iloc[1]["__value__"] == "7"
        # le labels: bounds then +Inf, merged sorted with base labels
        assert out.iloc[2]["__labels__"] == "host#$#h|le#$#1"
        assert out.iloc[3]["__labels__"] == "host#$#h|le#$#5"
        assert out.iloc[4]["__labels__"] == "host#$#h|le#$#+Inf"
        assert list(out["__value__"])[2:] == ["3", "2", "2"]

    def test_summary_expansion(self):
        df = pd.DataFrame(
            [dict(name="q", dtype="summary", value=None, ts_ns=5,
                  sum=10.0, count=4, quantiles=[0.5, 0.99],
                  qvalues=[1.25, 9.75])]
        )
        out = sls_metric_logs(df, label_cols=[])
        assert list(out["__name__"]) == ["q_sum", "q_count", "q", "q"]
        assert out.iloc[2]["__labels__"] == "quantile#$#0.5"
        assert out.iloc[3]["__labels__"] == "quantile#$#0.99"
        assert out.iloc[3]["__value__"] == "9.75"
