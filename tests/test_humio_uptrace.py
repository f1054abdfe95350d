"""humioexporter / uptraceexporter semantics, ported from
exporter/humioexporter/traces_exporter_test.go + tag_strategy_test.go
and exporter/uptraceexporter/translator_test.go."""

import pyarrow as pa

from opentelemetry_collector_contrib_ray.stages.humio import (
    HumioSpanEvents,
    UptraceSpanTransformer,
    uptrace_id_u64,
)


def _t(rows):
    keys = sorted({k for r in rows for k in r})
    return pa.table({k: [r.get(k) for r in rows] for k in keys})


_SPAN = dict(
    trace_id="01" * 16,
    span_id="02" * 8,
    parent_span_id="03" * 8,
    name="op",
    kind="server",
    status_code=1,
    status_message="all good",
    start_ns=1_599_999_999_000_000_000,
    end_ns=1_600_000_000_000_000_000,
)


class TestHumio:
    def test_span_event_fields(self):
        out = HumioSpanEvents(
            resource_attrs={"service.name": "svc", "env": "prod"},
            instrumentation=("lib", "2.0"),
            attr_cols=["http.method"],
        )(_t([dict(**_SPAN, **{"http.method": "GET"}, n_links=2)])).to_pandas()
        r = out.iloc[0]
        assert r["timestamp_ns"] == _SPAN["start_ns"]
        assert r["kind"] == "SPAN_KIND_SERVER"
        assert r["status_code"] == "STATUS_CODE_OK"
        assert r["status_description"] == "all good"
        assert r["service_name"] == "svc"
        # service.name hoisted out of attrs; resource + span + lib merged
        assert r["attrs"] == (
            "env=prod;http.method=GET;instrumentation.library.name=lib;"
            "instrumentation.library.version=2.0"
        )
        assert r["n_links"] == 2
        assert r["n_dropped"] == 0

    def test_missing_service_name_drops_resource(self):
        out = HumioSpanEvents(resource_attrs={"env": "prod"})(
            _t([_SPAN, _SPAN])
        ).to_pandas()
        assert list(out["tag"]) == ["__dropped__"]
        assert out["n_dropped"].sum() == 2

    def test_tag_strategies(self):
        t = _t([_SPAN])
        none = HumioSpanEvents(resource_attrs={"service.name": "svc"})(t).to_pandas()
        assert none.iloc[0]["tag"] == ""
        tid = HumioSpanEvents(
            resource_attrs={"service.name": "svc"}, tag_strategy="trace_id"
        )(t).to_pandas()
        assert tid.iloc[0]["tag"] == "01" * 16
        svc = HumioSpanEvents(
            resource_attrs={"service.name": "svc"}, tag_strategy="service_name"
        )(t).to_pandas()
        assert svc.iloc[0]["tag"] == "svc"

    def test_invalid_ids_render_empty(self):
        out = HumioSpanEvents(resource_attrs={"service.name": "svc"})(
            _t([dict(_SPAN, trace_id="0" * 32, parent_span_id="zz")])
        ).to_pandas()
        assert out.iloc[0]["trace_id"] == ""
        assert out.iloc[0]["parent_span_id"] == ""
        assert out.iloc[0]["span_id"] == "02" * 8


class TestUptrace:
    def test_little_endian_ids(self):
        # translator.go:27-29 — LE read, unlike jaeger's BE
        assert uptrace_id_u64("0100000000000000") == 1
        assert uptrace_id_u64("0000000000000001") == 1 << 56
        assert uptrace_id_u64("") == 0

    def test_span_fields(self):
        out = UptraceSpanTransformer(instrumentation=("tracer", "0.1"))(
            _t([_SPAN, dict(_SPAN, kind="weird", status_code=0,
                            parent_span_id=None)])
        ).to_pandas()
        r = out.iloc[0]
        assert r["id"] == uptrace_id_u64("02" * 8)
        assert r["parent_id"] == uptrace_id_u64("03" * 8)
        assert r["kind"] == "server"
        assert r["status_code"] == "ok"
        assert r["tracer_name"] == "tracer"
        r2 = out.iloc[1]
        assert r2["kind"] == "internal"  # unknown kinds collapse
        assert r2["status_code"] == "unset"
        assert r2["parent_id"] == 0
