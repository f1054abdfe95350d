"""Tests for stages/tanzu.py — semantics ported from
exporter/tanzuobservabilityexporter/transformer.go (+_test.go)."""

import pandas as pd
import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.tanzu import (
    _NIL_UUID,
    TanzuSpanTransformer,
)


def span_table(rows):
    cols = {
        "trace_id": [r.get("trace_id", "0102030405060708090a0b0c0d0e0f10") for r in rows],
        "span_id": [r.get("span_id", "0102030405060708") for r in rows],
        "parent_span_id": [r.get("parent") for r in rows],
        "name": [r.get("name", "op") for r in rows],
        "kind": [r.get("kind") for r in rows],
        "status_code": [r.get("code", 0) for r in rows],
        "status_message": [r.get("msg") for r in rows],
        "start_ns": [r.get("start", 1_000_000_000) for r in rows],
        "end_ns": [r.get("end", 3_500_000_000) for r in rows],
        "trace_state": [r.get("state") for r in rows],
        "n_events": [r.get("n_events", 0) for r in rows],
        "service": [r.get("service") for r in rows],
        "service.name": [r.get("service_name") for r in rows],
        "application": [r.get("application") for r in rows],
    }
    return pa.table(cols)


def run(rows, resource=None):
    tf = TanzuSpanTransformer(
        resource_attrs=resource, attr_cols=["service", "service.name", "application"]
    )
    return tf(span_table(rows)).to_pylist()


def tagdict(row):
    return dict(p.split("=", 1) for p in row["tags"].split(";") if p)


class TestIds:
    def test_uuid_formats(self):
        out = run([{"parent": "1112131415161718"}])
        r = out[0]
        assert r["trace_uuid"] == "01020304-0506-0708-090a-0b0c0d0e0f10"
        # 8-byte span id left-padded into the UUID tail (:217-219)
        assert r["span_uuid"] == "00000000-0000-0000-0102-030405060708"
        assert r["parent_uuid"] == "00000000-0000-0000-1112-131415161718"

    def test_empty_parent_is_nil_uuid(self):
        assert run([{}])[0]["parent_uuid"] == _NIL_UUID

    def test_invalid_ids_dropped(self):
        out = run(
            [
                {"trace_id": "00" * 16},  # empty trace id → drop (:58-61)
                {"span_id": "00" * 8},  # empty span id → drop (:63-66)
                {},
            ]
        )
        assert len(out) == 1


class TestTimes:
    def test_millis_and_duration(self):
        r = run([{"start": 1_000_000_000, "end": 3_500_000_000}])[0]
        assert r["start_ms"] == 1000 and r["duration_ms"] == 2500

    def test_unset_end_gives_zero_duration(self):
        r = run([{"start": 1_000_000_000, "end": 0}])[0]
        assert r["duration_ms"] == 0


class TestTags:
    def test_required_tag_defaults(self):
        t = tagdict(run([{}])[0])
        assert t["service"] == "defaultService"
        assert t["application"] == "defaultApp"

    def test_service_name_consumed_when_service_missing(self):
        t = tagdict(run([{"service_name": "checkout"}])[0])
        assert t["service"] == "checkout"
        assert "service.name" not in t  # deleted (:121-123)

    def test_service_name_kept_when_service_present(self):
        t = tagdict(run([{"service": "svc", "service_name": "other"}])[0])
        assert t["service"] == "svc" and t["service.name"] == "other"

    def test_resource_attrs_overridden_by_span_attrs(self):
        t = tagdict(run([{"application": "spanapp"}], resource={"application": "resapp"})[0])
        assert t["application"] == "spanapp"
        t2 = tagdict(run([{}], resource={"application": "resapp"})[0])
        assert t2["application"] == "resapp"

    def test_span_kind_and_unknown(self):
        assert tagdict(run([{"kind": "client"}])[0])["span.kind"] == "client"
        assert tagdict(run([{}])[0])["span.kind"] == "unspecified"
        assert tagdict(run([{"kind": "weird"}])[0])["span.kind"] == "unknown"

    def test_status_tags(self):
        ok = tagdict(run([{"code": 0}])[0])
        assert ok["status.code"] == "0" and "error" not in ok
        err = tagdict(run([{"code": 2, "msg": "x" * 300}])[0])
        assert err["error"] == "true"
        assert len(err["status.message"]) == 255 - len("status.message=")

    def test_trace_state_tag(self):
        t = tagdict(run([{"state": "k=v"}])[0])
        # the '=' inside the value survives the k=v render (split-once)
        assert t["w3c.tracestate"] == "k=v"
        assert "w3c.tracestate" not in tagdict(run([{}])[0])


def test_event_counts():
    assert run([{"n_events": 3}])[0]["n_logs"] == 3
