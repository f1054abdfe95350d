"""Tests for stages/azuremonitor.py — semantics ported from
exporter/azuremonitorexporter/trace_to_envelope.go (+_test.go)."""

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.azuremonitor import (
    AzureMonitorSpanToEnvelope,
    format_duration_ns,
)

BASE = {
    "trace_id": "0102030405060708090a0b0c0d0e0f10",
    "span_id": "0102030405060708",
    "parent_span_id": "1112131415161718",
    "name": "op",
    "kind": "server",
    "status_code": 0,
    "start_ns": 1_600_000_000_000_000_000,
    "end_ns": 1_600_000_001_000_000_000,
}


def run(rows, resource=None):
    full = []
    for r in rows:
        d = dict(BASE)
        d.update(r)
        full.append(d)
    cols = {}
    for k in set().union(*(r.keys() for r in full)):
        cols[k] = [r.get(k) for r in full]
    return AzureMonitorSpanToEnvelope(resource)(pa.table(cols)).to_pylist()


class TestEnvelopeRouting:
    def test_server_is_request(self):
        r = run([{"kind": "server"}])[0]
        assert r["envelope_name"] == "Microsoft.ApplicationInsights.Request"
        assert r["op_name"] == "op"

    def test_client_and_internal_are_dependencies(self):
        out = run([{"kind": "client"}, {"kind": "internal"}, {"kind": "unspecified"}])
        assert all(r["envelope_name"].endswith("RemoteDependency") for r in out)
        # internal (and unspecified→internal) force InProc (:96-99)
        assert out[1]["dep_type"] == "InProc" and out[2]["dep_type"] == "InProc"

    def test_faas_dropped(self):
        out = run([{"faas.trigger": "http"}, {}])
        assert len(out) == 1

    def test_operation_tags(self):
        r = run([{}])[0]
        assert r["op_id"] == BASE["trace_id"]
        assert r["op_parent_id"] == BASE["parent_span_id"]

    def test_cloud_role_tags(self):
        r = run([{}], resource={"service.name": "svc", "service.namespace": "ns", "service.instance.id": "i9"})[0]
        assert r["cloud_role"] == "ns.svc" and r["cloud_role_instance"] == "i9"


class TestStatus:
    def test_default_status(self):
        ok = run([{"status_code": 0}])[0]
        assert ok["response_code"] == "0" and ok["success"]
        err = run([{"status_code": 2}])[0]
        assert err["response_code"] == "2" and not err["success"]

    def test_http_status_overrides(self):
        r = run([{"http.method": "GET", "http.status_code": 404, "status_code": 0}])[0]
        assert r["response_code"] == "404" and not r["success"]
        ok = run([{"http.method": "GET", "http.status_code": 301}])[0]
        assert ok["success"]

    def test_rpc_status(self):
        r = run([{"rpc.system": "grpc", "rpc.grpc.status_code": 7}])[0]
        assert r["response_code"] == "7"
        z = run([{"rpc.system": "grpc"}])[0]
        assert z["response_code"] == "0"


class TestHttpRequest:
    def test_name_uses_route_else_span_name(self):
        r = run([{"http.method": "GET", "http.route": "bizzle"}])[0]
        assert r["data_name"] == "GET /bizzle"
        r2 = run([{"http.method": "GET"}])[0]
        assert r2["data_name"] == "GET op"

    def test_url_preference_chain(self):
        r = run([{"http.method": "GET", "http.scheme": "https", "http.host": "h:81", "http.target": "/p"}])[0]
        assert r["url_or_data"] == "https://h:81/p"
        r2 = run([{"http.method": "GET", "http.scheme": "https", "http.server_name": "sn", "net.host.port": 81, "http.target": "p"}])[0]
        assert r2["url_or_data"] == "https://sn:81/p"  # target gets "/"
        r3 = run([{"http.method": "GET", "http.url": "https://x/y"}])[0]
        assert r3["url_or_data"] == "https://x/y"

    def test_source_client_ip_over_peer_ip(self):
        r = run([{"http.method": "GET", "http.client_ip": "1.2.3.4", "net.peer.ip": "9.9.9.9"}])[0]
        assert r["source"] == "1.2.3.4"
        r2 = run([{"http.method": "GET", "net.peer.ip": "9.9.9.9"}])[0]
        assert r2["source"] == "9.9.9.9"


class TestHttpDependency:
    def test_url_wins_and_target_is_authority(self):
        r = run([{"kind": "client", "http.method": "GET", "http.url": "https://api.example.com:8080/v1?q=1"}])[0]
        assert r["dep_type"] == "HTTP"
        assert r["url_or_data"] == "https://api.example.com:8080/v1?q=1"
        assert r["target"] == "api.example.com:8080"

    def test_peer_name_chain(self):
        r = run([{"kind": "client", "http.method": "GET", "http.scheme": "http", "net.peer.name": "pn", "net.peer.port": 81, "http.target": "/t"}])[0]
        assert r["url_or_data"] == "http://pn:81/t" and r["target"] == "pn:81"


class TestOtherTypes:
    def test_database(self):
        r = run([{"kind": "client", "db.system": "mysql", "db.statement": "SELECT 1", "net.peer.name": "dbh", "net.peer.port": 3306}])[0]
        assert r["dep_type"] == "mysql"
        assert r["url_or_data"] == "SELECT 1" and r["target"] == "dbh:3306"

    def test_database_operation_fallback(self):
        r = run([{"kind": "client", "db.system": "redis", "db.operation": "GET"}])[0]
        assert r["url_or_data"] == "GET"

    def test_messaging(self):
        r = run([{"kind": "client", "messaging.system": "kafka", "messaging.url": "amqp://q"}])[0]
        assert r["dep_type"] == "kafka" and r["target"] == "amqp://q"
        req = run([{"kind": "server", "messaging.system": "kafka", "net.peer.ip": "8.8.8.8"}])[0]
        assert req["source"] == "8.8.8.8"

    def test_rpc_dependency(self):
        r = run([{"kind": "client", "rpc.system": "grpc", "net.peer.name": "rp", "net.peer.port": 50051}])[0]
        assert r["dep_type"] == "grpc"
        assert r["url_or_data"] == "grpc op" and r["target"] == "rp:50051"

    def test_rpc_typing_beats_http(self):
        # typing order rpc > http (:588-606)
        r = run([{"rpc.system": "grpc", "http.method": "GET"}])[0]
        assert r["span_type"] == "rpc"


def test_duration_format():
    import pandas as pd

    s = format_duration_ns(pd.Series([90_061_000_123_000]))  # 1d1h1m1s... no: 90061.000123 s
    # 90061 s = 1 day 1 h 1 m 1 s; fraction 123 µs
    assert s.iloc[0] == "01.01:01:01.000123"


def test_time_rfc3339():
    r = run([{"start_ns": 1_600_000_000_000_000_000}])[0]
    assert r["time"] == "2020-09-13T12:26:40Z"
    r2 = run([{"start_ns": 1_600_000_000_500_000_000}])[0]
    assert r2["time"] == "2020-09-13T12:26:40.5Z"
